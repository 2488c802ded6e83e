"""Round-5 measurements (run on the axon TPU, idle host, except
`biobank` which rehearses the virtual CPU mesh):

  python scripts/perf_round5.py profile     # -gk / -lmm 1 phase breakdown
  python scripts/perf_round5.py vc          # HE + REML-AI wall at n=5000
  python scripts/perf_round5.py bslmm_rate  # MCMC steady-state it/s
  python scripts/perf_round5.py bslmm_full  # full w=100k+s=1M protocol
  python scripts/perf_round5.py lmm10k      # n=10k, p=50k -gk/-lmm re-measure
  python scripts/perf_round5.py biobank     # n=8k 2-D mesh rehearsal (CPU)

Each subcommand prints one JSON line for PERF.md.  Reference
protocols: BASELINE.json configs 4-5; GEMMA defaults w=100k/s=1M
(gemma.cpp:645-649), per-AI-iteration n×n LU (vc.cpp:168-258).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _phase_times(log):
    return {k: round(v, 2) for k, v in sorted(log.timer.times.items())}


def profile():
    """Phase breakdown of the bench e2e legs (round-4 verdict weak #1:
    >95% of -lmm wall is host work; this names the phases)."""
    from bench import _synth_mouse
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import batch_run, run_gk, run_lmm
    from gemma_tpu.utils.log import RunLog

    with tempfile.TemporaryDirectory() as td:
        geno, pheno = _synth_mouse(td)
        common = f"-g {geno} -p {pheno} -outdir {td} -no-check"
        # warm both legs (compiles persisted in the XLA disk cache)
        batch_run(parse_args((common + " -gk -o W").split()))
        batch_run(parse_args(
            (common + f" -k {td}/W.cXX.txt -lmm 1 -o WA").split()))
        out = {}
        for leg, fn, args in (
                ("gk", run_gk, common + " -gk -o K"),
                ("lmm", run_lmm,
                 common + f" -k {td}/W.cXX.txt -lmm 1 -o A")):
            best = None
            for _ in range(3):
                log = RunLog(argv=["gemma-tpu"], quiet=True)
                t0 = time.time()
                fn(parse_args(args.split()), log)
                t = time.time() - t0
                if best is None or t < best[0]:
                    best = (t, _phase_times(log))
            out[f"{leg}_sec"] = round(best[0], 2)
            out[f"{leg}_phases"] = best[1]
    print(json.dumps(out))


def vc():
    """HE regression + REML-AI wall-clock at n=5000 (BASELINE config 4
    class).  The reference's REML-AI pays an n×n LU inverse per AI
    iteration on the host (vc.cpp:168-258); here each iteration is one
    jitted device program (inv + matmuls on the MXU)."""
    from synth_biobank import write_plink
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import batch_run

    n, p = 5000, 4096
    td = tempfile.mkdtemp(prefix="perfvc_")
    prefix = os.path.join(td, "s")
    write_plink(prefix, n, p, h2=0.5, seed=7)
    common = f"-bfile {prefix} -outdir {td} -no-check"
    t0 = time.time()
    batch_run(parse_args((common + " -gk -o K").split()))
    t_gk = time.time() - t0
    k = f"-k {td}/K.cXX.txt"
    # warm pass pays compiles; timed pass is deployed steady state
    batch_run(parse_args((common + f" {k} -vc 1 -o W1").split()))
    t0 = time.time()
    batch_run(parse_args((common + f" {k} -vc 1 -o HE").split()))
    t_he = time.time() - t0
    batch_run(parse_args((common + f" {k} -vc 2 -o W2").split()))
    t0 = time.time()
    batch_run(parse_args((common + f" {k} -vc 2 -o AI").split()))
    t_ai = time.time() - t0
    pve = None
    with open(f"{td}/AI.log.txt") as fh:
        for line in fh:
            if line.startswith("## pve estimates"):
                pve = float(line.split("=")[1].split()[0])
    print(json.dumps({"n": n, "p": p, "gk_sec": round(t_gk, 1),
                      "vc_he_sec": round(t_he, 2),
                      "vc_reml_ai_sec": round(t_ai, 2),
                      "reml_pve": pve}))


def _bslmm_data(td, n=1940, p=12226):
    from bench import _synth_mouse
    geno, pheno = _synth_mouse(td, n=n, p=p, seed=3)
    return geno, pheno


def bslmm_rate():
    """Steady-state MCMC iteration rate: two chain lengths, rate from
    the difference (cancels parse/eigen/compile/posterior-writer
    overhead).  Reference: one n×|gamma| dgemm per MH step on the
    host, 1.1M host-loop iterations (bslmm.cpp:992-1155)."""
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import batch_run

    with tempfile.TemporaryDirectory() as td:
        geno, pheno = _bslmm_data(td)
        common = f"-g {geno} -p {pheno} -outdir {td} -no-check -seed 42"
        batch_run(parse_args((common + " -gk -o K").split()))
        k = f"-k {td}/K.cXX.txt"
        short, long_ = 2000, 42000
        batch_run(parse_args(        # warm: compile chain program
            (common + f" {k} -bslmm 1 -w 1000 -s {short} -o W").split()))
        t0 = time.time()
        batch_run(parse_args(
            (common + f" {k} -bslmm 1 -w 1000 -s {short} -o A").split()))
        t_short = time.time() - t0
        t0 = time.time()
        batch_run(parse_args(
            (common + f" {k} -bslmm 1 -w 1000 -s {long_} -o B").split()))
        t_long = time.time() - t0
    rate = (long_ - short) / (t_long - t_short)
    full = 1_100_000 / rate + (t_short - (short + 1000) / rate)
    print(json.dumps({
        "n": 1940, "p": 12226,
        "iters_per_sec": round(rate, 1),
        "sec_short": round(t_short, 1), "sec_long": round(t_long, 1),
        "projected_full_1p1M_sec": round(full, 1)}))


def bslmm_full():
    """The full reference protocol: w=100,000 burn-in + s=1,000,000
    sampling on the mouse-scale shape (defaults gemma.cpp:645-649)."""
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import batch_run

    td = tempfile.mkdtemp(prefix="perfbslmm_")
    geno, pheno = _bslmm_data(td)
    common = f"-g {geno} -p {pheno} -outdir {td} -no-check -seed 42"
    batch_run(parse_args((common + " -gk -o K").split()))
    k = f"-k {td}/K.cXX.txt"
    t0 = time.time()
    batch_run(parse_args((common + f" {k} -bslmm 1 -o F").split()))
    t = time.time() - t0
    n_gamma = None
    with open(f"{td}/F.hyp.txt") as fh:
        rows = fh.readlines()[1:]
        if rows:
            n_gamma = float(np.mean([float(r.split()[5]) for r in rows]))
    print(json.dumps({"n": 1940, "p": 12226, "w": 100000, "s": 1000000,
                      "wall_sec": round(t, 1),
                      "iters_per_sec": round(1_100_000 / t, 1),
                      "mean_n_gamma": n_gamma}))


def lmm10k():
    """Re-measure the large-scale single-chip pipeline (PERF.md table:
    n=10,000 × p=50,000 synthetic PLINK): -gk, then -lmm 1 with the
    eigendecomposition and association timed via the phase profile."""
    from synth_biobank import write_plink
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import run_gk, run_lmm
    from gemma_tpu.utils.log import RunLog

    n, p = 10000, 50000
    td = tempfile.mkdtemp(prefix="perf10k_")
    prefix = os.path.join(td, "s")
    write_plink(prefix, n, p, h2=0.5, seed=1)
    common = f"-bfile {prefix} -outdir {td} -no-check"
    log = RunLog(argv=["gemma-tpu"], quiet=True)
    t0 = time.time()
    run_gk(parse_args((common + " -gk -o K").split()), log)
    t_gk = time.time() - t0
    gk_phases = _phase_times(log)
    log = RunLog(argv=["gemma-tpu"], quiet=True)
    t0 = time.time()
    run_lmm(parse_args(
        (common + f" -k {td}/K.cXX.txt -lmm 1 -o A").split()), log)
    t_lmm = time.time() - t0
    print(json.dumps({"n": n, "p": p, "gk_sec": round(t_gk, 1),
                      "gk_phases": gk_phases,
                      "lmm_sec": round(t_lmm, 1),
                      "lmm_phases": _phase_times(log)}))


def biobank():
    """Round-4 verdict missing #5: biobank-shape BOOKKEEPING rehearsal
    on the virtual 8-device CPU mesh — synthetic n=8192, p=32768 PLINK
    through 2-D `-gk` + `-lmm 1` with the memory guard armed at ~1.2×
    one K shard, plus output spot-equality against the replicated
    path on a SNP subset.  This validates padding, shard readback,
    sidecar write and the 2-D assoc pipeline at a real n; wall-clock
    is meaningless (8 virtual devices share one physical core)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from synth_biobank import write_plink
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import batch_run, _LAST_EIGEN_SHARDED

    n, p = 8192, 32768
    td = tempfile.mkdtemp(prefix="perfbio_")
    prefix = os.path.join(td, "s")
    write_plink(prefix, n, p, h2=0.5, seed=9)
    common = f"-bfile {prefix} -outdir {td} -no-check"
    # guard: one K shard is n*n*4/4 bytes on the ind=4 axis
    os.environ["GEMMA_TPU_MESH"] = "snp=2,ind=4"
    os.environ["GEMMA_TPU_MEM_GUARD"] = str(int(1.2 * n * n * 4 / 4))
    os.environ["GEMMA_TPU_EIGH_MIN_BLOCK"] = "2048"
    t0 = time.time()
    batch_run(parse_args((common + " -gk -o K").split()))
    t_gk = time.time() - t0
    t0 = time.time()
    batch_run(parse_args(
        (common + f" -k {td}/K.cXX.txt -lmm 1 -o A").split()))
    t_lmm = time.time() - t0
    sharded = dict(_LAST_EIGEN_SHARDED)
    for v in ("GEMMA_TPU_MESH", "GEMMA_TPU_MEM_GUARD",
              "GEMMA_TPU_EIGH_MIN_BLOCK"):
        os.environ.pop(v, None)
    # spot equality: replicated single-device run on a 2k-SNP subset
    os.environ["GEMMA_TPU_MAX_DEVICES"] = "1"
    snps = os.path.join(td, "subset.txt")
    with open(f"{prefix}.bim") as fh:
        rs = [ln.split()[1] for ln in fh][:2048]
    with open(snps, "w") as fh:
        fh.writelines(r + "\n" for r in rs)
    batch_run(parse_args(
        (common + f" -k {td}/K.cXX.txt -snps {snps} -lmm 1 "
         "-o R").split()))
    os.environ.pop("GEMMA_TPU_MAX_DEVICES", None)

    def read_p(path):
        with open(path) as fh:
            hdr = fh.readline().rstrip("\n").split("\t")
            jp, jr = hdr.index("p_wald"), hdr.index("rs")
            return {ln.split("\t")[jr]: float(ln.split("\t")[jp])
                    for ln in fh}
    p2d = read_p(f"{td}/A.assoc.txt")
    prep = read_p(f"{td}/R.assoc.txt")
    diffs = [abs(p2d[r] - prep[r]) for r in prep if r in p2d]
    print(json.dumps({
        "n": n, "p": p, "gk_sec": round(t_gk, 1),
        "lmm_sec": round(t_lmm, 1), "eigen_sharded": sharded,
        "subset_compared": len(diffs),
        "max_abs_dp_wald": float(max(diffs)),
        "pass_1e3": bool(max(diffs) < 1e-3)}))


if __name__ == "__main__":
    {"profile": profile, "vc": vc, "bslmm_rate": bslmm_rate,
     "bslmm_full": bslmm_full, "lmm10k": lmm10k,
     "biobank": biobank}[sys.argv[1]]()
