"""Round-3 real-chip measurements (run on the axon TPU, idle host):

  python scripts/perf_round3.py eigen20k   # n=20k kinship+eigen e2e
  python scripts/perf_round3.py parity6k   # f32 D&C vs f64 host p-values at n=6144
  python scripts/perf_round3.py mvlmm_lrt  # mvLMM -lmm 2 e2e throughput
  python scripts/perf_round3.py gxe        # -lmm 1 -gxe e2e throughput
  python scripts/perf_round3.py hlc        # HLC-shape 4-pheno mvLMM protocol (round 4)

Each subcommand prints one JSON line for PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def eigen20k(n=20000, p=24576):
    """Kinship + eigendecomposition end-to-end at n=20,000 through the
    production CLI (-gk from synthetic PLINK, then -eigen).

    p > n so K is FULL RANK and the spectral D&C faces a spread
    spectrum (balanced splits, the hard case).  `eigen20k_rd` runs the
    rank-deficient complement (p << n): its (n-p)-dimensional zero
    eigencluster exercises the cluster-leaf path instead."""
    from synth_biobank import write_plink
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import run_gk, run_eigen
    from gemma_tpu.utils.log import RunLog

    td = tempfile.mkdtemp(prefix="perf20k_")
    prefix = os.path.join(td, "s")
    write_plink(prefix, n, p, h2=0.5, seed=0)
    common = f"-bfile {prefix} -outdir {td} -no-check"
    log_gk = RunLog(argv=["gemma-tpu"], quiet=True)
    t0 = time.time()
    run_gk(parse_args((common + " -gk -o K").split()), log_gk)
    t_gk = time.time() - t0
    log_e = RunLog(argv=["gemma-tpu"], quiet=True)
    t0 = time.time()
    run_eigen(parse_args(
        (common + f" -k {td}/K.cXX.txt -eigen -o E").split()), log_e)
    t_eigen = time.time() - t0
    ph = lambda lg: {k: round(v, 2) for k, v in sorted(lg.timer.times.items())}
    print(json.dumps({"n": n, "p": p, "gk_sec": round(t_gk, 1),
                      "gk_phases": ph(log_gk),
                      "eigen_sec": round(t_eigen, 1),
                      "eigen_phases": ph(log_e)}))


def parity6k():
    """f32 spectral-D&C (production threshold engaged: n>4608) vs f64
    host-LAPACK `-lmm 1` p-values at n=6144 — the real-chip version of
    tests/test_f32_parity_dc.py."""
    from gemma_tpu.precision import enable_x64, apply_matmul_precision
    enable_x64()      # the f64 leg must not silently truncate to f32
    import jax
    import jax.numpy as jnp
    apply_matmul_precision(jnp.float32)   # production f32 config
    from gemma_tpu.models.lmm.engine import fit_null, assoc_block_impl
    from gemma_tpu.ops.eigh import eigh_zeroed, _DEVICE_EIGH_MAX_N

    n, p_assoc = 6144, 4096
    assert n > _DEVICE_EIGH_MAX_N
    rng = np.random.default_rng(0)
    G = rng.binomial(2, rng.uniform(0.1, 0.5, (8192, 1)),
                     (8192, n)).astype(np.float64)
    Gc = G - G.mean(axis=1, keepdims=True)
    K = (Gc.T @ Gc) / 8192
    rs = K.sum(axis=1)
    Kc = K - rs[:, None] / n - rs[None, :] / n + rs.sum() / (n * n)
    u = Gc[:50].sum(axis=0)
    y = 0.6 * u / u.std() + rng.normal(size=n)
    X = Gc[:p_assoc]

    def pipeline(dtype):
        t0 = time.time()
        w, U, trace_G = eigh_zeroed(jnp.asarray(Kc, dtype),
                                    out_dtype=dtype)
        w.block_until_ready()
        t_eigh = time.time() - t0
        W = jnp.ones((n, 1), dtype)
        UtW, Uty = U.T @ W, U.T @ jnp.asarray(y, dtype)
        nf = fit_null(w, UtW, Uty, trace_G, 1)
        st = assoc_block_impl(w, UtW, Uty, jnp.asarray(X, dtype) @ U,
                              nf.l_mle, nf.logl_mle, n_cvt=1, mode=1)
        return np.asarray(st.p_wald, np.float64), t_eigh

    p32, t32 = pipeline(jnp.float32)       # D&C path (n > 4608)
    # f64 parity leg runs on the CPU backend: the axon compile helper
    # has no f64 LuDecomposition, and the production f64 path is
    # host-LAPACK + CPU-grade numerics anyway
    with jax.default_device(jax.devices("cpu")[0]):
        p64, t64 = pipeline(jnp.float64)   # host LAPACK parity path
    dp = np.abs(p32 - p64)
    print(json.dumps({
        "n": n, "eigh_f32_dc_sec": round(t32, 1),
        "eigh_f64_host_sec": round(t64, 1),
        "max_abs_dp_wald": float(dp.max()),
        "pass_1e3": bool(dp.max() < 1e-3)}))


def mvlmm_lrt():
    """mvLMM -lmm 2 (LRT) end-to-end at the releases.org protocol
    shape (the Wald number lives in bench.py)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _synth_mouse
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import batch_run

    with tempfile.TemporaryDirectory() as td:
        geno, pheno = _synth_mouse(td, n=757, p=10775, seed=1, n_ph=2)
        common = f"-g {geno} -p {pheno} -outdir {td} -no-check"
        batch_run(parse_args((common + " -gk -o K").split()))
        k = f"-k {td}/K.cXX.txt"
        batch_run(parse_args(
            (common + f" {k} -lmm 2 -n 1 2 -o W").split()))  # warm
        from gemma_tpu.models.mvlmm import EM_STATS
        EM_STATS.update(bursts=0, compute_s=0.0, sync_s=0.0)
        t0 = time.time()
        batch_run(parse_args(
            (common + f" {k} -lmm 2 -n 1 2 -o A").split()))
        t = time.time() - t0
        with open(f"{td}/A.assoc.txt") as fh:
            n_out = sum(1 for _ in fh) - 1
    print(json.dumps({"mvlmm_lrt_snps_per_sec": round(n_out / t, 1),
                      "sec": round(t, 1), "snps": n_out,
                      "em_bursts": EM_STATS["bursts"],
                      "em_compute_s": round(EM_STATS["compute_s"], 2),
                      "em_sync_s": round(EM_STATS["sync_s"], 2)}))


def gxe():
    """Univariate GxE interaction (-lmm 1 -gxe) end-to-end at the
    mouse protocol shape — the reference runs the same per-SNP
    Brent/Newton loop with an extra covariate (lmm.cpp:2283-2540), so
    any device fan-out beats it; this records the actual number."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _synth_mouse
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import batch_run

    with tempfile.TemporaryDirectory() as td:
        geno, pheno = _synth_mouse(td, n=1940, p=12226, seed=2)
        env_file = os.path.join(td, "env.txt")
        rng = np.random.default_rng(9)
        with open(env_file, "w") as fh:
            for v in rng.binomial(1, 0.5, 1940):
                fh.write(f"{v}\n")
        common = f"-g {geno} -p {pheno} -outdir {td} -no-check"
        batch_run(parse_args((common + " -gk -o K").split()))
        k = f"-k {td}/K.cXX.txt -gxe {env_file}"
        batch_run(parse_args(
            (common + f" {k} -lmm 1 -o W").split()))        # warm
        t0 = time.time()
        batch_run(parse_args((common + f" {k} -lmm 1 -o A").split()))
        t = time.time() - t0
        with open(f"{td}/A.assoc.txt") as fh:
            n_out = sum(1 for _ in fh) - 1
    print(json.dumps({"gxe_snps_per_sec": round(n_out / t, 1),
                      "sec": round(t, 1), "snps": n_out}))


def hlc():
    """HLC-shape synthetic stand-in for the reference's lengthy
    protocol (test/lengthy_test_suite.sh:23-46): PLINK n=427, 4
    phenotypes (`-n 1 2 3 15` from a 15-column pheno file, exercising
    the general-d mvLMM path, not the 2x2 closed form), one continuous
    covariate, `-maf 0.1`, ~223k analyzed SNPs.  The reference takes
    ">30 minutes" for the -lmm step on its CI machine; this prints
    the end-to-end wall and the implied margin."""
    from synth_biobank import write_plink
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import batch_run

    n, p = 427, 223243
    td = tempfile.mkdtemp(prefix="perfhlc_")
    prefix = os.path.join(td, "hlc")
    # maf_lo=0.15 keeps (almost) every sampled-maf SNP above the 0.1
    # filter at n=427, matching the protocol's 223,243 analyzed rows
    write_plink(prefix, n, p, h2=0.5, seed=4, maf_lo=0.15)
    rng = np.random.default_rng(4)
    pheno = os.path.join(td, "pheno.txt")
    base = rng.normal(size=n)
    Y = 0.5 * base[:, None] + rng.normal(size=(n, 15))
    with open(pheno, "w") as fh:
        for row in Y:
            fh.write("\t".join(f"{v:.6f}" for v in row) + "\n")
    cvt = os.path.join(td, "cvt.txt")
    with open(cvt, "w") as fh:
        fh.writelines(f"{v:.4f}\n" for v in rng.normal(size=n))
    common = f"-bfile {prefix} -outdir {td} -no-check"
    t0 = time.time()
    batch_run(parse_args((common + " -gk 2 -o K").split()))
    t_gk = time.time() - t0
    from gemma_tpu.models.mvlmm import EM_STATS
    from gemma_tpu.run import run_mvlmm
    from gemma_tpu.utils.log import RunLog
    EM_STATS.update(bursts=0, compute_s=0.0, sync_s=0.0)
    log = RunLog(argv=["gemma-tpu"], quiet=True)
    t0 = time.time()
    run_mvlmm(parse_args(
        (common + f" -p {pheno} -k {td}/K.sXX.txt -lmm 1 -maf 0.1"
         f" -n 1 2 3 15 -c {cvt} -o A").split()), log)
    t_lmm = time.time() - t0
    with open(f"{td}/A.assoc.txt") as fh:
        n_out = sum(1 for _ in fh) - 1
    print(json.dumps({
        "n": n, "snps": n_out, "gk2_sec": round(t_gk, 1),
        "mvlmm4_sec": round(t_lmm, 1),
        "snps_per_sec": round(n_out / t_lmm, 1),
        "margin_vs_30min": round(1800.0 / t_lmm, 1),
        "em_bursts": EM_STATS["bursts"],
        "em_compute_s": round(EM_STATS["compute_s"], 2),
        "em_sync_s": round(EM_STATS["sync_s"], 2),
        "phases": {k: round(v, 2)
                   for k, v in sorted(log.timer.times.items())}}))


if __name__ == "__main__":
    {"eigen20k": eigen20k,
     "eigen20k_rd": lambda: eigen20k(p=4096),
     "parity6k": parity6k,
     "mvlmm_lrt": mvlmm_lrt, "gxe": gxe, "hlc": hlc}[sys.argv[1]]()
