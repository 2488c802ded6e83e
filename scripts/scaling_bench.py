"""Multi-device scaling harness (BASELINE: >=80% scaling efficiency).

Measures SNP-sharded LMM association throughput at 1, 2, ..., D
devices on whatever mesh is available and prints one JSON line per
device count plus the scaling efficiency relative to 1 device.

On a real pod slice run it as-is; on a development host use the
virtual CPU mesh:

    python scripts/scaling_bench.py --n 512 --snps-per-device 1024 --cpu 8

NOTE: virtual CPU devices all share one host's cores, so --cpu runs
validate the sharded program (collectives, layouts, weak-scaling
shapes) but CANNOT show real speedup — efficiency numbers are only
meaningful on real multi-chip hardware.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _read_pcol(path, col):
    with open(path) as fh:
        header = fh.readline().rstrip("\n").split("\t")
        j = header.index(col)
        return np.array([float(ln.split("\t")[j]) for ln in fh])


def _e2e(a):
    """Drive the PRODUCTION CLI (batch_run -gk / -lmm 1, and with
    --models also 2-phenotype mvLMM and -lm 4) at each device count on
    a synthetic PLINK dataset — files, QC, eigen, writers and the
    sharded device pipeline all included.  Output equality against the
    1-device run is asserted per mode, so the SPMD program shapes are
    validated before real hardware ever shows up (SURVEY §2.2 DP
    obligations)."""
    import shutil
    import tempfile

    import jax
    from synth_biobank import write_plink
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import batch_run

    total_dev = len(jax.devices())
    td = tempfile.mkdtemp(prefix="scaling_e2e_")
    try:
        prefix = os.path.join(td, "synth")
        write_plink(prefix, a.n, a.p, h2=0.5, seed=0)
        # 2-column phenotype file for the mvLMM pass (-p overrides .fam)
        pheno2 = os.path.join(td, "pheno2.txt")
        rng = np.random.default_rng(1)
        np.savetxt(pheno2, rng.normal(size=(a.n, 2)), fmt="%.6f")
        counts = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= total_dev]
        base = None
        p_ref = {}
        for d in counts:
            os.environ["GEMMA_TPU_MAX_DEVICES"] = str(d)
            out = os.path.join(td, f"out{d}")
            common = f"-bfile {prefix} -outdir {out} -no-check"
            t0 = time.time()
            batch_run(parse_args((common + " -gk -o K").split()))
            t_gk = time.time() - t0
            t0 = time.time()
            batch_run(parse_args(
                (common + f" -k {out}/K.cXX.txt -lmm 1 -o A").split()))
            t_lmm = time.time() - t0
            rec = {"devices": d, "gk_sec": round(t_gk, 2),
                   "lmm_sec": round(t_lmm, 2)}
            p_now = {"lmm": _read_pcol(f"{out}/A.assoc.txt", "p_wald")}
            if a.models:
                t0 = time.time()
                batch_run(parse_args(
                    (common + f" -p {pheno2} -k {out}/K.cXX.txt "
                     "-lmm 1 -n 1 2 -emi 1000 -nri 10 -o M").split()))
                rec["mvlmm_sec"] = round(time.time() - t0, 2)
                t0 = time.time()
                batch_run(parse_args((common + " -lm 4 -o L").split()))
                rec["lm_sec"] = round(time.time() - t0, 2)
                p_now["mvlmm"] = _read_pcol(f"{out}/M.assoc.txt",
                                            "p_wald")
                p_now["lm"] = _read_pcol(f"{out}/L.assoc.txt", "p_wald")
            if not p_ref:
                p_ref = p_now
            else:
                # float64: device count must not change the math at
                # all; float32: psum/reduction orders differ per mesh,
                # so the speed-mode p-value contract (1e-3 abs) is the
                # bar
                import jax as _jax
                tol = 1e-8 if _jax.config.jax_enable_x64 else 1e-3
                for mode, pv in p_now.items():
                    if not np.allclose(pv, p_ref[mode], atol=tol,
                                       equal_nan=True):
                        dmax = float(np.nanmax(np.abs(
                            pv - p_ref[mode])))
                        raise AssertionError(
                            f"{mode}: {d}-device output diverges from "
                            f"1-device output (max |dp| = {dmax:.2e})")
                rec["output_equal_1dev"] = True
            sps = a.p / t_lmm
            if base is None:
                base = sps
            rec["e2e_lmm_snps_per_sec"] = round(sps, 1)
            rec["scaling_efficiency"] = round(sps / (base * d), 3)
            print(json.dumps(rec))
    finally:
        os.environ.pop("GEMMA_TPU_MAX_DEVICES", None)
        shutil.rmtree(td, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1940)
    ap.add_argument("--p", type=int, default=20000,
                    help="SNP count for --e2e")
    ap.add_argument("--snps-per-device", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--e2e", action="store_true",
                    help="measure through batch_run on a synthetic "
                         "PLINK dataset instead of the bare kernel")
    ap.add_argument("--models", action="store_true",
                    help="with --e2e: also drive 2-phenotype mvLMM and "
                         "-lm 4 per device count, asserting output "
                         "equality against the 1-device run")
    ap.add_argument("--cpu", type=int, default=0, metavar="N",
                    help="force an N-device virtual CPU mesh (the axon "
                         "TPU plugin ignores JAX_PLATFORMS, so this sets "
                         "jax.config before backend init)")
    a = ap.parse_args()

    if a.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={a.cpu}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    if a.e2e:
        _e2e(a)
        return
    import jax
    import jax.numpy as jnp
    from gemma_tpu.parallel.mesh import make_mesh
    from gemma_tpu.parallel.shard import sharded_rotate_and_assoc

    n = a.n
    total_dev = len(jax.devices())
    dtype = (jnp.float32 if jax.default_backend() in ("tpu", "axon")
             else jnp.float64)

    rng = np.random.default_rng(0)
    eval_ = np.sort(np.abs(rng.gamma(1.5, 1.2, n)))
    eval_[:2] = 0.0
    UtW = rng.normal(0.9, 0.2, size=(n, 1))
    Uty = rng.normal(size=n) * np.sqrt(2.0 * eval_ + 1.0)
    U = np.linalg.qr(rng.normal(size=(n, n)))[0]

    args_d = (jnp.asarray(eval_, dtype), jnp.asarray(UtW, dtype),
              jnp.asarray(Uty, dtype), jnp.asarray(U, dtype))
    l_null = jnp.asarray(1.0, dtype)
    logl_null = jnp.asarray(-2000.0, dtype)

    base = None
    counts = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= total_dev]
    for d in counts:
        mesh = make_mesh(d, axis_names=("snp",))
        fn = sharded_rotate_and_assoc(mesh, n_cvt=1, mode=1)
        S = a.snps_per_device * d
        X = jnp.asarray(rng.binomial(
            2, 0.3, size=(S, n)).astype(np.float32), dtype)

        out = fn(*args_d, X, l_null, logl_null)
        out.p_wald.block_until_ready()
        t0 = time.time()
        for _ in range(a.reps):
            out = fn(*args_d, X, l_null, logl_null)
        out.p_wald.block_until_ready()
        dt = (time.time() - t0) / a.reps

        sps = S / dt
        if base is None:
            base = sps
        eff = sps / (base * d)
        print(json.dumps({
            "devices": d, "snps_per_sec": round(sps, 1),
            "scaling_efficiency": round(eff, 3),
        }))


if __name__ == "__main__":
    main()
