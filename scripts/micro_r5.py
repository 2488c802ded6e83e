"""Round-5 micro-attribution of the e2e phases (axon TPU, idle host):

  python scripts/micro_r5.py io      # parse / QC / d2h / text-format splits
  python scripts/micro_r5.py opt     # -lmm opt sub-costs: prep/h2d/device/fetch

Prints one JSON line each.  These name the numerator behind
perf_round5.py profile's phase totals so the attack targets the real
cost, not a guess.
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


def _t(fn, *a, **k):
    t0 = time.time()
    r = fn(*a, **k)
    return time.time() - t0, r


def io():
    import jax
    import jax.numpy as jnp
    from bench import _synth_mouse
    from gemma_tpu.io import native

    td = tempfile.mkdtemp(prefix="micro_")
    geno, pheno = _synth_mouse(td)
    out = {}
    n = 1940
    mask = np.ones(n, bool)

    t, _ = _t(native.bimbam_dims, geno)
    out["count_pass_sec"] = round(t, 3)
    t, parsed = _t(native.parse_bimbam, geno)
    out["parse_sec"] = round(t, 3)
    t, parsed2 = _t(native.parse_bimbam, geno, stat_mask=mask)
    out["parse_stats_sec"] = round(t, 3)

    # QC from stats (the downstream io/qc.py work)
    from gemma_tpu.io.qc import run_qc_blocked
    from gemma_tpu.io.bimbam import read_bimbam_genotypes
    t, gd = _t(read_bimbam_genotypes, geno, stat_mask=mask)
    out["read_bimbam_sec"] = round(t, 3)
    W = np.ones((n, 1))
    t, qc = _t(run_qc_blocked, gd, mask, W, block_size=8192)
    out["qc_sec"] = round(t, 3)

    # device transfer measurements
    rng = np.random.default_rng(0)
    Kh = rng.normal(size=(n, n)).astype(np.float32)
    Kh = Kh @ Kh.T
    Kd = jax.device_put(jnp.asarray(Kh))
    Kd.block_until_ready()
    tri = n * (n + 1) // 2
    seg = jnp.zeros(tri, jnp.float32) + Kd[0, 0]
    seg.block_until_ready()
    t, _ = _t(lambda: np.asarray(seg))
    out["d2h_tri_f32_sec"] = round(t, 3)
    out["d2h_tri_mb"] = round(tri * 4 / 1e6, 1)

    # text formatting (native writer) of the full n x n matrix
    Kf = np.asarray(Kh, np.float64)
    t, _ = _t(native.write_matrix_g10, os.path.join(td, "k.txt"), Kf)
    out["format_full_sec"] = round(t, 3)

    h2d = rng.integers(0, 3, size=(8192, n)).astype(np.int8)
    t, _ = _t(lambda: jax.device_put(jnp.asarray(h2d)).block_until_ready())
    out["h2d_i8_8192_sec"] = round(t, 3)
    print(json.dumps(out))


def opt():
    """Split the -lmm opt phase: host block prep, h2d, device compute,
    result fetch — at the e2e block size."""
    import jax
    import jax.numpy as jnp
    from bench import _synth_mouse
    from gemma_tpu.cli import parse_args
    from gemma_tpu.config import GemmaConfig
    from gemma_tpu.dataset import load_dataset
    from gemma_tpu.run import (_raw_wire_block, _assoc_snp_indices,
                               _mesh_block_size, _resolve_dtype)
    from gemma_tpu.parallel.mesh import default_mesh
    from gemma_tpu.parallel.shard import assoc_pipeline
    from gemma_tpu.models.lmm.engine import fit_null
    from gemma_tpu.ops.eigh import eigh_zeroed
    from gemma_tpu.ops.center import center_matrix

    td = tempfile.mkdtemp(prefix="micro_")
    geno, pheno = _synth_mouse(td)
    cfg = parse_args(
        f"-g {geno} -p {pheno} -outdir {td} -no-check -lmm 1 -o A".split())
    dtype = _resolve_dtype(cfg)
    out = {}
    t0 = time.time()
    ds = load_dataset(cfg)
    out["load_sec"] = round(time.time() - t0, 3)

    # kinship from scratch on device (cheap) to get factors
    X = ds.X_test()
    Xi = np.where(np.isnan(X), np.nanmean(X, axis=1, keepdims=True), X)
    Xc = Xi - Xi.mean(axis=1, keepdims=True)
    K = (Xc.T @ Xc / X.shape[0]).astype(np.float64)
    Kc = jnp.asarray(center_matrix(jnp.asarray(K, dtype)), dtype)
    eval_, U, trace_G = eigh_zeroed(Kc, out_dtype=dtype)
    W = jnp.asarray(ds.W, dtype)
    y = jnp.asarray(ds.Y[:, 0], dtype)
    UtW, Uty = U.T @ W, U.T @ y
    t0 = time.time()
    nf = fit_null(eval_, UtW, Uty, trace_G, 1)
    nf.logl_remle.block_until_ready()
    out["fit_null_sec"] = round(time.time() - t0, 3)

    idx = _assoc_snp_indices(ds)
    mesh = default_mesh()
    bs = _mesh_block_size(cfg, mesh, len(idx))
    out["block_size"] = bs
    out["n_blocks"] = -(-len(idx) // bs)
    assoc_fn = assoc_pipeline(mesh, 1, 1, cfg.l_min, cfg.l_max,
                              cfg.n_region)

    # warm compile
    raw = _raw_wire_block(ds, idx[:bs], bs, dtype)
    st = assoc_fn(eval_, UtW, Uty, U, raw, nf.l_mle, nf.logl_mle)
    st.p_wald.block_until_ready()

    # steady state, per stage
    t_prep = t_h2d = t_disp = 0.0
    sts = []
    t_all0 = time.time()
    for s in range(0, len(idx), bs):
        sel = idx[s:s + bs]
        t0 = time.time()
        raw = _raw_wire_block(ds, sel, bs, dtype)
        t_prep += time.time() - t0
        t0 = time.time()
        raw_d = jax.device_put(jnp.asarray(raw))
        raw_d.block_until_ready()
        t_h2d += time.time() - t0
        t0 = time.time()
        st = assoc_fn(eval_, UtW, Uty, U, raw_d, nf.l_mle, nf.logl_mle)
        sts.append((st, len(sel)))
        t_disp += time.time() - t0
    t0 = time.time()
    for st, _ in sts:
        st.p_wald.block_until_ready()
    t_dev = time.time() - t0
    t0 = time.time()
    from gemma_tpu.run import _gather_stats
    stats = _gather_stats(
        sts, ("beta", "se", "lambda_remle", "lambda_mle", "p_wald",
              "p_lrt", "p_score", "logl_H1"))
    t_fetch = time.time() - t0
    out.update(prep_sec=round(t_prep, 3), h2d_sec=round(t_h2d, 3),
               dispatch_sec=round(t_disp, 3), device_sec=round(t_dev, 3),
               fetch_sec=round(t_fetch, 3),
               total_sec=round(time.time() - t_all0, 3))
    print(json.dumps(out))


def kernel():
    """Sub-stage attribution of the bench kernel block (n=1940,
    S=8192, mode 1, f32/tf32): rotation matmul, shared-lambda grid
    scan, Newton polish + bracket logf, Wald epilogue.  Backs the
    PERF.md roofline argument with on-chip times instead of estimates.
    """
    import jax
    import jax.numpy as jnp
    from gemma_tpu.precision import apply_matmul_precision
    apply_matmul_precision(jnp.float32)
    from gemma_tpu.models.lmm import likelihood as lk
    from gemma_tpu.models.lmm.engine import assoc_block_impl
    from gemma_tpu.models.lmm.optimize import (calc_lambda,
                                               _F32_GRID_REFINE)

    n, n_cvt, S = 1940, 1, 8192
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    eval_ = np.sort(np.abs(rng.gamma(1.5, 1.2, n)))
    eval_[:2] = 0.0
    UtW = rng.normal(0.9, 0.2, size=(n, n_cvt))
    Uty = rng.normal(size=n) * np.sqrt(2.0 * eval_ + 1.0)
    U = np.linalg.qr(rng.normal(size=(n, n)))[0]
    X = rng.binomial(2, rng.uniform(0.05, 0.5, size=(S, 1)),
                     size=(S, n)).astype(np.float32)

    eval_d = jnp.asarray(eval_, dtype)
    UtW_d = jnp.asarray(UtW, dtype)
    Uty_d = jnp.asarray(Uty, dtype)
    U_d = jnp.asarray(U, dtype)
    X_d = jnp.asarray(X, dtype)

    rot = jax.jit(lambda x: jnp.matmul(x, U_d,
                                       preferred_element_type=dtype))
    Utx = rot(X_d)
    Utx.block_until_ready()
    data = lk.build_batch_data(eval_d, UtW_d, Uty_d, Utx, n_cvt)
    jax.block_until_ready(data)

    l_min, l_max, n_region = 1e-5, 1e5, 10
    step = np.log(l_max / l_min) / n_region
    n_fine = n_region * _F32_GRID_REFINE
    fine_np = l_min * np.exp((step / _F32_GRID_REFINE)
                             * np.arange(n_fine + 1))
    grid_fn = jax.jit(lambda d: lk.dev1_grid(fine_np, d, n_cvt,
                                             False, True))
    lam_c = jnp.full((S,), 1.0, dtype)
    logf3 = jax.jit(lambda d, l: (
        lk.logf_stable(l, d, n_cvt, False, True)
        + lk.logf_stable(l * 0.5, d, n_cvt, False, True)
        + lk.logf_stable(l * 2.0, d, n_cvt, False, True)))
    wald = jax.jit(lambda d, l: lk.wald_stats(l, d, n_cvt))
    lam_fn = jax.jit(lambda d: calc_lambda(
        d, n_cvt, calc_null=False, reml=True,
        l_min=l_min, l_max=l_max, n_region=n_region))
    full = jax.jit(lambda x: assoc_block_impl(
        eval_d, UtW_d, Uty_d, x, jnp.asarray(1.0, dtype),
        jnp.asarray(-2000.0, dtype), n_cvt=n_cvt, mode=1))

    def best3(fn, *a):
        jax.block_until_ready(fn(*a))         # warm/compile
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fn(*a))
            ts.append(time.time() - t0)
        return min(ts)

    out = {"n": n, "S": S}
    out["rot_sec"] = round(best3(rot, X_d), 4)
    out["grid_sec"] = round(best3(grid_fn, data), 4)
    out["logf3_sec"] = round(best3(logf3, data, lam_c), 4)
    out["wald_sec"] = round(best3(wald, data, lam_c), 4)
    out["calc_lambda_sec"] = round(best3(lam_fn, data), 4)
    out["assoc_full_sec"] = round(best3(full, Utx), 4)
    out["newton_residual_sec"] = round(
        out["calc_lambda_sec"] - out["grid_sec"] - out["logf3_sec"], 4)
    # rooflines: rotation is the compute floor (2 S n^2 tf32 flops);
    # everything else is streaming (S, n) passes over HBM
    out["rot_gflop"] = round(2 * S * n * n / 1e9, 1)
    out["snps_per_sec_full_block"] = round(
        S / (out["rot_sec"] + out["assoc_full_sec"]), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    {"io": io, "opt": opt, "kernel": kernel}[sys.argv[1]]()
