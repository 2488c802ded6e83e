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


if __name__ == "__main__":
    {"io": io, "opt": opt}[sys.argv[1]]()
