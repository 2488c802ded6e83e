"""BSLMM-DAP tests: grid Bayes factors + hyper EM."""

import numpy as np
import jax.numpy as jnp

from gemma_tpu.models.bslmmdap import (
    hyper_grid, dap_calc_bf, dap_estimate_hyper, write_hyp_bf,
    read_hyp, read_bf)
from gemma_tpu.models.logistic import irls_fit, logistic_cont_pred


def _setup(n=120, p=40, seed=0, h2=0.6):
    rng = np.random.default_rng(seed)
    X = rng.binomial(2, 0.3, size=(p, n)).astype(np.float64)
    Xc = X - X.mean(axis=1, keepdims=True)
    causal = [3, 17]
    g = Xc[causal].sum(axis=0)
    g *= np.sqrt(h2) / g.std()
    y = g + rng.normal(0, np.sqrt(1 - h2), n)
    y -= y.mean()
    K = Xc.T @ Xc / p
    from gemma_tpu.ops.eigh import eigh_zeroed
    eval_, U, trace_G = eigh_zeroed(jnp.asarray(K))
    UtX = np.asarray((jnp.asarray(Xc) @ U).T)
    Uty = np.asarray(U.T @ jnp.asarray(y))
    return UtX, Uty, np.asarray(eval_), float(trace_G), causal


def test_bf_matches_dense_marginal():
    UtX, Uty, eval_, trace_G, causal = _setup()
    grid = hyper_grid(0.2, 0.8, 3, 0.2, 0.8, 3, trace_G)
    BF = dap_calc_bf(jnp.asarray(UtX), jnp.asarray(Uty),
                     jnp.asarray(eval_), grid)
    n = len(Uty)
    tau = n / (Uty @ Uty)

    # dense check for one SNP / one grid point
    t, ij = 5, 4
    sa2, sb2 = grid[ij, 2], grid[ij, 3]
    w = 1.0 / (eval_ * sb2 + 1.0)
    x = UtX[:, t]
    logdet_H = -np.sum(np.log(w))
    hi_yy = np.sum(w * Uty ** 2)
    om = 1.0 + sa2 * np.sum(w * x * x)
    xhy = np.sum(w * x * Uty)
    p_yy = hi_yy - sa2 * xhy * xhy / om
    logm = -0.5 * logdet_H - 0.5 * np.log(om) - 0.5 * tau * p_yy \
        + 0.5 * n * np.log(tau)
    logm0 = -0.5 * logdet_H - 0.5 * tau * hi_yy + 0.5 * n * np.log(tau)
    np.testing.assert_allclose(BF[t, ij], np.exp(logm - logm0), rtol=1e-8)


def test_bf_ranks_causal_snps():
    UtX, Uty, eval_, trace_G, causal = _setup(h2=0.7, seed=1)
    grid = hyper_grid(0.3, 0.7, 3, 0.5, 0.9, 3, trace_G)
    BF = dap_calc_bf(jnp.asarray(UtX), jnp.asarray(Uty),
                     jnp.asarray(eval_), grid)
    score = BF.mean(axis=1)
    top = set(np.argsort(-score)[:2])
    assert top == set(causal)


def test_dap_em_roundtrip(tmp_path):
    UtX, Uty, eval_, trace_G, causal = _setup(h2=0.7, seed=2)
    grid = hyper_grid(0.3, 0.7, 2, 0.5, 0.9, 2, trace_G)
    BF = dap_calc_bf(jnp.asarray(UtX), jnp.asarray(Uty),
                     jnp.asarray(eval_), grid)

    rows = [dict(chr="1", rs=f"rs{i}", ps=i, n_miss=0)
            for i in range(BF.shape[0])]
    prefix = str(tmp_path / "dap")
    write_hyp_bf(prefix, grid, BF, rows)
    sa2, sb2, wab = read_hyp(prefix + ".hyp.txt")
    assert len(wab) == 4

    # the -bf INPUT format is `rs block BF...` (ReadFile_bf,
    # bslmmdap.cpp:139-204) — dap-g style, distinct from the bf
    # OUTPUT layout; write one in reader format with 4 blocks
    bf_in = tmp_path / "bf_in.txt"
    with open(bf_in, "w") as fh:
        fh.write("rs\tblock\t" +
                 "\t".join(f"BF{i}" for i in range(4)) + "\n")
        for i in range(BF.shape[0]):
            fh.write(f"rs{i}\tb{i // 10}\t" +
                     "\t".join(f"{v:.6e}" for v in BF[i]) + "\n")
    rs_list, blocks = read_bf(str(bf_in))
    m = sum(b.shape[0] for b in blocks)
    assert m == len(rs_list)

    Hyper, pip, coef = dap_estimate_hyper(sa2, sb2, wab, blocks,
                                          rs_list)
    assert np.all((pip >= 0) & (pip <= 1))
    np.testing.assert_allclose(Hyper[:, 4].sum(), 1.0, atol=1e-8)
    # causal SNPs get the highest posterior inclusion
    top = set(np.argsort(-pip)[:2])
    assert len(top & set(causal)) >= 1


def test_irls_recovers_logistic_coef():
    rng = np.random.default_rng(3)
    n = 2000
    x = rng.normal(size=(n, 1))
    eta = 1.5 * x[:, 0] - 0.5
    pr = 1 / (1 + np.exp(-eta))
    y = rng.binomial(1, pr).astype(np.float64)
    coef = irls_fit(x, y)
    np.testing.assert_allclose(coef, [1.5, -0.5], atol=0.2)
    pred = logistic_cont_pred(coef, x)
    assert 0 < pred.min() and pred.max() < 1


def test_dap_cli_with_annotations(tmp_path):
    """-bslmm 5 with -cat: discrete + continuous annotation columns
    feed the logistic prior (gemma.cpp:3103-3136; columns ending in
    `_c` are continuous, others discrete)."""
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import run_bslmmdap_em
    from gemma_tpu.models.bslmmdap import read_dap_annotations

    UtX, Uty, eval_, trace_G, causal = _setup(h2=0.7, seed=4)
    grid = hyper_grid(0.3, 0.7, 2, 0.5, 0.9, 2, trace_G)
    BF = dap_calc_bf(jnp.asarray(UtX), jnp.asarray(Uty),
                     jnp.asarray(eval_), grid)
    rows = [dict(chr="1", rs=f"rs{i}", ps=i, n_miss=0)
            for i in range(BF.shape[0])]
    prefix = str(tmp_path / "dap")
    write_hyp_bf(prefix, grid, BF, rows)
    bf_in = tmp_path / "bf_in.txt"
    with open(bf_in, "w") as fh:
        fh.write("rs\tblock\t" +
                 "\t".join(f"BF{i}" for i in range(4)) + "\n")
        for i in range(BF.shape[0]):
            fh.write(f"rs{i}\tb{i // 10}\t" +
                     "\t".join(f"{v:.6e}" for v in BF[i]) + "\n")

    rng = np.random.default_rng(0)
    cat = tmp_path / "cat.txt"
    with open(cat, "w") as fh:
        fh.write("rs\tcoding\tscore_c\n")
        for i in range(BF.shape[0]):
            fh.write(f"rs{i}\t{int(i in causal or rng.random() < 0.2)}"
                     f"\t{rng.normal():.4f}\n")

    Ac, Ad, n_levels = read_dap_annotations(str(cat),
                                            [f"rs{i}" for i in range(40)])
    assert Ac.shape == (40, 1) and Ad.shape == (40, 1)
    assert n_levels == [2]

    cfg = parse_args(["-bslmm", "5", "-hyp", prefix + ".hyp.txt",
                      "-bf", str(bf_in), "-cat", str(cat),
                      "-outdir", str(tmp_path), "-o", "dapann"])
    Hyper, pip, coef = run_bslmmdap_em(cfg)
    assert np.all((pip >= 0) & (pip <= 1))
    assert np.all(np.isfinite(coef))
    assert (tmp_path / "dapann.log.txt").exists()
