"""Property tests for the batched LMM core against direct dense algebra.

The Pab recurrences (reference lmm.cpp:283-482) compute quantities
a' P_p b where P_p is the projection-adjusted inverse built from the
first p columns of [W x].  Here we verify the batched recurrence and
the likelihood/derivative closures against brute-force dense formulas,
and the batched Brent+Newton optimiser against scipy root finding.
"""

import numpy as np
import scipy.optimize
import jax.numpy as jnp
import pytest

from gemma_tpu.models.lmm import (
    ab_index,
    pab_indices,
    build_batch_data,
    null_batch_data,
    logf,
    dev1,
    dev12,
    wald_stats,
    calc_lambda,
    fit_null,
    assoc_block,
)
from gemma_tpu.models.lmm import likelihood as lk


def _rand_problem(n=60, n_cvt=2, S=5, seed=0):
    rng = np.random.default_rng(seed)
    eval_ = np.abs(rng.normal(1.0, 0.5, n)) * 2.0
    eval_[:3] = 0.0  # mimic zeroed eigenvalues
    UtW = rng.normal(size=(n, n_cvt))
    UtW[:, 0] = rng.normal(1.0, 0.1, n)  # intercept-like
    Uty = rng.normal(size=n)
    Utx = rng.normal(size=(S, n))
    return eval_, UtW, Uty, Utx


def _dense_pab(eval_, UtW, Uty, utx, lam, p, a_vec, b_vec, power=1):
    """Direct a' (H^-1 projected through first p columns)^power b."""
    n = eval_.shape[0]
    Hi = 1.0 / (lam * eval_ + 1.0)
    cols = []
    n_cvt = UtW.shape[1]
    for lab in range(1, p + 1):
        cols.append(UtW[:, lab - 1] if lab <= n_cvt else utx)
    # sequential Gaussian elimination in the Hi inner product, exactly
    # the recurrence's semantics (project out columns one at a time)
    def proj_weighted(v_list, weight_mats):
        pass
    # build P_p operator explicitly: start with diag(Hi); for each col w,
    # P <- P - (P w)(P w)'/(w' P w)
    P = np.diag(Hi)
    for w in cols:
        Pw = P @ w
        P = P - np.outer(Pw, Pw) / (w @ Pw)
    M = np.linalg.matrix_power(P, power) if power > 1 else P
    return a_vec @ M @ b_vec


def test_ab_index_layout():
    # n_cvt=1: pairs (1,1)(1,2)(1,3)(2,2)(2,3)(3,3) → 0..5
    assert [ab_index(a, b, 1) for (a, b) in
            [(1, 1), (1, 2), (1, 3), (2, 2), (2, 3), (3, 3)]] == [0, 1, 2, 3, 4, 5]
    idx = pab_indices(2)
    assert idx.n_index == 10
    assert len(idx.pairs) == 10
    # symmetric access
    assert ab_index(3, 1, 2) == ab_index(1, 3, 2)


@pytest.mark.parametrize("n_cvt", [1, 2, 3])
def test_pab_recurrence_matches_dense(n_cvt):
    eval_, UtW, Uty, Utx = _rand_problem(n_cvt=n_cvt, S=3, seed=n_cvt)
    lam = 0.7
    idx = pab_indices(n_cvt)
    data = build_batch_data(
        jnp.asarray(eval_), jnp.asarray(UtW), jnp.asarray(Uty),
        jnp.asarray(Utx), n_cvt)
    hi = 1.0 / (lam * jnp.asarray(eval_) + 1.0)
    w = jnp.broadcast_to(hi, (3, eval_.shape[0]))
    rows = lk._pab_rows(lk._base_row(w, data, n_cvt), n_cvt)

    for s in range(3):
        x = Utx[s]
        # after eliminating all covariates (row n_cvt): check yy, xx, xy
        for (pos, av, bv) in [(idx.yy, Uty, Uty), (idx.xx, x, x),
                              (idx.xy, x, Uty)]:
            got = float(rows[n_cvt][s, pos])
            want = _dense_pab(eval_, UtW, Uty, x, lam, n_cvt, av, bv)
            np.testing.assert_allclose(got, want, rtol=1e-9)
        # after also eliminating x (row n_cvt+1): yy
        got = float(rows[n_cvt + 1][s, idx.yy])
        want = _dense_pab(eval_, UtW, Uty, x, lam, n_cvt + 1, Uty, Uty)
        np.testing.assert_allclose(got, want, rtol=1e-9)


def test_ppab_matches_squared_operator():
    n_cvt = 2
    eval_, UtW, Uty, Utx = _rand_problem(n_cvt=n_cvt, S=2, seed=9)
    lam = 1.3
    idx = pab_indices(n_cvt)
    data = build_batch_data(
        jnp.asarray(eval_), jnp.asarray(UtW), jnp.asarray(Uty),
        jnp.asarray(Utx), n_cvt)
    hi = 1.0 / (lam * jnp.asarray(eval_) + 1.0)
    w = jnp.broadcast_to(hi, (2, eval_.shape[0]))
    pab = lk._pab_rows(lk._base_row(w, data, n_cvt), n_cvt)
    ppab = lk._ppab_rows(lk._base_row(w * w, data, n_cvt), pab, n_cvt)
    pppab = lk._pppab_rows(lk._base_row(w * w * w, data, n_cvt), pab, ppab, n_cvt)

    s = 1
    x = Utx[s]
    got2 = float(ppab[n_cvt + 1][s, idx.yy])
    want2 = _dense_pab(eval_, UtW, Uty, x, lam, n_cvt + 1, Uty, Uty, power=2)
    np.testing.assert_allclose(got2, want2, rtol=1e-8)
    got3 = float(pppab[n_cvt + 1][s, idx.yy])
    want3 = _dense_pab(eval_, UtW, Uty, x, lam, n_cvt + 1, Uty, Uty, power=3)
    np.testing.assert_allclose(got3, want3, rtol=1e-8)


def _dense_logrl(eval_, UtW, Uty, utx, lam, calc_null):
    """Direct restricted log-likelihood (Zhou & Stephens 2012 eq. form)."""
    n = eval_.shape[0]
    H = lam * eval_ + 1.0
    X = UtW if calc_null else np.column_stack([UtW, utx])
    c_dim = X.shape[1]
    df = n - c_dim
    Hi = 1.0 / H
    XtHiX = X.T @ (Hi[:, None] * X)
    XtX = X.T @ X
    P = np.diag(Hi) - (Hi[:, None] * X) @ np.linalg.solve(XtHiX, X.T * Hi[None, :])
    yPy = Uty @ P @ Uty
    const = 0.5 * df * (np.log(df) - np.log(2 * np.pi) - 1.0)
    return (const - 0.5 * np.sum(np.log(np.abs(H)))
            - 0.5 * (np.linalg.slogdet(XtHiX)[1] - np.linalg.slogdet(XtX)[1])
            - 0.5 * df * np.log(yPy))


def _dense_logl(eval_, UtW, Uty, utx, lam, calc_null):
    n = eval_.shape[0]
    H = lam * eval_ + 1.0
    X = UtW if calc_null else np.column_stack([UtW, utx])
    Hi = 1.0 / H
    XtHiX = X.T @ (Hi[:, None] * X)
    P = np.diag(Hi) - (Hi[:, None] * X) @ np.linalg.solve(XtHiX, X.T * Hi[None, :])
    yPy = Uty @ P @ Uty
    const = 0.5 * n * (np.log(n) - np.log(2 * np.pi) - 1.0)
    return const - 0.5 * np.sum(np.log(np.abs(H))) - 0.5 * n * np.log(yPy)


@pytest.mark.parametrize("reml", [True, False])
@pytest.mark.parametrize("calc_null", [True, False])
def test_logf_matches_dense(reml, calc_null):
    n_cvt = 2
    eval_, UtW, Uty, Utx = _rand_problem(n_cvt=n_cvt, S=4, seed=3)
    data = build_batch_data(
        jnp.asarray(eval_), jnp.asarray(UtW), jnp.asarray(Uty),
        jnp.asarray(Utx), n_cvt)
    for lam in [1e-3, 0.5, 7.0]:
        got = np.asarray(logf(jnp.full((4,), lam), data, n_cvt, calc_null, reml))
        fn = _dense_logrl if reml else _dense_logl
        for s in range(4):
            want = fn(eval_, UtW, Uty, Utx[s], lam, calc_null)
            np.testing.assert_allclose(got[s], want, rtol=1e-8)


def test_derivatives_match_finite_difference():
    n_cvt = 1
    eval_, UtW, Uty, Utx = _rand_problem(n_cvt=n_cvt, S=3, seed=5)
    data = build_batch_data(
        jnp.asarray(eval_), jnp.asarray(UtW), jnp.asarray(Uty),
        jnp.asarray(Utx), n_cvt)
    lam = 0.8
    h = 1e-6
    for reml in [True, False]:
        lp = np.asarray(logf(jnp.full((3,), lam + h), data, n_cvt, False, reml))
        lm = np.asarray(logf(jnp.full((3,), lam - h), data, n_cvt, False, reml))
        d1_fd = (lp - lm) / (2 * h)
        d1_got = np.asarray(dev1(jnp.full((3,), lam), data, n_cvt, False, reml))
        np.testing.assert_allclose(d1_got, d1_fd, rtol=1e-4)

        d1p = np.asarray(dev1(jnp.full((3,), lam + h), data, n_cvt, False, reml))
        d1m = np.asarray(dev1(jnp.full((3,), lam - h), data, n_cvt, False, reml))
        d2_fd = (d1p - d1m) / (2 * h)
        d1d2 = dev12(jnp.full((3,), lam), data, n_cvt, False, reml)
        np.testing.assert_allclose(np.asarray(d1d2[0]), d1_got, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(d1d2[1]), d2_fd, rtol=1e-4)


def _simulate(n=120, n_cvt=1, S=8, lam_true=2.0, seed=11):
    """Simulate rotated data with a real mixed-model structure."""
    rng = np.random.default_rng(seed)
    eval_ = np.sort(np.abs(rng.gamma(2.0, 1.0, n)))
    eval_[:2] = 0.0
    UtW = rng.normal(size=(n, n_cvt))
    Utx = rng.normal(size=(S, n))
    # y in rotated space: var = lam*D + I (tau=1)
    Uty = rng.normal(size=n) * np.sqrt(lam_true * eval_ + 1.0)
    return eval_, UtW, Uty, Utx


def test_calc_lambda_matches_scipy_root():
    n_cvt = 1
    eval_, UtW, Uty, Utx = _simulate(seed=21)
    S = Utx.shape[0]
    data = build_batch_data(
        jnp.asarray(eval_), jnp.asarray(UtW), jnp.asarray(Uty),
        jnp.asarray(Utx), n_cvt)

    res = calc_lambda(data, n_cvt, calc_null=False, reml=True,
                      l_min=1e-5, l_max=1e5, n_region=10)
    lam_got = np.asarray(res.lam)
    logf_got = np.asarray(res.logf)

    for s in range(S):
        def d1(l):
            return float(dev1(jnp.full((1,), l),
                              build_batch_data(jnp.asarray(eval_),
                                               jnp.asarray(UtW),
                                               jnp.asarray(Uty),
                                               jnp.asarray(Utx[s:s+1]),
                                               n_cvt),
                              n_cvt, False, True)[0])
        # replicate the grid scan to find the bracket
        grid = 1e-5 * np.exp(np.log(1e10) / 10 * np.arange(11))
        vals = [d1(g) for g in grid]
        bracket = None
        for i in range(10):
            if vals[i] * vals[i + 1] <= 0:
                bracket = (grid[i], grid[i + 1])
                break
        if bracket is None:
            assert lam_got[s] in (1e-5, 1e5)
            continue
        root = scipy.optimize.brentq(d1, *bracket, xtol=1e-12, rtol=1e-12)
        np.testing.assert_allclose(lam_got[s], root, rtol=1e-4)
        # logf at the optimum
        want_logf = _dense_logrl(eval_, UtW, Uty, Utx[s], lam_got[s], False)
        np.testing.assert_allclose(logf_got[s], want_logf, rtol=1e-8)


def test_wald_matches_direct_gls():
    n_cvt = 1
    eval_, UtW, Uty, Utx = _simulate(seed=33)
    n = eval_.shape[0]
    data = build_batch_data(
        jnp.asarray(eval_), jnp.asarray(UtW), jnp.asarray(Uty),
        jnp.asarray(Utx), n_cvt)
    lam = 1.7
    S = Utx.shape[0]
    beta, se, fstat, df = wald_stats(jnp.full((S,), lam), data, n_cvt)
    assert df == n - n_cvt - 1
    for s in range(S):
        X = np.column_stack([UtW, Utx[s]])
        Hi = 1.0 / (lam * eval_ + 1.0)
        XtHiX = X.T @ (Hi[:, None] * X)
        bhat = np.linalg.solve(XtHiX, X.T @ (Hi * Uty))
        resid = Uty - X @ bhat
        rss = resid @ (Hi * resid)
        sigma2 = rss / df
        cov = np.linalg.inv(XtHiX) * sigma2
        np.testing.assert_allclose(float(beta[s]), bhat[-1], rtol=1e-8)
        np.testing.assert_allclose(float(se[s]), np.sqrt(cov[-1, -1]), rtol=1e-8)


def test_fit_null_recovers_lambda():
    # strong signal: lambda_true should be recovered within ~30%
    rng = np.random.default_rng(7)
    n = 400
    eval_ = np.sort(np.abs(rng.gamma(2.0, 1.0, n)))
    UtW = np.ones((n, 1)) * 0.1 + rng.normal(0, 0.01, (n, 1))
    lam_true = 3.0
    Uty = rng.normal(size=n) * np.sqrt(lam_true * eval_ + 1.0)
    nf = fit_null(jnp.asarray(eval_), jnp.asarray(UtW), jnp.asarray(Uty),
                  jnp.asarray(np.mean(eval_)), n_cvt=1)
    assert 1.0 < float(nf.l_remle) < 9.0
    assert np.isfinite(float(nf.logl_remle))
    assert np.isfinite(float(nf.pve)) and 0 < float(nf.pve) < 1
    # vg/ve consistency: vg = ve * lambda
    np.testing.assert_allclose(float(nf.vg_remle),
                               float(nf.ve_remle) * float(nf.l_remle),
                               rtol=1e-10)


def test_assoc_block_modes_run():
    eval_, UtW, Uty, Utx = _simulate(seed=55)
    nf = fit_null(jnp.asarray(eval_), jnp.asarray(UtW), jnp.asarray(Uty),
                  jnp.asarray(np.mean(eval_)), n_cvt=1)
    for mode in (1, 2, 3, 4, 9):
        st = assoc_block(jnp.asarray(eval_), jnp.asarray(UtW),
                         jnp.asarray(Uty), jnp.asarray(Utx),
                         nf.l_mle, nf.logl_mle, n_cvt=1, mode=mode)
        p = {1: st.p_wald, 2: st.p_lrt, 3: st.p_score}.get(mode, st.p_wald)
        pv = np.asarray(p)
        assert np.all((pv >= 0) & (pv <= 1))
        if mode in (1, 4):
            assert np.all(np.asarray(st.lambda_remle) > 0)
        if mode == 4:
            # null x: all three p-values present and broadly consistent
            assert np.all(np.asarray(st.p_lrt) >= 0)
            assert np.all(np.asarray(st.p_score) >= 0)


def test_null_pvalue_calibration():
    """Under a pure-null phenotype the Wald/LRT/score p-values are
    Uniform(0,1): a miscalibrated test statistic (wrong df, wrong
    variance scale) shifts the KS statistic far beyond this bound."""
    import scipy.stats
    from gemma_tpu.models.lmm import fit_null, build_batch_data
    from gemma_tpu.models.lmm.engine import assoc_block_impl
    from gemma_tpu.ops.eigh import eigh_zeroed

    rng = np.random.default_rng(41)
    n, p = 400, 600
    Xk = rng.binomial(2, 0.3, size=(800, n)).astype(np.float64)
    Xkc = Xk - Xk.mean(axis=1, keepdims=True)
    K = Xkc.T @ Xkc / 800
    eval_, U, trace_G = eigh_zeroed(jnp.asarray(K))

    # y has a genetic component, so the mixed model must de-correlate it
    L = np.linalg.cholesky(np.asarray(K) + 1e-8 * np.eye(n))
    y = L @ rng.normal(size=n) * 0.7 + rng.normal(size=n)
    W = np.ones((n, 1))
    UtW = U.T @ jnp.asarray(W)
    Uty = U.T @ jnp.asarray(y)
    nf = fit_null(eval_, UtW, Uty, trace_G, 1)

    # NULL test SNPs independent of y
    Xt = rng.binomial(2, 0.3, size=(p, n)).astype(np.float64)
    Utx = jnp.asarray(Xt) @ U
    st = assoc_block_impl(eval_, UtW, Uty, Utx, nf.l_mle, nf.logl_mle,
                          n_cvt=1, mode=4)
    for name in ("p_wald", "p_lrt", "p_score"):
        pv = np.asarray(getattr(st, name))
        pv = pv[np.isfinite(pv)]
        assert len(pv) > 0.9 * p
        ks = scipy.stats.kstest(pv, "uniform").statistic
        assert ks < 0.08, (name, ks)


def test_float32_speed_mode_matches_float64():
    """The float32 TPU speed mode (relaxed Newton tolerance + Brent
    fallback, calc_lambda docstring) reproduces float64 p-values well
    inside the 1e-3 golden tolerance."""
    from gemma_tpu.models.lmm import fit_null
    from gemma_tpu.models.lmm.engine import assoc_block_impl
    from gemma_tpu.ops.eigh import eigh_zeroed

    rng = np.random.default_rng(61)
    n, p = 300, 256
    Xk = rng.binomial(2, 0.3, size=(600, n)).astype(np.float64)
    Xkc = Xk - Xk.mean(axis=1, keepdims=True)
    K = Xkc.T @ Xkc / 600
    L = np.linalg.cholesky(K + 1e-8 * np.eye(n))
    y = L @ rng.normal(size=n) * 0.6 + rng.normal(size=n)
    Xt = rng.binomial(2, 0.3, size=(p, n)).astype(np.float64)
    Xt[:8] += (y > np.median(y)) * 0.5          # some real signals
    W = np.ones((n, 1))

    outs = {}
    for dtype in (jnp.float64, jnp.float32):
        eval_, U, tg = eigh_zeroed(jnp.asarray(K, dtype))
        UtW = U.T @ jnp.asarray(W, dtype)
        Uty = U.T @ jnp.asarray(y, dtype)
        nf = fit_null(eval_, UtW, Uty, tg, 1)
        Utx = jnp.asarray(Xt, dtype) @ U
        st = assoc_block_impl(eval_, UtW, Uty, Utx, nf.l_mle,
                              nf.logl_mle, n_cvt=1, mode=1)
        outs[str(dtype.__name__)] = np.asarray(st.p_wald, np.float64)

    a, b = outs["float64"], outs["float32"]
    ok = np.isfinite(a) & np.isfinite(b)
    assert ok.mean() > 0.97
    assert np.nanmax(np.abs(a[ok] - b[ok])) < 1e-3


@pytest.mark.parametrize("reml,calc_null", [(True, False), (False, False),
                                            (True, True)])
def test_dev1_grid_matches_per_point(reml, calc_null):
    """The shared-lambda batched grid evaluation (one MXU pass over the
    rotated block for ALL grid points) must agree with the per-lane
    dev1 called once per grid value — same recurrences, different
    contraction layout (round-5 kernel path)."""
    rng = np.random.default_rng(11)
    n, S, n_cvt = 200, 16, 2
    ev = np.sort(np.abs(rng.gamma(1.5, 1.2, n))); ev[:2] = 0.0
    UtW = rng.normal(0.5, 0.3, (n, n_cvt))
    Uty = rng.normal(size=n) * np.sqrt(ev + 1.0)
    Utx = rng.normal(size=(S, n))
    data = lk.build_batch_data(jnp.asarray(ev), jnp.asarray(UtW),
                               jnp.asarray(Uty), jnp.asarray(Utx), n_cvt)
    grid = 1e-5 * np.exp(np.log(1e10) / 10 * np.arange(11))
    got = np.asarray(lk.dev1_grid(grid, data, n_cvt, calc_null, reml))
    want = np.stack([np.asarray(lk.dev1(
        jnp.full((S,), g, jnp.float64), data, n_cvt, calc_null, reml))
        for g in grid])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)
