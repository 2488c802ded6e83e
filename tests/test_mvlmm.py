"""Tests for the multivariate LMM core against dense reference math.

The model in the kinship eigenbasis: y_k ~ N(B x_k, H_k) with
H_k = delta_k Vg + Ve.  We verify the transformed-basis likelihood
machinery against brute-force dense computation and check that EM and
NR maximise the exact restricted likelihood.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gemma_tpu.models import mvlmm_core as core


def _problem(n=80, d=2, c=1, seed=0, Vg=None, Ve=None):
    rng = np.random.default_rng(seed)
    eval_ = np.sort(np.abs(rng.gamma(2.0, 1.0, n)))
    eval_[0] = 0.0
    X = np.vstack([np.ones((1, n)), rng.normal(size=(c - 1, n))])
    if Vg is None:
        A = rng.normal(size=(d, d))
        Vg = A @ A.T / d + 0.5 * np.eye(d)
    if Ve is None:
        A = rng.normal(size=(d, d))
        Ve = A @ A.T / d + 0.5 * np.eye(d)
    # simulate Y from the model with B = 0
    Y = np.zeros((d, n))
    for k in range(n):
        H = eval_[k] * Vg + Ve
        Y[:, k] = rng.multivariate_normal(np.zeros(d), H)
    return eval_, X, Y, Vg, Ve


def _dense_reml_logl(eval_, X, Y, Vg, Ve):
    """Direct restricted log-likelihood via dense block algebra."""
    n = eval_.shape[0]
    d, c = Y.shape[0], X.shape[0]
    logdet_H = 0.0
    yHiy = 0.0
    Q = np.zeros((c * d, c * d))
    xHiy = np.zeros(c * d)
    for k in range(n):
        H = eval_[k] * Vg + Ve
        Hi = np.linalg.inv(H)
        logdet_H += np.linalg.slogdet(H)[1]
        yHiy += Y[:, k] @ Hi @ Y[:, k]
        Q += np.kron(np.outer(X[:, k], X[:, k]), Hi)
        xHiy += np.kron(X[:, k], Hi @ Y[:, k])
    yPy = yHiy - xHiy @ np.linalg.solve(Q, xHiy)
    XXt = X @ X.T
    logl_const = (-0.5 * (n - c) * d * np.log(2 * np.pi)
                  + 0.5 * d * np.linalg.slogdet(XXt)[1])
    return (logl_const - 0.5 * logdet_H
            - 0.5 * np.linalg.slogdet(Q)[1] - 0.5 * yPy)


def test_eigen_proc_diagonalizes():
    eval_, X, Y, Vg, Ve = _problem(seed=1)
    D_l, UltVeh, UltVehi, logdet_Ve = core.eigen_proc(
        jnp.asarray(Vg), jnp.asarray(Ve))
    # UltVehi Ve UltVehi' = I and UltVehi Vg UltVehi' = diag(D_l)
    T = np.asarray(UltVehi)
    np.testing.assert_allclose(T @ Ve @ T.T, np.eye(2), atol=1e-10)
    np.testing.assert_allclose(T @ Vg @ T.T, np.diag(np.asarray(D_l)),
                               atol=1e-10)
    np.testing.assert_allclose(float(logdet_Ve),
                               np.linalg.slogdet(Ve)[1], rtol=1e-10)
    # UltVeh is the inverse transform: UltVeh' UltVehi... check
    # UltVehi @ UltVeh should relate via Ul' Ve^{-1/2} Ve^{1/2} Ul = I
    np.testing.assert_allclose(np.asarray(UltVehi) @ np.asarray(UltVeh).T
                               @ np.asarray(UltVeh) @ np.asarray(UltVehi).T,
                               np.eye(2), atol=1e-8)


def test_nr_logl_matches_dense():
    eval_, X, Y, Vg, Ve = _problem(seed=2)
    fn = core._nr_logl_fn(True, jnp.asarray(eval_), jnp.asarray(X),
                          jnp.asarray(Y))
    v = jnp.concatenate([core.sym_to_vech(jnp.asarray(Vg), 2),
                         core.sym_to_vech(jnp.asarray(Ve), 2)])
    got = float(fn(v))
    want = _dense_reml_logl(eval_, X, Y, Vg, Ve)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_em_increases_and_nr_converges():
    eval_, X, Y, Vg_true, Ve_true = _problem(n=150, seed=3)
    d = 2
    Vg0 = jnp.eye(d) * 1.0
    Ve0 = jnp.eye(d) * 1.0
    B0 = jnp.zeros((d, 1))

    Vg1, Ve1, B1, logl1, _ = core.mph_em(True, 200, 1e-6, jnp.asarray(eval_),
                                      jnp.asarray(X), jnp.asarray(Y),
                                      Vg0, Ve0, B0)
    fn = core._nr_logl_fn(True, jnp.asarray(eval_), jnp.asarray(X),
                          jnp.asarray(Y))
    v1 = jnp.concatenate([core.sym_to_vech(Vg1, d), core.sym_to_vech(Ve1, d)])
    # EM's reported logl agrees with the exact likelihood
    np.testing.assert_allclose(float(fn(v1)), float(logl1), rtol=1e-4)

    Vg2, Ve2, logl2, Hvar = core.mph_nr(True, 100, 1e-8,
                                        jnp.asarray(eval_), jnp.asarray(X),
                                        jnp.asarray(Y), Vg1, Ve1)
    assert float(logl2) >= float(logl1) - 1e-6
    # at the optimum the gradient vanishes
    v2 = jnp.concatenate([core.sym_to_vech(Vg2, d), core.sym_to_vech(Ve2, d)])
    g = np.asarray(jax.grad(fn)(v2))
    assert np.abs(g).max() < 1e-3
    # variance estimates (−H⁻¹ diagonal) are positive at the optimum
    assert np.all(np.diag(np.asarray(Hvar)) > 0)


def test_em_batched_matches_single():
    eval_, X, Y, Vg_true, Ve_true = _problem(n=100, seed=4)
    d = 2
    rng = np.random.default_rng(5)
    xs = rng.normal(size=(3, 100))
    X_alt = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(X), (3, 1, 100)),
         jnp.asarray(xs)[:, None, :]], axis=1)
    Vg0 = jnp.broadcast_to(jnp.eye(d), (3, d, d))
    Ve0 = jnp.broadcast_to(jnp.eye(d), (3, d, d))
    B0 = jnp.zeros((3, d, 2))
    Vg_b, Ve_b, B_b, logl_b, _ = core.mph_em(
        True, 100, 1e-6, jnp.asarray(eval_), X_alt, jnp.asarray(Y),
        Vg0, Ve0, B0)
    for s in range(3):
        Vg_s, Ve_s, B_s, logl_s, _ = core.mph_em(
            True, 100, 1e-6, jnp.asarray(eval_), X_alt[s], jnp.asarray(Y),
            jnp.eye(d), jnp.eye(d), jnp.zeros((d, 2)))
        np.testing.assert_allclose(np.asarray(logl_b)[s], float(logl_s),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(Vg_b)[s], np.asarray(Vg_s),
                                   rtol=1e-4, atol=1e-8)


def test_mph_calc_p_null_x_is_uniform_stat():
    """For x uncorrelated with y, the Wald stat should be O(d), p not tiny."""
    eval_, X, Y, Vg, Ve = _problem(n=200, seed=6)
    rng = np.random.default_rng(7)
    xs = jnp.asarray(rng.binomial(2, 0.3, size=(5, 200)).astype(np.float64))
    Vgb = jnp.broadcast_to(jnp.asarray(Vg), (5, 2, 2))
    Veb = jnp.broadcast_to(jnp.asarray(Ve), (5, 2, 2))
    stat, beta, Vbeta = core.mph_calc_p(jnp.asarray(eval_), xs,
                                        jnp.asarray(X), jnp.asarray(Y),
                                        Vgb, Veb)
    s = np.asarray(stat)
    assert np.all(s >= 0)
    assert np.all(s < 30)     # null stats ~ chi2(2)
    assert np.asarray(beta).shape == (5, 2)


def test_mph_calc_p_matches_dense_gls():
    """beta from mph_calc_p equals the dense GLS estimate of the SNP
    effect with covariates, at fixed (Vg, Ve)."""
    eval_, W, Y, Vg, Ve = _problem(n=60, seed=8)
    rng = np.random.default_rng(9)
    x = rng.normal(size=60)
    stat, beta, Vbeta = core.mph_calc_p(
        jnp.asarray(eval_), jnp.asarray(x)[None, :], jnp.asarray(W),
        jnp.asarray(Y), jnp.asarray(Vg)[None], jnp.asarray(Ve)[None])

    # dense GLS: regress vec(Y) on [W x] ⊗ I_d blocks
    n, d, c = 60, 2, 1
    Xfull = np.vstack([W, x[None, :]])
    Q = np.zeros(((c + 1) * d, (c + 1) * d))
    rhs = np.zeros((c + 1) * d)
    for k in range(n):
        H = eval_[k] * Vg + Ve
        Hi = np.linalg.inv(H)
        Q += np.kron(np.outer(Xfull[:, k], Xfull[:, k]), Hi)
        rhs += np.kron(Xfull[:, k], Hi @ Y[:, k])
    sol = np.linalg.solve(Q, rhs)
    beta_x_dense = sol[c * d:]
    np.testing.assert_allclose(np.asarray(beta)[0], beta_x_dense, rtol=1e-8)
    # Vbeta equals the corresponding block of Q^{-1}
    Vb_dense = np.linalg.inv(Q)[c * d:, c * d:]
    np.testing.assert_allclose(np.asarray(Vbeta)[0], Vb_dense, rtol=1e-7)


def test_mvlmm_score_null_calibration():
    """mvLMM score-test p-values are Uniform(0,1) under the null —
    pins the chi-square(d) reference distribution and the Qi/beta
    algebra of mph_calc_p."""
    import scipy.stats
    from gemma_tpu.models.mvlmm import MvlmmNull, mvlmm_assoc
    from gemma_tpu.ops.eigh import eigh_zeroed

    rng = np.random.default_rng(51)
    n, p, d = 250, 400, 2
    Xk = rng.binomial(2, 0.3, size=(500, n)).astype(np.float64)
    Xkc = Xk - Xk.mean(axis=1, keepdims=True)
    K = Xkc.T @ Xkc / 500
    K /= np.diag(K).mean()
    eval_, U, tg = eigh_zeroed(jnp.asarray(K))
    L = np.linalg.cholesky(K + 1e-8 * np.eye(n))
    Y = np.column_stack([
        L @ rng.normal(size=n) * 0.6 + rng.normal(size=n) * 0.8
        for _ in range(d)])
    X0 = (U.T @ jnp.ones((n, 1))).T
    Yr = (U.T @ jnp.asarray(Y)).T

    class Cfg:
        l_min, l_max, n_region = 1e-5, 1e5, 10
        em_iter, em_prec, nr_iter, nr_prec = 10000, 1e-4, 100, 1e-4
        p_nr, crt = 0.001, 0

    null = MvlmmNull(eval_, X0, Yr, Cfg())
    Xt = rng.binomial(2, 0.3, size=(p, n)).astype(np.float64)
    Utx = jnp.asarray(Xt) @ U
    res = mvlmm_assoc(eval_, X0, Yr, Utx, null, 3, Cfg(), jnp.float64)
    pv = res["p_score"]
    pv = pv[np.isfinite(pv)]
    assert len(pv) > 0.95 * p
    ks = scipy.stats.kstest(pv, "uniform").statistic
    assert ks < 0.08, ks


def test_em_nan_lane_poisons_output():
    """A lane whose likelihood goes non-finite must come out NaN —
    GEMMA's MphEM never converges on NaN (|NaN-x| < prec is false),
    runs to max_iter and NaN-poisons Vg/Ve/logl (mvlmm.cpp:599-724);
    the early freeze here must not smuggle a stale finite iterate into
    the output.  Healthy lanes in the same block stay untouched."""
    eval_, X, Y, _, _ = _problem(n=100, seed=6)
    d = 2
    rng = np.random.default_rng(7)
    xs = rng.normal(size=(2, 100))
    X_alt = jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(X), (2, 1, 100)),
         jnp.asarray(xs)[:, None, :]], axis=1)
    Vg0 = jnp.stack([jnp.eye(d), jnp.full((d, d), jnp.nan)])
    Ve0 = jnp.broadcast_to(jnp.eye(d), (2, d, d))
    B0 = jnp.zeros((2, d, 2))
    Vg, Ve, B, logl, done = core.mph_em(
        True, 100, 1e-6, jnp.asarray(eval_), X_alt, jnp.asarray(Y),
        Vg0, Ve0, B0)
    # poisoned lane: everything NaN, and marked done (no stall)
    assert not np.isfinite(np.asarray(logl)[1])
    assert np.all(np.isnan(np.asarray(Vg)[1]))
    assert np.all(np.isnan(np.asarray(Ve)[1]))
    assert bool(np.asarray(done)[1])
    # healthy lane unaffected: matches a solo run exactly
    Vg_s, Ve_s, _, logl_s, _ = core.mph_em(
        True, 100, 1e-6, jnp.asarray(eval_), X_alt[0], jnp.asarray(Y),
        jnp.eye(d), jnp.eye(d), jnp.zeros((d, 2)))
    np.testing.assert_allclose(np.asarray(logl)[0], float(logl_s),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(Vg)[0], np.asarray(Vg_s),
                               rtol=1e-4, atol=1e-8)


@pytest.mark.parametrize("c", [1, 2, 3])
def test_calc_qi_matches_dense_inverse(c):
    """calc_qi's per-phenotype block inversion (closed adjugate for
    c<=2, LU fallback above) against an explicit dense build of the
    (dc, dc) Q matrix (CalcQi, mvlmm.cpp:285-329)."""
    rng = np.random.default_rng(7 + c)
    n, d, B = 60, 2, 5
    eval_ = np.sort(np.abs(rng.gamma(2.0, 1.0, n)))
    eval_[0] = 0.0
    X = np.vstack([np.ones((1, n)), rng.normal(size=(c - 1, n))])
    D_l = rng.uniform(0.05, 3.0, size=(B, d))

    Qi, logdet = core.calc_qi(jnp.asarray(eval_), jnp.asarray(D_l),
                              jnp.asarray(X))
    assert Qi.shape == (B, c * d, c * d)

    for b in range(B):
        Q = np.zeros((c * d, c * d))
        for l in range(d):
            w = 1.0 / (D_l[b, l] * eval_ + 1.0)
            blk = (X * w) @ X.T
            Q[l::d, l::d] = blk
        np.testing.assert_allclose(np.asarray(Qi[b]), np.linalg.inv(Q),
                                   rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(float(logdet[b]),
                                   np.linalg.slogdet(Q)[1], rtol=1e-10)
