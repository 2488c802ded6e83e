"""BSLMM MCMC tests.

GEMMA's GSL RNG stream cannot be replicated bit-for-bit (SURVEY.md
§7.3), so — like GEMMA's own fixed-seed smoke tests — these validate
the machinery statistically and structurally:

  * the masked fixed-shape posterior matches a dense computation of
    the marginal log-posterior at given (h, rho, logp, gamma);
  * a short chain on strongly-simulated sparse data concentrates
    posterior inclusion on the causal SNPs and pve near truth;
  * GBLUP (-bslmm 2) matches its closed form.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gemma_tpu.models.bslmm import (
    BslmmSettings, make_mcmc_step, run_mcmc, ridge_gblup, calc_p_gamma)


def _sim(n=150, p=120, n_causal=3, seed=0, h2=0.6):
    rng = np.random.default_rng(seed)
    X = rng.binomial(2, 0.3, size=(p, n)).astype(np.float64)
    Xc = X - X.mean(axis=1, keepdims=True)
    causal = rng.choice(p, n_causal, replace=False)
    beta = rng.normal(0, 1, n_causal)
    g = beta @ Xc[causal]
    g *= np.sqrt(h2) / g.std()
    y = g + rng.normal(0, np.sqrt(1 - h2), n)
    y -= y.mean()
    K = Xc.T @ Xc / p
    return Xc, y, K, causal


def _eigen_setup(Xc, y, K, dtype=jnp.float64):
    from gemma_tpu.ops.eigh import eigh_zeroed
    eval_, U, trace_G = eigh_zeroed(jnp.asarray(K, dtype=dtype))
    UtX = (jnp.asarray(Xc, dtype=dtype) @ U).T
    Uty = U.T @ jnp.asarray(y, dtype=dtype)
    return eval_, U, trace_G, UtX, Uty


def test_posterior_matches_dense():
    """Masked s_max-shaped posterior == dense |gamma|-sized formula."""
    Xc, y, K, _ = _sim(seed=1)
    eval_, U, trace_G, UtX, Uty = _eigen_setup(Xc, y, K)
    n, p = UtX.shape

    st = BslmmSettings(ns_test=p, ni_test=n, s_max=20, w_step=1, s_step=1)
    calc_posterior, _ = make_mcmc_step(UtX, Uty, eval_, trace_G,
                                       calc_p_gamma(p, st.geo_mean), st)

    h, rho, logp = 0.5, 0.8, np.log(5.0 / p)
    ng = 4
    ranks = jnp.where(jnp.arange(20) < ng, jnp.arange(20), p).astype(jnp.int32)
    key = jax.random.PRNGKey(0)
    logpost, *_ = calc_posterior(key, Uty, ranks, jnp.int32(ng),
                                 jnp.float64(h), jnp.float64(rho),
                                 jnp.float64(logp))

    # dense marginal log-posterior (CalcPosterior, bslmm.cpp:517-642)
    sigma_a2 = h * rho / (float(trace_G) * (1 - h) * np.exp(logp) * p)
    sigma_b2 = h * (1 - rho) / (float(trace_G) * (1 - h))
    d = np.asarray(eval_) * sigma_b2
    w_hi = 1.0 / (d + 1.0)
    Xg = np.asarray(UtX[:, :ng])
    Om = sigma_a2 * (Xg * w_hi[:, None]).T @ Xg + np.eye(ng)
    XtHiy = (Xg * w_hi[:, None]).T @ np.asarray(Uty)
    P_yy = np.sum(w_hi * np.asarray(Uty) ** 2) - sigma_a2 * XtHiy @ \
        np.linalg.solve(Om, XtHiy)
    want = (0.5 * np.sum(np.log(w_hi))       # -0.5 logdet_H
            - 0.5 * np.linalg.slogdet(Om)[1]
            - 0.5 * n * np.log(P_yy)
            + (ng - 1.0) * logp + (p - ng) * np.log(1 - np.exp(logp)))
    np.testing.assert_allclose(float(logpost), want, rtol=1e-8)


def test_short_chain_finds_causal_snps():
    Xc, y, K, causal = _sim(n=200, p=100, n_causal=2, seed=2, h2=0.7)
    eval_, U, trace_G, UtX, Uty = _eigen_setup(Xc, y, K)
    n, p = UtX.shape

    # order columns by marginal correlation (stand-in for logLR ranking)
    cor = np.abs(np.asarray(UtX).T @ np.asarray(Uty))
    order = np.argsort(-cor, kind="stable")
    UtX_sorted = UtX[:, order]

    st = BslmmSettings(ns_test=p, ni_test=n, s_max=20,
                       w_step=500, s_step=2000, r_pace=2, n_mh=1)
    final = run_mcmc(UtX_sorted, Uty, eval_, trace_G, st,
                     h0=0.5, rho0=0.9, logp0=np.log(5.0 / p),
                     n_gamma0=5, seed=3)

    w = int(final.w)
    assert w == 1000
    hyp = np.asarray(final.rec_hyp)[:w]
    assert np.all(np.isfinite(hyp[:, 0]))
    pve_mean = hyp[:, 1].mean()
    assert 0.4 < pve_mean < 0.95      # truth 0.7

    # posterior inclusion concentrated on causal SNPs
    cnt = np.asarray(final.acc_betacnt)
    pip = np.zeros(p)
    pip[order] = cnt / w
    top2 = np.argsort(-pip)[:2]
    assert set(top2) == set(causal)

    accept_ratio = int(final.n_accept) / (st.w_step + st.s_step)
    assert 0.01 < accept_ratio < 0.9


def test_probit_chain_runs():
    """-bslmm 3: case/control chain with latent liability resampling."""
    rng = np.random.default_rng(7)
    Xc, y_cont, K, causal = _sim(n=120, p=60, n_causal=2, seed=7, h2=0.7)
    y01 = (y_cont > 0).astype(np.float64)
    y_lab = y01 - y01.mean()                    # centered labels
    eval_, U, trace_G, UtX, Uty = _eigen_setup(Xc, y_lab, K)
    n, p = UtX.shape

    st = BslmmSettings(ns_test=p, ni_test=n, s_max=10,
                       w_step=100, s_step=400, r_pace=2, n_mh=2, a_mode=13)
    final = run_mcmc(UtX, Uty, eval_, trace_G, st,
                     h0=0.4, rho0=0.8, logp0=np.log(4.0 / p), n_gamma0=4,
                     seed=8, U=U, y_labels=jnp.asarray(y_lab))
    w = int(final.w)
    assert w == 200
    hyp = np.asarray(final.rec_hyp)[:w]
    assert np.all(np.isfinite(hyp))
    assert np.all((hyp[:, 1] >= 0) & (hyp[:, 1] <= 1))   # pve
    assert int(final.n_accept) > 0


def test_ridge_gblup_closed_form():
    Xc, y, K, _ = _sim(seed=4)
    eval_, U, trace_G, UtX, Uty = _eigen_setup(Xc, y, K)
    lam = 1.7
    alpha, u_rot = ridge_gblup(UtX, Uty, eval_, lam)
    H = lam * np.asarray(eval_) + 1.0
    np.testing.assert_allclose(
        np.asarray(alpha),
        lam / UtX.shape[1] * np.asarray(UtX).T @ (np.asarray(Uty) / H),
        rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(u_rot), (H - 1.0) * np.asarray(Uty) / H, rtol=1e-10)


def test_mcmc_checkpoint_resume(tmp_path, monkeypatch):
    """Segmented checkpointing: (a) a checkpointed run reproduces the
    un-checkpointed chain bit-for-bit (the RNG key travels in the
    state); (b) a run killed mid-chain resumes from the .npz and
    reaches the identical final state."""
    import os as _os
    import numpy as _np
    import jax.numpy as jnp
    from gemma_tpu.models.bslmm import BslmmSettings, run_mcmc

    rng = np.random.default_rng(0)
    n, p = 60, 40
    X = rng.binomial(2, 0.3, size=(p, n)).astype(np.float64)
    Xc = X - X.mean(axis=1, keepdims=True)
    y = Xc[2] * 0.9 + rng.normal(size=n)
    y -= y.mean()
    K = Xc.T @ Xc / p
    from gemma_tpu.ops.eigh import eigh_zeroed
    eval_, U, trace_G = eigh_zeroed(jnp.asarray(K))
    UtX = (jnp.asarray(Xc) @ U).T
    Uty = U.T @ jnp.asarray(y)

    st = BslmmSettings(ns_test=p, ni_test=n, w_step=200, s_step=400,
                       r_pace=10, s_max=20, a_mode=11)
    args = (UtX, Uty, eval_, jnp.asarray(trace_G), st, 0.4, 0.8,
            float(np.log(3 / p)), 3)

    ref = run_mcmc(*args, seed=7)

    ck = str(tmp_path / "chain.ckpt.npz")
    seg = run_mcmc(*args, seed=7, checkpoint_path=ck,
                   checkpoint_every=137)
    for f in ref._fields:
        np.testing.assert_array_equal(np.asarray(getattr(ref, f)),
                                      np.asarray(getattr(seg, f)), f)
    assert _os.path.exists(ck)

    # crash after the second segment save, then resume
    ck2 = str(tmp_path / "crash.ckpt.npz")
    saves = {"n": 0}
    real_savez = _np.savez

    def crashing_savez(*a, **kw):
        real_savez(*a, **kw)
        saves["n"] += 1
        if saves["n"] == 2:
            raise KeyboardInterrupt

    monkeypatch.setattr(_np, "savez", crashing_savez)
    with pytest.raises(KeyboardInterrupt):
        run_mcmc(*args, seed=7, checkpoint_path=ck2, checkpoint_every=137)
    monkeypatch.setattr(_np, "savez", real_savez)

    partial = _np.load(ck2)
    # the crash hits inside the SECOND savez, before its atomic
    # os.replace — so the surviving checkpoint is the first segment
    assert int(partial["it"]) == 137

    resumed = run_mcmc(*args, seed=7, checkpoint_path=ck2,
                       checkpoint_every=137)
    for f in ref._fields:
        np.testing.assert_array_equal(np.asarray(getattr(ref, f)),
                                      np.asarray(getattr(resumed, f)), f)
