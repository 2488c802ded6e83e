"""Variance-component estimator tests.

Anchors:
  * consistency with the univariate LMM REML fit — both maximise the
    same restricted likelihood, so -vc 2 on (K, y) must reproduce the
    PVE the LMM null model reports (GEMMA cross-checks the same way:
    its .log.txt pve for -lmm equals -vc 2's on one component);
  * HE regression recovers simulated heritability.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from gemma_tpu.models.vc import vc_he, vc_reml_ai
from gemma_tpu.ops.center import center_matrix
from gemma_tpu.ops.eigh import eigh_zeroed

EXAMPLE = "/root/reference/example"


def _simulate(n=300, p=800, h2=0.5, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.binomial(2, 0.3, size=(p, n)).astype(np.float64)
    Xc = X - X.mean(axis=1, keepdims=True)
    K = Xc.T @ Xc / p
    u = Xc.T @ rng.normal(0, 1, p) / np.sqrt(p)
    u = u / u.std() * np.sqrt(h2)
    e = rng.normal(0, np.sqrt(1 - h2), n)
    y = u + e
    W = np.ones((n, 1))
    return K, W, y


def test_he_recovers_heritability():
    K, W, y = _simulate(h2=0.5, seed=1)
    Kc = np.asarray(center_matrix(jnp.asarray(K)))
    v_traceG = np.array([np.mean(np.diag(Kc))])
    res = vc_he(Kc[None], W, y, v_traceG)
    assert 0.25 < res.pve[0] < 0.75
    assert res.se_pve[0] > 0
    assert len(res.sigma2) == 2


def test_reml_ai_matches_lmm_null():
    K, W, y = _simulate(h2=0.4, seed=2)
    Kc = np.asarray(center_matrix(jnp.asarray(K)))
    v_traceG = np.array([np.mean(np.diag(Kc))])
    res = vc_reml_ai(Kc[None], W, y, v_traceG)

    # univariate LMM REML on the same data
    from gemma_tpu.models.lmm import fit_null
    eval_, U, trace_G = eigh_zeroed(jnp.asarray(Kc))
    UtW = U.T @ jnp.asarray(W)
    Uty = U.T @ jnp.asarray(y)
    nf = fit_null(eval_, UtW, Uty, trace_G, n_cvt=1)

    # pve agreement (same REML optimum)
    np.testing.assert_allclose(res.pve[0], float(nf.pve), atol=2e-3)
    # sigma2_g / sigma2_e == lambda
    lam_vc = res.sigma2[0] / res.sigma2[1]
    np.testing.assert_allclose(lam_vc, float(nf.l_remle), rtol=2e-2)


def test_reml_two_components():
    rng = np.random.default_rng(3)
    n = 200
    K1, W, _ = _simulate(n=n, seed=4)
    K2, _, _ = _simulate(n=n, seed=5)
    K1 = np.asarray(center_matrix(jnp.asarray(K1)))
    K2 = np.asarray(center_matrix(jnp.asarray(K2)))
    # y with variance from both components
    L1 = np.linalg.cholesky(K1 + 1e-6 * np.eye(n))
    L2 = np.linalg.cholesky(K2 + 1e-6 * np.eye(n))
    y = (0.7 * L1 @ rng.normal(size=n) + 0.5 * L2 @ rng.normal(size=n)
         + 0.7 * rng.normal(size=n))
    Ks = np.stack([K1, K2])
    v_traceG = np.array([np.mean(np.diag(K1)), np.mean(np.diag(K2))])
    res = vc_reml_ai(Ks, W, y, v_traceG)
    assert np.all(np.isfinite(res.sigma2))
    assert np.all(res.sigma2 > 0)
    assert 0 < res.pve_total < 1
    he = vc_he(Ks, W, y, v_traceG)
    # the two estimators agree roughly (different moments, small n)
    np.testing.assert_allclose(res.pve_total, he.pve_total, atol=0.3)


@pytest.mark.skipif(not os.path.exists(f"{EXAMPLE}/BXD_geno.txt.gz"),
                    reason="BXD data not available")
def test_vc_cli_end_to_end(tmp_path):
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import batch_run, run_vc
    out = str(tmp_path)
    common = (f"-g {EXAMPLE}/BXD_geno.txt.gz -p {EXAMPLE}/BXD_pheno.txt "
              f"-a {EXAMPLE}/BXD_snps.txt -outdir {out} -precision float64")
    batch_run(parse_args((common + " -gk -o K").split()))
    cfg = parse_args(
        f"-p {EXAMPLE}/BXD_pheno.txt -k {out}/K.cXX.txt -vc 2 -o vc "
        f"-outdir {out} -precision float64".split())
    res = run_vc(cfg)
    assert 0 < res.pve[0] < 1
    assert os.path.exists(f"{out}/vc.log.txt")


def test_acl_recovers_heritability():
    from gemma_tpu.models.vc import vc_acl
    K, W, y = _simulate(h2=0.5, seed=5)
    Kc = np.asarray(center_matrix(jnp.asarray(K)))
    v_traceG = np.array([np.mean(np.diag(Kc))])
    res = vc_acl(Kc[None], W, y, v_traceG)
    # ACL is method-of-moments like HE; on the same data the two
    # estimates must agree to sampling noise and both bracket h2
    he = vc_he(Kc[None], W, y, v_traceG)
    assert 0.25 < res.pve[0] < 0.75
    assert abs(res.pve[0] - he.pve[0]) < 0.15
    assert res.se_pve[0] > 0
    assert len(res.sigma2) == 2
    assert res.sigma2[1] > 0          # residual variance


def test_acl_two_components():
    from gemma_tpu.models.vc import vc_acl
    rng = np.random.default_rng(7)
    n = 250
    K1, W, _ = _simulate(n=n, seed=8)
    K2, _, _ = _simulate(n=n, seed=9)
    K1c = np.asarray(center_matrix(jnp.asarray(K1)))
    K2c = np.asarray(center_matrix(jnp.asarray(K2)))
    L1 = np.linalg.cholesky(K1c + 1e-6 * np.eye(n))
    L2 = np.linalg.cholesky(K2c + 1e-6 * np.eye(n))
    y = (L1 @ rng.normal(size=n) * np.sqrt(0.4)
         + L2 @ rng.normal(size=n) * np.sqrt(0.2)
         + rng.normal(size=n) * np.sqrt(0.4))
    v_traceG = np.array([np.mean(np.diag(K1c)), np.mean(np.diag(K2c))])
    res = vc_acl(np.stack([K1c, K2c]), W, y, v_traceG)
    assert len(res.pve) == 2
    assert len(res.sigma2) == 3
    assert np.all(np.isfinite(res.se_pve))
    assert 0.0 < res.pve_total < 1.0


def test_reml_noconstrain_matches_constrained():
    K, W, y = _simulate(h2=0.4, seed=11)
    Kc = np.asarray(center_matrix(jnp.asarray(K)))
    v_traceG = np.array([np.mean(np.diag(Kc))])
    res_c = vc_reml_ai(Kc[None], W, y, v_traceG, noconstrain=False)
    res_u = vc_reml_ai(Kc[None], W, y, v_traceG, noconstrain=True)
    # interior optimum: both parameterizations find the same root
    np.testing.assert_allclose(res_u.pve[0], res_c.pve[0], atol=5e-3)
    np.testing.assert_allclose(res_u.sigma2, res_c.sigma2, rtol=2e-2)


def test_vc_se_matches_empirical_sd():
    """se(pve) from HE regression and REML-AI estimate the replicate
    sampling sd (fixed kinship, phenotype redrawn)."""
    from gemma_tpu.models.vc import vc_acl
    rng = np.random.default_rng(31)
    n, p, h2 = 250, 600, 0.4
    X = rng.binomial(2, 0.3, size=(p, n)).astype(np.float64)
    Xc = X - X.mean(axis=1, keepdims=True)
    K = Xc.T @ Xc / p
    Kc = np.asarray(center_matrix(jnp.asarray(K)))
    v_traceG = np.array([np.mean(np.diag(Kc))])
    W = np.ones((n, 1))
    L = np.linalg.cholesky(Kc + 1e-8 * np.eye(n))

    def draw():
        u = L @ rng.normal(size=n)
        u = u / u.std() * np.sqrt(h2)
        return u + rng.normal(0, np.sqrt(1 - h2), n)

    ests = {"he": [], "reml": [], "acl": []}
    for rep in range(40):
        y = draw()
        ests["he"].append(float(vc_he(Kc[None], W, y, v_traceG).pve[0]))
        if rep < 15:   # REML is costlier; fewer replicates
            ests["reml"].append(
                float(vc_reml_ai(Kc[None], W, y, v_traceG).pve[0]))
        ests["acl"].append(float(vc_acl(Kc[None], W, y, v_traceG).pve[0]))

    y = draw()
    he = vc_he(Kc[None], W, y, v_traceG)
    reml = vc_reml_ai(Kc[None], W, y, v_traceG)
    acl = vc_acl(Kc[None], W, y, v_traceG)

    for res, key, tol in ((he, "he", 0.5), (reml, "reml", 0.6),
                          (acl, "acl", 0.5)):
        emp = float(np.std(ests[key]))
        se = float(res.se_pve[0])
        assert emp > 0
        assert abs(se - emp) / emp < tol, (key, se, emp)
