"""MQS (summary-statistics variance components) tests.

Simulate a GWAS: individual-level data gives marginal z-scores; MQS on
(z-scores + reference genotypes) should recover the simulated
heritability, consistent with the individual-level HE estimate.
"""

import numpy as np
import pytest

from gemma_tpu.models.mqs import (
    parse_header, read_beta_summary, calcq, calc_s, calc_vc_ss,
    comp_ak_to_s)


def _sim_gwas(n=500, p=400, h2=0.5, seed=0):
    rng = np.random.default_rng(seed)
    maf = rng.uniform(0.1, 0.5, p)
    X = rng.binomial(2, maf[:, None], size=(p, n)).astype(np.float64)
    Xc = X - X.mean(axis=1, keepdims=True)
    beta = rng.normal(0, 1, p)                # infinitesimal model
    g = beta @ Xc
    g *= np.sqrt(h2) / g.std()
    y = g + rng.normal(0, np.sqrt(1 - h2), n)
    y = (y - y.mean()) / y.std()
    # marginal z-scores
    xs = np.sqrt((Xc * Xc).sum(axis=1))
    z = (Xc @ y) / xs
    return X, y, z


def test_parse_header():
    h = parse_header("rs\tchr\tps\tn_mis\tn_obs\tz\taf")
    assert h["rs"] == 1 and h["chr"] == 2 and h["pos"] == 3
    assert h["nmis"] == 4 and h["nobs"] == 5 and h["z"] == 6
    assert h["af"] == 7 and h["coln"] == 7


def test_read_beta_summary_variants(tmp_path):
    f = tmp_path / "beta.txt"
    f.write_text("rs\tz\tn\nrs1\t2.0\t100\nrs2\t-1.0\t200\n")
    b = read_beta_summary(str(f))
    np.testing.assert_allclose(b.z2, [4.0, 1.0])
    assert b.ni.tolist() == [100, 200]
    assert b.ni_total == 200 and b.ns_test == 2

    f2 = tmp_path / "beta2.txt"
    f2.write_text("rs\tbeta\tse\tn\nrs1\t0.4\t0.2\t50\n")
    b2 = read_beta_summary(str(f2))
    np.testing.assert_allclose(b2.z2, [4.0])


def test_comp_ak_to_s_single_component():
    """For one component with A=K, S ≈ (tr(Kc²)-...)/tr(Kc)² - 1/(n-c),
    positive for a real genetic covariance structure."""
    rng = np.random.default_rng(1)
    n = 80
    B = rng.normal(size=(n, 200))
    K = (B @ B.T) / 200
    Kc = K - K.mean(0) - K.mean(1)[:, None] + K.mean()
    Kc /= np.diag(Kc).mean()
    S = comp_ak_to_s(Kc[None], Kc[None], 1)
    assert S.shape == (1, 1)
    assert S[0, 0] > 0


def test_mqs_recovers_heritability(tmp_path):
    X, y, z = _sim_gwas(n=500, p=400, h2=0.5, seed=2)
    p, n = X.shape

    cats = np.zeros(p, dtype=np.int64)
    ni = np.full(p, n)
    weight = np.ones(p)
    z2 = z * z

    Vq, q, s = calcq(200, cats, ni, weight, z2, 1)
    W = np.ones((n, 1))
    S, Svar, ns = calc_s(X, W, cats, 1)
    res = calc_vc_ss(Vq, S, Svar, q, s, float(n))

    assert 0.3 < res.pve[0] < 0.7       # truth 0.5
    assert res.se_pve[0] > 0
    assert np.isfinite(res.enrich[0])

    # cross-check with individual-level HE regression
    from gemma_tpu.models.vc import vc_he
    from gemma_tpu.ops.center import center_matrix
    import jax.numpy as jnp
    Xc = X - X.mean(axis=1, keepdims=True)
    K = Xc.T @ Xc / p
    Kc = np.asarray(center_matrix(jnp.asarray(K)))
    he = vc_he(Kc[None], W, y, np.array([np.mean(np.diag(Kc))]))
    np.testing.assert_allclose(res.pve[0], he.pve[0], atol=0.15)


def test_mqs_two_categories(tmp_path):
    X, y, z = _sim_gwas(n=400, p=300, h2=0.5, seed=3)
    p, n = X.shape
    cats = (np.arange(p) % 2).astype(np.int64)
    Vq, q, s = calcq(100, cats, np.full(p, n), np.ones(p), z * z, 2)
    S, Svar, ns = calc_s(X, np.ones((n, 1)), cats, 2)
    res = calc_vc_ss(Vq, S, Svar, q, s, float(n))
    assert np.all(np.isfinite(res.pve))
    assert 0.2 < res.pve_total < 0.85
    # both halves carry signal → enrichment near 1
    assert 0.3 < res.enrich[0] < 3.0


def test_gs_gq_vc_cli(tmp_path):
    """End-to-end: -gq writes q/Vq/size; -gs writes S/size; -vc -beta
    solves for pve."""
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import run_gs, run_gq, run_vc_summary

    X, y, z = _sim_gwas(n=300, p=250, h2=0.5, seed=4)
    p, n = X.shape
    out = str(tmp_path)

    # write a BIMBAM genotype file + pheno + beta file
    geno = tmp_path / "geno.txt"
    with open(geno, "w") as fh:
        for j in range(p):
            fh.write(f"rs{j}, A, T, " +
                     ", ".join(str(v) for v in X[j]) + "\n")
    (tmp_path / "pheno.txt").write_text("\n".join(f"{v:.6f}" for v in y)
                                        + "\n")
    betaf = tmp_path / "beta.txt"
    with open(betaf, "w") as fh:
        fh.write("rs\tz\tn\n")
        for j in range(p):
            fh.write(f"rs{j}\t{z[j]:.6f}\t{n}\n")

    common = (f"-g {geno} -p {tmp_path}/pheno.txt -outdir {out} "
              f"-precision float64 -notsnp")
    run_gq(parse_args(f"-beta {betaf} -gq 1 -o q -outdir {out}".split()))
    assert (tmp_path / "q.q.txt").exists()
    assert (tmp_path / "q.Vq.txt").exists()

    run_gs(parse_args((common + " -gs 1 -o s").split()))
    assert (tmp_path / "s.S.txt").exists()

    res = run_vc_summary(parse_args(
        (common + f" -beta {betaf} -vc 1 -o vcs").split()))
    assert 0.25 < res.pve[0] < 0.75

    # the -study/-ref path composes the files written by -gq and -gs
    from gemma_tpu.run import run_vc_study_ref
    res2 = run_vc_study_ref(parse_args(
        f"-study {out}/q -ref {out}/s -vc 1 -o vsr -outdir {out}".split()))
    np.testing.assert_allclose(res2.pve[0], res.pve[0], rtol=1e-6)
