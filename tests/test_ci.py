"""-ci 1/2 (modes 66/67): MQS confidence intervals.

Anchors:
  * pipeline runs end-to-end from files (beta + ref panel + genotypes)
    and produces finite positive standard errors;
  * with a constant -wcat the LDSC weights normalize to one, so
    -ci 2 must reproduce -ci 1 exactly (UpdateWeight normalizes to
    mean one per category, param.cpp:2336-2350);
  * se(pve) from -ci agrees with the jackknife se the -vc summary
    path reports on the same data, to within a small factor.
"""

import numpy as np
import pytest

from gemma_tpu.cli import parse_args
from gemma_tpu.run import run_ci, run_vc_summary, run_gs


def _write_dataset(tmp_path, n=220, p=400, h2=0.4, seed=0):
    rng = np.random.default_rng(seed)
    maf = rng.uniform(0.1, 0.5, p)
    X = rng.binomial(2, maf[:, None], size=(p, n)).astype(float)
    Xc = X - X.mean(axis=1, keepdims=True)
    sd = Xc.std(axis=1)
    beta = rng.normal(0, 1, p)
    g = (Xc / sd[:, None]).T @ beta / np.sqrt(p)
    g = g / g.std() * np.sqrt(h2)
    y = g + rng.normal(0, np.sqrt(1 - h2), n)

    geno = tmp_path / "geno.txt"
    with open(geno, "w") as fh:
        for j in range(p):
            row = ", ".join(str(v) for v in X[j])
            fh.write(f"rs{j}, A, T, {row}\n")
    pheno = tmp_path / "pheno.txt"
    np.savetxt(pheno, y)

    # marginal z-scores on standardized genotypes
    z = (Xc / sd[:, None]) @ (y - y.mean()) / (y.std() * np.sqrt(n))
    betaf = tmp_path / "beta.txt"
    with open(betaf, "w") as fh:
        fh.write("rs\ta1\ta0\tz\tn\n")
        for j in range(p):
            fh.write(f"rs{j}\tA\tT\t{z[j]:.6f}\t{n}\n")
    return geno, pheno, betaf


def test_ci_end_to_end(tmp_path):
    geno, pheno, betaf = _write_dataset(tmp_path)

    # reference panel S matrix from the same genotypes (-gs)
    cfg_gs = parse_args(["-g", str(geno), "-p", str(pheno), "-gs",
                         "-outdir", str(tmp_path), "-o", "ref"])
    run_gs(cfg_gs)

    # MQS point estimate (-vc 1 -beta): needed for -pve
    cfg_vc = parse_args(["-g", str(geno), "-p", str(pheno),
                         "-beta", str(betaf), "-vc", "1",
                         "-outdir", str(tmp_path), "-o", "vc"])
    vc = run_vc_summary(cfg_vc)
    pve = float(vc.pve[0])
    assert np.isfinite(pve)

    cfg_ci = parse_args(["-g", str(geno), "-p", str(pheno),
                         "-beta", str(betaf),
                         "-ref", str(tmp_path / "ref"),
                         "-pve", f"{pve}", "-ci", "1",
                         "-outdir", str(tmp_path), "-o", "ci"])
    res = run_ci(cfg_ci)

    assert res.pve[0] == pytest.approx(pve)
    assert np.isfinite(res.se_pve[0]) and res.se_pve[0] > 0
    assert res.se_pve_total == pytest.approx(res.se_pve[0])
    assert res.sigma2persnp[0] == pytest.approx(pve / 400)
    # single component: enrichment is exactly 1 with se ~ 0
    assert res.enrich[0] == pytest.approx(1.0)
    # the two se estimates target the same sampling variance
    assert res.se_pve[0] == pytest.approx(float(vc.se_pve[0]), rel=1.0)
    assert (tmp_path / "ci.log.txt").exists()


def test_ci2_constant_wcat_matches_ci1(tmp_path):
    geno, pheno, betaf = _write_dataset(tmp_path, seed=3)
    cfg_gs = parse_args(["-g", str(geno), "-p", str(pheno), "-gs",
                         "-outdir", str(tmp_path), "-o", "ref"])
    run_gs(cfg_gs)

    wcat = tmp_path / "wcat.txt"
    with open(wcat, "w") as fh:
        fh.write("rs\tw\n")
        for j in range(400):
            fh.write(f"rs{j}\t1.0\n")

    base = ["-g", str(geno), "-p", str(pheno), "-beta", str(betaf),
            "-ref", str(tmp_path / "ref"), "-pve", "0.35",
            "-outdir", str(tmp_path)]
    res1 = run_ci(parse_args(base + ["-ci", "1", "-o", "ci1"]))
    res2 = run_ci(parse_args(base + ["-ci", "2", "-o", "ci2",
                                     "-wcat", str(wcat)]))
    np.testing.assert_allclose(res2.se_pve, res1.se_pve, rtol=1e-10)
    np.testing.assert_allclose(res2.se_enrich, res1.se_enrich,
                               atol=1e-12)


def test_ci2_requires_wcat(tmp_path):
    geno, pheno, betaf = _write_dataset(tmp_path, n=60, p=50, seed=5)
    cfg_gs = parse_args(["-g", str(geno), "-p", str(pheno), "-gs",
                         "-outdir", str(tmp_path), "-o", "ref"])
    run_gs(cfg_gs)
    cfg = parse_args(["-g", str(geno), "-p", str(pheno),
                      "-beta", str(betaf), "-ref", str(tmp_path / "ref"),
                      "-pve", "0.3", "-ci", "2",
                      "-outdir", str(tmp_path), "-o", "bad"])
    with pytest.raises(ValueError, match="wcat"):
        run_ci(cfg)


def test_mstudy_mref_pooling(tmp_path):
    """Pooling identities (ReadFile_mstudy/mref): a single-entry list
    reproduces the direct read; the same panel listed twice leaves q/S
    unchanged, doubles the SNP counts, and halves Vq."""
    from gemma_tpu.models.ci import (read_study, read_mstudy, read_ref,
                                     read_mref)
    n_vc = 2
    rng = np.random.default_rng(11)
    S = rng.normal(size=(n_vc, n_vc)); S = S @ S.T
    Svar = np.abs(rng.normal(size=(n_vc, n_vc)))
    Vq = rng.normal(size=(n_vc, n_vc)); Vq = Vq @ Vq.T
    q = rng.normal(size=n_vc)
    s = np.array([120.0, 80.0])
    np.savetxt(tmp_path / "a.S.txt", np.vstack([S, Svar]))
    np.savetxt(tmp_path / "a.size.txt", np.concatenate([s, [500.0]]))
    np.savetxt(tmp_path / "a.Vq.txt", Vq)
    np.savetxt(tmp_path / "a.q.txt", q)

    single = tmp_path / "single.txt"
    single.write_text(f"{tmp_path}/a\n")
    double = tmp_path / "double.txt"
    double.write_text(f"{tmp_path}/a\n{tmp_path}/a\n")

    Vq1, q1, s1, ni1 = read_mstudy(str(single))
    Vq0, q0, s0, ni0 = read_study(str(tmp_path / "a"))
    np.testing.assert_allclose(Vq1, Vq0); np.testing.assert_allclose(q1, q0)
    np.testing.assert_allclose(s1, s0); assert ni1 == ni0

    Vq2, q2, s2, _ = read_mstudy(str(double))
    np.testing.assert_allclose(q2, q0)
    np.testing.assert_allclose(s2, 2 * s0)
    np.testing.assert_allclose(Vq2, Vq0 / 2)

    S1, Sv1, sr1, nir1 = read_mref(str(single))
    S0, Sv0, sr0, nir0 = read_ref(str(tmp_path / "a"))
    np.testing.assert_allclose(S1, S0); np.testing.assert_allclose(Sv1, Sv0)

    # ReadFile_mref normalizes the pooled sums by the POOLED sizes
    # (gemma_io.cpp:4167-4177), so a duplicated panel halves S (the
    # cross terms s_i s_j quadruple while the sum only doubles) and
    # divides Svar by 8 — the reference pooling assumes disjoint
    # panels; this pins its exact algebra.
    S2, Sv2, sr2, _ = read_mref(str(double))
    np.testing.assert_allclose(S2, S0 / 2)
    np.testing.assert_allclose(Sv2, Sv0 / 8)
    np.testing.assert_allclose(sr2, 2 * sr0)


def test_vc2_ldsc_second_pass(tmp_path):
    """-vc 2 with -beta runs the LDSC-weighted second pass
    (gemma.cpp:2183-2212): estimates stay near -vc 1's on homogeneous
    data (weights normalize to ~one), but the passes are distinct."""
    geno, pheno, betaf = _write_dataset(tmp_path, seed=13)
    base = ["-g", str(geno), "-p", str(pheno), "-beta", str(betaf),
            "-outdir", str(tmp_path)]
    res1 = run_vc_summary(parse_args(base + ["-vc", "1", "-o", "v1"]))
    res2 = run_vc_summary(parse_args(base + ["-vc", "2", "-o", "v2"]))
    assert np.isfinite(res2.pve[0])
    assert np.isfinite(res2.se_pve[0])
    # same underlying quantity; weighting shifts it only slightly here
    assert abs(res2.pve[0] - res1.pve[0]) < 0.25


def test_vc_summary_wsnp_weights(tmp_path):
    """-wsnp per-SNP weights flow into both q and S; constant weights
    are a no-op because ObtainWeight normalizes to mean one."""
    geno, pheno, betaf = _write_dataset(tmp_path, n=120, p=150, seed=17)
    wsnp = tmp_path / "wsnp.txt"
    with open(wsnp, "w") as fh:
        for j in range(150):
            fh.write(f"rs{j}\t2.5\n")
    base = ["-g", str(geno), "-p", str(pheno), "-beta", str(betaf),
            "-outdir", str(tmp_path)]
    res0 = run_vc_summary(parse_args(base + ["-vc", "1", "-o", "w0"]))
    res1 = run_vc_summary(parse_args(base + ["-vc", "1", "-o", "w1",
                                             "-wsnp", str(wsnp)]))
    np.testing.assert_allclose(res1.pve, res0.pve, rtol=1e-8)
    np.testing.assert_allclose(res1.se_pve, res0.se_pve, rtol=1e-8)


def test_ci_se_matches_empirical_sd(tmp_path):
    """The -ci standard error estimates the sampling sd of the MQS pve
    estimator: across replicate phenotype draws (fixed genotypes) the
    empirical sd of pve-hat must match the analytic se to ~35%."""
    from gemma_tpu.models.mqs import calcq, calc_s, calc_vc_ss
    from gemma_tpu.models.ci import (read_ref, read_signed_beta,
                                     read_beta_rs_set, obtain_weight,
                                     update_snp_z, standardized_genotypes,
                                     xwz_passes, calc_ci_ss)
    from gemma_tpu.run import run_gs, run_ci

    rng = np.random.default_rng(21)
    n, p, h2 = 300, 250, 0.3
    maf = rng.uniform(0.15, 0.5, p)
    X = rng.binomial(2, maf[:, None], size=(p, n)).astype(float)
    Xc = X - X.mean(axis=1, keepdims=True)
    Xs = Xc / Xc.std(axis=1, keepdims=True)
    beta = rng.normal(0, 1, p)
    g = Xs.T @ beta / np.sqrt(p)
    g = g / g.std() * np.sqrt(h2)

    geno = tmp_path / "geno.txt"
    with open(geno, "w") as fh:
        for j in range(p):
            fh.write(f"rs{j}, A, T, " + ", ".join(map(str, X[j])) + "\n")
    W = np.ones((n, 1))

    # reference panel S from the fixed genotypes (shared by replicates)
    cats = np.zeros(p, dtype=np.int64)
    S, Svar, ns = calc_s(X, W, cats, 1)

    # empirical distribution of pve-hat over phenotype replicates
    pves = []
    for rep in range(60):
        y = g + rng.normal(0, np.sqrt(1 - h2), n)
        z = Xs @ (y - y.mean()) / (y.std() * np.sqrt(n))
        Vq, q, s_vec = calcq(200, cats, np.full(p, n), np.ones(p),
                             z * z, 1)
        res = calc_vc_ss(Vq, S, Svar, q, s_vec, float(n))
        pves.append(float(res.pve[0]))
    emp_sd = float(np.std(pves))

    # analytic se from the -ci pipeline on one replicate
    y = g + rng.normal(0, np.sqrt(1 - h2), n)
    z = Xs @ (y - y.mean()) / (y.std() * np.sqrt(n))
    np.savetxt(tmp_path / "pheno.txt", y)
    with open(tmp_path / "beta.txt", "w") as fh:
        fh.write("rs\ta1\ta0\tz\tn\n")
        for j in range(p):
            fh.write(f"rs{j}\tA\tT\t{z[j]:.6f}\t{n}\n")
    from gemma_tpu.cli import parse_args
    run_gs(parse_args(["-g", str(geno), "-p", str(tmp_path / "pheno.txt"),
                       "-gs", "-outdir", str(tmp_path), "-o", "ref"]))
    res = run_ci(parse_args(
        ["-g", str(geno), "-p", str(tmp_path / "pheno.txt"),
         "-beta", str(tmp_path / "beta.txt"),
         "-ref", str(tmp_path / "ref"), "-pve", f"{np.mean(pves):.4f}",
         "-ci", "1", "-outdir", str(tmp_path), "-o", "ci"]))
    se = float(res.se_pve[0])
    assert emp_sd > 0
    assert abs(se - emp_sd) / emp_sd < 0.35, (se, emp_sd)
