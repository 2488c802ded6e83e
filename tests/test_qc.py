"""SNP quality-control filters (ReadFile_geno/bed QC,
gemma_io.cpp:715-850 / 1007-1046)."""

import numpy as np

from gemma_tpu.io.qc import run_qc
from gemma_tpu.io.hwe import hwe_exact_p


def _X(rows):
    return np.asarray(rows, dtype=np.float64)


def test_missingness_filter():
    n = 20
    x_ok = np.tile([0.0, 1.0, 2.0, 1.0], 5)
    x_bad = x_ok.copy()
    x_bad[:2] = np.nan                      # 10% missing > 5%
    W = np.ones((n, 1))
    qc = run_qc(_X([x_ok, x_bad]), W, miss_level=0.05, maf_level=-1)
    assert qc.indicator_snp.tolist() == [True, False]
    assert qc.n_miss.tolist() == [0, 2]


def test_maf_filter_and_notsnp():
    n = 40
    rare = np.zeros(n); rare[0] = 1.0       # maf = 1/80 < 0.01... = 0.0125
    rare2 = np.zeros(n)
    rare2[0] = 0.5                          # maf = 0.00625 < 0.01
    common = np.tile([0.0, 1.0], n // 2)
    W = np.ones((n, 1))
    qc = run_qc(_X([rare2, common]), W, maf_level=0.01)
    assert qc.indicator_snp.tolist() == [False, True]
    # -notsnp (maf_level = -1) disables the filter
    qc2 = run_qc(_X([rare2, common]), W, maf_level=-1)
    assert qc2.indicator_snp.tolist() == [True, True]


def test_monomorphic_dropped():
    n = 30
    mono = np.full(n, 1.0)
    poly = np.tile([0.0, 2.0], n // 2)
    W = np.ones((n, 1))
    qc = run_qc(_X([mono, poly]), W, maf_level=-1)
    assert qc.indicator_snp.tolist() == [False, True]


def test_hwe_exact_matches_wigginton():
    """Wigginton, Cutler & Abecasis (2005) worked example: 1000
    individuals, 57 het / 14 rare-hom gives P ~ 0 vs the calibrated
    case; spot values cross-checked against R's HardyWeinberg."""
    # balanced case: perfectly HWE-consistent counts → p near 1
    assert hwe_exact_p(25, 25, 50) > 0.5
    # strong excess homozygosity → tiny p
    assert hwe_exact_p(50, 50, 0) < 1e-20
    # symmetric in the homozygote labels
    np.testing.assert_allclose(hwe_exact_p(30, 10, 40),
                               hwe_exact_p(10, 30, 40), rtol=1e-12)


def test_hwe_filter_applies():
    n = 100
    # 50/50 hom split with no hets: max HWE violation
    bad = np.concatenate([np.zeros(n // 2), np.full(n // 2, 2.0)])
    good = np.tile([0.0, 1.0, 1.0, 2.0], n // 4)
    W = np.ones((n, 1))
    qc = run_qc(_X([bad, good]), W, hwe_level=1e-3, maf_level=0.01)
    assert qc.indicator_snp.tolist() == [False, True]
    # hwe_level 0 disables (default)
    qc2 = run_qc(_X([bad, good]), W, hwe_level=0.0, maf_level=0.01)
    assert qc2.indicator_snp.tolist() == [True, True]


def test_r2_covariate_filter():
    rng = np.random.default_rng(0)
    n = 60
    cov = rng.normal(size=n)
    W = np.column_stack([np.ones(n), cov])
    # SNP perfectly collinear with the covariate span vs an
    # independent one
    collinear = 1.0 + 0.5 * cov
    indep = rng.binomial(2, 0.4, n).astype(float)
    qc = run_qc(_X([collinear, indep]), W, maf_level=-1, r2_level=0.9999)
    assert qc.indicator_snp.tolist() == [False, True]


def test_plink_vs_bimbam_polymorphism_rule():
    n = 20
    # fractional dosages, all in (0.5, 1.5): one genotype CLASS but
    # polymorphic VALUES — BIMBAM keeps it, PLINK's class rule drops it
    frac = np.tile([0.9, 1.1], n // 2)
    W = np.ones((n, 1))
    qc_b = run_qc(_X([frac]), W, maf_level=-1, plink_poly=False)
    qc_p = run_qc(_X([frac]), W, maf_level=-1, plink_poly=True)
    assert qc_b.indicator_snp.tolist() == [True]
    assert qc_p.indicator_snp.tolist() == [False]
