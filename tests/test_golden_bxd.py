"""End-to-end golden tests on the BXD dataset.

Replicates the reference regression suite (test/dev_tests.rb:26-55):
kinship from BXD genotypes with covariates, then -lmm 2 (LRT) and
-lmm 9 (LRT+score), asserting the same output cells at the same 1e-3
tolerance GEMMA's own CI uses.  All values compare against numbers the
reference produces with `-no-check -maf 0.1`.
"""

import os

import numpy as np
import pytest

from gemma_tpu.cli import parse_args
from gemma_tpu.run import batch_run

EXAMPLE = "/root/reference/example"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{EXAMPLE}/BXD_geno.txt.gz"),
    reason="BXD example data not available")


def _read_table(path):
    with open(path) as fh:
        lines = [ln.rstrip("\n").split("\t") for ln in fh]
    return lines[0], lines[1:]


def _col(header, rows, name):
    j = header.index(name)
    return np.array([float(r[j]) for r in rows])


@pytest.fixture(scope="module")
def bxd_outputs(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("bxd"))
    common = (f"-g {EXAMPLE}/BXD_geno.txt.gz -p {EXAMPLE}/BXD_pheno.txt "
              f"-c {EXAMPLE}/BXD_covariates2.txt -a {EXAMPLE}/BXD_snps.txt "
              f"-outdir {out} -precision float64")
    batch_run(parse_args((common + " -gk -o BXD").split()))
    batch_run(parse_args(
        (common + f" -k {out}/BXD.cXX.txt -lmm 2 -no-check -maf 0.1 "
         "-o BXDLMM").split()))
    batch_run(parse_args(
        (common + f" -k {out}/BXD.cXX.txt -lmm 9 -no-check -maf 0.1 "
         "-o BXDLMM9").split()))
    return out


def test_bxd_kinship_wrote_full_matrix(bxd_outputs):
    K = np.loadtxt(f"{bxd_outputs}/BXD.cXX.txt")
    assert K.shape[0] == K.shape[1]
    # kinship covers ALL individuals in the pheno file (ni_total)
    n_total = sum(1 for _ in open(f"{EXAMPLE}/BXD_pheno.txt"))
    assert K.shape[0] == n_total
    np.testing.assert_allclose(K, K.T, atol=1e-12)


def test_bxd_lmm2_golden(bxd_outputs):
    """dev_tests.rb:42-43 — p_lrt cell and max."""
    header, rows = _read_table(f"{bxd_outputs}/BXDLMM.assoc.txt")
    # expect [2, 9]: file line index 2 → data row 1 (0-based), column 9
    assert abs(float(rows[1][9]) - 1.234747e-01) < 1e-3
    p_lrt = _col(header, rows, "p_lrt")
    assert abs(p_lrt.max() - 9.997119e-01) < 1e-3


def test_bxd_lmm9_golden(bxd_outputs):
    """dev_tests.rb:53-54 — max l_mle and max p_lrt."""
    header, rows = _read_table(f"{bxd_outputs}/BXDLMM9.assoc.txt")
    l_mle = _col(header, rows, "l_mle")
    p_lrt = _col(header, rows, "p_lrt")
    # the reference asserts the l_mle value on the row with max l_mle
    assert abs(l_mle.max() - 0.7531109) < 1e-3
    assert abs(p_lrt.max() - 9.997119e-01) < 1e-3


def test_lmm5_residuals_only(tmp_path):
    """-lmm 5 writes residU/residE and no assoc.txt
    (gemma.cpp:2756-2796 runs no association pass in mode 5)."""
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import run_gk, run_lmm
    out = str(tmp_path)
    common = (f"-g {EXAMPLE}/BXD_geno.txt.gz -p {EXAMPLE}/BXD_pheno.txt "
              f"-outdir {out} -precision float64 -no-check")
    run_gk(parse_args((common + " -gk -o K").split()))
    run_lmm(parse_args((common + f" -k {out}/K.cXX.txt -lmm 5 -o r5").split()))
    assert (tmp_path / "r5.residU.txt").exists()
    assert (tmp_path / "r5.residE.txt").exists()
    assert not (tmp_path / "r5.assoc.txt").exists()
    u = np.loadtxt(tmp_path / "r5.residU.txt")
    e = np.loadtxt(tmp_path / "r5.residE.txt")
    # u + e reconstructs the null-model residual y - W beta
    assert u.shape == e.shape
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(e))


def test_widv_unit_weights_noop(tmp_path):
    """-widv with all-ones weights reproduces the unweighted analysis
    exactly (gemma.cpp:2599-2644 reduces to the identity transform)."""
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import run_gk, run_lmm
    out = str(tmp_path)
    common = (f"-g {EXAMPLE}/BXD_geno.txt.gz -p {EXAMPLE}/BXD_pheno.txt "
              f"-outdir {out} -precision float64 -no-check")
    run_gk(parse_args((common + " -gk -o K").split()))

    res0 = run_lmm(parse_args(
        (common + f" -k {out}/K.cXX.txt -lmm 1 -o a0").split()))

    n_total = len(open(f"{EXAMPLE}/BXD_pheno.txt").readlines())
    wfile = tmp_path / "w.txt"
    wfile.write_text("1.0\n" * n_total)
    res1 = run_lmm(parse_args(
        (common + f" -k {out}/K.cXX.txt -lmm 1 -widv {wfile} "
         f"-o a1").split()))

    np.testing.assert_allclose(res1["stats"]["p_wald"],
                               res0["stats"]["p_wald"], rtol=1e-8)

    # heterogeneous weights: run completes with valid statistics
    rng = np.random.default_rng(0)
    wfile2 = tmp_path / "w2.txt"
    wfile2.write_text("".join(f"{v:.4f}\n"
                              for v in rng.uniform(0.5, 2.0, n_total)))
    res2 = run_lmm(parse_args(
        (common + f" -k {out}/K.cXX.txt -lmm 1 -widv {wfile2} "
         f"-o a2").split()))
    p = res2["stats"]["p_wald"]
    ok = np.isfinite(p)
    assert ok.mean() > 0.9
    assert np.all((p[ok] >= 0) & (p[ok] <= 1))
    # weights change the fit
    assert not np.allclose(p, res0["stats"]["p_wald"])


def test_eigen_staging_roundtrip(tmp_path):
    """The file-staged pipeline (SURVEY §5.4): -gk → -eigen → -lmm with
    -u/-d reproduces the direct -lmm -k run (gemma.cpp:2648-2668)."""
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import run_gk, run_eigen, run_lmm
    out = str(tmp_path)
    common = (f"-g {EXAMPLE}/BXD_geno.txt.gz -p {EXAMPLE}/BXD_pheno.txt "
              f"-outdir {out} -precision float64 -no-check")
    run_gk(parse_args((common + " -gk -o K").split()))
    run_eigen(parse_args((common + f" -k {out}/K.cXX.txt -eigen "
                          "-o E").split()))
    assert (tmp_path / "E.eigenU.txt").exists()
    assert (tmp_path / "E.eigenD.txt").exists()

    direct = run_lmm(parse_args(
        (common + f" -k {out}/K.cXX.txt -lmm 1 -o d1").split()))
    staged = run_lmm(parse_args(
        (common + f" -u {out}/E.eigenU.txt -d {out}/E.eigenD.txt "
         f"-lmm 1 -o s1").split()))
    np.testing.assert_allclose(staged["stats"]["p_wald"],
                               direct["stats"]["p_wald"],
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(staged["stats"]["beta"],
                               direct["stats"]["beta"], rtol=1e-6)


def test_loco_excludes_chromosome(tmp_path):
    """LOCO: -gk -loco 1 builds the kinship from all chromosomes but 1
    (ksnps), and -lmm -loco 1 tests only chromosome-1 SNPs (gwasnps)
    (LOCO_set_Snps, param.cpp:48-66; dev_tests.rb:57-77)."""
    from gemma_tpu.cli import parse_args
    from gemma_tpu.run import run_gk, run_lmm
    out = str(tmp_path)
    common = (f"-g {EXAMPLE}/BXD_geno.txt.gz -p {EXAMPLE}/BXD_pheno.txt "
              f"-a {EXAMPLE}/BXD_snps.txt -outdir {out} "
              f"-precision float64 -no-check")
    run_gk(parse_args((common + " -gk -o Kfull").split()))
    run_gk(parse_args((common + " -gk -loco 1 -o K1").split()))
    Kf = np.loadtxt(tmp_path / "Kfull.cXX.txt")
    K1 = np.loadtxt(tmp_path / "K1.cXX.txt")
    assert Kf.shape == K1.shape
    assert not np.allclose(Kf, K1)          # chr 1 SNPs excluded

    res = run_lmm(parse_args(
        (common + f" -k {out}/K1.cXX.txt -lmm 2 -loco 1 -o a1").split()))
    lines = (tmp_path / "a1.assoc.txt").read_text().splitlines()[1:]
    chrs = {ln.split("\t")[0] for ln in lines}
    assert chrs == {"1"}                     # only chromosome 1 tested
    p = res["stats"]["p_lrt"]
    ok = np.isfinite(p)
    assert ok.mean() > 0.9
    assert np.all((p[ok] >= 0) & (p[ok] <= 1))
