"""GxE interaction LMM test on BXD (covariates file doubles as env)."""

import os

import numpy as np
import pytest

from gemma_tpu.cli import parse_args
from gemma_tpu.run import batch_run, run_lmm

EXAMPLE = "/root/reference/example"


@pytest.mark.skipif(not os.path.exists(f"{EXAMPLE}/BXD_geno.txt.gz"),
                    reason="BXD data not available")
def test_gxe_lmm_runs(tmp_path):
    out = str(tmp_path)
    # single-column env file from the first covariate column
    env_file = str(tmp_path / "env.txt")
    with open(f"{EXAMPLE}/BXD_covariates.txt") as fh, \
         open(env_file, "w") as eh:
        for line in fh:
            eh.write(line.split()[0] + "\n")

    common = (f"-g {EXAMPLE}/BXD_geno.txt.gz -p {EXAMPLE}/BXD_pheno.txt "
              f"-a {EXAMPLE}/BXD_snps.txt -outdir {out} -precision float64 "
              f"-maf 0.1 -no-check")
    batch_run(parse_args((common + " -gk -o K").split()))
    cfg = parse_args(
        (common + f" -k {out}/K.cXX.txt -lmm 1 -gxe {env_file} "
         "-o gxe").split())
    res = run_lmm(cfg)
    p = res["stats"]["p_wald"]
    finite = np.isfinite(p)
    assert finite.mean() > 0.95
    assert np.all((p[finite] >= 0) & (p[finite] <= 1))
    # mostly-null interactions: p should not be systematically tiny
    assert np.median(p[finite]) > 0.1
