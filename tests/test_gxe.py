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


def _simulate_mv_gxe(tmp_path, n=150, p=80, seed=0, effect=1.2):
    """Two phenotypes, binary environment, a true interaction at rs0."""
    rng = np.random.default_rng(seed)
    X = rng.binomial(2, 0.35, size=(p, n)).astype(float)
    env = rng.binomial(1, 0.5, n).astype(float)
    Xc = X - X.mean(axis=1, keepdims=True)
    K = Xc.T @ Xc / p
    K /= np.mean(np.diag(K))
    L = np.linalg.cholesky(K + 1e-6 * np.eye(n))
    Y = np.empty((n, 2))
    for t in range(2):
        u = L @ rng.normal(size=n) * 0.5
        Y[:, t] = u + rng.normal(size=n) * 0.8
        Y[:, t] += effect * X[0] * env       # interaction on both traits

    geno = tmp_path / "geno.txt"
    with open(geno, "w") as fh:
        for j in range(p):
            fh.write(f"rs{j}, A, T, " + ", ".join(map(str, X[j])) + "\n")
    np.savetxt(tmp_path / "pheno.txt", Y)
    np.savetxt(tmp_path / "env.txt", env)
    np.savetxt(tmp_path / "K.txt", K)
    return geno


def test_mvlmm_gxe_detects_interaction(tmp_path):
    from gemma_tpu.run import run_mvlmm
    geno = _simulate_mv_gxe(tmp_path)
    cfg = parse_args(
        [ "-g", str(geno), "-p", str(tmp_path / "pheno.txt"),
          "-gxe", str(tmp_path / "env.txt"),
          "-k", str(tmp_path / "K.txt"), "-lmm", "4",
          "-n", "1", "2", "-no-check",
          "-outdir", str(tmp_path), "-o", "mvgxe"])
    res = run_mvlmm(cfg)
    st = res["stats"]
    for key in ("p_wald", "p_lrt", "p_score"):
        pvals = st[key]
        assert np.all(np.isfinite(pvals)), key
        assert np.all((pvals >= 0) & (pvals <= 1)), key
        # the planted interaction is the top hit, overwhelmingly small
        assert pvals[0] < 1e-4, (key, pvals[0])
        assert np.median(pvals[1:]) > 0.05, key
    # the three tests agree on ordering at the top
    assert st["p_wald"][0] < np.partition(st["p_wald"][1:], 1)[1]
    out = tmp_path / "mvgxe.assoc.txt"
    assert out.exists()
    header = out.read_text().splitlines()[0]
    assert "p_wald" in header and "beta_1" in header
