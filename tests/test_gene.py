"""Gene-expression association (-gene) end-to-end test on BXD."""

import os

import numpy as np
import pytest

from gemma_tpu.cli import parse_args
from gemma_tpu.run import batch_run, run_lmm

EXAMPLE = "/root/reference/example"


@pytest.mark.skipif(not os.path.exists(f"{EXAMPLE}/BXD_geno.txt.gz"),
                    reason="BXD data not available")
def test_gene_mode_runs(tmp_path):
    out = str(tmp_path)
    rng = np.random.default_rng(0)

    # synthesize a small expression matrix over the BXD individuals
    n_total = sum(1 for _ in open(f"{EXAMPLE}/BXD_pheno.txt"))
    pheno = [line.split()[0] for line in open(f"{EXAMPLE}/BXD_pheno.txt")]
    yv = np.array([np.nan if v == "NA" else float(v) for v in pheno])
    yz = (yv - np.nanmean(yv)) / np.nanstd(yv)   # standardized signal
    gene_file = str(tmp_path / "genes.txt")
    with open(gene_file, "w") as fh:
        fh.write("geneID\t" + "\t".join(f"i{i}" for i in range(n_total)) +
                 "\n")
        for g in range(12):
            expr = rng.normal(size=n_total)
            if g < 3:   # correlated genes
                expr += 2.0 * np.nan_to_num(yz)
            fh.write(f"gene{g}\t" + "\t".join(f"{v:.5f}" for v in expr) +
                     "\n")

    common = (f"-g {EXAMPLE}/BXD_geno.txt.gz -p {EXAMPLE}/BXD_pheno.txt "
              f"-a {EXAMPLE}/BXD_snps.txt -outdir {out} -precision float64 "
              f"-maf 0.1 -no-check")
    batch_run(parse_args((common + " -gk -o K").split()))
    cfg = parse_args(
        (common + f" -k {out}/K.cXX.txt -lmm 1 -gene {gene_file} "
         "-o gene").split())
    res = run_lmm(cfg)

    p = res["stats"]["p_wald"]
    assert len(p) == 12
    assert np.all(np.isfinite(p))
    # the 3 correlated genes should be the most significant
    assert set(np.argsort(p)[:3]) == {0, 1, 2}
    header = open(f"{out}/gene.assoc.txt").readline()
    assert header.startswith("geneID\t")


def test_lm_gene_matches_ols(tmp_path):
    """-lm with -gene: per-gene OLS where the phenotype is the
    predictor; cross-check beta/p against statsmodels-free dense OLS."""
    import jax.numpy as jnp
    import scipy.stats
    from gemma_tpu.models.lm import lm_gene_block

    rng = np.random.default_rng(3)
    n, G = 80, 12
    W = np.column_stack([np.ones(n), rng.normal(size=n)])
    x = rng.normal(size=n)
    Y = rng.normal(size=(G, n))
    Y[0] += 0.8 * x                       # one associated gene

    st = lm_gene_block(jnp.asarray(W), jnp.asarray(x), jnp.asarray(Y),
                       mode=54)
    # dense reference: regress each gene on [W, x]
    for g in range(G):
        Xd = np.column_stack([W, x])
        coef, res, *_ = np.linalg.lstsq(Xd, Y[g], rcond=None)
        dfr = n - Xd.shape[1]
        resid = Y[g] - Xd @ coef
        sigma2 = resid @ resid / dfr
        cov = sigma2 * np.linalg.inv(Xd.T @ Xd)
        tstat = coef[-1] / np.sqrt(cov[-1, -1])
        p_ref = 2 * scipy.stats.t.sf(abs(tstat), dfr)
        np.testing.assert_allclose(float(st.beta[g]), coef[-1], rtol=1e-8)
        np.testing.assert_allclose(float(st.p_wald[g]), p_ref, rtol=1e-6)
    assert float(st.p_wald[0]) < 1e-4
