"""Multi-file genotype inputs (-mg / -mbfile) and the lazy .bed backend."""

import numpy as np
import pytest

from gemma_tpu.cli import parse_args
from gemma_tpu.dataset import load_dataset


def _write_bimbam(path, X, start):
    with open(path, "w") as fh:
        for j in range(X.shape[0]):
            fh.write(f"rs{start + j}, A, T, " +
                     ", ".join(map(str, X[j])) + "\n")


def test_mg_concatenates_snp_axis(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    X1 = rng.binomial(2, 0.4, size=(30, n)).astype(float)
    X2 = rng.binomial(2, 0.4, size=(20, n)).astype(float)
    _write_bimbam(tmp_path / "a.txt", X1, 0)
    _write_bimbam(tmp_path / "b.txt", X2, 30)
    np.savetxt(tmp_path / "pheno.txt", rng.normal(size=n))
    mg = tmp_path / "list.txt"
    mg.write_text(f"{tmp_path}/a.txt\n{tmp_path}/b.txt\n")

    cfg = parse_args(["-mg", str(mg), "-p", str(tmp_path / "pheno.txt"),
                      "-notsnp"])
    ds = load_dataset(cfg)
    assert ds.geno.n_snps == 50
    assert list(ds.geno.snps.rs[:2]) == ["rs0", "rs1"]
    assert list(ds.geno.snps.rs[-1:]) == ["rs49"]
    np.testing.assert_array_equal(ds.geno.block([0, 30]),
                                  np.stack([X1[0], X2[0]]))

    # single-file -g on the concatenation gives identical QC
    _write_bimbam(tmp_path / "all.txt", np.vstack([X1, X2]), 0)
    cfg1 = parse_args(["-g", str(tmp_path / "all.txt"),
                       "-p", str(tmp_path / "pheno.txt"), "-notsnp"])
    ds1 = load_dataset(cfg1)
    np.testing.assert_array_equal(ds.qc.indicator_snp,
                                  ds1.qc.indicator_snp)
    np.testing.assert_array_equal(ds.qc.maf, ds1.qc.maf)


def test_mg_individual_mismatch_raises(tmp_path):
    rng = np.random.default_rng(1)
    _write_bimbam(tmp_path / "a.txt",
                  rng.binomial(2, 0.4, size=(5, 40)).astype(float), 0)
    _write_bimbam(tmp_path / "b.txt",
                  rng.binomial(2, 0.4, size=(5, 41)).astype(float), 5)
    np.savetxt(tmp_path / "pheno.txt", rng.normal(size=40))
    mg = tmp_path / "list.txt"
    mg.write_text(f"{tmp_path}/a.txt\n{tmp_path}/b.txt\n")
    cfg = parse_args(["-mg", str(mg), "-p", str(tmp_path / "pheno.txt")])
    with pytest.raises(ValueError, match="disagree"):
        load_dataset(cfg)


def test_lazy_bed_block_equals_dense(tmp_path):
    """The streaming .bed backend decodes blocks identical to the
    one-shot dense decode, without materialising X."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.synth_biobank import write_plink
    from gemma_tpu.io.plink import read_plink, read_bed_matrix

    write_plink(str(tmp_path / "t"), n=37, p=25, h2=0.5, seed=3)
    geno, ids, pheno = read_plink(str(tmp_path / "t"))
    assert geno._X is None                      # nothing materialised
    dense = read_bed_matrix(str(tmp_path / "t.bed"), 37, 25)
    sel = np.array([0, 7, 24])
    np.testing.assert_array_equal(geno.block(sel), dense[sel])
    assert geno._X is None
    np.testing.assert_array_equal(geno.X, dense)
