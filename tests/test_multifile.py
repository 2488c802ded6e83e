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


def test_km2_sparse_kinship_roundtrip(tmp_path):
    """-km 2 (id id value triples) reproduces the dense -km 1 run
    (ReadFile_kin k_mode 2, gemma_io.cpp:1246-1292)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.synth_biobank import write_plink
    from gemma_tpu.run import run_gk, run_lmm

    write_plink(str(tmp_path / "t"), n=120, p=300, h2=0.5, seed=9)
    out = str(tmp_path)
    common = f"-bfile {tmp_path}/t -outdir {out} -precision float64 -no-check"
    run_gk(parse_args((common + " -gk -o K").split()))

    K = np.loadtxt(tmp_path / "K.cXX.txt")
    ids = [line.split()[1] for line in open(tmp_path / "t.fam")]
    with open(tmp_path / "K.sparse.txt", "w") as fh:
        for i in range(len(ids)):
            for j in range(i + 1):
                fh.write(f"{ids[i]}\t{ids[j]}\t{K[i, j]:.10g}\n")

    d1 = run_lmm(parse_args(
        (common + f" -k {out}/K.cXX.txt -lmm 1 -o d").split()))
    s1 = run_lmm(parse_args(
        (common + f" -k {out}/K.sparse.txt -km 2 -lmm 1 -o s").split()))
    np.testing.assert_allclose(s1["stats"]["p_wald"], d1["stats"]["p_wald"],
                               rtol=1e-6, atol=1e-12)


def test_nind_truncates_first_n(tmp_path):
    """-nind keeps the FIRST N analyzed individuals in file order, not
    a random subset (trim_individuals, param.cpp:74-91)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.synth_biobank import write_plink
    write_plink(str(tmp_path / "t"), n=60, p=40, h2=0.5, seed=4)
    cfg = parse_args(f"-bfile {tmp_path}/t -nind 25 -notsnp".split())
    ds = load_dataset(cfg)
    assert ds.ni_test == 25
    assert np.flatnonzero(ds.indicator_idv).max() <= 24 or \
        np.array_equal(np.flatnonzero(ds.indicator_idv),
                       np.flatnonzero(ds.indicator_idv))
    # first 25 analyzed rows in file order
    full = parse_args(f"-bfile {tmp_path}/t -notsnp".split())
    ds_full = load_dataset(full)
    first25 = np.flatnonzero(ds_full.indicator_idv)[:25]
    np.testing.assert_array_equal(np.flatnonzero(ds.indicator_idv), first25)


def test_gk2_standardized_kinship(tmp_path):
    """-gk 2 builds the standardized relatedness matrix: each SNP is
    centered AND scaled by 1/sd before the X'X/p accumulation
    (BimbamKin -gk 2 branch, gemma_io.cpp:1535-1538); mean diagonal
    is ~1 and the matrix matches the dense numpy computation."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.synth_biobank import write_plink
    from gemma_tpu.run import run_gk

    write_plink(str(tmp_path / "t"), n=80, p=200, h2=0.5, seed=13)
    out = str(tmp_path)
    cfg = parse_args(f"-bfile {tmp_path}/t -gk 2 -notsnp -no-check "
                     f"-outdir {out} -precision float64 -o S".split())
    K = run_gk(cfg)
    assert (tmp_path / "S.sXX.txt").exists()

    ds = load_dataset(parse_args(
        f"-bfile {tmp_path}/t -notsnp -precision float64".split()))
    X = ds.geno.X[ds.qc.indicator_snp]          # over ALL individuals
    mean = np.nanmean(X, axis=1)
    filled = np.where(np.isnan(X), mean[:, None], X)
    Xc = filled - mean[:, None]
    sd = Xc.std(axis=1)
    Xs = Xc / np.where(sd > 0, sd, 1.0)[:, None]
    K_ref = Xs.T @ Xs / Xs.shape[0]
    np.testing.assert_allclose(K, K_ref, atol=1e-8)
    assert abs(np.mean(np.diag(K)) - 1.0) < 1e-6
