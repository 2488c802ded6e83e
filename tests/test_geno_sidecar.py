"""Genotype parse cache (binary sidecar) + int8 QC-stat fast paths.

The sidecar must be EXACT: a run that hits the cache has to produce
bit-identical dosages and identical QC decisions to the run that
parsed the text (unlike the kinship text sidecar, which documents a
%.10g round-trip deviation).  Covers: hard-call int8 storage,
fractional float64 storage, invalidation on source change, stored-stat
mask matching, and qc_stats_from_i8 equivalence with the float sweep.
"""

import gzip
import os

import numpy as np
import pytest

from gemma_tpu.io.bimbam import (read_bimbam_genotypes, Int8Genotypes,
                                 _sidecar_path)
from gemma_tpu.io.qc import run_qc, run_qc_blocked, qc_stats_from_i8


def _write_bimbam(path, X, fractional=False):
    op = gzip.open if str(path).endswith(".gz") else open
    with op(path, "wt") as fh:
        for j, row in enumerate(X):
            vals = []
            for v in row:
                if np.isnan(v):
                    vals.append("NA")
                elif fractional:
                    vals.append(f"{v:.6f}")
                else:
                    vals.append(f"{int(v)}")
            fh.write(f"rs{j}, A, T, " + ", ".join(vals) + "\n")


def _rand_X(rng, p=40, n=25, fractional=False):
    X = rng.binomial(2, 0.3, size=(p, n)).astype(np.float64)
    if fractional:
        X += rng.uniform(0, 0.25, size=X.shape)
    X[rng.random(X.shape) < 0.1] = np.nan
    X[3] = 1.0          # monomorphic row exercises the poly filter
    return X


def test_sidecar_hard_calls_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    X = _rand_X(rng)
    path = str(tmp_path / "g.txt.gz")
    _write_bimbam(path, X)
    mask = np.ones(X.shape[1], bool)
    mask[:3] = False

    g1 = read_bimbam_genotypes(path, stat_mask=mask)
    assert os.path.exists(_sidecar_path(path))
    g2 = read_bimbam_genotypes(path, stat_mask=mask)
    assert isinstance(g2, Int8Genotypes)
    # bit-identical dosages and metadata through the cache
    np.testing.assert_array_equal(
        np.isnan(g1.X), np.isnan(g2.X))
    np.testing.assert_array_equal(
        np.nan_to_num(g1.X), np.nan_to_num(g2.X))
    assert list(g1.snps.rs) == list(g2.snps.rs)
    assert list(g1.snps.a_minor) == list(g2.snps.a_minor)
    # identical QC decisions (stored stats vs fresh parse)
    W = np.ones((int(mask.sum()), 1))
    q1 = run_qc_blocked(g1, mask, W)
    q2 = run_qc_blocked(g2, mask, W)
    np.testing.assert_array_equal(q1.indicator_snp, q2.indicator_snp)
    np.testing.assert_array_equal(q1.n_miss, q2.n_miss)
    np.testing.assert_allclose(q1.maf, q2.maf, rtol=0, atol=0)


def test_sidecar_fractional_exact(tmp_path):
    rng = np.random.default_rng(1)
    X = _rand_X(rng, fractional=True)
    path = str(tmp_path / "g.txt")
    _write_bimbam(path, X, fractional=True)
    g1 = read_bimbam_genotypes(path)
    g2 = read_bimbam_genotypes(path)
    assert not isinstance(g2, Int8Genotypes)   # stored float64
    np.testing.assert_array_equal(
        np.nan_to_num(g1.X), np.nan_to_num(g2.X))


def test_sidecar_invalidation(tmp_path):
    rng = np.random.default_rng(2)
    X = _rand_X(rng)
    path = str(tmp_path / "g.txt")
    _write_bimbam(path, X)
    g1 = read_bimbam_genotypes(path)
    # rewrite the source with different data: cache must NOT serve it
    X2 = _rand_X(rng)
    _write_bimbam(path, X2)
    os.utime(path, ns=(os.stat(path).st_atime_ns,
                       os.stat(path).st_mtime_ns + 7))
    g2 = read_bimbam_genotypes(path)
    assert not np.array_equal(np.nan_to_num(g1.X), np.nan_to_num(g2.X))
    np.testing.assert_array_equal(
        np.nan_to_num(g2.X), np.nan_to_num(
            np.where(np.isnan(X2), np.nan, X2)))


def test_sidecar_stat_mask_mismatch_recomputes(tmp_path):
    rng = np.random.default_rng(3)
    X = _rand_X(rng)
    path = str(tmp_path / "g.txt")
    _write_bimbam(path, X)
    mask_a = np.ones(X.shape[1], bool)
    read_bimbam_genotypes(path, stat_mask=mask_a)       # writes sidecar
    mask_b = mask_a.copy()
    mask_b[5:9] = False
    g = read_bimbam_genotypes(path, stat_mask=mask_b)   # cache hit
    W = np.ones((int(mask_b.sum()), 1))
    q_cache = run_qc_blocked(g, mask_b, W)
    # ground truth: float sweep over the text-parsed matrix
    os.environ["GEMMA_TPU_GENO_SIDECAR"] = "0"
    try:
        g_plain = read_bimbam_genotypes(path)
    finally:
        os.environ.pop("GEMMA_TPU_GENO_SIDECAR")
    q_true = run_qc(g_plain.X[:, mask_b], W)
    np.testing.assert_array_equal(q_cache.indicator_snp,
                                  q_true.indicator_snp)
    np.testing.assert_array_equal(q_cache.n_miss, q_true.n_miss)


def test_qc_stats_from_i8_matches_float_sweep():
    rng = np.random.default_rng(4)
    X = _rand_X(rng, p=60, n=37)
    X[7] = np.nan                      # all-missing row
    Xi8 = np.where(np.isnan(X), -1, X).astype(np.int8)
    mask = rng.random(37) < 0.8
    stats = qc_stats_from_i8(Xi8, mask)
    Xm = X[:, mask]
    miss = np.isnan(Xm)
    np.testing.assert_array_equal(stats[:, 0], miss.sum(axis=1))
    np.testing.assert_array_equal(stats[:, 1],
                                  np.where(miss, 0, Xm).sum(axis=1))
    np.testing.assert_array_equal(
        stats[:, 2], ((Xm >= 0) & (Xm <= 0.5) & ~miss).sum(axis=1))
    np.testing.assert_array_equal(
        stats[:, 3], ((Xm > 0.5) & (Xm < 1.5) & ~miss).sum(axis=1))
    np.testing.assert_array_equal(
        stats[:, 4], ((Xm >= 1.5) & (Xm <= 2.0) & ~miss).sum(axis=1))
    obs_rows = ~miss.all(axis=1)
    np.testing.assert_array_equal(
        stats[obs_rows, 5],
        np.nanmin(np.where(miss, np.nan, Xm)[obs_rows], axis=1))
    np.testing.assert_array_equal(
        stats[obs_rows, 6],
        np.nanmax(np.where(miss, np.nan, Xm)[obs_rows], axis=1))
    assert (stats[~obs_rows, 5] > stats[~obs_rows, 6]).all()
    np.testing.assert_array_equal(
        stats[:, 7], np.where(miss, 0, Xm * Xm).sum(axis=1))


def test_plink_qc_stats_fast_path(tmp_path):
    """LazyBedGenotypes.qc_stats (int8 counting) must reproduce the
    float-sweep run_qc decisions on a synthetic .bed."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from synth_biobank import write_plink
    from gemma_tpu.io.plink import read_plink

    prefix = str(tmp_path / "s")
    write_plink(prefix, 64, 128, h2=0.5, seed=11)
    geno, ids, pheno = read_plink(prefix)
    mask = np.ones(64, bool)
    mask[::7] = False
    W = np.ones((int(mask.sum()), 1))
    q_fast = run_qc_blocked(geno, mask, W, plink_poly=True)
    q_true = run_qc(geno.X[:, mask], W, plink_poly=True)
    np.testing.assert_array_equal(q_fast.indicator_snp,
                                  q_true.indicator_snp)
    np.testing.assert_array_equal(q_fast.n_miss, q_true.n_miss)
    np.testing.assert_allclose(q_fast.maf, q_true.maf)
