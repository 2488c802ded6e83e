"""Fused native QC statistics must reproduce the numpy QC sweep
exactly (same filter chain, gemma_io.cpp:805-853 semantics)."""

import gzip
import os

import numpy as np
import pytest

from gemma_tpu.io import native
from gemma_tpu.io.qc import run_qc, run_qc_from_stats


def _write_bimbam(path, X, rs=None):
    p, n = X.shape
    with gzip.open(path, "wt") as fh:
        for j in range(p):
            vals = [("NA" if np.isnan(v) else f"{v:g}") for v in X[j]]
            fh.write(f"{rs[j] if rs else f'rs{j}'}, A, T, "
                     + ", ".join(vals) + "\n")


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_fused_stats_match_numpy_qc(tmp_path):
    rng = np.random.default_rng(0)
    p, n = 400, 120
    # mixed dosages: integers, fractional, missing; some monomorphic
    X = rng.binomial(2, rng.uniform(0.02, 0.5, (p, 1)),
                     (p, n)).astype(float)
    X[rng.random((p, n)) < 0.08] = np.nan
    frac = rng.random((p, n)) < 0.2
    X[frac] = np.round(rng.uniform(0, 2, (p, n)), 3)[frac]
    X[7] = 1.0                       # monomorphic
    X[11] = np.nan                   # all missing
    path = str(tmp_path / "g.txt.gz")
    _write_bimbam(path, X)

    mask = np.ones(n, bool)
    mask[::7] = False                # analyzed subset
    parsed = native.parse_bimbam(path, stat_mask=mask)
    assert parsed is not None and len(parsed) == 5
    _, _, _, Xp, stats = parsed
    np.testing.assert_allclose(Xp, X, atol=1e-9, equal_nan=True)

    W = np.ones((int(mask.sum()), 1))
    ref = run_qc(X[:, mask], W, hwe_level=1e-3)
    got = run_qc_from_stats(stats, int(mask.sum()), W, hwe_level=1e-3)
    np.testing.assert_array_equal(got.indicator_snp, ref.indicator_snp)
    np.testing.assert_array_equal(got.n_miss, ref.n_miss)
    np.testing.assert_allclose(got.maf, ref.maf, atol=1e-12)
    np.testing.assert_array_equal(got.n_idv, ref.n_idv)

    # covariate-r2 branch (needs real genotypes): same keep set
    W2 = np.column_stack([np.ones(int(mask.sum())),
                          X[0, mask] + rng.normal(0, 1e-3, int(mask.sum()))])
    W2 = np.nan_to_num(W2)

    class _G:
        def block(self, sel):
            return X[sel]

    ref2 = run_qc(X[:, mask], W2)
    got2 = run_qc_from_stats(stats, int(mask.sum()), W2, geno=_G(),
                             indicator_idv=mask)
    np.testing.assert_array_equal(got2.indicator_snp, ref2.indicator_snp)


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_fast_dosage_parser_exotic_tokens(tmp_path):
    """Exponent / overlong tokens fall back to strtod and parse
    exactly; plain decimals match strtod to the double."""
    vals = ["1", "0.52", "2.000", "1e-3", "0.12345678901234567890",
            "-0.5", "+1.5", ".5", "2."]
    path = str(tmp_path / "t.txt")
    with open(path, "w") as fh:
        fh.write("rs1, A, T, " + ", ".join(vals) + "\n")
    parsed = native.parse_bimbam(path)
    _, _, _, X = parsed
    expect = np.array([float(v) for v in vals])
    np.testing.assert_array_equal(X[0], expect)


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_streaming_qc_stats_pass(tmp_path):
    from gemma_tpu.io.bimbam import StreamingBimbamGenotypes
    rng = np.random.default_rng(1)
    X = rng.binomial(2, 0.3, (50, 30)).astype(float)
    X[rng.random((50, 30)) < 0.1] = np.nan
    path = str(tmp_path / "s.txt.gz")
    _write_bimbam(path, X)
    geno = StreamingBimbamGenotypes(path)
    mask = np.ones(30, bool)
    stats = geno.qc_stats(mask)
    assert stats.shape == (50, 8)
    np.testing.assert_array_equal(stats[:, 0],
                                  np.isnan(X).sum(axis=1))
