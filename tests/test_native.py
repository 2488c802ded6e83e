"""Native C++ BIMBAM parser vs the pure-Python fallback."""

import os

import numpy as np
import pytest

from gemma_tpu.io import native

BXD = "/root/reference/example/BXD_geno.txt.gz"


def test_native_builds_and_loads():
    assert native.available(), "native library failed to build/load"


@pytest.mark.skipif(not os.path.exists(BXD), reason="BXD not available")
def test_native_matches_python_parser():
    out = native.parse_bimbam(BXD)
    assert out is not None
    rs, a1, a0, X = out

    # force the Python path
    import gemma_tpu.io.bimbam as bb
    import gemma_tpu.io.native as nat
    saved = (nat._lib, nat._tried)
    try:
        nat._lib, nat._tried = None, True
        g = bb.read_bimbam_genotypes(BXD)
    finally:
        nat._lib, nat._tried = saved

    assert list(g.snps.rs) == rs
    assert list(g.snps.a_minor) == a1
    np.testing.assert_array_equal(np.isnan(g.X), np.isnan(X))
    nz = ~np.isnan(X)
    np.testing.assert_array_equal(g.X[nz], X[nz])


def test_native_handles_na_and_commas(tmp_path):
    f = tmp_path / "g.txt"
    f.write_text("rs1, A, T, 0.5, NA, 2\nrs2 G C 1 0 NA\n")
    out = native.parse_bimbam(str(f))
    assert out is not None
    rs, a1, a0, X = out
    assert rs == ["rs1", "rs2"]
    np.testing.assert_allclose(X[0, [0, 2]], [0.5, 2.0])
    assert np.isnan(X[0, 1]) and np.isnan(X[1, 2])


def test_native_matrix_writer_byte_identity(tmp_path):
    """write_matrix (native or savetxt) is byte-identical to the
    per-cell %.10g formatting GEMMA's WriteMatrix produces."""
    from gemma_tpu.io.writers import write_matrix
    rng = np.random.default_rng(5)
    M = np.concatenate([rng.normal(size=(20, 40)),
                        np.array([[0.0, 1.0, -1e-12, 3e8] * 10])])
    p1 = tmp_path / "a.txt"
    write_matrix(str(p1), M)
    ref_lines = ["\t".join(f"{v:.10g}" for v in row) for row in M]
    assert p1.read_text().splitlines() == ref_lines


def test_fmt_g10_byte_identity_sweep():
    """The fast %.10g path (matrix_writer.cpp fmt_g10) must emit bytes
    identical to snprintf for every value it accepts, and defer (None)
    only on genuinely ambiguous roundings."""
    if not native.available():
        return
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.normal(size=20000),
        rng.normal(size=20000) * 10.0 ** rng.integers(-30, 30, 20000),
        rng.integers(-10**15, 10**15, 10000).astype(np.float64),
        np.array([0.0, -0.0, 1.0, -1.0, 0.335, 1e-5, 1e5, 1e10, 1e-10,
                  9.999999999e9, 1.00000000005, np.pi, 2**-1074,
                  1.7976931348623157e308, 5e-324, 0.1, 1/3,
                  np.inf, -np.inf, np.nan]),
    ])
    n_fallback = 0
    for v in vals:
        fast = native.fmt_g10(float(v))
        if fast is None:
            n_fallback += 1
            continue
        assert fast == "%.10g" % v, (float(v).hex(), fast, "%.10g" % v)
    # the fallback is for rare boundary cases, not a crutch
    assert n_fallback < len(vals) * 1e-3
