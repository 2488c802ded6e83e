"""Binary matrix sidecar cache: correctness + staleness invalidation.

The sidecar (io/writers.py write_matrix(sidecar=True)) exists so the
-gk → -lmm staging does not pay an O(n²) text re-parse (26 s at n=10k,
PERF.md); the text file stays the interchange format and stale caches
must never be served (ReadFile_kin parity, gemma_io.cpp:1186-1244).
"""

import os
import time

import numpy as np

from gemma_tpu.io.writers import write_matrix
from gemma_tpu.io.readers import (read_kinship, read_matrix_sidecar,
                                  read_eigen_u)


def test_sidecar_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    K = rng.normal(size=(12, 12))
    K = K @ K.T
    path = str(tmp_path / "K.cXX.txt")
    write_matrix(path, K, sidecar=True)
    assert os.path.exists(path + ".bin")
    # sidecar returns the FULL-precision matrix (not the %.10g text)
    M = read_matrix_sidecar(path)
    np.testing.assert_array_equal(M, K)
    # read_kinship subsets through the sidecar
    ind = np.ones(12, bool)
    ind[3] = False
    G = read_kinship(path, ind)
    np.testing.assert_array_equal(G, K[np.ix_(ind.nonzero()[0],
                                              ind.nonzero()[0])])


def test_sidecar_stale_rejected(tmp_path):
    rng = np.random.default_rng(1)
    K = rng.normal(size=(8, 8))
    path = str(tmp_path / "K.cXX.txt")
    write_matrix(path, K, sidecar=True)
    # overwrite the text with a DIFFERENT matrix (no sidecar update) —
    # e.g. reference GEMMA regenerated the file in place
    time.sleep(0.01)
    K2 = rng.normal(size=(8, 8))
    np.savetxt(path, K2, fmt="%.10g", delimiter="\t")
    assert read_matrix_sidecar(path) is None
    G = read_kinship(path, np.ones(8, bool))
    np.testing.assert_allclose(G, K2, atol=1e-9)


def test_eigen_u_sidecar(tmp_path):
    rng = np.random.default_rng(2)
    U = rng.normal(size=(10, 10))
    path = str(tmp_path / "o.eigenU.txt")
    write_matrix(path, U, sidecar=True)
    np.testing.assert_array_equal(read_eigen_u(path), U)
    os.remove(path + ".bin")
    np.testing.assert_allclose(read_eigen_u(path), U, atol=1e-9)


def test_pack_triu_chunks_roundtrip():
    import jax.numpy as jnp
    from gemma_tpu.ops.kinship import pack_triu_chunks, triu_chunk_bounds
    rng = np.random.default_rng(3)
    for n in (1, 7, 64, 129):
        K = rng.normal(size=(n, n))
        K = K + K.T
        bounds = triu_chunk_bounds(n, 8, target_bytes=1024)
        chunks = pack_triu_chunks(jnp.asarray(K), bounds)
        got = np.concatenate([np.asarray(c) for c in chunks])
        iu = np.triu_indices(n)
        np.testing.assert_allclose(got, K[iu], atol=0)


def test_triu_chunk_bounds_cover_all_rows():
    from gemma_tpu.ops.kinship import triu_chunk_bounds
    for n in (1, 7, 64, 257):
        bounds = triu_chunk_bounds(n, 8, target_bytes=512)
        assert bounds[0][0] == 0 and bounds[-1][1] == n
        for (a0, b0), (a1, b1) in zip(bounds, bounds[1:]):
            assert b0 == a1 and a0 < b0
        total = sum(
            (b - a) * n - (a + b - 1) * (b - a) // 2 for a, b in bounds)
        assert total == n * (n + 1) // 2


def test_fetch_k_streamed_matches_write_matrix(tmp_path):
    """Chunked upper-triangle readback + streaming row writes produce
    the full K and a byte-identical text file (run.py:_fetch_k_streamed
    vs writers.write_matrix)."""
    import jax.numpy as jnp
    from gemma_tpu.run import _fetch_k_streamed
    from gemma_tpu.io.writers import write_matrix
    from gemma_tpu.ops.kinship import triu_chunk_bounds

    rng = np.random.default_rng(3)
    n = 157
    A = rng.normal(size=(n, n))
    K0 = (A + A.T) / 2
    # force several chunks at this tiny n
    import gemma_tpu.run as run_mod
    from gemma_tpu.ops import kinship as kin_mod
    orig = kin_mod.triu_chunk_bounds
    kin_mod.triu_chunk_bounds = lambda nn, it, target_bytes=1 << 20: \
        orig(nn, it, target_bytes=4096)
    try:
        streamed = str(tmp_path / "ks.txt")
        K, text_written = _fetch_k_streamed(
            jnp.asarray(K0), n, streamed)
    finally:
        kin_mod.triu_chunk_bounds = orig
    np.testing.assert_allclose(K, K0, atol=0)
    ref = str(tmp_path / "kr.txt")
    write_matrix(ref, K0)
    assert text_written
    with open(streamed, "rb") as fa, open(ref, "rb") as fb:
        assert fa.read() == fb.read()


def test_fetch_k_streamed_no_path(tmp_path):
    import jax.numpy as jnp
    from gemma_tpu.run import _fetch_k_streamed
    rng = np.random.default_rng(4)
    n = 33
    A = rng.normal(size=(n, n))
    K0 = (A + A.T) / 2
    K, text_written = _fetch_k_streamed(jnp.asarray(K0), n, None)
    assert not text_written
    np.testing.assert_allclose(K, K0, atol=0)
