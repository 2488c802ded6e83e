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


def test_pack_unpack_tril():
    import jax.numpy as jnp
    from gemma_tpu.ops.kinship import pack_tril, unpack_tril
    rng = np.random.default_rng(3)
    for n in (1, 7, 64, 129):
        K = rng.normal(size=(n, n))
        K = K + K.T
        packed = np.asarray(pack_tril(jnp.asarray(K)))
        assert packed.shape == (n * (n + 1) // 2,)
        np.testing.assert_allclose(unpack_tril(packed, n), K, atol=1e-12)
