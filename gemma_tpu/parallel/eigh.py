"""Distributed symmetric eigendecomposition (pod-scale kinship).

The reference calls LAPACK DSYEVR on one node (lapack.cpp:205-222);
at biobank scale (n=100k) the kinship matrix no longer fits one chip,
so this module provides a spectral divide-and-conquer eigensolver
whose heavy operations — matmuls and QR — are exactly the primitives
XLA shards well under GSPMD (Nakatsukasa & Higham 2013, QDWH-eig):

  1. shift by a spectral-median estimate sigma,
  2. polar decomposition of (A - sigma I) via `jax.scipy.linalg.polar`
     (QDWH — a few matmul/QR-rich iterations),
  3. P = (U_p + I)/2 is the exact projector onto the invariant
     subspace with eigenvalues > sigma; split with randomized range
     finding (QR of P @ Omega),
  4. recurse on V' A V in each half until blocks fit a single chip,
     where `jnp.linalg.eigh` finishes.

Host-side recursion, device-side math: every matmul/QR can carry
`jax.sharding` annotations over the mesh; leaves run locally.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_eigh(A):
    """Leaf solver: on TPU backends XLA's eigensolver is iteration-
    bound and ~90x slower than LAPACK at these sizes, so leaves run on
    the host (the splits above remain device matmul/QR work)."""
    if jax.default_backend() not in ("cpu",):
        w, V = np.linalg.eigh(np.asarray(A, dtype=np.float64))
        return jnp.asarray(w, A.dtype), jnp.asarray(V, A.dtype)
    return jnp.linalg.eigh(A)


def _polar_projector(A, sigma):
    """P projecting onto the eigenspace of A with eigenvalues > sigma."""
    n = A.shape[0]
    Up, _ = jax.scipy.linalg.polar(A - sigma * jnp.eye(n, dtype=A.dtype))
    return 0.5 * (Up + jnp.eye(n, dtype=A.dtype))


def _split_basis(Pproj, k, key):
    """Orthonormal bases (V1 (n,k), V2 (n,n-k)) of range(P) and its
    complement via randomized range finding (exact for projectors)."""
    n = Pproj.shape[0]
    G = jax.random.normal(key, (n, n), Pproj.dtype)
    Y1 = Pproj @ G[:, :k] if k > 0 else jnp.zeros((n, 0), Pproj.dtype)
    Y2 = (G[:, :n - k] - Pproj @ G[:, :n - k]) if n - k > 0 else \
        jnp.zeros((n, 0), Pproj.dtype)
    V1 = jnp.linalg.qr(Y1)[0] if k > 0 else Y1
    V2 = jnp.linalg.qr(Y2)[0] if n - k > 0 else Y2
    return V1, V2


def eigh_dc(A, min_block: int = 512, key=None, _depth: int = 0):
    """Spectral divide-and-conquer eigh.  Returns (eigenvalues
    ascending, eigenvectors as columns), like jnp.linalg.eigh."""
    n = A.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    if n <= min_block or _depth > 40:
        return _leaf_eigh(A)

    diag = jnp.diag(A)
    sigma = jnp.median(diag)
    Pproj = _polar_projector(A, sigma)
    k = int(np.clip(int(jnp.round(jnp.trace(Pproj))), 0, n))
    if k == 0 or k == n:
        # median split failed (clustered spectrum) — try the midpoint
        lo, hi = float(jnp.min(diag)), float(jnp.max(diag))
        sigma = 0.5 * (lo + hi)
        Pproj = _polar_projector(A, sigma)
        k = int(np.clip(int(jnp.round(jnp.trace(Pproj))), 0, n))
        if k == 0 or k == n:
            return _leaf_eigh(A)   # effectively degenerate block

    key, k1, k2, k3 = jax.random.split(key, 4)
    V1, V2 = _split_basis(Pproj, k, k1)
    A1 = V1.T @ A @ V1
    A2 = V2.T @ A @ V2

    w1, U1 = eigh_dc(A1, min_block, k2, _depth + 1)
    w2, U2 = eigh_dc(A2, min_block, k3, _depth + 1)

    w = jnp.concatenate([w2, w1])            # w2 below sigma, w1 above
    U = jnp.concatenate([V2 @ U2, V1 @ U1], axis=1)
    order = jnp.argsort(w)
    return w[order], U[:, order]


def eigh_sharded(A, mesh: Mesh, min_block: int = 2048):
    """eigh_dc with the matrix laid out over a 1-D mesh (row-sharded).

    All matmul/polar/QR steps consume and produce row-sharded
    operands; GSPMD inserts the collectives.  Leaves gather to a
    single device for the local eigh.
    """
    axis = mesh.axis_names[0]
    sharding = NamedSharding(mesh, P(axis, None))
    A = jax.device_put(A, sharding)
    return eigh_dc(A, min_block=min_block)
