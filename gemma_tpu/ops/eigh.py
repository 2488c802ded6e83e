"""Symmetric eigendecomposition with GEMMA's zeroing rule.

GEMMA eigendecomposes the centered n×n relatedness matrix once per run
with LAPACK DSYEVR and zeroes eigenvalues below 1e-10 — including
negatives — before everything downstream (lapack.cpp
`EigenDecomp_Zeroed`:260-291).  The returned trace is the mean of the
*zeroed* eigenvalues.

On a single chip this maps to `jnp.linalg.eigh` (XLA's QR-based
symmetric eigensolver).  For pod-scale n the distributed path lives in
`gemma_tpu.parallel.eigh`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EIGEN_MINVALUE = 1e-10


def eigh_zeroed(G):
    """Eigendecompose symmetric G; zero eigenvalues < 1e-10.

    Returns (eigenvalues, U, trace_G) where trace_G = mean(zeroed
    eigenvalues), the quantity GEMMA threads through PVE estimates.
    Eigenvalues ascend, matching LAPACK/GEMMA ordering.
    """
    eval_, U = jnp.linalg.eigh(G)
    eval_ = jnp.where(eval_ < EIGEN_MINVALUE, 0.0, eval_)
    trace_G = jnp.mean(eval_)
    return eval_, U, trace_G


def zero_eigenvalues(eval_):
    """Apply the <1e-10 → 0 rule to externally loaded eigenvalues.

    Mirrors the `-u/-d` path (gemma.cpp:2661-2668): trace is the mean
    of the zeroed values.
    """
    eval_ = jnp.where(eval_ < EIGEN_MINVALUE, 0.0, eval_)
    return eval_, jnp.mean(eval_)
