"""Symmetric eigendecomposition with GEMMA's zeroing rule.

GEMMA eigendecomposes the centered n×n relatedness matrix once per run
with LAPACK DSYEVR and zeroes eigenvalues below 1e-10 — including
negatives — before everything downstream (lapack.cpp
`EigenDecomp_Zeroed`:260-291).  The returned trace is the mean of the
*zeroed* eigenvalues.

Backend policy: XLA's TPU eigensolver is iteration-bound and far off
speed-of-light (measured ~90s at n=2048 on v5e vs ~1s for host LAPACK
at n=1940), so on TPU backends the decomposition runs on the host in
float64 — the same dsyevd-class solver the reference uses
(lapack.cpp:205-222) — and only the factors move to the device, where
all the matmul-heavy work happens.  On CPU backends `jnp.linalg.eigh`
is LAPACK anyway.  For pod-scale n the distributed path lives in
`gemma_tpu.parallel.eigh`.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

EIGEN_MINVALUE = 1e-10


def _use_host_eigh() -> bool:
    return jax.default_backend() not in ("cpu",)


def eigh_zeroed(G, out_dtype=None):
    """Eigendecompose symmetric G; zero eigenvalues < 1e-10.

    Returns (eigenvalues, U, trace_G) where trace_G = mean(zeroed
    eigenvalues), the quantity GEMMA threads through PVE estimates.
    Eigenvalues ascend, matching LAPACK/GEMMA ordering.  `out_dtype`
    overrides the factor dtype (the host path may receive a float64
    numpy matrix while the device pipeline runs float32).
    """
    if _use_host_eigh():
        dtype = out_dtype or G.dtype
        w, V = np.linalg.eigh(np.asarray(G, dtype=np.float64))
        eval_ = jnp.asarray(np.where(w < EIGEN_MINVALUE, 0.0, w), dtype)
        U = jnp.asarray(V, dtype)
        return eval_, U, jnp.mean(eval_)
    eval_, U = jnp.linalg.eigh(jnp.asarray(G, dtype=out_dtype)
                               if out_dtype is not None else G)
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
