"""Symmetric eigendecomposition with GEMMA's zeroing rule.

GEMMA eigendecomposes the centered n×n relatedness matrix once per run
with LAPACK DSYEVR and zeroes eigenvalues below 1e-10 — including
negatives — before everything downstream (lapack.cpp
`EigenDecomp_Zeroed`:260-291).  The returned trace is the mean of the
*zeroed* eigenvalues.

Backend policy (measured on the axon-tunneled v5e, scripts/probe_tpu.py):

  * float32 (TPU speed mode): XLA's device eigensolver runs at
    0.15 s (n=2048) / 0.72 s (n=4096), relative error ~1.5e-6 —
    ~25x faster than single-core host LAPACK by n=10k — AND the
    factors never cross the host↔device tunnel, whose device→host
    direction measures only ~1-4 MB/s.  The decomposition therefore
    stays on device and U feeds the rotation matmuls in place.
  * float64 (reference-parity mode): TPUs emulate f64; the
    decomposition runs on host LAPACK (the same dsyevd-class solver
    the reference uses, lapack.cpp:205-222) and the factors move to
    the device once.
  * CPU backend: `jnp.linalg.eigh` is LAPACK anyway.

For n beyond one chip's HBM (~25k at f32 with the solver's workspace)
the sharded QDWH divide-and-conquer path lives in
`gemma_tpu.parallel.eigh`.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

EIGEN_MINVALUE = 1e-10

# XLA's TPU eigh compile time explodes past ~6k (254 s at n=6144,
# remote-compile OOM at n=10000); above this the spectral divide-and-
# conquer path splits the problem into device-eigh-sized leaves with
# matmul/QR-rich splits whose compiles stay cheap.
_DEVICE_EIGH_MAX_N = 4608


def _use_host_eigh(dtype) -> bool:
    if jax.default_backend() in ("cpu",):
        return False
    return jnp.dtype(dtype) == jnp.float64


@functools.partial(jax.jit, static_argnames=("out_dtype_name",))
def _eigh_zeroed_device(G, out_dtype_name: str):
    raw, U = jnp.linalg.eigh(jnp.asarray(G, jnp.dtype(out_dtype_name)))
    eval_ = jnp.where(raw < EIGEN_MINVALUE, 0.0, raw)
    return eval_, U, jnp.mean(eval_), raw


def eigh_zeroed(G, out_dtype=None, with_raw: bool = False):
    """Eigendecompose symmetric G; zero eigenvalues < 1e-10.

    Returns (eigenvalues, U, trace_G) where trace_G = mean(zeroed
    eigenvalues), the quantity GEMMA threads through PVE estimates.
    Eigenvalues ascend, matching LAPACK/GEMMA ordering.  `out_dtype`
    overrides the factor dtype (the host path may receive a float64
    numpy matrix while the device pipeline runs float32).

    with_raw=True appends the PRE-zeroing eigenvalues as a fourth
    return — the -check validator must scan those (validate_K reads
    the raw spectrum, debug.cpp:358-381; the zeroing rule would erase
    the negative eigenvalues it warns about).
    """
    dtype = out_dtype or G.dtype
    if _use_host_eigh(dtype):
        w, V = np.linalg.eigh(np.asarray(G, dtype=np.float64))
        eval_ = jnp.asarray(np.where(w < EIGEN_MINVALUE, 0.0, w), dtype)
        U = jnp.asarray(V, dtype)
        out = (eval_, U, jnp.mean(eval_))
        return out + (jnp.asarray(w, dtype),) if with_raw else out
    if (G.shape[0] > _DEVICE_EIGH_MAX_N
            and jax.default_backend() not in ("cpu",)):
        from gemma_tpu.parallel.eigh import eigh_dc, polish_banded
        Gd = jnp.asarray(G, jnp.dtype(dtype))
        w, U = eigh_dc(Gd, min_block=4096)
        # banded Rayleigh-Ritz polish: contracts the sign-iteration's
        # near-split subspace mixing to the f32 floor (measured
        # 7.9e-3 -> sub-1e-3 p_wald deltas at n=6144)
        w, U = polish_banded(Gd, w, U)
        eval_ = jnp.where(w < EIGEN_MINVALUE, 0.0, w)
        out = (eval_, U, jnp.mean(eval_))
        return out + (w,) if with_raw else out
    eval_, U, tr, raw = _eigh_zeroed_device(G, jnp.dtype(dtype).name)
    return (eval_, U, tr, raw) if with_raw else (eval_, U, tr)


def zero_eigenvalues(eval_):
    """Apply the <1e-10 → 0 rule to externally loaded eigenvalues.

    Mirrors the `-u/-d` path (gemma.cpp:2661-2668): trace is the mean
    of the zeroed values.
    """
    eval_ = jnp.where(eval_ < EIGEN_MINVALUE, 0.0, eval_)
    return eval_, jnp.mean(eval_)
