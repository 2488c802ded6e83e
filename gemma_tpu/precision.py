"""Precision policy.

GEMMA computes everything in float64 (GSL/LAPACK doubles).  On TPU,
float64 is emulated and slow, while float32 keeps the MXU/VPU at full
rate; float32 matches GEMMA's published golden values to the 1e-3
absolute tolerance its own regression suite uses (test-helpers.rb).

The policy is explicit: every numerical entry point takes a ``dtype``
and no module relies on the global ``jax_enable_x64`` switch except to
discover whether float64 is *available*.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def enable_x64() -> None:
    """Turn on 64-bit support process-wide (call before tracing)."""
    jax.config.update("jax_enable_x64", True)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def resolve_dtype(precision: str = "auto"):
    """Map a config string to a jnp dtype.

    "auto" selects float64 when x64 is enabled (CPU parity runs) and
    float32 otherwise (TPU speed runs).
    """
    if precision == "float64":
        if not x64_enabled():
            enable_x64()
        return jnp.float64
    if precision == "float32":
        return jnp.float32
    if precision == "auto":
        return jnp.float64 if x64_enabled() else jnp.float32
    raise ValueError(f"unknown precision {precision!r}")


def host_dtype():
    """Host-side (numpy) dtype: always float64, matching GEMMA's parsers."""
    return np.float64


def apply_matmul_precision(dtype) -> None:
    """Raise the default matmul precision for float32 speed mode on
    accelerator backends.

    TPU f32 matmuls default to bf16 multiplies (~8 mantissa bits):
    measured on-chip at n=6144 with EXACT f64 eigen factors, that
    alone moves -lmm p_wald by 9.8e-3 — far outside the 1e-3
    speed-mode contract, and enough to fail GEMMA's own 1e-3
    kinship-cell goldens.  "tensorfloat32" (bf16x3 passes on v5e)
    brings it to 8.0e-4, and "float32" (bf16x6, 2x the cost) is no
    better (7.8e-4 — the remaining error is f32 arithmetic elsewhere,
    not matmul precision), so bf16x3 is the default.
    GEMMA_TPU_MATMUL_PRECISION overrides (e.g. "float32", or
    "bfloat16" for raw MXU rate where accuracy is not needed).  No-op
    for float64 and on CPU, where f32 matmuls are already true f32."""
    import os
    if jnp.dtype(dtype) != jnp.float32:
        return
    if jax.default_backend() in ("cpu",):
        return
    prec = os.environ.get("GEMMA_TPU_MATMUL_PRECISION", "tensorfloat32")
    jax.config.update("jax_default_matmul_precision", prec)
