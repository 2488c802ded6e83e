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
