"""Numeric sanity checks (the -check runtime, debug.cpp analogue).

GEMMA's safety culture is numeric, not concurrent: NaN poisoning of
fresh buffers, eigenvalue scans of K, condition-number warnings
(debug.cpp:242-381).  Here: explicit finite checks between pipeline
phases and a kinship validator with the same thresholds.
"""

from __future__ import annotations

import warnings

import numpy as np

CONDITION_WARN_RATIO = 2e6   # mathfunc.h CONDITIONED_MAXRATIO
EIGEN_MINVALUE = 1e-10


def check_finite(name: str, arr) -> None:
    a = np.asarray(arr)
    if not np.all(np.isfinite(a)):
        raise FloatingPointError(f"{name} contains NaN/Inf values")


def validate_kinship(K: np.ndarray | None,
                     eigenvalues: np.ndarray | None = None,
                     strict: bool = False,
                     max_asym: float | None = None) -> list:
    """Mirror validate_K (debug.cpp:358-381): symmetry, near-zero /
    negative eigenvalues, condition number.  Returns warning strings.

    For the device-resident pipeline pass K=None with precomputed
    `eigenvalues` and `max_asym` (scalar device reductions) — reading
    the full n×n matrix back over the axon tunnel costs minutes at
    large n (device→host measures ~4 MB/s)."""
    msgs = []
    if K is not None:
        K = np.asarray(K)
        if not np.allclose(K, K.T, rtol=0,
                           atol=1e-8 * max(1.0, np.abs(K).max())):
            msgs.append("K is not symmetric")
    elif max_asym is not None and max_asym > 1e-6:
        msgs.append("K is not symmetric")
    if eigenvalues is None:
        eigenvalues = np.linalg.eigvalsh(K)
    ev = np.asarray(eigenvalues)
    n_zero = int(np.sum(np.abs(ev) < EIGEN_MINVALUE))
    if n_zero > 1:
        msgs.append(f"K has {n_zero} eigenvalues close to zero")
    if int(np.sum(ev < -EIGEN_MINVALUE)) > 1:
        msgs.append("K has more than one negative eigenvalue")
    pos = ev[ev > 0]
    if pos.size and pos.max() / max(pos.min(), 1e-300) > CONDITION_WARN_RATIO:
        msgs.append("K is ill-conditioned (condition number > 2e6)")
    for m in msgs:
        if strict:
            raise FloatingPointError(m)
        warnings.warn(m)
    return msgs
