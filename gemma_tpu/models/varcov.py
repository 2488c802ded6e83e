"""Windowed SNP-SNP correlations (-calccor; reference src/varcov.cpp).

For each QC-passing SNP, GEMMA computes its genotype variance and its
correlation with every following kept SNP inside a window bounded by
base pairs, centimorgans and/or SNP count (CalcNB, varcov.cpp:168-218;
Calc_Cor:220-241).  Output: one row per SNP with the window size, the
variance, and the comma-joined correlation list.

TPU-native: rows are mean-imputed, centered, unit-normalised; the
banded correlation matrix is computed as blocked (S, n) x (n, S+B)
matmuls and the needed superdiagonals are sliced out — one MXU
program instead of per-pair dot products.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def calc_neighbours(chr_, pos, cM, window_bp, window_cm, window_ns):
    """Number of following in-window kept SNPs per SNP
    (CalcNB semantics on the kept subset, varcov.cpp:168-218).

    Inputs are arrays over KEPT SNPs in file order.
    """
    p = len(chr_)
    n_nb = np.zeros(p, dtype=np.int64)
    for t in range(p):
        if chr_[t] == "-9" or (cM[t] == -9 and window_cm != 0) or \
           (pos[t] == -9 and window_bp != 0):
            continue
        if t == p - 1:
            continue
        t2 = t + 1
        nb = 0
        while (t2 < p and chr_[t2] == chr_[t]
               and (window_cm == 0 or cM[t2] - cM[t] < window_cm)
               and (window_bp == 0 or pos[t2] - pos[t] < window_bp)
               and (window_ns == 0 or nb < window_ns)):
            t2 += 1
            nb += 1
        n_nb[t] = nb
    return n_nb


@functools.partial(jax.jit, static_argnames=("bandwidth",))
def _banded_cor(Xn, bandwidth: int):
    """Xn: (p, n) unit-normalised rows.  Returns (p, bandwidth) where
    out[i, j] = cor(x_i, x_{i+j+1}) (garbage past the end, masked by
    the caller)."""
    p, n = Xn.shape
    pad = jnp.zeros((bandwidth, n), Xn.dtype)
    Xp = jnp.concatenate([Xn, pad], axis=0)
    full = jnp.matmul(Xn, Xp.T, preferred_element_type=Xn.dtype)
    idx = jnp.arange(p)[:, None] + jnp.arange(1, bandwidth + 1)[None, :]
    return jnp.take_along_axis(full, idx, axis=1)


def windowed_correlations_fetch(fetch, p: int, n: int, n_nb: np.ndarray,
                                block: int = 2048):
    """Streaming windowed correlations: `fetch(lo, hi)` returns raw
    dosage rows, called with monotone lo (one file scan on a streaming
    backend).  Only `block + bandwidth` normalised rows are held at
    once — the reference's sliding-window posture (varcov.cpp:220-345)
    instead of a (p, n) materialisation."""
    bw = int(n_nb.max()) if len(n_nb) else 0
    var = np.zeros(p)
    cors = [np.zeros(0)] * p

    def _normalize(raw, lo, hi):
        miss = np.isnan(raw)
        mean = np.nanmean(np.where(miss, np.nan, raw), axis=1)
        Xc = np.where(miss, mean[:, None], raw) - mean[:, None]
        ss = np.einsum("ij,ij->i", Xc, Xc)
        var[lo:hi] = ss / n
        return Xc / np.sqrt(np.where(ss > 0, ss, 1.0))[:, None]

    if bw == 0:
        for s in range(0, p, block):
            e = min(s + block, p)
            _normalize(fetch(s, e), s, e)
        return var, cors

    carry = np.zeros((0, n))
    fetched = 0
    s = 0
    while s < p:
        e = min(s + block, p)
        hi = min(e + bw, p)
        if hi > fetched:
            new = _normalize(fetch(fetched, hi), fetched, hi)
            carry = np.vstack([carry, new]) if carry.size else new
            fetched = hi
        # carry holds normalised rows [s, fetched)
        band = np.asarray(_banded_cor(jnp.asarray(carry), bw))[:e - s]
        for i in range(s, e):
            k = int(n_nb[i])
            cors[i] = band[i - s, :k].copy()
        carry = carry[e - s:]
        s = e
    return var, cors


def windowed_correlations(X_raw: np.ndarray, n_nb: np.ndarray,
                          block: int = 2048):
    """Per-SNP variance and in-window correlations.

    X_raw: (p, n) raw dosages over analyzed individuals (NaN missing).
    Returns (var (p,), list of per-SNP correlation arrays).
    """
    p, n = X_raw.shape
    miss = np.isnan(X_raw)
    mean = np.nanmean(np.where(miss, np.nan, X_raw), axis=1)
    Xc = np.where(miss, mean[:, None], X_raw) - mean[:, None]
    ss = np.einsum("ij,ij->i", Xc, Xc)
    var = ss / n
    norm = np.sqrt(np.where(ss > 0, ss, 1.0))
    Xn = Xc / norm[:, None]

    bw = int(n_nb.max()) if len(n_nb) else 0
    cors = [np.zeros(0)] * p
    if bw == 0:
        return var, cors

    for s in range(0, p, block):
        e = min(s + block, p)
        # rows s..e need neighbours up to e+bw
        hi = min(e + bw, p)
        sub = jnp.asarray(Xn[s:hi])
        band = np.asarray(_banded_cor(sub, bw))[:e - s]
        for i in range(s, e):
            k = int(n_nb[i])
            cors[i] = band[i - s, :k].copy()
    return var, cors


def write_cor(path: str, snp_rows: list, n_nb, var, cors) -> None:
    """prefix.cor.txt (VARCOV::WriteCov layout, varcov.cpp:74-146)."""
    with open(path, "w") as fh:
        fh.write("chr\trs\tps\tn_mis\tn_obs\tallele1\tallele0\taf\t"
                 "window_size\tvar\tcor\n")
        for i, s in enumerate(snp_rows):
            fh.write(f"{s['chr']}\t{s['rs']}\t{s['ps']}\t{s['n_miss']}\t"
                     f"{s['n_obs']}\t{s['allele1']}\t{s['allele0']}\t"
                     f"{s['af']:.3f}\t{len(cors[i])}\t{var[i]:.6e}\t")
            if len(cors[i]) == 0:
                fh.write("NA")
            else:
                fh.write(",".join(f"{v:.6e}" for v in cors[i]))
            fh.write("\n")
