"""Batched LMM (restricted) likelihood in the eigen-rotated space.

The model: y = W alpha + x beta + u + e, u ~ N(0, lambda tau^-1 K),
e ~ N(0, tau^-1 I).  After rotating by the eigenvectors U of K
(D = eigenvalues), H = lambda D + I is diagonal and every quantity the
(restricted) likelihood needs reduces to weighted inner products of the
rotated vectors {U'w_1..U'w_c, U'x, U'y} with weights H^-1, H^-2, H^-3
(Zhou & Stephens 2012 supplement; reference lmm.cpp:227-1125).

TPU-first design: GEMMA computes these per SNP in scalar loops; here a
whole SNP block is one program.  For a batch of per-SNP lambdas:

  * weights Hi^k are (S, n) elementwise VPU ops,
  * the {W,y}-pair base quantities are one (S,n)x(n,m) MXU matmul,
  * the x-involving base quantities are one (S,n)x(n,c+1) MXU matmul,
  * the covariate-elimination recurrence (CalcPab/CalcPPab/CalcPPPab,
    lmm.cpp:283-482) runs on (S, n_index) tensors with static gather
    tables — n_cvt+1 unrolled steps of cheap elementwise work.

Everything is shape-static and jit/vmap/shard_map friendly; `lam` may
carry leading batch axes (e.g. a grid axis for the interval scan).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg
import numpy as np

from gemma_tpu.models.lmm.indices import pab_indices

P_YY_MIN = 1e-8  # round-off clamp, reference lmm.cpp:52
_LOG_2PI = float(np.log(2.0 * np.pi))


class LmmBatchData(NamedTuple):
    """Device-resident inputs for one SNP block.

    eval:    (n,)   zeroed eigenvalues of the centered kinship matrix
    UtWy:    (n, c+1)  rotated covariates with rotated phenotype as last col
    wy_prod: (n, m_wy) elementwise products of the {W,y}-pair columns,
             ordered to match PabIndices.wy_positions
    Utx:     (S, n) rotated genotypes for the block (zeros for null fits)
    iab_logdiag: (S, n_cvt+1) log of the identity-weighted recurrence
             diagonals (lambda-independent piece of the REML logdet,
             precomputed once per block instead of per logf call)
    """

    eval: jax.Array
    UtWy: jax.Array
    wy_prod: jax.Array
    Utx: jax.Array
    iab_logdiag: jax.Array


def build_batch_data(eval_, UtW, Uty, Utx, n_cvt: int) -> LmmBatchData:
    """Assemble the shared tensors for a SNP block (or a null fit)."""
    idx = pab_indices(n_cvt)
    UtWy = jnp.concatenate([UtW, Uty[:, None]], axis=1)
    cols = []
    for (a, b) in idx.wy_pairs:
        ca = UtWy[:, a - 1] if a <= n_cvt else UtWy[:, n_cvt]
        cb = UtWy[:, b - 1] if b <= n_cvt else UtWy[:, n_cvt]
        cols.append(ca * cb)
    wy_prod = jnp.stack(cols, axis=1)

    data = LmmBatchData(eval=eval_, UtWy=UtWy, wy_prod=wy_prod, Utx=Utx,
                        iab_logdiag=None)
    ones = jnp.ones(Utx.shape, dtype=eval_.dtype)
    iab = _pab_rows(_base_row(ones, data, n_cvt), n_cvt)
    # log of Iab[i, diag_i] for i = 0..n_cvt; the x diagonal (i=n_cvt)
    # is only consumed by alt-model REML fits where x is nonzero
    logs = [jnp.log(iab[i][..., int(idx.diag[i])])
            for i in range(n_cvt + 1)]
    return data._replace(iab_logdiag=jnp.stack(logs, axis=-1))


def null_batch_data(eval_, UtW, Uty, n_cvt: int) -> LmmBatchData:
    """Batch data for the no-SNP (null) model: a single all-zero x lane."""
    Utx = jnp.zeros((1, eval_.shape[0]), dtype=eval_.dtype)
    return build_batch_data(eval_, UtW, Uty, Utx, n_cvt)


def _base_row(w, data: LmmBatchData, n_cvt: int):
    """Row 0 of the Pab recurrence for weight vector(s) w: (..., S, n).

    Returns (..., S, n_index): weighted inner products of every column
    pair, laid out in GEMMA's GetabIndex order.
    """
    idx = pab_indices(n_cvt)
    shared = jnp.matmul(w, data.wy_prod)              # (..., S, m_wy)
    wx = w * data.Utx                                  # (..., S, n)
    xcross = jnp.matmul(wx, data.UtWy)                 # (..., S, c+1)
    xx = jnp.sum(wx * data.Utx, axis=-1)               # (..., S)

    # Assemble flat n_index layout by static position classification.
    wy_col = {int(p): i for i, p in enumerate(idx.wy_positions)}
    xw_col = {int(p): int(j) for p, j in zip(idx.xw_positions, idx.xw_partners)}
    parts = []
    for k in range(idx.n_index):
        if k in wy_col:
            parts.append(shared[..., wy_col[k]])
        elif k == idx.xx:
            parts.append(xx)
        else:
            parts.append(xcross[..., xw_col[k]])
    return jnp.stack(parts, axis=-1)


def _base_rows_multi(hi, data: LmmBatchData, n_cvt: int, order: int):
    """Base rows for weights hi^1..hi^order in one fused pass.

    The only large materialized tensor is Utx: v1 = hi*Utx is shared by
    every power (xx terms become dot products of v1 with hi-powers of
    Utx; xcross terms are (hi^p * v1) @ UtWy), so HBM traffic per
    derivative evaluation drops ~order-fold versus calling _base_row
    once per power.  hi itself is a cheap broadcast of (lam, eval) that
    XLA fuses into each consumer.
    """
    idx = pab_indices(n_cvt)
    v1 = hi * data.Utx                                  # (..., S, n)

    shared, xcross, xx = [], [], []
    w = hi
    vx = v1
    for p in range(order):
        shared.append(jnp.matmul(w, data.wy_prod))      # (..., S, m_wy)
        xcross.append(jnp.matmul(vx, data.UtWy))
        if p == 0:
            xx.append(jnp.sum(v1 * data.Utx, axis=-1))
        elif p == 1:
            xx.append(jnp.sum(v1 * v1, axis=-1))
        else:
            xx.append(jnp.sum(v1 * v1 * hi, axis=-1))
        if p + 1 < order:
            w = w * hi
            vx = vx * hi

    wy_col = {int(q): i for i, q in enumerate(idx.wy_positions)}
    xw_col = {int(q): int(j) for q, j in zip(idx.xw_positions,
                                             idx.xw_partners)}
    rows = []
    for p in range(order):
        parts = []
        for k in range(idx.n_index):
            if k in wy_col:
                parts.append(shared[p][..., wy_col[k]])
            elif k == idx.xx:
                parts.append(xx[p])
            else:
                parts.append(xcross[p][..., xw_col[k]])
        rows.append(jnp.stack(parts, axis=-1))
    return rows



def _pab_rows(row0, n_cvt: int):
    """CalcPab recurrence: eliminate covariates 1..n_cvt then x.

    Returns list of n_cvt+2 rows, each (..., n_index).
    """
    idx = pab_indices(n_cvt)
    rows = [row0]
    for p in range(1, n_cvt + 2):
        prev = rows[-1]
        ab = prev
        aw = prev[..., idx.aw[p - 1]]
        bwv = prev[..., idx.bw[p - 1]]
        ww = prev[..., int(idx.ww[p - 1])][..., None]
        safe = jnp.where(ww != 0.0, ww, 1.0)
        rows.append(jnp.where(ww != 0.0, ab - aw * bwv / safe, ab))
    return rows


def _ppab_rows(row0_pp, pab, n_cvt: int):
    """CalcPPab recurrence (second-order quantities a' P_p^2 b)."""
    idx = pab_indices(n_cvt)
    rows = [row0_pp]
    for p in range(1, n_cvt + 2):
        prev2 = rows[-1]
        prev1 = pab[p - 1]
        ps_aw = prev1[..., idx.aw[p - 1]]
        ps_bw = prev1[..., idx.bw[p - 1]]
        ps_ww = prev1[..., int(idx.ww[p - 1])][..., None]
        ps2_ab = prev2
        ps2_aw = prev2[..., idx.aw[p - 1]]
        ps2_bw = prev2[..., idx.bw[p - 1]]
        ps2_ww = prev2[..., int(idx.ww[p - 1])][..., None]
        safe = jnp.where(ps_ww != 0.0, ps_ww, 1.0)
        val = (ps2_ab + ps_aw * ps_bw * ps2_ww / (safe * safe)
               - (ps_aw * ps2_bw + ps_bw * ps2_aw) / safe)
        rows.append(jnp.where(ps_ww != 0.0, val, ps2_ab))
    return rows


def _pppab_rows(row0_ppp, pab, ppab, n_cvt: int):
    """CalcPPPab recurrence (third-order quantities a' P_p^3 b)."""
    idx = pab_indices(n_cvt)
    rows = [row0_ppp]
    for p in range(1, n_cvt + 2):
        prev3 = rows[-1]
        prev1 = pab[p - 1]
        prev2 = ppab[p - 1]
        ps_aw = prev1[..., idx.aw[p - 1]]
        ps_bw = prev1[..., idx.bw[p - 1]]
        ps_ww = prev1[..., int(idx.ww[p - 1])][..., None]
        ps2_aw = prev2[..., idx.aw[p - 1]]
        ps2_bw = prev2[..., idx.bw[p - 1]]
        ps2_ww = prev2[..., int(idx.ww[p - 1])][..., None]
        ps3_ab = prev3
        ps3_aw = prev3[..., idx.aw[p - 1]]
        ps3_bw = prev3[..., idx.bw[p - 1]]
        ps3_ww = prev3[..., int(idx.ww[p - 1])][..., None]
        safe = jnp.where(ps_ww != 0.0, ps_ww, 1.0)
        val = (ps3_ab
               - ps_aw * ps_bw * ps2_ww * ps2_ww / (safe * safe * safe)
               - (ps_aw * ps3_bw + ps_bw * ps3_aw + ps2_aw * ps2_bw) / safe
               + (ps_aw * ps2_bw * ps2_ww + ps_bw * ps2_aw * ps2_ww
                  + ps_aw * ps_bw * ps3_ww) / (safe * safe))
        rows.append(jnp.where(ps_ww != 0.0, val, ps3_ab))
    return rows


def _weights(lam, eval_):
    v = lam[..., None] * eval_ + 1.0
    hi = 1.0 / v
    return v, hi


def _nc_total(n_cvt: int, calc_null: bool) -> int:
    return n_cvt if calc_null else n_cvt + 1


def logf(lam, data: LmmBatchData, n_cvt: int, calc_null: bool, reml: bool):
    """Log (restricted) likelihood at lambda (LogRL_f / LogL_f).

    lam: (..., S); returns (..., S).
    """
    idx = pab_indices(n_cvt)
    n = data.eval.shape[0]
    nc_total = _nc_total(n_cvt, calc_null)

    v, hi = _weights(lam, data.eval)
    logdet_h = jnp.sum(jnp.log(jnp.abs(v)), axis=-1)
    pab = _pab_rows(_base_row(hi, data, n_cvt), n_cvt)

    p_yy = pab[nc_total][..., idx.yy]
    p_yy = jnp.where((p_yy >= 0.0) & (p_yy < P_YY_MIN), P_YY_MIN, p_yy)

    if reml:
        df = float(n - n_cvt) if calc_null else float(n - n_cvt - 1)
        # |W'H^-1 W| / |W'W| via the recurrence diagonals (lmm.cpp:843-850);
        # the identity-weighted half is precomputed per block
        logdet_hiw = jnp.zeros_like(p_yy)
        for i in range(nc_total):
            d = idx.diag[i]
            logdet_hiw = (logdet_hiw + jnp.log(pab[i][..., d])
                          - data.iab_logdiag[..., i])
        c = float(0.5 * df * (np.log(df) - _LOG_2PI - 1.0))
        return c - 0.5 * logdet_h - 0.5 * logdet_hiw - 0.5 * df * jnp.log(p_yy)
    else:
        c = float(0.5 * n * (np.log(float(n)) - _LOG_2PI - 1.0))
        return c - 0.5 * logdet_h - 0.5 * n * jnp.log(p_yy)


def logf_stable(lam, data: LmmBatchData, n_cvt: int, calc_null: bool,
                reml: bool):
    """logf via an explicit weighted-GLS residual — float32-stable.

    The Pab recurrence computes p_yy = y'P(λ)y by subtracting nested
    projection quadratics; at extreme λ the subtrahends agree to ~7
    digits and float32 loses the value entirely (measured on BXD: ML
    logf(λ=1e5) came out −42.2 where the true value is −55.3, so the
    boundary comparison picked l_max and every p_lrt saturated at 1 —
    the f64 run correctly picks l_min).  Here the minimised quadratic
    is assembled as Σ hᵢ rᵢ² with r the per-component GLS residual:
    sums of non-negative terms, no catastrophic cancellation, at the
    cost of one (S, n) residual temporary per evaluation.  Float64
    parity mode keeps the exact GSL/Pab evaluation path.
    """
    n = data.eval.shape[0]
    W = data.UtWy[:, :n_cvt]                       # (n, c)
    y = data.UtWy[:, n_cvt]                        # (n,)
    v, hi = _weights(lam, data.eval)               # (..., S, n)
    logdet_h = jnp.sum(jnp.log(jnp.abs(v)), axis=-1)

    # weighted Gram blocks, built without materialising (S, n, c)
    Gww = jnp.einsum("...kn,ni,nj->...kij", hi, W, W)
    gwy = jnp.einsum("...kn,ni,n->...ki", hi, W, y)
    if calc_null:
        G = Gww
        rhs = gwy
    else:
        x = data.Utx                               # (S, n)
        Gwx = jnp.einsum("...kn,ni,kn->...ki", hi, W, x)
        Gxx = jnp.einsum("...kn,kn,kn->...k", hi, x, x)
        gxy = jnp.einsum("...kn,kn,n->...k", hi, x, y)
        top = jnp.concatenate([Gww, Gwx[..., :, None]], axis=-1)
        bot = jnp.concatenate([Gwx[..., None, :], Gxx[..., None, None]],
                              axis=-1)
        G = jnp.concatenate([top, bot], axis=-2)   # (..., S, c+1, c+1)
        rhs = jnp.concatenate([gwy, gxy[..., None]], axis=-1)

    L = jnp.linalg.cholesky(G)
    beta = jax.scipy.linalg.cho_solve((L, True), rhs[..., None])[..., 0]
    t = y - jnp.einsum("ni,...ki->...kn", W, beta[..., :n_cvt])
    if not calc_null:
        t = t - data.Utx * beta[..., n_cvt:n_cvt + 1]
    p_yy = jnp.einsum("...kn,...kn->...k", hi, t * t)
    p_yy = jnp.where((p_yy >= 0.0) & (p_yy < P_YY_MIN), P_YY_MIN, p_yy)

    nc_total = _nc_total(n_cvt, calc_null)
    if reml:
        df = float(n - n_cvt) if calc_null else float(n - n_cvt - 1)
        ld = jnp.log(jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1)))
        logdet_hiw = 2.0 * jnp.sum(ld, axis=-1)
        # λ-independent |A'A| piece (identity weights)
        A0ww = W.T @ W
        if calc_null:
            G0 = jnp.broadcast_to(A0ww, G.shape[:-2] + A0ww.shape)
        else:
            x = data.Utx
            g0wx = jnp.einsum("ni,kn->ki", W, x)
            g0xx = jnp.einsum("kn,kn->k", x, x)
            top0 = jnp.concatenate(
                [jnp.broadcast_to(A0ww, x.shape[:1] + A0ww.shape),
                 g0wx[..., :, None]], axis=-1)
            bot0 = jnp.concatenate(
                [g0wx[..., None, :], g0xx[..., None, None]], axis=-1)
            G0 = jnp.concatenate([top0, bot0], axis=-2)
        L0 = jnp.linalg.cholesky(G0)
        ld0 = jnp.log(jnp.abs(jnp.diagonal(L0, axis1=-2, axis2=-1)))
        logdet_hiw = logdet_hiw - 2.0 * jnp.sum(ld0, axis=-1)
        c = float(0.5 * df * (np.log(df) - _LOG_2PI - 1.0))
        return (c - 0.5 * logdet_h - 0.5 * logdet_hiw
                - 0.5 * df * jnp.log(p_yy))
    c = float(0.5 * n * (np.log(float(n)) - _LOG_2PI - 1.0))
    return c - 0.5 * logdet_h - 0.5 * n * jnp.log(p_yy)


def dev1(lam, data: LmmBatchData, n_cvt: int, calc_null: bool, reml: bool):
    """First derivative of the log (restricted) likelihood w.r.t. lambda."""
    n = data.eval.shape[0]
    nc_total = _nc_total(n_cvt, calc_null)

    _, hi = _weights(lam, data.eval)
    trace_hi = jnp.sum(hi, axis=-1)

    row1, row2 = _base_rows_multi(hi, data, n_cvt, 2)
    pab = _pab_rows(row1, n_cvt)
    ppab = _ppab_rows(row2, pab, n_cvt)
    return _dev1_from_rows(lam, trace_hi, pab, ppab, n, n_cvt,
                           calc_null, reml)


def _dev1_from_rows(lam, trace_hi, pab, ppab, n: int, n_cvt: int,
                    calc_null: bool, reml: bool):
    idx = pab_indices(n_cvt)
    nc_total = _nc_total(n_cvt, calc_null)
    p_yy = pab[nc_total][..., idx.yy]
    pp_yy = ppab[nc_total][..., idx.yy]
    ypkpy = (p_yy - pp_yy) / lam

    if reml:
        df = float(n - n_cvt) if calc_null else float(n - n_cvt - 1)
        trace_p = trace_hi
        for i in range(nc_total):
            d = idx.diag[i]
            trace_p = trace_p - ppab[i][..., d] / pab[i][..., d]
        trace_pk = (df - trace_p) / lam
        return -0.5 * trace_pk + 0.5 * df * ypkpy / p_yy
    else:
        trace_hik = (n - trace_hi) / lam
        return -0.5 * trace_hik + 0.5 * n * ypkpy / p_yy


def dev1_grid(grid_np, data: LmmBatchData, n_cvt: int, calc_null: bool,
              reml: bool):
    """dev1 at a FIXED vector of G shared lambda values, for every lane
    at once: returns (G,) + lanes.

    The per-lane dev1 re-reads the (S, n) rotated block for every grid
    point; with the lambda axis shared across lanes, every x-involving
    base quantity for ALL grid points and both weight powers comes from
    two MXU matmuls that read Utx ONCE — xcross = Utx @ (hi_g^p ⊙ UtWy)
    and xx = Utx² @ hi_g^p — and the {W,y} quantities don't involve x at
    all ((2G, n)(n, m_wy)).  This is the reference's interval scan
    (lmm.cpp:1967-1982, one SNP and one lambda at a time) as a single
    batched program.
    """
    idx = pab_indices(n_cvt)
    n = data.eval.shape[0]
    lanes = data.Utx.shape[:-1]
    lane_nd = len(lanes)
    dtype = data.eval.dtype
    nc_total = _nc_total(n_cvt, calc_null)
    G = len(grid_np)
    lam = jnp.asarray(np.asarray(grid_np), dtype)        # (G,)
    hi = 1.0 / (lam[:, None] * data.eval + 1.0)          # (G, n)
    HiP = jnp.stack([hi, hi * hi])                        # (2, G, n)
    trace_hi = jnp.sum(hi, axis=-1)                       # (G,)

    shared = jnp.matmul(HiP.reshape(2 * G, n),
                        data.wy_prod).reshape(2, G, -1)   # (2, G, m_wy)
    Wb = jnp.einsum("pgn,nc->npgc", HiP, data.UtWy)       # (n, 2, G, c+1)
    xcross = jnp.matmul(data.Utx, Wb.reshape(n, -1))
    xcross = xcross.reshape(lanes + (2, G, n_cvt + 1))
    xx = jnp.matmul(data.Utx * data.Utx,
                    HiP.reshape(2 * G, n).T).reshape(lanes + (2, G))

    wy_col = {int(q): i for i, q in enumerate(idx.wy_positions)}
    xw_col = {int(q): int(j) for q, j in zip(idx.xw_positions,
                                             idx.xw_partners)}
    full = (G,) + lanes
    rows = []
    for p in range(2):
        parts = []
        for k in range(idx.n_index):
            if k in wy_col:
                v = shared[p, :, wy_col[k]].reshape(
                    (G,) + (1,) * lane_nd)
                parts.append(jnp.broadcast_to(v, full))
            elif k == idx.xx:
                parts.append(jnp.moveaxis(xx[..., p, :], -1, 0))
            else:
                parts.append(jnp.moveaxis(
                    xcross[..., p, :, xw_col[k]], -1, 0))
        rows.append(jnp.stack(parts, axis=-1))            # (G,)+lanes+(ni,)

    pab = _pab_rows(rows[0], n_cvt)
    ppab = _ppab_rows(rows[1], pab, n_cvt)
    lam_b = lam.reshape((G,) + (1,) * lane_nd)
    tr_b = trace_hi.reshape((G,) + (1,) * lane_nd)
    return _dev1_from_rows(lam_b, tr_b, pab, ppab, n, n_cvt,
                           calc_null, reml)


def dev12(lam, data: LmmBatchData, n_cvt: int, calc_null: bool, reml: bool):
    """First and second derivatives (LogRL_dev12 / LogL_dev12)."""
    idx = pab_indices(n_cvt)
    n = data.eval.shape[0]
    nc_total = _nc_total(n_cvt, calc_null)

    _, hi = _weights(lam, data.eval)
    trace_hi = jnp.sum(hi, axis=-1)
    trace_hihi = jnp.sum(hi * hi, axis=-1)

    row1, row2, row3 = _base_rows_multi(hi, data, n_cvt, 3)
    pab = _pab_rows(row1, n_cvt)
    ppab = _ppab_rows(row2, pab, n_cvt)
    pppab = _pppab_rows(row3, pab, ppab, n_cvt)

    p_yy = pab[nc_total][..., idx.yy]
    pp_yy = ppab[nc_total][..., idx.yy]
    ppp_yy = pppab[nc_total][..., idx.yy]
    ypkpy = (p_yy - pp_yy) / lam
    ypkpkpy = (p_yy + ppp_yy - 2.0 * pp_yy) / (lam * lam)

    if reml:
        df = float(n - n_cvt) if calc_null else float(n - n_cvt - 1)
        trace_p = trace_hi
        trace_pp = trace_hihi
        for i in range(nc_total):
            d = idx.diag[i]
            ps_ww = pab[i][..., d]
            ps2_ww = ppab[i][..., d]
            ps3_ww = pppab[i][..., d]
            trace_p = trace_p - ps2_ww / ps_ww
            trace_pp = trace_pp + ps2_ww * ps2_ww / (ps_ww * ps_ww) - 2.0 * ps3_ww / ps_ww
        trace_pk = (df - trace_p) / lam
        trace_pkpk = (df + trace_pp - 2.0 * trace_p) / (lam * lam)
        d1 = -0.5 * trace_pk + 0.5 * df * ypkpy / p_yy
        d2 = (0.5 * trace_pkpk
              - 0.5 * df * (2.0 * ypkpkpy * p_yy - ypkpy * ypkpy) / (p_yy * p_yy))
        return d1, d2
    else:
        trace_hik = (n - trace_hi) / lam
        trace_hikhik = (n + trace_hihi - 2.0 * trace_hi) / (lam * lam)
        d1 = -0.5 * trace_hik + 0.5 * n * ypkpy / p_yy
        d2 = (0.5 * trace_hikhik
              - 0.5 * n * (2.0 * ypkpkpy * p_yy - ypkpy * ypkpy) / (p_yy * p_yy))
        return d1, d2


def wald_stats(lam, data: LmmBatchData, n_cvt: int):
    """beta, se, p_wald ingredients at the REML lambda (CalcRLWald).

    Returns (beta, se, f_stat, df): the F statistic feeds the F(1, df)
    survival function.
    """
    idx = pab_indices(n_cvt)
    n = data.eval.shape[0]
    df = float(n - n_cvt - 1)

    _, hi = _weights(lam, data.eval)
    pab = _pab_rows(_base_row(hi, data, n_cvt), n_cvt)

    p_yy = pab[n_cvt][..., idx.yy]
    p_xx = pab[n_cvt][..., idx.xx]
    p_xy = pab[n_cvt][..., idx.xy]
    px_yy = pab[n_cvt + 1][..., idx.yy]

    beta = p_xy / p_xx
    tau = df / px_yy
    se = jnp.sqrt(1.0 / (tau * p_xx))
    # identically (p_yy - px_yy) * tau (CalcRLWald, lmm.cpp:1125-1157:
    # the recurrence defines px_yy = p_yy - p_xy²/p_xx), but free of
    # the catastrophic cancellation: for near-null SNPs p_yy and px_yy
    # agree to ~7 digits and the float32 difference came out negative,
    # saturating p_wald at 1.0 (measured 2.8e-3 absolute p error —
    # outside the speed-mode contract; tests/test_f32_parity_dc.py)
    f_stat = (p_xy * p_xy / p_xx) * tau
    return beta, se, f_stat, df


def score_stats(lam_null, data: LmmBatchData, n_cvt: int):
    """beta, se, score-test F statistic at the null MLE lambda (CalcRLScore)."""
    idx = pab_indices(n_cvt)
    n = data.eval.shape[0]
    df = float(n - n_cvt - 1)

    _, hi = _weights(lam_null, data.eval)
    pab = _pab_rows(_base_row(hi, data, n_cvt), n_cvt)

    p_yy = pab[n_cvt][..., idx.yy]
    p_xx = pab[n_cvt][..., idx.xx]
    p_xy = pab[n_cvt][..., idx.xy]
    px_yy = pab[n_cvt + 1][..., idx.yy]

    beta = p_xy / p_xx
    tau = df / px_yy
    se = jnp.sqrt(1.0 / (tau * p_xx))
    f_stat = n * p_xy * p_xy / (p_yy * p_xx)
    return beta, se, f_stat, df
