"""Batched lambda optimisation: interval scan + Brent + Newton polish.

Replicates the control flow of GEMMA's `CalcLambda` (lmm.cpp:1945-2140)
for a whole SNP block at once:

  1. evaluate d logL / d lambda at n_region+1 log-spaced grid points in
     [l_min, l_max]; intervals where the sign changes are root brackets,
  2. for each bracket (processed in interval order, one "pass" per
     lane-local bracket) run Brent's method until the bracket shrinks to
     1e-1 relative width (GSL `gsl_root_test_interval(0, 1e-1)`),
  3. polish with Newton's method on (dev1, dev2) until successive
     iterates agree to 1e-5 relative (GSL `gsl_root_test_delta`), with
     GEMMA's exact quirks: the *second-to-last* Newton iterate is kept
     (lmm.cpp:2096), and a Newton sequence that leaves (l_min, l_max) or
     hits a non-finite value poisons the whole SNP with NaN
     (lmm.cpp:2078-2094),
  4. keep the bracket root with the best log-likelihood (first bracket
     accepted unconditionally, later ones on strict improvement,
     lmm.cpp:2109-2116), then compare against the endpoints l_min/l_max
     on strict improvement (lmm.cpp:2121-2136).

Vectorisation: every lane (SNP) carries its own Brent/Newton state;
iterations run under `lax.while_loop` until all active lanes converge,
so a batch costs max-iterations-over-lanes, each iteration being one
fused likelihood-derivative evaluation over the block (MXU matmuls, see
likelihood.py).  Brent's update is the classical Brent-Dekker step
(inverse quadratic / secant with bisection fallback) exactly as GSL
implements it, so the root trajectories match the reference.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gemma_tpu.models.lmm import likelihood as lk

_BRENT_MAX_ITER = 100
_NEWTON_MAX_ITER = 100
_BRENT_EPSREL = 1e-1
_NEWTON_EPSREL = 1e-5
# float32 speed mode: sub-intervals per coarse grid interval in the
# shared-lambda fine scan (bracket width 10^(1/16) ≈ 1.15 at the
# default l_min/l_max — tight enough that Newton converges in a few
# iterations and the midpoint is a safe fallback)
_F32_GRID_REFINE = 16


class _BrentState(NamedTuple):
    a: jax.Array
    b: jax.Array
    c: jax.Array
    fa: jax.Array
    fb: jax.Array
    fc: jax.Array
    d: jax.Array
    e: jax.Array
    converged: jax.Array
    it: jax.Array


def _brent_batched(f: Callable, lo, hi, flo, fhi, active):
    """Vectorised Brent-Dekker root finding on brackets [lo, hi].

    Stops a lane once GSL's interval test (epsabs=0, epsrel=1e-1)
    passes.  Returns (root, converged, cap_hit).
    """
    eps = jnp.finfo(lo.dtype).eps

    state = _BrentState(
        a=lo, b=hi, c=hi, fa=flo, fb=fhi, fc=fhi,
        d=hi - lo, e=hi - lo,
        converged=jnp.zeros(lo.shape, dtype=bool),
        it=jnp.zeros((), dtype=jnp.int32),
    )

    def interval_ok(b, c):
        xlo = jnp.minimum(b, c)
        xhi = jnp.maximum(b, c)
        straddle = (xlo > 0) & (xhi > 0) | ((xlo < 0) & (xhi < 0))
        min_abs = jnp.where(straddle, jnp.minimum(jnp.abs(xlo), jnp.abs(xhi)), 0.0)
        return jnp.abs(xhi - xlo) < _BRENT_EPSREL * min_abs

    def cond(s: _BrentState):
        return (s.it < _BRENT_MAX_ITER) & jnp.any(active & ~s.converged)

    def body(s: _BrentState):
        live = active & ~s.converged

        # --- transform phase (GSL brent_iterate preamble) ---
        a, b, c, fa, fb, fc, d, e = s.a, s.b, s.c, s.fa, s.fb, s.fc, s.d, s.e

        same_side = ((fb < 0) & (fc < 0)) | ((fb > 0) & (fc > 0))
        ac_equal = same_side
        c = jnp.where(same_side, a, c)
        fc = jnp.where(same_side, fa, fc)
        d = jnp.where(same_side, b - a, d)
        e = jnp.where(same_side, b - a, e)

        swap = jnp.abs(fc) < jnp.abs(fb)
        ac_equal = ac_equal | swap
        a2 = jnp.where(swap, b, a)
        b2 = jnp.where(swap, c, b)
        c2 = jnp.where(swap, a2, c)
        fa2 = jnp.where(swap, fb, fa)
        fb2 = jnp.where(swap, fc, fb)
        fc2 = jnp.where(swap, fa2, fc)
        a, b, c, fa, fb, fc = a2, b2, c2, fa2, fb2, fc2

        tol = 0.5 * eps * jnp.abs(b)
        m = 0.5 * (c - b)

        early = (fb == 0) | (jnp.abs(m) <= tol)

        # --- step phase (interpolation with bisection fallback) ---
        bisect = (jnp.abs(e) < tol) | (jnp.abs(fa) <= jnp.abs(fb))
        s_r = fb / jnp.where(fa != 0, fa, 1.0)
        # two-point (secant) form when a == c
        p_2 = 2.0 * m * s_r
        q_2 = 1.0 - s_r
        # three-point inverse quadratic form
        q_3 = fa / jnp.where(fc != 0, fc, 1.0)
        r_3 = fb / jnp.where(fc != 0, fc, 1.0)
        p_3 = s_r * (2.0 * m * q_3 * (q_3 - r_3) - (b - a) * (r_3 - 1.0))
        q3b = (q_3 - 1.0) * (r_3 - 1.0) * (s_r - 1.0)
        p = jnp.where(ac_equal, p_2, p_3)
        q = jnp.where(ac_equal, q_2, q3b)
        q = jnp.where(p > 0, -q, q)
        p = jnp.where(p > 0, p, -p)
        interp_ok = 2.0 * p < jnp.minimum(3.0 * m * q - jnp.abs(tol * q),
                                          jnp.abs(e * q))
        d_new = jnp.where(interp_ok, p / jnp.where(q != 0, q, 1.0), m)
        e_new = jnp.where(interp_ok, d, m)
        d_new = jnp.where(bisect, m, d_new)
        e_new = jnp.where(bisect, m, e_new)

        step = jnp.where(jnp.abs(d_new) > tol, d_new,
                         jnp.where(m > 0, tol, -tol))
        b_n = b + step
        b_eval = jnp.where(live & ~early, b_n, jnp.ones_like(b_n))
        fb_n = f(b_eval)

        # --- commit: stepping lanes take post-step state; early lanes
        # commit the transformed (possibly swapped) root and freeze;
        # finished lanes keep their state untouched ---
        do_step = live & ~early
        do_early = live & early

        def commit(step_v, early_v, old_v):
            return jnp.where(do_step, step_v, jnp.where(do_early, early_v, old_v))

        a_out = commit(b, a, s.a)          # post-step: a := b
        b_out = commit(b_n, b, s.b)
        c_out = commit(c, c, s.c)
        fa_out = commit(fb, fa, s.fa)      # post-step: fa := fb
        fb_out = commit(fb_n, fb, s.fb)
        fc_out = commit(fc, fc, s.fc)
        d_out = commit(d_new, d, s.d)
        e_out = commit(e_new, e, s.e)

        conv_now = (do_step & interval_ok(b_out, c_out)) | do_early
        converged = s.converged | conv_now

        return _BrentState(a_out, b_out, c_out, fa_out, fb_out, fc_out,
                           d_out, e_out, converged, s.it + 1)

    out = jax.lax.while_loop(cond, body, state)
    cap_hit = active & ~out.converged
    return out.b, out.converged, cap_hit


class _NewtonState(NamedTuple):
    x_prev: jax.Array
    x: jax.Array
    f: jax.Array
    df: jax.Array
    converged: jax.Array
    failed: jax.Array
    it: jax.Array


def _newton_batched(fdf: Callable, x0, active, l_min: float, l_max: float,
                    epsrel: float = _NEWTON_EPSREL):
    """Vectorised GSL-Newton polish with GEMMA's exit semantics.

    Returns (root = second-to-last iterate, converged, failed).
    `failed` lanes must be reported as NaN (lmm.cpp:2087-2094).
    """
    f0, df0 = fdf(x0)
    state = _NewtonState(
        x_prev=x0, x=x0, f=f0, df=df0,
        converged=jnp.zeros(x0.shape, dtype=bool),
        failed=jnp.zeros(x0.shape, dtype=bool),
        it=jnp.zeros((), dtype=jnp.int32),
    )

    def cond(s: _NewtonState):
        return (s.it < _NEWTON_MAX_ITER) & jnp.any(
            active & ~s.converged & ~s.failed)

    def body(s: _NewtonState):
        live = active & ~s.converged & ~s.failed
        zero_div = s.df == 0.0
        step_x = s.x - s.f / jnp.where(zero_div, 1.0, s.df)
        f_new, df_new = fdf(step_x)
        bad = ~jnp.isfinite(f_new) | ~jnp.isfinite(df_new)
        # GSL test_delta(x1=new, x0=old, epsabs=0, epsrel=1e-5)
        conv = (jnp.abs(step_x - s.x) < epsrel * jnp.abs(step_x)) | (
            step_x == s.x)
        oob = ~((step_x > l_min) & (step_x < l_max))

        fail_now = live & (zero_div | bad | (~conv & oob))
        conv_now = live & ~zero_div & ~bad & conv

        cont = live & ~fail_now & ~conv_now
        x_prev = jnp.where(live & ~zero_div, s.x, s.x_prev)
        x = jnp.where(live & ~zero_div, step_x, s.x)
        f = jnp.where(cont, f_new, s.f)
        df = jnp.where(cont, df_new, s.df)

        return _NewtonState(
            x_prev=x_prev, x=x, f=f, df=df,
            converged=s.converged | conv_now,
            failed=s.failed | fail_now,
            it=s.it + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    # lanes still live at the iteration cap exited with GSL_CONTINUE → NaN
    cap_failed = active & ~out.converged & ~out.failed
    return out.x_prev, out.converged, out.failed | cap_failed


class LambdaResult(NamedTuple):
    lam: jax.Array   # (S,)
    logf: jax.Array  # (S,)


@functools.partial(
    jax.jit,
    static_argnames=("n_cvt", "calc_null", "reml", "l_min", "l_max",
                     "n_region"))
def calc_lambda(data: lk.LmmBatchData, n_cvt: int, calc_null: bool,
                reml: bool, l_min: float, l_max: float,
                n_region: int) -> LambdaResult:
    """Batched equivalent of GEMMA CalcLambda over a SNP block.

    In float64 the GSL semantics are replicated exactly, including the
    NaN poisoning on Newton failure (golden parity).  In float32 (TPU
    speed mode) the 1e-5 relative Newton tolerance sits below the
    noise floor of the derivative (cancellation of O(n) terms), so the
    tolerance is widened to 5e-4 — still far tighter than the 1e-3
    p-value tolerance — and a lane whose Newton polish fails falls
    back to its Brent bracket root instead of NaN.
    """
    lanes = data.Utx.shape[:-1]   # usually (S,); kernels may use 2-D
    dtype = data.eval.dtype
    strict = dtype == jnp.float64
    newton_epsrel = _NEWTON_EPSREL if strict else 5e-4

    def f_dev1(lam):
        return lk.dev1(lam, data, n_cvt, calc_null, reml)

    def f_dev12(lam):
        return lk.dev12(lam, data, n_cvt, calc_null, reml)

    if strict:
        def f_logf(lam):
            return lk.logf(lam, data, n_cvt, calc_null, reml)
    else:
        # float32: the Pab p_yy suffers catastrophic cancellation at
        # extreme lambda (measured +13-nat logf inflation at l_max on
        # BXD, flipping the boundary selection); the residual-form
        # evaluation is cancellation-free (lk.logf_stable)
        def f_logf(lam):
            return lk.logf_stable(lam, data, n_cvt, calc_null, reml)

    # 1. grid scan of dev1 signs (lmm.cpp:1967-1982).
    #
    #    float64 parity mode keeps the original per-point evaluation —
    #    its summation order fixes the Brent/Newton trajectories and
    #    the NaN-poisoning boundary, which the staging roundtrip tests
    #    pin at the NaN-location level.
    #
    #    float32 speed mode evaluates an R×-finer grid in ONE
    #    shared-lambda batched program (lk.dev1_grid reads the rotated
    #    block once, not once per point): the coarse intervals keep the
    #    reference's bracket DEFINITION (a root the 10-point scan
    #    misses stays missed), while the fine sub-bracket hands Newton
    #    a start within ~10^(1/(2R)) of the root, replacing the
    #    memory-bound per-lane Brent while_loop entirely.
    step = np.log(l_max / l_min) / n_region
    refine = 1 if strict else _F32_GRID_REFINE
    n_fine = n_region * refine
    fine_np = l_min * np.exp((step / refine) * np.arange(n_fine + 1))
    if strict:
        d1f = jnp.stack([f_dev1(jnp.full(lanes, g, dtype=dtype))
                         for g in fine_np])
    else:
        d1f = lk.dev1_grid(fine_np, data, n_cvt, calc_null, reml)
    d1 = d1f[::refine]                              # coarse points
    grid_np = fine_np[::refine]
    sign_change = d1[:-1] * d1[1:] <= 0.0           # (G, S)
    num_changes = jnp.sum(sign_change, axis=0)      # (S,)
    sign_change_f = d1f[:-1] * d1f[1:] <= 0.0       # (Gf, S)

    # j-th sign-change interval per lane via cumulative counts and a
    # one-hot contraction (no argsort/gather)
    grid = jnp.asarray(grid_np, dtype=dtype)
    csum = jnp.cumsum(sign_change.astype(jnp.int32), axis=0)  # (G, S)
    lane_nd = sign_change.ndim - 1
    g_iota = jnp.arange(n_region, dtype=jnp.int32).reshape(
        (n_region,) + (1,) * lane_nd)
    gp_iota = jnp.arange(n_region + 1).reshape(
        (n_region + 1,) + (1,) * lane_nd)
    grid_col = grid.reshape((n_region + 1,) + (1,) * lane_nd)

    fine = jnp.asarray(fine_np, dtype=dtype)
    f_iota = jnp.arange(n_fine, dtype=jnp.int32).reshape(
        (n_fine,) + (1,) * lane_nd)

    def bracket_at(j):
        """(lo, hi, flo, fhi) of each lane's j-th sign-change interval;
        lanes with fewer changes get unused dummies.  Speed mode
        narrows the coarse interval to its leftmost sign-changing fine
        sub-interval (the coarse endpoints straddle, so one exists —
        argmax returns the first True)."""
        onehot = (sign_change & (csum == j + 1)).astype(d1.dtype)
        iv = jnp.sum(g_iota * onehot.astype(jnp.int32), axis=0)
        if strict:
            sel_lo = (gp_iota == iv[None]).astype(d1.dtype)
            sel_hi = (gp_iota == iv[None] + 1).astype(d1.dtype)
            lo = jnp.sum(grid_col * sel_lo, axis=0)
            hi = jnp.sum(grid_col * sel_hi, axis=0)
            flo = jnp.sum(d1 * sel_lo, axis=0)
            fhi = jnp.sum(d1 * sel_hi, axis=0)
            return lo, hi, flo, fhi
        window = ((f_iota >= iv[None] * refine)
                  & (f_iota < (iv[None] + 1) * refine) & sign_change_f)
        jf = jnp.argmax(window, axis=0)
        lo = fine[jf]
        hi = fine[jf + 1]
        flo = jnp.take_along_axis(d1f, jf[None], axis=0)[0]
        fhi = jnp.take_along_axis(d1f, jf[None] + 1, axis=0)[0]
        return lo, hi, flo, fhi

    neg_inf = jnp.full(lanes, -jnp.inf, dtype=dtype)

    class _Carry(NamedTuple):
        j: jax.Array
        best_logf: jax.Array
        best_lam: jax.Array
        has_cand: jax.Array
        failed: jax.Array
        stopped: jax.Array

    carry0 = _Carry(
        j=jnp.zeros((), jnp.int32),
        best_logf=neg_inf,
        best_lam=jnp.full(lanes, np.nan, dtype=dtype),
        has_cand=jnp.zeros(lanes, bool),
        failed=jnp.zeros(lanes, bool),
        stopped=jnp.zeros(lanes, bool),
    )

    def outer_cond(cy: _Carry):
        active = (cy.j < num_changes) & ~cy.stopped & ~cy.failed
        return (cy.j < n_region) & jnp.any(active)

    def outer_body(cy: _Carry):
        active = (cy.j < num_changes) & ~cy.stopped & ~cy.failed
        lo, hi, flo, fhi = bracket_at(cy.j)

        if strict:
            root_b, brent_conv, brent_cap = _brent_batched(
                f_dev1, lo, hi, flo, fhi, active)
        else:
            # the fine sub-bracket is within 10^(1/refine) relative
            # width: Newton from its geometric midpoint replaces the
            # per-lane Brent while_loop (each iteration of which was a
            # full memory-bound block evaluation)
            root_b = jnp.sqrt(lo * hi)
            brent_conv = jnp.ones_like(active)
            brent_cap = jnp.zeros_like(active)

        newton_active = active & brent_conv
        root_n, nt_conv, nt_failed = _newton_batched(
            f_dev12, root_b, newton_active, l_min, l_max,
            epsrel=newton_epsrel)

        if strict:
            cand_ok = newton_active & nt_conv
        else:
            # robust mode: Newton failure falls back to the Brent root
            root_n = jnp.where(nt_conv, root_n, root_b)
            nt_failed = jnp.zeros_like(nt_failed)
            cand_ok = newton_active
        l_cand = jnp.clip(root_n, l_min, l_max)
        logf_cand = f_logf(l_cand)

        accept = cand_ok & (~cy.has_cand | (logf_cand > cy.best_logf))
        best_logf = jnp.where(accept, logf_cand, cy.best_logf)
        best_lam = jnp.where(accept, l_cand, cy.best_lam)

        return _Carry(
            j=cy.j + 1,
            best_logf=best_logf,
            best_lam=best_lam,
            has_cand=cy.has_cand | cand_ok,
            failed=cy.failed | (newton_active & nt_failed),
            stopped=cy.stopped | brent_cap,
        )

    cy = jax.lax.while_loop(outer_cond, outer_body, carry0)

    # endpoint comparison (lmm.cpp:1985-2000 and 2121-2136)
    logf_lmin = f_logf(jnp.full(lanes, l_min, dtype=dtype))
    logf_lmax = f_logf(jnp.full(lanes, l_max, dtype=dtype))

    best_logf, best_lam = cy.best_logf, cy.best_lam
    take_min = logf_lmin > best_logf
    best_logf = jnp.where(take_min, logf_lmin, best_logf)
    best_lam = jnp.where(take_min, l_min, best_lam)
    take_max = logf_lmax > best_logf
    best_logf = jnp.where(take_max, logf_lmax, best_logf)
    best_lam = jnp.where(take_max, l_max, best_lam)

    nan = jnp.full(lanes, np.nan, dtype=dtype)
    best_logf = jnp.where(cy.failed, nan, best_logf)
    best_lam = jnp.where(cy.failed, nan, best_lam)
    return LambdaResult(lam=best_lam, logf=best_logf)
