"""Multivariate LMM core: batched EM + Newton-Raphson over (Vg, Ve).

Model (reference src/mvlmm.cpp; Zhou & Stephens 2014): d phenotypes
Y (d×n), covariates X (c×n), kinship eigenvalues delta_k.  In the
kinship eigenbasis each individual contributes an independent d-variate
Gaussian with covariance H_k = delta_k Vg + Ve.

Simultaneous diagonalisation (EigenProc, mvlmm.cpp:213-282): with
Ve^-1/2 Vg Ve^-1/2 = Ul D_l Ul', the transform UltVehi = Ul' Ve^-1/2
whitens both matrices: H_k → diag(delta_k D_l + 1).  Every likelihood
quantity then reduces to (d, n) elementwise work plus small matmuls.

TPU-native design decisions vs the reference:
  * the whole SNP batch optimises in lockstep — one (S, ...) program
    with per-lane convergence masks instead of per-SNP EM/NR loops;
  * MphNR's ~1700 lines of hand-derived gradient/Hessian trace
    machinery (mvlmm.cpp:1111-2556) are replaced by jax.grad /
    jax.hessian of the exact restricted likelihood in vech(Vg, Ve)
    coordinates — same observed-information Newton step, derived by
    autodiff rather than by hand;
  * all d×d eigendecompositions are vmapped `jnp.linalg.eigh` calls.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_LOG_2PI = float(np.log(2.0 * np.pi))


def vech_index(i: int, j: int, d: int) -> int:
    """GEMMA GetIndex (upper-triangle row-major flattening)."""
    if j < i:
        i, j = j, i
    return (2 * d - i + 1) * i // 2 + (j - i)


def vech_to_sym(v, d: int):
    """(…, v_size) → (…, d, d) symmetric."""
    rows, cols = np.triu_indices(d)
    order = np.array([vech_index(i, j, d) for i, j in zip(rows, cols)])
    out = jnp.zeros(v.shape[:-1] + (d, d), v.dtype)
    out = out.at[..., rows, cols].set(v[..., order])
    out = out.at[..., cols, rows].set(v[..., order])
    return out


def sym_to_vech(M, d: int):
    rows, cols = np.triu_indices(d)
    order = np.argsort([vech_index(i, j, d) for i, j in zip(rows, cols)])
    return M[..., rows[order], cols[order]]


def _eigh2x2(M):
    """Closed-form symmetric 2x2 eigendecomposition, batched.

    Batched tiny `jnp.linalg.eigh` is iteration-bound on TPU (the MXU
    sees no work); the analytic form is a handful of VPU elementwise
    ops and autodiff-friendly — it carries the per-SNP EM/NR hot loop
    for the most common mvLMM case d=2 (CalcQi/CalcSigma profile,
    releases.org:139-156).  Returns (w ascending, V) like eigh.
    """
    a = M[..., 0, 0]
    b = M[..., 0, 1]
    d = M[..., 1, 1]
    t = 0.5 * (a + d)
    # guard the sqrt at b==0, a==d (grad of sqrt(0) is nan)
    h2 = (0.5 * (a - d)) ** 2 + b * b
    r = jnp.sqrt(jnp.maximum(h2, jnp.finfo(M.dtype).tiny))
    w1 = t - r
    w2 = t + r
    # eigenvector for w2: (b, w2 - a) or (w2 - d, b) — pick the
    # better-conditioned form per lane
    use1 = jnp.abs(w2 - a) >= jnp.abs(w2 - d)
    vx = jnp.where(use1, b, w2 - d)
    vy = jnp.where(use1, w2 - a, b)
    # b==0: diagonal matrix — unit vectors by diagonal order
    diag = jnp.abs(b) <= jnp.finfo(M.dtype).tiny * 8
    big_is_a = a >= d
    vx = jnp.where(diag, jnp.where(big_is_a, 1.0, 0.0), vx)
    vy = jnp.where(diag, jnp.where(big_is_a, 0.0, 1.0), vy)
    nrm = jnp.sqrt(vx * vx + vy * vy)
    nrm = jnp.where(nrm == 0, 1.0, nrm)
    vx = vx / nrm
    vy = vy / nrm
    w = jnp.stack([w1, w2], axis=-1)
    # V columns: v(w1) = (-vy, vx) (orthogonal complement), v(w2)
    V = jnp.stack([jnp.stack([-vy, vx], axis=-1),
                   jnp.stack([vx, vy], axis=-1)], axis=-1)
    return w, V


def _sym_eigh(M):
    """Batched symmetric eigh: closed form for d=2, LAPACK-backed
    `jnp.linalg.eigh` otherwise."""
    if M.shape[-1] == 2:
        return _eigh2x2(M)
    return jnp.linalg.eigh(M)


def eigen_proc(Vg, Ve):
    """Simultaneous diagonalisation of (Vg, Ve).

    Returns (D_l, UltVeh, UltVehi, logdet_Ve); batched over leading
    axes.  Mirrors EigenProc: nonpositive Ve eigenvalues are skipped
    (pseudo-root), negative D_l are zeroed.
    """
    ev, Uv = _sym_eigh(Ve)
    pos = ev > 0
    sqrt_ev = jnp.sqrt(jnp.where(pos, ev, 1.0))
    logdet_Ve = jnp.sum(jnp.where(pos, jnp.log(jnp.where(pos, ev, 1.0)), 0.0),
                        axis=-1)
    # Ve^{1/2} and Ve^{-1/2} from the (pseudo-)spectral root
    Veh = jnp.einsum("...ik,...k,...jk->...ij", Uv,
                     jnp.where(pos, sqrt_ev, 0.0), Uv)
    Vehi = jnp.einsum("...ik,...k,...jk->...ij", Uv,
                      jnp.where(pos, 1.0 / sqrt_ev, 0.0), Uv)
    Lam = Vehi @ Vg @ Vehi
    D_l, Ul = _sym_eigh(Lam)
    D_l = jnp.where(D_l < 0, 0.0, D_l)
    UltVeh = jnp.swapaxes(Ul, -1, -2) @ Veh
    UltVehi = jnp.swapaxes(Ul, -1, -2) @ Vehi
    return D_l, UltVeh, UltVehi, logdet_Ve


def _blocks_inv_logdet(blocks):
    """Batched inverse + log|det| of small (..., c, c) blocks.

    c<=2 uses the closed adjugate form (no LU): inside the SNP-batched
    EM these blocks are the entire CalcQi cost — GEMMA profiles CalcQi
    at 22.7% of an mvLMM run (test/performance/releases.org:139-156)
    and a batched LU over 16k lanes per EM iteration is the TPU
    analogue.  Larger c falls back to LAPACK-style inv/slogdet.
    Returns ((..., c, c), (...,))."""
    c = blocks.shape[-1]
    if c == 1:
        det = blocks[..., 0, 0]
        inv = (1.0 / det)[..., None, None]
    elif c == 2:
        a = blocks[..., 0, 0]
        b = blocks[..., 0, 1]
        e = blocks[..., 1, 0]
        f = blocks[..., 1, 1]
        det = a * f - b * e
        inv = jnp.stack(
            [jnp.stack([f, -b], -1), jnp.stack([-e, a], -1)],
            -2) / det[..., None, None]
    else:
        sign, ld = jnp.linalg.slogdet(blocks)
        return jnp.linalg.inv(blocks), ld
    return inv, jnp.log(jnp.abs(det))


def calc_qi(eval_, D_l, X, with_blocks: bool = False):
    """Q^{-1} and log|Q| where Q[i*d+l, j*d+l] = sum_k X_ik X_jk /
    (D_l[l] delta_k + 1) (CalcQi, mvlmm.cpp:285-329).

    Q couples covariates only within one whitened phenotype l — it is
    a permuted block-diagonal of d Gram blocks of size c×c — so the
    inverse is d small inverses and log|Q| the sum of block logdets;
    no (dc, dc) LU ever runs (the reference LU-inverts the full dc×dc
    Q per SNP per iteration).

    eval_: (n,), D_l: (..., d), X: (c, n).  Returns (..., dc, dc) and
    log|Q|; with_blocks=True appends the (..., d, c, c) per-phenotype
    inverse blocks so consumers can contract block-wise instead of
    through the mostly-zero full matrix.
    """
    d = D_l.shape[-1]
    c = X.shape[-2]
    # weights (..., d, n)
    w = 1.0 / (D_l[..., :, None] * eval_ + 1.0)
    # blocks (..., d, c, c)
    blocks = jnp.einsum("...ln,...in,...jn->...lij", w, X, X)
    batch = blocks.shape[:-3]
    binv, bld = _blocks_inv_logdet(blocks)
    Q4 = jnp.zeros(batch + (c, d, c, d), blocks.dtype)
    ld = np.arange(d)
    # set Q4[..., :, l, :, l] = binv[..., l, :, :]; the two advanced
    # index axes are non-adjacent so they land in front of the result
    Q4 = Q4.at[..., :, ld, :, ld].set(jnp.moveaxis(binv, -3, 0))
    Qi = Q4.reshape(batch + (c * d, c * d))
    if with_blocks:
        return Qi, bld.sum(-1), binv
    return Qi, bld.sum(-1)


def _calc_xhiy(eval_, D_l, X, UltVehiY):
    """xHiy[j*d+i] = sum_k X_jk UltVehiY_ik / (delta_k D_l[i] + 1)
    (CalcXHiY, mvlmm.cpp:334-359).  Returns (..., c*d)."""
    d = D_l.shape[-1]
    c = X.shape[-2]
    w = 1.0 / (D_l[..., :, None] * eval_ + 1.0)         # (..., d, n)
    wy = w * UltVehiY                                    # (..., d, n)
    out = jnp.einsum("...jn,...in->...ji", X, wy)        # (..., c, d)
    return out.reshape(out.shape[:-2] + (c * d,))


def mph_calc_logl(eval_, xHiy, D_l, UltVehiY, Qi):
    """-0.5(sum_k y'H^-1y + log|H_k|) + 0.5 xHiy' Qi xHiy
    (MphCalcLogL, mvlmm.cpp:565-594)."""
    v = D_l[..., :, None] * eval_ + 1.0                  # (..., d, n)
    quad = jnp.sum(UltVehiY * UltVehiY / v, axis=(-1, -2))
    logd = jnp.sum(jnp.log(v), axis=(-1, -2))
    qQq = jnp.einsum("...i,...ij,...j->...", xHiy, Qi, xHiy)
    return -0.5 * (quad + logd - qQq)


class EmState(NamedTuple):
    Vg: jax.Array
    Ve: jax.Array
    B: jax.Array
    BX: jax.Array       # ML mode: UltVehiB @ X carried across iterations
    logl: jax.Array
    logl_prev: jax.Array
    done: jax.Array
    t: jax.Array


@functools.partial(jax.jit,
                   static_argnames=("reml", "max_iter", "prec",
                                    "with_bx"))
def mph_em(reml: bool, max_iter: int, prec: float, eval_, X, Y,
           Vg0, Ve0, B0, iter_cap=None, BX0=None, with_bx: bool = False):
    """Batched PX-EM for (Vg, Ve, B) (MphEM, mvlmm.cpp:599-724).

    eval_: (n,); X: (..., c, n); Y: (d, n); Vg0/Ve0: (..., d, d);
    B0: (..., d, c).  Leading batch axes optimise in lockstep with
    per-lane convergence freezing (|Δlogl| < prec, checked from t=1).
    Returns (Vg, Ve, B, logl, done) — `done` marks lanes that actually
    converged (or went non-finite), letting callers compact and
    continue the stragglers (mvlmm._em_staged_reml).

    ML-mode resumability: GEMMA's ML EM carries the stale UltVehiBX
    matrix across iterations (mvlmm.cpp:679-694) — a restart that
    reseeded it from B would change the trajectory.  Passing BX0 (the
    carried matrix from a previous burst) continues the exact
    trajectory; with_bx=True appends the carried BX to the return so
    burst drivers can thread it.  (REML mode depends only on (Vg, Ve)
    and composes without this.)
    """
    n = eval_.shape[0]
    d = Y.shape[0]
    c = X.shape[-2]
    batch = Vg0.shape[:-2]

    XXt = X @ jnp.swapaxes(X, -1, -2)                    # (..., c, c)
    XXti = jnp.linalg.inv(XXt)
    _, logdet_XXt = jnp.linalg.slogdet(XXt)
    if reml:
        logl_const = (-0.5 * (n - c) * d * _LOG_2PI
                      + 0.5 * d * logdet_XXt)
    else:
        logl_const = -0.5 * n * d * _LOG_2PI

    def body(s: EmState) -> EmState:
        D_l, UltVeh, UltVehi, logdet_Ve = eigen_proc(s.Vg, s.Ve)
        Qi, logdet_Q, Qb = calc_qi(eval_, D_l, X, with_blocks=True)
        UltVehiY = UltVehi @ Y                            # (..., d, n)
        xHiy = _calc_xhiy(eval_, D_l, X, UltVehiY)

        logl = (logl_const + mph_calc_logl(eval_, xHiy, D_l, UltVehiY, Qi)
                - 0.5 * n * logdet_Ve)
        if reml:
            logl = logl - 0.5 * (logdet_Q - c * logdet_Ve)

        # non-finite lanes (f32 overflow, degenerate SNPs) must freeze
        # too: a single NaN lane would otherwise force the whole
        # lockstep block to max_iter (measured: the 2048-block EM
        # burned 1000 iterations at ~3.1 ms each on stragglers).
        # GEMMA's MphEM never converges on NaN (|NaN-x|<prec is false)
        # and runs to max_iter with NaN-poisoned Vg/Ve/logl
        # (mvlmm.cpp:599-724) — so a lane newly frozen for
        # non-finiteness is NaN-poisoned here, reproducing the
        # reference output without paying the stalled iterations
        nanfrozen = (s.t > 0) & ~s.done & ~jnp.isfinite(logl)
        conv = (s.t > 0) & ((jnp.abs(logl - s.logl_prev) < prec)
                            | ~jnp.isfinite(logl))
        done_new = s.done | conv

        # --- M step (skipped for frozen lanes) ---
        v = D_l[..., :, None] * eval_ + 1.0
        OmegaU = D_l[..., :, None] / v                    # (..., d, n)
        OmegaE = eval_ * OmegaU

        if reml:
            # UpdateRL_B: B = unvec(Qi xHiy) (mvlmm.cpp:420-441)
            b = jnp.einsum("...ij,...j->...i", Qi, xHiy)  # (..., c*d)
            UltVehiB = jnp.swapaxes(
                b.reshape(b.shape[:-1] + (c, d)), -1, -2)  # (..., d, c)
            UltVehiBX = UltVehiB @ X
            BX_carry = s.BX  # unused in REML mode
        else:
            # ML mode: GEMMA seeds UltVehiBX from the input B at t==0
            # and afterwards reuses the matrix carried from the
            # previous iteration (old basis) — replicated exactly
            # (mvlmm.cpp:679-694).  A resumed burst (BX0 given) is
            # mid-trajectory: its t==0 uses the carried matrix.
            seed_BX = (UltVehi @ s.B) @ X
            fresh = (s.t == 0) & (BX0 is None)
            UltVehiBX = jnp.where(fresh, seed_BX, s.BX)

        UltVehiU = OmegaE * (UltVehiY - UltVehiBX)

        if not reml:
            # UpdateL_B: B from residual Y - U (mvlmm.cpp:402-418)
            YUX = (UltVehiY - UltVehiU) @ jnp.swapaxes(X, -1, -2)
            UltVehiB = YUX @ XXti
            UltVehiBX = UltVehiB @ X
            BX_carry = UltVehiBX
        UltVehiE = UltVehiY - UltVehiBX - UltVehiU

        UltVehT = jnp.swapaxes(UltVeh, -1, -2)
        U_hat = UltVehT @ UltVehiU                        # (..., d, n)
        E_hat = UltVehT @ UltVehiE
        B_new = UltVehT @ UltVehiB

        # Sigma_uu/Sigma_ee (CalcSigma, mvlmm.cpp:485-560)
        Suu = jnp.zeros(batch + (d, d), Y.dtype)
        See = jnp.zeros(batch + (d, d), Y.dtype)
        dd = np.arange(d)
        Suu = Suu.at[..., dd, dd].set(jnp.sum(OmegaU, axis=-1))
        See = See.at[..., dd, dd].set(jnp.sum(OmegaE, axis=-1))
        if reml:
            # M_e[k] has columns x_jk/(delta_k dl_i+1) placed at row
            # j*d+i, col i; Sigma += sum_k M' Qi M (with dl/delta
            # factors).  Qi is block-diagonal across the whitened
            # phenotype index (see calc_qi), so M' Qi M is DIAGONAL
            # and each entry is a c×c contraction with Qi's block —
            # never the (cd)² full-matrix einsum.
            w = 1.0 / v                                    # (..., d, n)
            Xw = jnp.einsum("...jn,...in->...jin", X, w)   # (..., c, d, n)
            Gee = jnp.einsum("...jan,...qan->...ajq", Xw, Xw)
            see2 = jnp.sum(Qb * Gee, axis=(-1, -2))        # (..., d)
            See = See.at[..., dd, dd].add(see2)
            Xwu = Xw * D_l[..., None, :, None]             # times dl
            Guu = jnp.einsum("...jan,...qan,n->...ajq", Xwu, Xwu, eval_)
            suu2 = jnp.sum(Qb * Guu, axis=(-1, -2))
            Suu = Suu.at[..., dd, dd].add(suu2)
        Suu = UltVehT @ Suu @ UltVeh
        See = UltVehT @ See @ UltVeh

        # UpdateV (mvlmm.cpp:443-483)
        nz = eval_ != 0
        inv_ev = jnp.where(nz, 1.0 / jnp.where(nz, eval_, 1.0), 0.0)
        Vg_new = (jnp.einsum("...in,n,...jn->...ij", U_hat, inv_ev, U_hat)
                  + Suu) / n
        Ve_new = (E_hat @ jnp.swapaxes(E_hat, -1, -2) + See) / n

        keep = done_new
        km = keep[..., None, None] if batch else keep
        nm = nanfrozen[..., None, None] if batch else nanfrozen
        nan = jnp.asarray(jnp.nan, Y.dtype)
        Vg_out = jnp.where(nm, nan, jnp.where(km, s.Vg, Vg_new))
        Ve_out = jnp.where(nm, nan, jnp.where(km, s.Ve, Ve_new))
        B_out = jnp.where(nm, nan, jnp.where(km, s.B, B_new))
        BX_out = jnp.where(km, s.BX, BX_carry)
        logl_out = jnp.where(nanfrozen, logl,
                             jnp.where(keep, s.logl, logl))
        logl_prev = jnp.where(keep, s.logl_prev, logl)

        return EmState(Vg=Vg_out, Ve=Ve_out, B=B_out, BX=BX_out,
                       logl=logl_out, logl_prev=logl_prev, done=done_new,
                       t=s.t + 1)

    # iter_cap (runtime scalar) lets burst drivers bound iterations
    # without a fresh compile per burst length
    cap = max_iter if iter_cap is None else jnp.minimum(iter_cap, max_iter)

    def cond(s: EmState):
        return (s.t < cap) & ~jnp.all(s.done)

    zero = jnp.zeros(batch, Y.dtype)
    state = EmState(Vg=Vg0, Ve=Ve0, B=B0,
                    BX=(jnp.zeros(batch + (d, n), Y.dtype)
                        if BX0 is None else BX0),
                    logl=zero, logl_prev=zero,
                    done=jnp.zeros(batch, bool), t=jnp.zeros((), jnp.int32))
    out = jax.lax.while_loop(cond, body, state)
    if with_bx:
        return out.Vg, out.Ve, out.B, out.logl, out.done, out.BX
    return out.Vg, out.Ve, out.B, out.logl, out.done


# ---------------------------------------------------------------------------
# Newton-Raphson refinement (MphNR, mvlmm.cpp:2608-2761) via autodiff

def _nr_logl_fn(reml: bool, eval_, X, Y):
    """The exact (restricted) log-likelihood as a function of
    vech(Vg) ++ vech(Ve), B profiled out.  Autodiffable."""
    n = eval_.shape[0]
    d = Y.shape[0]
    c = X.shape[-2]
    XXt = X @ jnp.swapaxes(X, -1, -2)
    _, logdet_XXt = jnp.linalg.slogdet(XXt)
    if reml:
        logl_const = (-0.5 * (n - c) * d * _LOG_2PI + 0.5 * d * logdet_XXt)
    else:
        logl_const = -0.5 * n * d * _LOG_2PI

    def fn(vparams):
        v_size = d * (d + 1) // 2
        Vg = vech_to_sym(vparams[:v_size], d)
        Ve = vech_to_sym(vparams[v_size:], d)
        D_l, UltVeh, UltVehi, logdet_Ve = eigen_proc(Vg, Ve)
        Qi, logdet_Q = calc_qi(eval_, D_l, X)
        UltVehiY = UltVehi @ Y
        xHiy = _calc_xhiy(eval_, D_l, X, UltVehiY)
        logl = (logl_const + mph_calc_logl(eval_, xHiy, D_l, UltVehiY, Qi)
                - 0.5 * n * logdet_Ve)
        if reml:
            logl = logl - 0.5 * (logdet_Q - c * logdet_Ve)
        return logl

    return fn


def _is_pd(M):
    """Positive-definiteness check via eigenvalues (all > 0)."""
    ev = _sym_eigh(M)[0] if M.shape[-1] == 2 else jnp.linalg.eigvalsh(M)
    return jnp.all(ev > 0, axis=-1)


class NrState(NamedTuple):
    Vg: jax.Array
    Ve: jax.Array
    logl: jax.Array
    grad: jax.Array
    Hinv: jax.Array
    done: jax.Array
    t: jax.Array


@functools.partial(jax.jit,
                   static_argnames=("reml", "max_iter", "prec"))
def mph_nr(reml: bool, max_iter: int, prec: float, eval_, X, Y, Vg0, Ve0):
    """Batched Newton-Raphson on vech(Vg, Ve) with GEMMA's step-halving
    and acceptance rules (MphNR, mvlmm.cpp:2661-2740).

    X: (..., c, n) (per-lane X allowed); Vg0/Ve0: (..., d, d).
    Returns (Vg, Ve, logl, Hessian_var) where Hessian_var = -H^{-1}
    (the variance of the estimates, mvlmm.cpp:2742-2744).
    """
    d = Y.shape[0]
    v_size = d * (d + 1) // 2
    p2 = 2 * v_size
    batch = Vg0.shape[:-2]
    per_lane_x = X.ndim == 3 and len(batch) == 1

    def lane_logl(vparams, Xl):
        return _nr_logl_fn(reml, eval_, Xl, Y)(vparams)

    grad_fn = jax.grad(lane_logl)
    hess_fn = jax.hessian(lane_logl)
    if batch:
        in_axes = (0, 0) if per_lane_x else (0, None)
        logl_b = jax.vmap(lane_logl, in_axes=in_axes)
        grad_b = jax.vmap(grad_fn, in_axes=in_axes)
        hess_b = jax.vmap(hess_fn, in_axes=in_axes)
    else:
        logl_b, grad_b, hess_b = lane_logl, grad_fn, hess_fn

    def pack(Vg, Ve):
        return jnp.concatenate(
            [sym_to_vech(Vg, d), sym_to_vech(Ve, d)], axis=-1)

    def unpack(v):
        return vech_to_sym(v[..., :v_size], d), vech_to_sym(v[..., v_size:], d)

    def body(s: NrState) -> NrState:
        v_save = pack(s.Vg, s.Ve)
        first = s.t == 0

        # step-halving inner loop (do-while with up to 10 halvings)
        def halve(i, carry):
            v_cur, logl_cur, pd_cur, accepted = carry
            scale = 0.5 ** i
            step = jnp.einsum("...ij,...j->...i", s.Hinv, s.grad)
            v_try = jnp.where(first, v_save, v_save - scale * step)
            Vg_t, Ve_t = unpack(v_try)
            pd = _is_pd(Vg_t) & _is_pd(Ve_t)
            logl_try = logl_b(v_try, X)
            ok = first | (pd & (logl_try >= s.logl)
                          & (logl_try - s.logl <= 10.0))
            take = ~accepted
            v_new = jnp.where(take[..., None], v_try, v_cur)
            logl_new = jnp.where(take, logl_try, logl_cur)
            pd_new = jnp.where(take, pd, pd_cur)
            return v_new, logl_new, pd_new, accepted | ok

        init = (v_save, jnp.full(batch, -jnp.inf, Y.dtype),
                jnp.zeros(batch, bool), jnp.zeros(batch, bool))
        v_new, logl_new, pd_new, accepted = jax.lax.fori_loop(
            0, 10, halve, init)

        # termination rules (mvlmm.cpp:2724-2734); non-finite lanes
        # freeze immediately (see mph_em straggler note)
        revert = ~first & ((logl_new < s.logl) | ~pd_new)
        small = ~first & (logl_new - s.logl < prec)
        done_new = s.done | revert | small | ~jnp.isfinite(logl_new)

        v_next = jnp.where(revert[..., None], v_save, v_new)
        logl_next = jnp.where(revert, s.logl, logl_new)

        live = ~s.done
        v_out = jnp.where(live[..., None], v_next, pack(s.Vg, s.Ve))
        logl_out = jnp.where(live, logl_next, s.logl)

        Vg_out, Ve_out = unpack(v_out)

        # derivatives for the next step (CalcDev)
        g = grad_b(v_out, X)
        H = hess_b(v_out, X)
        Hinv = jnp.linalg.inv(H)
        upd = live & ~done_new
        g = jnp.where(upd[..., None], g, s.grad)
        Hinv = jnp.where(upd[..., None, None], Hinv, s.Hinv)

        return NrState(Vg=Vg_out, Ve=Ve_out, logl=logl_out, grad=g,
                       Hinv=Hinv, done=done_new, t=s.t + 1)

    def cond(s: NrState):
        return (s.t < max_iter) & ~jnp.all(s.done)

    state = NrState(
        Vg=Vg0, Ve=Ve0,
        logl=jnp.full(batch, -jnp.inf, Y.dtype),
        grad=jnp.zeros(batch + (p2,), Y.dtype),
        Hinv=jnp.eye(p2, dtype=Y.dtype) * jnp.ones(batch + (1, 1), Y.dtype),
        done=jnp.zeros(batch, bool),
        t=jnp.zeros((), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, state)
    return out.Vg, out.Ve, out.logl, -out.Hinv


# ---------------------------------------------------------------------------
# Edgeworth small-sample correction (-crt): CalcCRT mvlmm.cpp:2054-2330,
# PCRT mvlmm.cpp:2952-2970 (Rothenberg, Econometrica 1984)

def _vech_basis(d: int) -> np.ndarray:
    """(v_size, d, d) symmetric derivative matrices D_v = dH/dv in
    GEMMA's convention: off-diagonal elements vary together (1 at both
    (i,j) and (j,i); Calc_xHiDHix mvlmm.cpp:1170-1215) — the same
    convention vech_to_sym induces for the autodiff Hessian."""
    v_size = d * (d + 1) // 2
    S = np.zeros((v_size, d, d))
    for i in range(d):
        for j in range(i, d):
            v = vech_index(i, j, d)
            S[v, i, j] = 1.0
            S[v, j, i] = 1.0
    return S


def _calc_crt_one(eval_, X, Y, Vg, Ve, Hvar):
    """CRT factors (crt_a, crt_b, crt_c) for one SNP at its NR optimum.

    X: (c, n) covariates WITH the tested SNP as the last row (the
    reference appends it the same way; the (c-1)-th d×d block of Qi is
    the SNP block, mvlmm.cpp:2099-2101).  All quantities live in the
    original phenotype basis: Hi_k = (delta_k Vg + Ve)^{-1} via the
    whitening transform (CalcHiQi, mvlmm.cpp:942-1013), Qi is the
    back-rotated inverse of sum_k x_k x_k' kron Hi_k.  Hvar is
    -Hessian^{-1} of the (restricted) likelihood in vech(Vg, Ve) at
    the optimum, as mph_nr returns it — the same observed information
    CalcDev builds by hand and CalcCRT negates (mvlmm.cpp:2305-2307).
    """
    d = Vg.shape[-1]
    c = X.shape[-2]
    v_size = d * (d + 1) // 2
    dtype = Y.dtype
    Svs = jnp.asarray(_vech_basis(d), dtype)

    D_l, UltVeh, UltVehi, _ = eigen_proc(Vg, Ve)
    w = 1.0 / (D_l[:, None] * eval_ + 1.0)                 # (d, n)
    # Hi[k] = UltVehi' diag(w_k) UltVehi — (n, d, d), original basis
    Hi = jnp.einsum("li,ln,lj->nij", UltVehi, w, UltVehi)

    Qi_w, _ = calc_qi(eval_, D_l, X)
    Qi5 = Qi_w.reshape(c, d, c, d)
    # back-rotate: Qi = (I kron UltVeh') Qi_white (I kron UltVeh)
    Qi = jnp.einsum("ki,akbl,lj->aibj", UltVeh, Qi5, UltVeh
                    ).reshape(c * d, c * d)

    # HiS[v, k] = Hi_k D_v Hi_k — (v, n, d, d)
    HiS = jnp.einsum("nij,vjl,nlm->vnim", Hi, Svs, Hi)
    # M_e[v] = sum_k x_k x_k' kron HiS[v,k]; M_g with extra delta_k
    # (Calc_xHiDHix_all, mvlmm.cpp:1650-1675), flattened (v, dc, dc)
    Me = jnp.einsum("an,vnij,bn->vaibj", X, HiS, X
                    ).reshape(v_size, c * d, c * d)
    Mg = jnp.einsum("an,n,vnij,bn->vaibj", X, eval_, HiS, X
                    ).reshape(v_size, c * d, c * d)

    QiM_g = jnp.einsum("ij,vjk->vik", Qi, Mg)
    QiM_e = jnp.einsum("ij,vjk->vik", Qi, Me)
    QiMQi_g = jnp.einsum("vij,jk->vik", QiM_g, Qi)
    QiMQi_e = jnp.einsum("vij,jk->vik", QiM_e, Qi)

    s0 = (c - 1) * d                                       # SNP block
    Qi_si = jnp.linalg.inv(Qi[s0:s0 + d, s0:s0 + d])
    # C_g[v] = QiMQi_g[v]_s @ Qi_si; trCg[v] = -tr(C_g[v])
    Cg = QiMQi_g[:, s0:s0 + d, s0:s0 + d] @ Qi_si
    Ce = QiMQi_e[:, s0:s0 + d, s0:s0 + d] @ Qi_si
    trCg = -jnp.trace(Cg, axis1=-2, axis2=-1)
    trCe = -jnp.trace(Ce, axis1=-2, axis2=-1)

    # h_xx = -Hessian_inv (mvlmm.cpp:2305-2307) = Hvar blocks
    h_gg = Hvar[:v_size, :v_size]
    h_ge = Hvar[:v_size, v_size:]
    h_ee = Hvar[v_size:, v_size:]

    B = jnp.zeros((), dtype)
    C = jnp.zeros((), dtype)
    D = jnp.zeros((), dtype)
    for v1 in range(v_size):
        # E[v2, k] = Hi D_{v1} Hi D_{v2} Hi = HiS[v1] @ D_{v2} @ Hi
        E = jnp.einsum("nij,wjl,nlm->wnim", HiS[v1], Svs, Hi)
        # MM_xx[v2] = sum_k delta^p x_k x_k' kron E[v2,k]
        # (Calc_xHiDHiDHix, mvlmm.cpp:1350-1460: single product order;
        # the ge cross terms pick up a 2x in trB below)
        MM_ee = jnp.einsum("an,wnij,bn->waibj", X, E, X
                           ).reshape(v_size, c * d, c * d)
        MM_ge = jnp.einsum("an,n,wnij,bn->waibj", X, eval_, E, X
                           ).reshape(v_size, c * d, c * d)
        MM_gg = jnp.einsum("an,n,wnij,bn->waibj", X, eval_ * eval_, E, X
                           ).reshape(v_size, c * d, c * d)

        for v2 in range(v1, v_size):
            QiMQiMQi_gg = QiM_g[v1] @ QiMQi_g[v2]
            QiMQiMQi_ge = QiM_g[v1] @ QiMQi_e[v2] + QiM_e[v1] @ QiMQi_g[v2]
            QiMQiMQi_ee = QiM_e[v1] @ QiMQi_e[v2]

            trB_gg = -jnp.trace(
                QiMQiMQi_gg[s0:s0 + d, s0:s0 + d] @ Qi_si)
            trB_ge = -jnp.trace(
                QiMQiMQi_ge[s0:s0 + d, s0:s0 + d] @ Qi_si)
            trB_ee = -jnp.trace(
                QiMQiMQi_ee[s0:s0 + d, s0:s0 + d] @ Qi_si)

            QiMMQi_gg = Qi @ MM_gg[v2] @ Qi
            QiMMQi_ge = Qi @ MM_ge[v2] @ Qi
            QiMMQi_ee = Qi @ MM_ee[v2] @ Qi
            trB_gg = trB_gg + jnp.trace(
                QiMMQi_gg[s0:s0 + d, s0:s0 + d] @ Qi_si)
            trB_ge = trB_ge + 2.0 * jnp.trace(
                QiMMQi_ge[s0:s0 + d, s0:s0 + d] @ Qi_si)
            trB_ee = trB_ee + jnp.trace(
                QiMMQi_ee[s0:s0 + d, s0:s0 + d] @ Qi_si)

            trCC_gg = jnp.trace(Cg[v1] @ Cg[v2])
            trCC_ge = jnp.trace(Cg[v1] @ Ce[v2]) + jnp.trace(Ce[v1] @ Cg[v2])
            trCC_ee = jnp.trace(Ce[v1] @ Ce[v2])

            trD_gg, trD_ge, trD_ee = 2 * trB_gg, 2 * trB_ge, 2 * trB_ee

            # the v1!=v2 terms are DOUBLED with the same h values —
            # GEMMA's asymmetric-h quirk kept (mvlmm.cpp:2309-2325)
            mult = 1.0 if v1 == v2 else 2.0
            hg, he, hx = h_gg[v1, v2], h_ge[v1, v2], h_ee[v1, v2]
            B = B + mult * (hg * trB_gg + he * trB_ge + hx * trB_ee)
            C = C + mult * (
                hg * (trCC_gg + 0.5 * trCg[v1] * trCg[v2])
                + he * (trCC_ge + 0.5 * trCg[v1] * trCe[v2]
                        + 0.5 * trCe[v1] * trCg[v2])
                + hx * (trCC_ee + 0.5 * trCe[v1] * trCe[v2]))
            D = D + mult * (
                hg * (trCC_gg + 0.5 * trD_gg)
                + he * (trCC_ge + 0.5 * trD_ge)
                + hx * (trCC_ee + 0.5 * trD_ee))

    return 2.0 * D - C, 2.0 * B, C              # crt_a, crt_b, crt_c


@jax.jit
def calc_crt(eval_, X_batch, Y, Vg_batch, Ve_batch, Hvar_batch):
    """Batched CRT factors for compacted lanes: X_batch (S, c, n) with
    the SNP as last covariate row; Vg/Ve (S, d, d) and Hvar
    (S, 2v, 2v) = -H^{-1} at the per-SNP NR optimum (from mph_nr).
    Returns (crt_a, crt_b, crt_c) each (S,)."""
    return jax.vmap(lambda X, Vg, Ve, Hv: _calc_crt_one(
        eval_, X, Y, Vg, Ve, Hv))(X_batch, Vg_batch, Ve_batch, Hvar_batch)


def pcrt(mode: int, d: int, p_value, crt_a, crt_b, crt_c):
    """Apply the correction to a p-value (PCRT, mvlmm.cpp:2952-2970):
    mode 1 Wald, 2 LRT, 3 score (score passes through unchanged, as in
    the reference's else-branch)."""
    import scipy.stats
    q = float(d)
    chisq = scipy.stats.chi2.isf(p_value, q)
    if mode == 1:
        a = crt_c / (2.0 * q * (q + 2.0))
        b = 1.0 + (crt_a + crt_b) / (2.0 * q)
        chisq_crt = (-b + np.sqrt(np.maximum(b * b + 4.0 * a * chisq, 0.0))
                     ) / (2.0 * a)
    elif mode == 2:
        chisq_crt = chisq / (1.0 + crt_a / (2.0 * q))
    else:
        chisq_crt = chisq
    return scipy.stats.chi2.sf(chisq_crt, q)


# ---------------------------------------------------------------------------
# Per-SNP Wald/score p-value (MphCalcP, mvlmm.cpp:727-831)

def mph_calc_p(eval_, x, W, Y, Vg, Ve):
    """p-value, beta (d,), Vbeta (d,d) for SNP x given (Vg, Ve).

    x: (..., n) per-SNP genotype; W: (c, n) covariates; Vg/Ve may carry
    the same batch axes as x.  Returns (p_chisq_stat, beta, Vbeta);
    p-value = chi2_sf(stat, d) computed by the caller.
    """
    d = Y.shape[0]
    c = W.shape[-2]                 # W may carry batch axes (GxE: the
                                    # per-SNP covariates include x)
    D_l, UltVeh, UltVehi, _ = eigen_proc(Vg, Ve)
    Qi, _ = calc_qi(eval_, D_l, W)
    UltVehiY = UltVehi @ Y                                 # (..., d, n)

    w = 1.0 / (D_l[..., :, None] * eval_ + 1.0)            # (..., d, n)
    wy = w * UltVehiY
    xPy0 = jnp.einsum("...n,...in->...i", x, wy)           # (..., d)
    # xPx0_diag[i] = sum_k x_k^2 w[i,k]
    xPx0_diag = jnp.einsum("...in->...i", w * (x[..., None, :] ** 2))

    whx = jnp.einsum("...n,...jn,...in->...ji", x, W, w)   # (..., c, d)
    WHiy = _calc_xhiy(eval_, D_l, W, UltVehiY)             # (..., c*d)

    batch = whx.shape[:-2]
    dd = np.arange(d)
    WHix = jnp.zeros(batch + (c, d, d), x.dtype)
    WHix = WHix.at[..., dd, dd].set(whx)
    WHix = WHix.reshape(batch + (c * d, d))

    QiWHix = jnp.einsum("...ij,...jk->...ik", Qi, WHix)    # (..., cd, d)
    xPx = -jnp.einsum("...ji,...jk->...ik", WHix, QiWHix)
    xPx = xPx.at[..., dd, dd].add(xPx0_diag)
    xPy = xPy0 - jnp.einsum("...ji,...j->...i", QiWHix, WHiy)

    bhat = jnp.linalg.solve(xPx, xPy[..., None])[..., 0]
    Vb_rot = jnp.linalg.inv(xPx)
    UltVehT = jnp.swapaxes(UltVeh, -1, -2)
    beta = jnp.einsum("...ji,...j->...i", UltVeh, bhat)
    Vbeta = UltVehT @ Vb_rot @ UltVeh
    stat = jnp.einsum("...i,...i->...", bhat, xPy)
    return stat, beta, Vbeta


@jax.jit
def mph_calc_beta(eval_, W, Y, Vg, Ve):
    """Null-model B and se(B) (MphCalcBeta, mvlmm.cpp:835-935).

    Returns (B (d, c), se_B (d, c))."""
    d = Y.shape[0]
    c = W.shape[0]
    D_l, UltVeh, UltVehi, _ = eigen_proc(Vg, Ve)
    Qi, _ = calc_qi(eval_, D_l, W)
    UltVehiY = UltVehi @ Y
    WHiy = _calc_xhiy(eval_, D_l, W, UltVehiY)             # (c*d,)
    QiWHiy = Qi @ WHiy

    UltVehT = jnp.swapaxes(UltVeh, -1, -2)
    beta_blocks = QiWHiy.reshape(c, d)                     # row i → block
    B = (beta_blocks @ UltVeh).T                           # (d, c)

    Qi4 = Qi.reshape(c, d, c, d)
    # rotated diagonal blocks: UltVeh' Qi[i,i] UltVeh
    diag_blocks = jnp.einsum("ki,ckcl,lj->cij", UltVeh, Qi4, UltVeh,
                             optimize=True)
    se_B = jnp.sqrt(jnp.einsum("cii->ic", diag_blocks))    # (d, c)
    return B, se_B
