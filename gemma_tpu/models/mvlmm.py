"""Multivariate LMM driver (-lmm with multiple -n columns).

Orchestrates mvlmm_core into GEMMA's analysis flow
(MVLMM::AnalyzeBimbam/AnalyzePlink, mvlmm.cpp:2972-3416):

  null model:  MphInitial (univariate REML diagonals) → EM('R') →
               NR('R') → B/se(B); repeat with 'L' for the LRT null.
  per SNP:     reset (Vg, Ve) to the null estimates, short EM
               (em_iter/10), Wald/LRT/score p; SNPs with p < -pnr are
               compacted and refined with Newton-Raphson (nr_iter/10).

The per-SNP EM runs for a whole block in lockstep on device; the rare
NR refinement runs on a host-compacted sub-batch.
"""

from __future__ import annotations

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from gemma_tpu.models import mvlmm_core as core
from gemma_tpu.models.lmm import likelihood as lk
from gemma_tpu.models.lmm.optimize import calc_lambda
from gemma_tpu.models.lmm.engine import _vg_ve_beta
from gemma_tpu.ops.stats import chisq_sf


def mph_initial(eval_, X, Y, l_min=1e-5, l_max=1e5, n_region=10,
                em_iter=10000, em_prec=1e-4, nr_iter=100, nr_prec=1e-4):
    """Initial (Vg, Ve, B) (MphInitial, mvlmm.cpp:2763-2948).

    Diagonals from univariate REML per trait; for d > 4 the
    off-diagonals come from pairwise two-trait fits; B from the GLS
    formula at the initial (Vg, Ve).
    """
    d = Y.shape[0]
    c = X.shape[0]
    n = eval_.shape[0]
    Xt = jnp.swapaxes(X, -1, -2)                      # (n, c)

    vgs, ves = [], []
    for i in range(d):
        data = lk.null_batch_data(eval_, Xt, Y[i], c)
        res = calc_lambda(data, c, calc_null=True, reml=True,
                          l_min=l_min, l_max=l_max, n_region=n_region)
        vg, ve, _, _ = _vg_ve_beta(eval_, Xt, Y[i], res.lam[0], c)
        vgs.append(vg)
        ves.append(ve)
    Vg = jnp.diag(jnp.stack(vgs))
    Ve = jnp.diag(jnp.stack(ves))

    if d > 4:
        # pairwise two-trait refits for off-diagonals (mvlmm.cpp:2805-2884)
        Vg = np.array(Vg)       # writable host copies
        Ve = np.array(Ve)
        for i in range(d):
            for j in range(i + 1, d):
                Ys = jnp.stack([Y[i], Y[j]])
                Vg_s = jnp.diag(jnp.asarray([Vg[i, i], Vg[j, j]]))
                Ve_s = jnp.diag(jnp.asarray([Ve[i, i], Ve[j, j]]))
                B_s = jnp.zeros((2, c), Y.dtype)
                Vg_s, Ve_s, B_s, _, _ = core.mph_em(
                    True, em_iter, em_prec, eval_, X, Ys, Vg_s, Ve_s, B_s)
                Vg_s, Ve_s, _, _ = core.mph_nr(
                    True, nr_iter, nr_prec, eval_, X, Ys, Vg_s, Ve_s)
                Vg[i, j] = Vg[j, i] = float(Vg_s[0, 1])
                Ve[i, j] = Ve[j, i] = float(Ve_s[0, 1])
        Vg = jnp.asarray(Vg)
        Ve = jnp.asarray(Ve)

    # B-hat at the initial (Vg, Ve) (mvlmm.cpp:2886-2935)
    B, _ = core.mph_calc_beta(eval_, X, Y, Vg, Ve)
    return Vg, Ve, B


@functools.partial(jax.jit, static_argnames=("reml", "em_iter", "em_prec"))
def _assoc_em_block(eval_, X0, Y, x_block, Vg_null, Ve_null, B_null,
                    reml: bool, em_iter: int, em_prec: float):
    """Short per-SNP EM for one block + Wald statistics."""
    S = x_block.shape[0]
    d = Y.shape[0]
    c = X0.shape[0]
    X_alt = jnp.concatenate(
        [jnp.broadcast_to(X0, (S, c, X0.shape[1])), x_block[:, None, :]],
        axis=1)
    Vg0 = jnp.broadcast_to(Vg_null, (S, d, d))
    Ve0 = jnp.broadcast_to(Ve_null, (S, d, d))
    B0 = jnp.broadcast_to(B_null, (S, d, c + 1))
    Vg, Ve, B, logl, _ = core.mph_em(reml, em_iter, em_prec, eval_, X_alt, Y,
                                  Vg0, Ve0, B0)
    stat, beta, Vbeta = core.mph_calc_p(eval_, x_block, X0, Y, Vg, Ve)
    return logl, stat, beta, Vbeta


def _x_alt(X0, x_block):
    S = x_block.shape[0]
    c = X0.shape[0]
    return jnp.concatenate(
        [jnp.broadcast_to(X0, (S, c, X0.shape[1])), x_block[:, None, :]],
        axis=1)


@functools.partial(jax.jit, static_argnames=("em_iter", "em_prec"))
def _em_burst_reml(eval_, X0, Y, x_block, Vg0, Ve0, iter_cap,
                   em_iter: int, em_prec: float):
    """One bounded REML EM burst for (possibly compacted) lanes.
    REML EM depends only on (Vg, Ve) — restarting from the current
    iterate is trajectory-exact — so bursts compose losslessly."""
    S = x_block.shape[0]
    d = Y.shape[0]
    c = X0.shape[0]
    B0 = jnp.zeros((S, d, c + 1), Y.dtype)
    Vg, Ve, _, logl, done = core.mph_em(True, em_iter, em_prec, eval_,
                                        _x_alt(X0, x_block), Y, Vg0, Ve0,
                                        B0, iter_cap=iter_cap)
    return Vg, Ve, logl, done


@functools.partial(jax.jit, static_argnames=("em_iter", "em_prec",
                                             "first"))
def _em_burst_ml(eval_, X0, Y, x_block, Vg0, Ve0, B0, BX0, iter_cap,
                 em_iter: int, em_prec: float, first: bool):
    """One bounded ML EM burst.  ML mode carries GEMMA's stale
    UltVehiBX quirk (mvlmm.cpp:679-694) in BX0/with_bx, so resumed
    bursts continue the exact single-shot trajectory."""
    Vg, Ve, B, logl, done, BX = core.mph_em(
        False, em_iter, em_prec, eval_, _x_alt(X0, x_block), Y, Vg0,
        Ve0, B0, iter_cap=iter_cap, BX0=(None if first else BX0),
        with_bx=True)
    return Vg, Ve, B, logl, done, BX


@functools.partial(jax.jit,
                   static_argnames=("reml", "nr_iter", "nr_prec"))
def _nr_lanes(eval_, X0, Y, x_block, Vg, Ve, reml: bool, nr_iter: int,
              nr_prec: float):
    """NR on the straggler lanes only (Vg/Ve update, no stats)."""
    Vg2, Ve2, logl, _ = core.mph_nr(reml, nr_iter, nr_prec, eval_,
                                    _x_alt(X0, x_block), Y, Vg, Ve)
    return Vg2, Ve2, logl


@jax.jit
def _calc_p_block(eval_, X0, Y, x_block, Vg, Ve):
    return core.mph_calc_p(eval_, x_block, X0, Y, Vg, Ve)


# EM iterations granted before the speed-mode NR finisher takes over
# the surviving stragglers (f32 only; see _em_staged)
_NR_SWITCH = 128

# Compaction cost accounting (round-3 verdict #5): per-burst device
# compute vs host-sync split, accumulated across all _em_staged calls
# in the process (scripts/perf_round3.py reads it after an e2e run).
EM_STATS = {"bursts": 0, "compute_s": 0.0, "sync_s": 0.0}
# Post-first-burst layout of the EM carry, for the multichip test's
# compute-sharding assertion (1-vs-8 equality alone cannot tell
# whether the EM actually distributed).
_LAST_BURST_SHARDING: dict = {}


def _record_burst_sharding(x_act, Vg_act) -> None:
    _LAST_BURST_SHARDING.clear()
    for name, arr in (("x", x_act), ("Vg", Vg_act)):
        sh = getattr(arr, "sharding", None)
        _LAST_BURST_SHARDING[name] = str(getattr(sh, "spec", sh))


def _em_staged(reml: bool, eval_, X0, Y, x_block, Vg_null, Ve_null,
               B_null, em_iter: int, em_prec: float,
               nr_finish: bool = False, nr_iter: int = 10,
               nr_prec: float = 1e-3):
    """Per-SNP EM with straggler compaction, both criteria (the
    lockstep while_loop otherwise runs the WHOLE block for the maximum
    iteration count of its slowest lane — measured heavy tail on
    issue243: ~2/3 of lanes converge in <100 iterations, a handful
    run to 1000, costing ~10x the useful work).  Runs geometric
    bursts, retires converged lanes between bursts, and finishes the
    shrinking straggler set at bucketed sizes.  ML bursts thread the
    carried UltVehiBX (see _em_burst_ml) so compaction stays
    trajectory-exact for the reference's stale-matrix quirk.

    nr_finish (float32 speed mode only): after _NR_SWITCH EM
    iterations the surviving stragglers switch to safeguarded
    Newton-Raphson (quadratic convergence, ~5 steps) instead of
    crawling to em_iter — same optimum within the 1e-3 speed-mode
    contract, ~an order of magnitude less straggler work.  Float64
    parity mode keeps the pure-EM trajectory.

    Returns (logl, stat, beta, Vbeta) like _assoc_em_block."""
    S = x_block.shape[0]
    d = Y.shape[0]
    dtype = x_block.dtype
    c = X0.shape[0]

    Vg_out = np.zeros((S, d, d), np.float64)
    Ve_out = np.zeros((S, d, d), np.float64)
    logl_out = np.zeros(S, np.float64)

    active = np.arange(S)
    Vg_act = jnp.broadcast_to(jnp.asarray(Vg_null, dtype), (S, d, d))
    Ve_act = jnp.broadcast_to(jnp.asarray(Ve_null, dtype), (S, d, d))
    B_act = (None if reml else
             jnp.broadcast_to(jnp.asarray(B_null, dtype), (S, d, c + 1)))
    BX_act = None if reml else jnp.zeros((S, d, Y.shape[1]), dtype)
    x_act = x_block
    burst = 32
    spent = 0
    first = True
    while len(active) and spent < em_iter:
        if nr_finish and spent >= _NR_SWITCH:
            Vg_act, Ve_act, logl = _nr_lanes(
                eval_, X0, Y, x_act, Vg_act, Ve_act, reml=reml,
                nr_iter=nr_iter, nr_prec=nr_prec)
            k = len(active)
            Vg_out[active] = np.asarray(Vg_act)[:k]
            Ve_out[active] = np.asarray(Ve_act)[:k]
            logl_out[active] = np.asarray(logl)[:k]
            active = np.empty(0, np.int64)
            break
        it = min(burst, em_iter - spent)
        if reml:
            Vg_act, Ve_act, logl, done = _em_burst_reml(
                eval_, X0, Y, x_act, Vg_act, Ve_act, jnp.int32(it),
                em_iter, em_prec)
        else:
            Vg_act, Ve_act, B_act, logl, done, BX_act = _em_burst_ml(
                eval_, X0, Y, x_act, Vg_act, Ve_act, B_act, BX_act,
                jnp.int32(it), em_iter, em_prec, first)
        if first:
            _record_burst_sharding(x_act, Vg_act)
        first = False
        spent += it
        burst = min(burst * 2, 512)
        k = len(active)
        t0 = time.perf_counter()
        done = jax.block_until_ready(done)      # device compute
        t1 = time.perf_counter()
        done_h = np.array(done[:k])             # host round-trip
        t2 = time.perf_counter()
        EM_STATS["bursts"] += 1
        EM_STATS["compute_s"] += t1 - t0
        EM_STATS["sync_s"] += t2 - t1
        if spent >= em_iter:
            done_h[:] = True
        fin = np.flatnonzero(done_h)
        if len(fin):
            rows = active[fin]
            Vg_out[rows] = np.asarray(Vg_act)[fin]
            Ve_out[rows] = np.asarray(Ve_act)[fin]
            logl_out[rows] = np.asarray(logl)[fin]
        still = np.flatnonzero(~done_h)
        active = active[still]
        if not len(active):
            break
        size = _bucket(len(active))
        sel = jnp.asarray(np.resize(still, size))
        x_act = jnp.take(x_act, sel, axis=0)
        Vg_act = jnp.take(Vg_act, sel, axis=0)
        Ve_act = jnp.take(Ve_act, sel, axis=0)
        if not reml:
            B_act = jnp.take(B_act, sel, axis=0)
            BX_act = jnp.take(BX_act, sel, axis=0)

    Vg_f = jnp.asarray(Vg_out, dtype)
    Ve_f = jnp.asarray(Ve_out, dtype)
    stat, beta, Vbeta = _calc_p_block(eval_, X0, Y, x_block, Vg_f, Ve_f)
    return jnp.asarray(logl_out, dtype), stat, beta, Vbeta


def _em_staged_reml(eval_, X0, Y, x_block, Vg_null, Ve_null,
                    em_iter: int, em_prec: float, **kw):
    return _em_staged(True, eval_, X0, Y, x_block, Vg_null, Ve_null,
                      None, em_iter, em_prec, **kw)


@functools.partial(jax.jit,
                   static_argnames=("reml", "nr_iter", "nr_prec"))
def _assoc_nr_block(eval_, X0, Y, x_block, Vg, Ve,
                    reml: bool, nr_iter: int, nr_prec: float):
    """NR refinement for a compacted sub-batch (per-lane X)."""
    S = x_block.shape[0]
    c = X0.shape[0]
    X_alt = jnp.concatenate(
        [jnp.broadcast_to(X0, (S, c, X0.shape[1])), x_block[:, None, :]],
        axis=1)
    Vg2, Ve2, logl, _ = core.mph_nr(reml, nr_iter, nr_prec, eval_, X_alt,
                                    Y, Vg, Ve)
    stat, beta, Vbeta = core.mph_calc_p(eval_, x_block, X0, Y, Vg2, Ve2)
    return logl, stat, beta, Vbeta


@functools.partial(
    jax.jit,
    static_argnames=("reml", "em_iter", "em_prec", "nr_iter", "nr_prec"))
def _em_then_nr_block(eval_, X0, Y, x_block, Vg_null, Ve_null, B_null,
                      reml: bool, em_iter: int, em_prec: float,
                      nr_iter: int, nr_prec: float):
    """Short EM then NR refinement for a (small) compacted block."""
    S = x_block.shape[0]
    d = Y.shape[0]
    c = X0.shape[0]
    X_alt = jnp.concatenate(
        [jnp.broadcast_to(X0, (S, c, X0.shape[1])), x_block[:, None, :]],
        axis=1)
    Vg0 = jnp.broadcast_to(Vg_null, (S, d, d))
    Ve0 = jnp.broadcast_to(Ve_null, (S, d, d))
    B0 = jnp.broadcast_to(B_null, (S, d, c + 1))
    Vg, Ve, _, _, _ = core.mph_em(reml, em_iter, em_prec, eval_, X_alt, Y,
                               Vg0, Ve0, B0)
    Vg2, Ve2, logl, Hvar = core.mph_nr(reml, nr_iter, nr_prec, eval_,
                                       X_alt, Y, Vg, Ve)
    stat, beta, Vbeta = core.mph_calc_p(eval_, x_block, X0, Y, Vg2, Ve2)
    return logl, stat, beta, Vbeta, Vg2, Ve2, Hvar


@jax.jit
def _crt_block(eval_, X0, Y, x_block, Vg, Ve, Hvar):
    """CRT factors for a compacted block at its per-SNP NR optimum
    (CalcCRT via mvlmm_core.calc_crt); Hvar = -H^{-1} from mph_nr."""
    S = x_block.shape[0]
    c = X0.shape[0]
    X_alt = jnp.concatenate(
        [jnp.broadcast_to(X0, (S, c, X0.shape[1])), x_block[:, None, :]],
        axis=1)
    return core.calc_crt(eval_, X_alt, Y, Vg, Ve, Hvar)


@functools.partial(jax.jit, static_argnames=())
def _score_block(eval_, X0, Y, x_block, Vg_null, Ve_null):
    S = x_block.shape[0]
    d = Y.shape[0]
    Vg0 = jnp.broadcast_to(Vg_null, (S, d, d))
    Ve0 = jnp.broadcast_to(Ve_null, (S, d, d))
    return core.mph_calc_p(eval_, x_block, X0, Y, Vg0, Ve0)


class MvlmmNull:
    """Null-model fits for both REML and ML criteria."""

    def __init__(self, eval_, X0, Y, cfg):
        d = Y.shape[0]
        Vg, Ve, B = mph_initial(
            eval_, X0, Y, l_min=cfg.l_min, l_max=cfg.l_max,
            n_region=cfg.n_region, em_iter=cfg.em_iter,
            em_prec=cfg.em_prec, nr_iter=cfg.nr_iter, nr_prec=cfg.nr_prec)
        Vg, Ve, B, _, _ = core.mph_em(True, cfg.em_iter, cfg.em_prec,
                                   eval_, X0, Y, Vg, Ve, B)
        Vg, Ve, logl_r, Hvar = core.mph_nr(True, cfg.nr_iter, cfg.nr_prec,
                                           eval_, X0, Y, Vg, Ve)
        B_r, se_B_r = core.mph_calc_beta(eval_, X0, Y, Vg, Ve)
        self.Vg_remle, self.Ve_remle = Vg, Ve
        self.B_remle, self.se_B_remle = B_r, se_B_r
        self.logl_remle_H0 = float(logl_r)
        v_size = d * (d + 1) // 2
        self.VVg_remle = np.diag(np.asarray(Hvar))[:v_size]
        self.VVe_remle = np.diag(np.asarray(Hvar))[v_size:]

        Vg2, Ve2, B2, _, _ = core.mph_em(False, cfg.em_iter, cfg.em_prec,
                                      eval_, X0, Y, Vg, Ve, B_r)
        Vg2, Ve2, logl_m, _ = core.mph_nr(False, cfg.nr_iter, cfg.nr_prec,
                                          eval_, X0, Y, Vg2, Ve2)
        B_m, se_B_m = core.mph_calc_beta(eval_, X0, Y, Vg2, Ve2)
        self.Vg_mle, self.Ve_mle = Vg2, Ve2
        self.B_mle, self.se_B_mle = B_m, se_B_m
        self.logl_mle_H0 = float(logl_m)

        # per-SNP fits start from the MLE null (mvlmm.cpp:3206-3208:
        # V_g_null is whatever V_g holds after the MLE refit)
        self.Vg_start, self.Ve_start = Vg2, Ve2
        c1 = X0.shape[0] + 1
        self.B_start = jnp.concatenate(
            [B_m, jnp.zeros((d, 1), B_m.dtype)], axis=1)


def _bucket(n: int, lo: int = 32) -> int:
    """Round up to a power-of-two bucket to bound jit signatures."""
    b = lo
    while b < n:
        b *= 2
    return b


def _pad_rows(arr: jnp.ndarray, size: int) -> jnp.ndarray:
    if arr.shape[0] == size:
        return arr
    reps = jnp.broadcast_to(arr[:1], (size - arr.shape[0],) + arr.shape[1:])
    return jnp.concatenate([arr, reps], axis=0)


def mvlmm_assoc(eval_, X0, Y, x_block, null: MvlmmNull, mode: int, cfg,
                dtype):
    """Association statistics for one (S, n) rotated SNP block.

    Returns dict of host arrays.  Mirrors the mode logic of
    mvlmm.cpp:3298-3353 including the p < -pnr NR refinement.
    """
    d = Y.shape[0]
    S = x_block.shape[0]
    em_iter = max(cfg.em_iter // 10, 1)
    em_prec = cfg.em_prec * 10
    nr_iter = max(cfg.nr_iter // 10, 1)
    nr_prec = cfg.nr_prec * 10
    # float32 speed mode: stragglers switch to the NR finisher after
    # _NR_SWITCH EM iterations (same optimum within the 1e-3 contract);
    # float64 parity mode keeps the reference's pure-EM trajectory
    speed_mode = jnp.dtype(dtype) == jnp.float32
    staged_kw = dict(nr_finish=bool(speed_mode), nr_iter=nr_iter,
                     nr_prec=nr_prec)

    # SNP-axis fan-out: commit the block SNP-sharded over the mesh so
    # every EM/NR/stat program partitions across devices (the mvLMM
    # analogue of the univariate assoc_pipeline; mvlmm.cpp:2972-3416
    # gets its DP story here).  1-device meshes no-op.
    from gemma_tpu.parallel.mesh import default_mesh
    mesh = default_mesh()
    if mesh.size > 1 and S % mesh.size == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P
        x_block = jax.device_put(
            x_block, NamedSharding(mesh, P("snp", None)))

    p_wald = np.zeros(S)
    p_lrt = np.zeros(S)
    p_score = np.zeros(S)
    beta = np.zeros((S, d))
    Vbeta = np.zeros((S, d, d))

    if mode in (3, 4):
        stat, b, Vb = _score_block(eval_, X0, Y, x_block,
                                   null.Vg_start, null.Ve_start)
        p_score = np.array(chisq_sf(stat, float(d)))
        beta, Vbeta = np.array(b), np.array(Vb)

    use_crt = getattr(cfg, "crt", 0) == 1

    def _nr_refine(reml: bool, idx: np.ndarray):
        """EM-refit then NR for the compacted lanes idx, padded to a
        power-of-two bucket so jit signatures stay bounded.  With
        -crt, also returns the Edgeworth factors at the NR optimum."""
        size = _bucket(len(idx))
        xs = _pad_rows(jnp.asarray(x_block[idx]), size)
        logl2, stat2, b2, Vb2, Vg2, Ve2, Hvar = _em_then_nr_block(
            eval_, X0, Y, xs, null.Vg_start, null.Ve_start, null.B_start,
            reml=reml, em_iter=em_iter, em_prec=em_prec,
            nr_iter=nr_iter, nr_prec=nr_prec)
        k = len(idx)
        crt_abc = None
        if use_crt:
            ca, cb, cc = _crt_block(eval_, X0, Y, xs, Vg2, Ve2, Hvar)
            crt_abc = (np.asarray(ca)[:k], np.asarray(cb)[:k],
                       np.asarray(cc)[:k])
        return (np.asarray(logl2)[:k], np.asarray(stat2)[:k],
                np.asarray(b2)[:k], np.asarray(Vb2)[:k], crt_abc)

    if mode in (2, 4):
        if speed_mode:
            # staged ML EM: straggler compaction with the carried
            # UltVehiBX keeping the trajectory burst-exact, plus the
            # NR finisher.  f32/TPU only: the compaction ladder
            # compiles one EM program per bucket shape — disk-cached
            # and amortised on the TPU, but measured 2x SLOWER than
            # the single-compile lockstep program on the cache-less
            # CPU CI backend (463 s vs 233 s on issue243/300), so f64
            # parity keeps lockstep
            logl, stat, b, Vb = _em_staged(
                False, eval_, X0, Y, x_block, null.Vg_start,
                null.Ve_start, null.B_start, em_iter=em_iter,
                em_prec=em_prec, **staged_kw)
            logl = np.asarray(logl)
        else:
            logl, stat, b, Vb = _assoc_em_block(
                eval_, X0, Y, x_block, null.Vg_start, null.Ve_start,
                null.B_start, reml=False, em_iter=em_iter,
                em_prec=em_prec)
        p_lrt = np.array(chisq_sf(2.0 * (np.asarray(logl)
                                         - null.logl_mle_H0), float(d)))
        beta, Vbeta = np.array(b), np.array(Vb)
        idx = np.flatnonzero(p_lrt < cfg.p_nr)
        if len(idx):
            logl2, stat2, b2, Vb2, crt_abc = _nr_refine(False, idx)
            p_ref = np.asarray(
                chisq_sf(2.0 * (logl2 - null.logl_mle_H0), float(d)))
            if use_crt:
                p_ref = core.pcrt(2, d, p_ref, *crt_abc)
            p_lrt[idx] = p_ref
            beta[idx] = b2
            Vbeta[idx] = Vb2

    if mode in (1, 4):
        # staged REML EM with straggler compaction (identical
        # trajectory to the single-shot loop; see _em_staged)
        logl, stat, b, Vb = _em_staged_reml(
            eval_, X0, Y, x_block, null.Vg_start, null.Ve_start,
            em_iter=em_iter, em_prec=em_prec, **staged_kw)
        p_wald = np.array(chisq_sf(stat, float(d)))
        beta, Vbeta = np.array(b), np.array(Vb)
        idx = np.flatnonzero(p_wald < cfg.p_nr)
        if len(idx):
            logl2, stat2, b2, Vb2, crt_abc = _nr_refine(True, idx)
            p_ref = np.asarray(chisq_sf(stat2, float(d)))
            if use_crt:
                p_ref = core.pcrt(1, d, p_ref, *crt_abc)
            p_wald[idx] = p_ref
            beta[idx] = b2
            Vbeta[idx] = Vb2

    return dict(p_wald=p_wald, p_lrt=p_lrt, p_score=p_score,
                beta=beta, Vbeta=Vbeta)


# ---------------------------------------------------------------------------
# GxE variant (MVLMM::AnalyzeBimbamGXE/AnalyzePlinkGXE,
# mvlmm.cpp:3970-4416): the global null is [W, env]; each SNP adds two
# rows — x as a per-SNP covariate and x∘env as the tested effect.

def _gxe_x_alt(X0e, x_block, xe_block=None):
    S = x_block.shape[0]
    c = X0e.shape[0]
    rows = [jnp.broadcast_to(X0e, (S, c, X0e.shape[1])), x_block[:, None, :]]
    if xe_block is not None:
        rows.append(xe_block[:, None, :])
    return jnp.concatenate(rows, axis=1)


@functools.partial(
    jax.jit, static_argnames=("reml", "em_iter", "em_prec", "nr_iter",
                              "nr_prec"))
def _gxe_h0_refit_block(eval_, X0e, Y, x_block, Vg0, Ve0, B0,
                        reml: bool, em_iter: int, em_prec: float,
                        nr_iter: int, nr_prec: float):
    """Per-SNP null [W, env, x]: short EM then NR (mvlmm.cpp:4272-4296)."""
    S = x_block.shape[0]
    d = Y.shape[0]
    X_h0 = _gxe_x_alt(X0e, x_block)
    Vg, Ve, B, _, _ = core.mph_em(
        reml, em_iter, em_prec, eval_, X_h0, Y,
        jnp.broadcast_to(Vg0, (S, d, d)), jnp.broadcast_to(Ve0, (S, d, d)),
        jnp.broadcast_to(B0, (S,) + B0.shape))
    Vg, Ve, logl, _ = core.mph_nr(reml, nr_iter, nr_prec, eval_, X_h0, Y,
                                  Vg, Ve)
    return Vg, Ve, logl


@functools.partial(jax.jit,
                   static_argnames=("reml", "em_iter", "em_prec"))
def _gxe_h1_em_block(eval_, X0e, Y, x_block, xe_block, Vg0, Ve0, B0,
                     reml: bool, em_iter: int, em_prec: float):
    """H1 EM over [W, env, x, x∘env]; test on the interaction row."""
    X_alt = _gxe_x_alt(X0e, x_block, xe_block)
    Vg, Ve, B, logl, _ = core.mph_em(reml, em_iter, em_prec, eval_, X_alt, Y,
                                  Vg0, Ve0, B0)
    W_snp = X_alt[:, :-1, :]
    stat, beta, Vbeta = core.mph_calc_p(eval_, xe_block, W_snp, Y, Vg, Ve)
    return logl, stat, beta, Vbeta, Vg, Ve


@functools.partial(jax.jit,
                   static_argnames=("reml", "nr_iter", "nr_prec"))
def _gxe_h1_nr_block(eval_, X0e, Y, x_block, xe_block, Vg0, Ve0,
                     reml: bool, nr_iter: int, nr_prec: float):
    X_alt = _gxe_x_alt(X0e, x_block, xe_block)
    Vg, Ve, logl, _ = core.mph_nr(reml, nr_iter, nr_prec, eval_, X_alt, Y,
                                  Vg0, Ve0)
    W_snp = X_alt[:, :-1, :]
    stat, beta, Vbeta = core.mph_calc_p(eval_, xe_block, W_snp, Y, Vg, Ve)
    return logl, stat, beta, Vbeta


@functools.partial(jax.jit, static_argnames=())
def _gxe_score_block(eval_, X0e, Y, x_block, xe_block, Vg_null, Ve_null):
    S = x_block.shape[0]
    d = Y.shape[0]
    X_alt = _gxe_x_alt(X0e, x_block, xe_block)
    W_snp = X_alt[:, :-1, :]
    return core.mph_calc_p(eval_, xe_block, W_snp, Y,
                           jnp.broadcast_to(Vg_null, (S, d, d)),
                           jnp.broadcast_to(Ve_null, (S, d, d)))


def mvlmm_assoc_gxe(eval_, X0e, Y, x_block, xe_block, null: MvlmmNull,
                    mode: int, cfg, dtype):
    """GxE association for one rotated block.  X0e already contains
    the environment row ([UtW; Ut env]); the per-SNP state evolution
    (H0' refits feeding H1 starts for mode 4) follows
    mvlmm.cpp:4268-4352."""
    d = Y.shape[0]
    S = x_block.shape[0]
    em_iter = max(cfg.em_iter // 10, 1)
    em_prec = cfg.em_prec * 10
    nr_iter = max(cfg.nr_iter // 10, 1)
    nr_prec = cfg.nr_prec * 10

    p_wald = np.zeros(S)
    p_lrt = np.zeros(S)
    p_score = np.zeros(S)
    beta = np.zeros((S, d))
    Vbeta = np.zeros((S, d, d))

    Vg_start = jnp.broadcast_to(null.Vg_start, (S, d, d))
    Ve_start = jnp.broadcast_to(null.Ve_start, (S, d, d))
    # B for H1 has c+2 SNP columns (x and x∘env)
    B_h1 = jnp.concatenate(
        [null.B_start, jnp.zeros((d, 1), null.B_start.dtype)], axis=1)
    B_h1 = jnp.broadcast_to(B_h1, (S,) + B_h1.shape)
    B_h0 = null.B_start                                  # (d, c+1)

    Vg_h1_0, Ve_h1_0 = Vg_start, Ve_start
    logl_H0_snp = None
    if mode in (2, 3, 4):
        if mode in (3, 4):
            Vg_r, Ve_r, _ = _gxe_h0_refit_block(
                eval_, X0e, Y, x_block, null.Vg_start, null.Ve_start,
                B_h0, reml=True, em_iter=em_iter, em_prec=em_prec,
                nr_iter=nr_iter, nr_prec=nr_prec)
            Vg_h1_0, Ve_h1_0 = Vg_r, Ve_r
        if mode in (2, 4):
            # mode 4 carries the 'R'-refit state into the 'L' refit
            # (V_g is not reset between the two, mvlmm.cpp:4283-4295)
            Vg0 = Vg_h1_0 if mode == 4 else null.Vg_start
            Ve0 = Ve_h1_0 if mode == 4 else null.Ve_start
            Vg_l, Ve_l, logl_H0_snp = _gxe_h0_refit_block(
                eval_, X0e, Y, x_block, Vg0, Ve0, B_h0, reml=False,
                em_iter=em_iter, em_prec=em_prec,
                nr_iter=nr_iter, nr_prec=nr_prec)
            logl_H0_snp = np.asarray(logl_H0_snp)
            Vg_h1_0, Ve_h1_0 = Vg_l, Ve_l

    if mode in (3, 4):
        stat, b, Vb = _gxe_score_block(eval_, X0e, Y, x_block, xe_block,
                                       null.Vg_start, null.Ve_start)
        p_score = np.array(chisq_sf(stat, float(d)))
        beta, Vbeta = np.array(b), np.array(Vb)

    if mode in (2, 4):
        logl, stat, b, Vb, Vg1, Ve1 = _gxe_h1_em_block(
            eval_, X0e, Y, x_block, xe_block, Vg_h1_0, Ve_h1_0, B_h1,
            reml=False, em_iter=em_iter, em_prec=em_prec)
        p_lrt = np.array(chisq_sf(2.0 * (np.asarray(logl) - logl_H0_snp),
                                  float(d)))
        beta, Vbeta = np.array(b), np.array(Vb)
        idx = np.flatnonzero(p_lrt < cfg.p_nr)
        if len(idx):
            size = _bucket(len(idx))
            pad = lambda a: _pad_rows(jnp.asarray(a[idx]), size)
            logl2, _, b2, Vb2 = _gxe_h1_nr_block(
                eval_, X0e, Y, pad(x_block), pad(xe_block),
                pad(np.asarray(Vg1)), pad(np.asarray(Ve1)),
                reml=False, nr_iter=nr_iter, nr_prec=nr_prec)
            k = len(idx)
            p_lrt[idx] = np.asarray(chisq_sf(
                2.0 * (np.asarray(logl2)[:k] - logl_H0_snp[idx]), float(d)))
            beta[idx] = np.asarray(b2)[:k]
            Vbeta[idx] = np.asarray(Vb2)[:k]

    if mode in (1, 4):
        logl, stat, b, Vb, Vg1, Ve1 = _gxe_h1_em_block(
            eval_, X0e, Y, x_block, xe_block, Vg_h1_0, Ve_h1_0, B_h1,
            reml=True, em_iter=em_iter, em_prec=em_prec)
        p_wald = np.array(chisq_sf(stat, float(d)))
        beta, Vbeta = np.array(b), np.array(Vb)
        idx = np.flatnonzero(p_wald < cfg.p_nr)
        if len(idx):
            size = _bucket(len(idx))
            pad = lambda a: _pad_rows(jnp.asarray(a[idx]), size)
            _, stat2, b2, Vb2 = _gxe_h1_nr_block(
                eval_, X0e, Y, pad(x_block), pad(xe_block),
                pad(np.asarray(Vg1)), pad(np.asarray(Ve1)),
                reml=True, nr_iter=nr_iter, nr_prec=nr_prec)
            k = len(idx)
            p_wald[idx] = np.asarray(chisq_sf(np.asarray(stat2)[:k],
                                              float(d)))
            beta[idx] = np.asarray(b2)[:k]
            Vbeta[idx] = np.asarray(Vb2)[:k]

    return dict(p_wald=p_wald, p_lrt=p_lrt, p_score=p_score,
                beta=beta, Vbeta=Vbeta)
