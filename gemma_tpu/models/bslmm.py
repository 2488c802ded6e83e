"""BSLMM: Bayesian sparse linear mixed model via MCMC (-bslmm 1/2/3).

Reference src/bslmm.cpp (Zhou, Carbonetto & Stephens 2013).  The model
in the kinship eigenbasis: y = X_gamma beta + u + e with a sparse
effect set gamma, u ~ N(0, sigma_b^2 tau^-1 diag(eval)), and
Metropolis-Hastings over (h, rho, log pi, gamma).

TPU-native redesign (vs GEMMA's 1.1M-iteration host loop with one
dgemm per step):
  * UtX lives on device with columns pre-sorted by the per-SNP ML
    log-likelihood-ratio rank, so "rank r" = column r;
  * the active set is a fixed-size (s_max,) index buffer with a count;
    every posterior evaluation has static shapes (gather + masked
    (s_max, n) matmul + s_max Cholesky), so the WHOLE chain compiles
    into a single `lax.fori_loop` program — no host round-trips;
  * proposals use jax.random (inverse-CDF sampling on the geometric
    rank distribution, bounded rejection for set membership);
  * recording scatters into device buffers every r_pace steps.

Deviation from the reference (documented): GEMMA's GSL Mersenne
stream cannot be replicated bit-for-bit; fixed jax.random seeds give
reproducible chains whose posterior summaries match statistically
(test_bslmm.py) — the same stance GEMMA's own tests take (fixed
GSL_RNG_SEED smoke values, not analytic goldens).
"""

from __future__ import annotations

import dataclasses
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class BslmmSettings:
    """Derived MCMC settings (PARAM defaults, param.cpp:1174-1199)."""
    ns_test: int
    ni_test: int
    s_min: int = 0
    s_max: int = 300
    h_min: float = 0.0
    h_max: float = 1.0
    rho_min: float = 0.0
    rho_max: float = 1.0
    logp_min: float = 0.0   # set from ns_test if 0
    logp_max: float = 0.0
    h_scale: float = -1.0
    rho_scale: float = -1.0
    logp_scale: float = -1.0
    geo_mean: float = 2000.0
    w_step: int = 100000
    s_step: int = 1000000
    r_pace: int = 10
    w_pace: int = 1000
    n_mh: int = 1            # a_mode 11 forces n_mh = 1 (param.cpp:1177)
    a_mode: int = 11

    def __post_init__(self):
        if self.logp_min == 0:
            self.logp_min = -np.log(self.ns_test)
        if self.h_scale == -1:
            self.h_scale = min(1.0, 10.0 / np.sqrt(self.ni_test))
        if self.rho_scale == -1:
            self.rho_scale = min(1.0, 10.0 / np.sqrt(self.ni_test))
        if self.logp_scale == -1:
            self.logp_scale = min(1.0, 5.0 / np.sqrt(self.ni_test))
        if self.h_min == -1:
            self.h_min = 0.0
        if self.h_max == -1:
            self.h_max = 1.0
        self.s_max = min(self.s_max, self.ns_test)


def calc_p_gamma(ns_test: int, geo_mean: float) -> np.ndarray:
    """Rank proposal: 0.7 geometric(1/geo_mean) + 0.3 uniform,
    normalised (CalcPgamma, bslmm.cpp:311-324)."""
    i = np.arange(1, ns_test + 1)
    q = 1.0 / geo_mean
    p = 0.7 * q * (1 - q) ** (i - 1) + 0.3 / ns_test
    return p / p.sum()


def _reflect(x, lo, hi):
    x = jnp.where(x < lo, 2 * lo - x, x)
    return jnp.where(x > hi, 2 * hi - x, x)


class ChainState(NamedTuple):
    key: jax.Array
    ranks: jax.Array       # (s_max,) int32, sentinel = ns_test when empty
    n_gamma: jax.Array     # int32
    h: jax.Array
    rho: jax.Array
    logp: jax.Array
    logpost: jax.Array
    pve: jax.Array
    pge: jax.Array
    beta: jax.Array        # (s_max,) sampled effects for active ranks
    alpha: jax.Array       # (n,)  current alpha'
    Utu: jax.Array         # (n,)
    UtXb: jax.Array        # (n,)
    Utz: jax.Array         # (n,) rotated working response (= Uty, mode 11;
                           #      resampled latent liabilities, mode 13)
    mean_z: jax.Array      # probit intercept accumulator (mode 13)
    acc_mean_z: jax.Array
    n_accept: jax.Array
    # accumulators
    acc_alpha: jax.Array   # (n,)
    acc_Utu: jax.Array     # (n,)
    acc_beta: jax.Array    # (p,) sum of sampled beta per SNP rank
    acc_betacnt: jax.Array # (p,) count of inclusion
    rec_hyp: jax.Array     # (n_rec, 6)
    rec_gamma: jax.Array   # (n_rec, s_max) int32 (ranks + 1; 0 = empty)
    w: jax.Array           # number of recorded states


def make_mcmc_step(UtX_sorted, Uty, eval_, trace_G, p_gamma,
                   st: BslmmSettings, U=None, y_labels=None):
    """Build the jitted single-iteration MCMC update (one t of
    bslmm.cpp:992-1151, with its n_mh inner M-H steps).

    For the probit model (a_mode 13) pass U (eigenvectors) and
    y_labels (centered case/control labels): each iteration resamples
    the latent liabilities by truncated normals around z_hat
    (SampleZ, bslmm.cpp:689-713)."""
    n, p = UtX_sorted.shape
    s_max = st.s_max
    dtype = UtX_sorted.dtype
    cum_p = jnp.cumsum(jnp.asarray(p_gamma, dtype))
    p_gamma_d = jnp.asarray(p_gamma, dtype)
    SENT = p  # sentinel rank

    def gather_X(ranks, n_gamma):
        """(n, s_max) masked active columns."""
        mask = jnp.arange(s_max) < n_gamma
        cols = jnp.where(mask, ranks, 0)
        Xg = UtX_sorted[:, cols] * mask[None, :]
        return Xg, mask

    def calc_posterior(key, uty, ranks, n_gamma, h, rho, logp):
        """Masked-shape CalcPosterior (both overloads,
        bslmm.cpp:450-642).  Returns (logpost, beta, UtXb, alpha, Utu,
        pve, pge)."""
        k1, k2, k3, k4 = jax.random.split(key, 4)
        sigma_b2 = h * (1.0 - rho) / (trace_G * (1.0 - h))
        sigma_a2 = h * rho / (trace_G * (1.0 - h) * jnp.exp(logp) * p)

        d = eval_ * sigma_b2
        w_hi = 1.0 / (d + 1.0)
        logdet_H = -jnp.sum(jnp.log(w_hi))
        Hi_yy0 = jnp.sum(w_hi * uty * uty)
        utu_rand = jax.random.normal(k1, (n,), dtype) * jnp.sqrt(d * w_hi)

        use_x = (n_gamma > 0) & (rho != 0)

        Xg, mask = gather_X(ranks, n_gamma)
        Xw = Xg * w_hi[:, None]
        Omega = sigma_a2 * (Xw.T @ Xg) + jnp.eye(s_max, dtype=dtype)
        XtHiy = Xw.T @ uty                       # masked cols → zeros
        L = jnp.linalg.cholesky(Omega)
        logdet_O = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
        beta_hat = sigma_a2 * jax.scipy.linalg.cho_solve((L, True), XtHiy)
        quad = XtHiy @ beta_hat
        P_yy = jnp.where(use_x, Hi_yy0 - quad, Hi_yy0)

        if st.a_mode == 13:
            tau = jnp.asarray(1.0, dtype)
        else:
            tau = jax.random.gamma(k2, n / 2.0, dtype=dtype) * (2.0 / P_yy)

        z = jax.random.normal(k3, (s_max,), dtype)
        # beta = beta_hat + sqrt(sigma_a2/tau) * L^-T z (bslmm.cpp:582-590)
        beta_s = jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
        beta_s = beta_s * jnp.sqrt(sigma_a2 / tau) + beta_hat
        beta_s = beta_s * mask
        UtXb = jnp.where(use_x, Xg @ beta_s, jnp.zeros(n, dtype))

        alpha = (uty - UtXb) * w_hi * sigma_b2
        scale_u = jnp.sqrt(1.0 / tau) if st.a_mode != 13 else 1.0
        Utu = alpha * eval_ + utu_rand * scale_u

        pge_raw = jnp.sum(UtXb * UtXb) / n
        uu = jnp.sum(Utu * Utu) / n
        pve = jnp.where(use_x, pge_raw + uu, uu)
        pge = jnp.where(use_x & (pve != 0), pge_raw / jnp.maximum(pve, 1e-300),
                        0.0)
        pve = pve / (pve + 1.0 / tau)

        logpost = -0.5 * logdet_H - jnp.where(use_x, 0.5 * logdet_O, 0.0)
        if st.a_mode == 13:
            logpost = logpost - 0.5 * P_yy
        else:
            logpost = logpost - 0.5 * n * jnp.log(P_yy)
        logpost = logpost + (n_gamma - 1.0) * logp + (p - n_gamma) * jnp.log(
            1.0 - jnp.exp(logp))
        return logpost, beta_s, UtXb, alpha, Utu, pve, pge

    def sample_new_rank(key, ranks, n_gamma):
        """Draw a rank from p_gamma not already active (bounded
        rejection, bslmm.cpp:811-813)."""
        def cond(c):
            k, r, ok = c
            return ~ok

        def body(c):
            k, _, _ = c
            k, sub = jax.random.split(k)
            u = jax.random.uniform(sub, dtype=dtype)
            r = jnp.searchsorted(cum_p, u).astype(jnp.int32)
            r = jnp.minimum(r, p - 1)
            present = jnp.any((ranks == r) & (jnp.arange(s_max) < n_gamma))
            return k, r, ~present

        key, r, _ = jax.lax.while_loop(
            cond, body, (key, jnp.int32(0), jnp.array(False)))
        return key, r

    def active_prob_sum(ranks, n_gamma):
        mask = jnp.arange(s_max) < n_gamma
        return jnp.sum(jnp.where(mask, p_gamma_d[jnp.where(mask, ranks, 0)],
                                 0.0))

    def propose_gamma(key, ranks, n_gamma, repeat):
        """add/remove/swap with proposal correction
        (ProposeGamma, bslmm.cpp:770-877)."""
        def step(i, carry):
            key, ranks, n_gamma, logmh = carry

            def do(carry):
                key, ranks, n_gamma, logmh = carry
                key, ku = jax.random.split(key)
                unif = jax.random.uniform(ku, dtype=dtype)
                can_add = n_gamma < s_max
                can_del = n_gamma > st.s_min
                can_swp = (n_gamma > 0) & (n_gamma < p)
                flag = jnp.where((unif < 0.40) & can_add, 1,
                        jnp.where((unif >= 0.40) & (unif < 0.80) & can_del, 2,
                         jnp.where((unif >= 0.80) & can_swp, 3, 4)))

                prob_act = active_prob_sum(ranks, n_gamma)

                # --- add ---
                key, r_add = sample_new_rank(key, ranks, n_gamma)
                prob_total_a = 1.0 - prob_act
                ranks_a = ranks.at[n_gamma].set(r_add)
                log_a = (-jnp.log(p_gamma_d[r_add] / prob_total_a)
                         - jnp.log(n_gamma + 1.0))

                # --- remove ---
                key, kd = jax.random.split(key)
                col = jax.random.randint(kd, (), 0, jnp.maximum(n_gamma, 1))
                r_rem = ranks[col]
                prob_total_d = 1.0 - prob_act + p_gamma_d[r_rem]
                ranks_d = ranks.at[col].set(ranks[n_gamma - 1])
                ranks_d = ranks_d.at[n_gamma - 1].set(SENT)
                log_d = (jnp.log(p_gamma_d[r_rem] / prob_total_d)
                         + jnp.log(jnp.maximum(n_gamma.astype(dtype), 1.0)))

                # --- swap: remove r_rem (at col), add r_add ---
                prob_total_s = 1.0 - prob_act
                log_s = (jnp.log(p_gamma_d[r_rem] /
                                 (prob_total_s + p_gamma_d[r_rem]
                                  - p_gamma_d[r_add]))
                         - jnp.log(p_gamma_d[r_add] / prob_total_s))
                ranks_s = ranks.at[col].set(r_add)

                ranks_n = jnp.where(flag == 1, ranks_a,
                           jnp.where(flag == 2, ranks_d,
                            jnp.where(flag == 3, ranks_s, ranks)))
                ng_n = jnp.where(flag == 1, n_gamma + 1,
                        jnp.where(flag == 2, n_gamma - 1, n_gamma))
                dlog = jnp.where(flag == 1, log_a,
                         jnp.where(flag == 2, log_d,
                          jnp.where(flag == 3, log_s, 0.0)))
                return key, ranks_n, ng_n, logmh + dlog

            return jax.lax.cond(i < repeat, do, lambda c: c,
                                (key, ranks, n_gamma, logmh))

        key, ranks, n_gamma, logmh = jax.lax.fori_loop(
            0, 20, step, (key, ranks, n_gamma, jnp.zeros((), dtype)))
        ranks = jnp.sort(ranks)   # sentinel sorts last (bslmm.cpp:873)
        return key, ranks, n_gamma, logmh

    def propose_h_rho_pi(key, h, rho, logp, repeat):
        d_h = (st.h_max - st.h_min) * st.h_scale
        d_rho = (st.rho_max - st.rho_min) * st.rho_scale
        d_logp = min(0.1, (st.logp_max - st.logp_min) * st.logp_scale)

        def step(i, carry):
            key, h, rho, logp, lr = carry

            def do(carry):
                key, h, rho, logp, lr = carry
                key, k1, k2, k3 = jax.random.split(key, 4)
                h2 = _reflect(h + (jax.random.uniform(k1, dtype=dtype) - 0.5)
                              * d_h, st.h_min, st.h_max)
                rho2 = _reflect(rho + (jax.random.uniform(k2, dtype=dtype)
                                       - 0.5) * d_rho,
                                st.rho_min, st.rho_max)
                logp2 = _reflect(logp + (jax.random.uniform(k3, dtype=dtype)
                                         - 0.5) * d_logp,
                                 st.logp_min, st.logp_max)
                return key, h2, rho2, logp2, lr + (logp2 - logp)

            return jax.lax.cond(i < repeat, do, lambda c: c, carry)

        return jax.lax.fori_loop(
            0, 20, step, (key, h, rho, logp, jnp.zeros((), dtype)))

    def mh_step(s: ChainState) -> ChainState:
        key, k0, k1, k2 = jax.random.split(s.key, 4)
        long_jump = jax.random.uniform(k0, dtype=dtype) < 0.33
        repeat = jnp.where(
            long_jump, 1 + jax.random.randint(k1, (), 0, 20), 1)

        key, h_n, rho_n, logp_n, lr_pi = propose_h_rho_pi(
            key, s.h, s.rho, s.logp, repeat)
        key, ranks_n, ng_n, lr_g = propose_gamma(
            key, s.ranks, s.n_gamma, repeat)

        key, kp = jax.random.split(key)
        logpost_n, beta_n, UtXb_n, alpha_n, Utu_n, pve_n, pge_n = \
            calc_posterior(kp, s.Utz, ranks_n, ng_n, h_n, rho_n, logp_n)

        logmh = lr_pi + lr_g + logpost_n - s.logpost
        key, ka = jax.random.split(key)
        accept = (logmh > 0) | (jnp.log(
            jax.random.uniform(ka, dtype=dtype)) < logmh)

        def take(new, old):
            return jnp.where(accept, new, old)

        return s._replace(
            key=key,
            ranks=take(ranks_n, s.ranks),
            n_gamma=take(ng_n, s.n_gamma),
            h=take(h_n, s.h), rho=take(rho_n, s.rho),
            logp=take(logp_n, s.logp),
            logpost=take(logpost_n, s.logpost),
            pve=take(pve_n, s.pve), pge=take(pge_n, s.pge),
            beta=take(beta_n, s.beta),
            alpha=jnp.where(accept, alpha_n, s.alpha),
            Utu=jnp.where(accept, Utu_n, s.Utu),
            UtXb=jnp.where(accept, UtXb_n, s.UtXb),
            n_accept=s.n_accept + accept.astype(jnp.int32),
        )

    def iteration(t, s: ChainState) -> ChainState:
        if st.a_mode == 13:
            # resample latent liabilities (SampleZ, bslmm.cpp:689-713):
            # z_i ~ N(z_hat_i, 1) truncated by the case/control label
            key, kz, km = jax.random.split(s.key, 3)
            z_hat = U @ (s.UtXb + s.Utu) + s.mean_z
            eps = jax.random.truncated_normal(
                kz,
                jnp.where(y_labels <= 0, -jnp.inf, -z_hat),
                jnp.where(y_labels <= 0, -z_hat, jnp.inf),
                (n,), dtype)
            z = z_hat + eps
            mean_z = jnp.mean(z)
            z = z - mean_z
            Utz = U.T @ z
            # refresh the posterior at the current state (bslmm.cpp:1006-1026)
            key, kp = jax.random.split(key)
            logpost0, beta0, UtXb0, alpha0, Utu0, pve0, pge0 = \
                calc_posterior(kp, Utz, s.ranks, s.n_gamma, s.h, s.rho,
                               s.logp)
            s = s._replace(key=key, Utz=Utz, mean_z=mean_z,
                           logpost=logpost0, beta=beta0, UtXb=UtXb0,
                           alpha=alpha0, Utu=Utu0, pve=pve0, pge=pge0)

        for _ in range(st.n_mh):
            s = mh_step(s)

        if st.a_mode == 13:
            # sample the intercept and update mean_z
            # (bslmm.cpp:1100-1105)
            key, kg = jax.random.split(s.key)
            z_res_mean = s.mean_z + jax.random.normal(kg, (), dtype) * \
                jnp.sqrt(1.0 / n)
            s = s._replace(key=key, mean_z=z_res_mean)

        # record every r_pace steps after burn-in (bslmm.cpp:1110-1149);
        # non-recording iterations scatter into a trailing dummy row so
        # the write is always one row, never a full-buffer copy
        do_rec = (t >= st.w_step) & ((t % st.r_pace) == 0)
        n_rec_rows = s.rec_hyp.shape[0] - 1
        w_col = jnp.where(do_rec, s.w, n_rec_rows)

        hyp_row = jnp.stack([s.h, s.pve, s.rho, s.pge, s.logp,
                             s.n_gamma.astype(dtype)])
        rec_hyp = s.rec_hyp.at[w_col].set(hyp_row)
        mask = jnp.arange(s_max) < s.n_gamma
        gam_row = jnp.where(mask, s.ranks + 1, 0).astype(jnp.int32)
        rec_gamma = s.rec_gamma.at[w_col].set(gam_row)

        inc = jnp.where(do_rec & mask, 1.0, 0.0)
        bsum = jnp.where(do_rec & mask, s.beta, 0.0)
        safe_ranks = jnp.where(mask, s.ranks, 0)
        acc_beta = s.acc_beta.at[safe_ranks].add(bsum)
        acc_betacnt = s.acc_betacnt.at[safe_ranks].add(inc)

        return s._replace(
            acc_alpha=jnp.where(do_rec, s.acc_alpha + s.alpha, s.acc_alpha),
            acc_Utu=jnp.where(do_rec, s.acc_Utu + s.Utu, s.acc_Utu),
            acc_mean_z=jnp.where(do_rec, s.acc_mean_z + s.mean_z,
                                 s.acc_mean_z),
            acc_beta=acc_beta, acc_betacnt=acc_betacnt,
            rec_hyp=rec_hyp, rec_gamma=rec_gamma,
            w=s.w + do_rec.astype(jnp.int32),
        )

    return calc_posterior, iteration


def run_mcmc(UtX_sorted, Uty, eval_, trace_G, settings: BslmmSettings,
             h0: float, rho0: float, logp0: float, n_gamma0: int,
             seed: int = 0, U=None, y_labels=None,
             checkpoint_path: str | None = None,
             checkpoint_every: int = 0, on_segment=None):
    """Run the full chain on device.  Returns the final ChainState."""
    n, p = UtX_sorted.shape
    dtype = UtX_sorted.dtype
    s_max = settings.s_max
    # +1 dummy row absorbs writes from non-recording iterations
    n_rec = (settings.s_step + settings.r_pace - 1) // settings.r_pace + 2

    calc_posterior, iteration = make_mcmc_step(
        UtX_sorted, Uty, eval_, trace_G, calc_p_gamma(p, settings.geo_mean),
        settings, U=U, y_labels=y_labels)

    key = jax.random.PRNGKey(seed)
    key, kp = jax.random.split(key)
    ranks0 = jnp.where(jnp.arange(s_max) < n_gamma0,
                       jnp.arange(s_max), p).astype(jnp.int32)
    logpost0, beta0, UtXb0, alpha0, Utu0, pve0, pge0 = calc_posterior(
        kp, Uty, ranks0, jnp.int32(n_gamma0), jnp.asarray(h0, dtype),
        jnp.asarray(rho0, dtype), jnp.asarray(logp0, dtype))

    state = ChainState(
        key=key, ranks=ranks0, n_gamma=jnp.int32(n_gamma0),
        h=jnp.asarray(h0, dtype), rho=jnp.asarray(rho0, dtype),
        logp=jnp.asarray(logp0, dtype), logpost=logpost0,
        pve=pve0, pge=pge0, beta=beta0, alpha=alpha0, Utu=Utu0,
        UtXb=UtXb0, Utz=Uty, mean_z=jnp.zeros((), dtype),
        acc_mean_z=jnp.zeros((), dtype), n_accept=jnp.int32(0),
        acc_alpha=jnp.zeros(n, dtype), acc_Utu=jnp.zeros(n, dtype),
        acc_beta=jnp.zeros(p, dtype), acc_betacnt=jnp.zeros(p, dtype),
        rec_hyp=jnp.zeros((n_rec, 6), dtype),
        rec_gamma=jnp.zeros((n_rec, s_max), jnp.int32),
        w=jnp.int32(0),
    )

    total = settings.w_step + settings.s_step

    @jax.jit
    def chain(state, start, stop):
        return jax.lax.fori_loop(start, stop, iteration, state)

    if not checkpoint_path or checkpoint_every <= 0:
        return chain(state, jnp.int32(0), jnp.int32(total))

    # Segmented execution with host-side checkpointing — a capability
    # the reference lacks (its only crash tolerance is the w_pace
    # incremental flush, bslmm.cpp:1113-1155; SURVEY §5.3-5.4): the
    # chain runs in fixed-size device segments and the full ChainState
    # (including the RNG key) lands in an .npz after each, so a killed
    # multi-hour run resumes bit-identically from the last segment.
    start_iter = 0
    if os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        if (int(ck["total"]) == total and int(ck["seed"]) == seed
                and int(ck["it"]) < total):
            start_iter = int(ck["it"])
            state = ChainState(**{
                f: jnp.asarray(ck[f]) for f in ChainState._fields})

    it = start_iter
    while it < total:
        stop = min(it + checkpoint_every, total)
        state = chain(state, jnp.int32(it), jnp.int32(stop))
        jax.block_until_ready(state.rec_hyp)
        it = stop
        payload = {f: np.asarray(getattr(state, f))
                   for f in ChainState._fields}
        payload.update(it=it, total=total, seed=seed)
        tmp = checkpoint_path + ".tmp.npz"
        np.savez(tmp, **payload)
        os.replace(tmp, checkpoint_path)
        if on_segment is not None:
            # incremental result flush — the reference writes partial
            # .hyp.txt every w_pace records (bslmm.cpp:1113-1155); on
            # TPU the chain runs whole segments on device, so the
            # flush granularity is the checkpoint segment
            on_segment(state)
    return state


def ridge_gblup(UtX, Uty, eval_, lam):
    """-bslmm 2: GBLUP / ridge (RidgeR, bslmm.cpp:1194-1222).
    Returns (alpha (p,), breeding values in rotated space (n,))."""
    H = lam * eval_ + 1.0
    bv_rot = Uty / H
    alpha = (lam / UtX.shape[1]) * (UtX.T @ bv_rot)
    u_rot = (H - 1.0) * bv_rot
    return alpha, u_rot
