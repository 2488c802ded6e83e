"""Univariate LMM engine: null-model fit and batched association.

Orchestrates the likelihood kernels (likelihood.py) and the batched
lambda optimiser (optimize.py) into the two operations GEMMA's LMM
class performs (lmm.cpp):

  * fit_null      — REML + ML lambda for the covariate-only model, plus
                    vg/ve/beta/se (CalcLmmVgVeBeta, lmm.cpp:2210) and
                    PVE (CalcPve, lmm.cpp:2183).
  * assoc_block   — per-SNP Wald/LRT/score statistics for a block of
                    rotated genotypes (the body of LMM::Analyze,
                    lmm.cpp:1474-1658), fully vectorised: the whole
                    block shares one traced program per (S, n, n_cvt,
                    mode) signature.

Modes mirror GEMMA's -lmm numbers: 1=Wald, 2=LRT, 3=score, 4=all,
9=LRT+score (with beta/se from the score fit).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gemma_tpu.models.lmm import likelihood as lk
from gemma_tpu.models.lmm.indices import pab_indices
from gemma_tpu.models.lmm.optimize import calc_lambda
from gemma_tpu.ops.stats import f_sf, chisq_sf


class NullFit(NamedTuple):
    l_mle: jax.Array
    logl_mle: jax.Array
    l_remle: jax.Array
    logl_remle: jax.Array
    vg_mle: jax.Array
    ve_mle: jax.Array
    beta_mle: jax.Array
    se_beta_mle: jax.Array
    vg_remle: jax.Array
    ve_remle: jax.Array
    beta_remle: jax.Array
    se_beta_remle: jax.Array
    pve: jax.Array
    pve_se: jax.Array


def _vg_ve_beta(eval_, UtW, Uty, lam, n_cvt: int):
    """REML/MLE variance components and GLS covariate effects at lambda.

    Mirrors CalcLmmVgVeBeta (lmm.cpp:2210-2281).
    """
    idx = pab_indices(n_cvt)
    n = eval_.shape[0]
    hi = 1.0 / (lam * eval_ + 1.0)
    HiW = UtW * hi[:, None]
    WHiW = HiW.T @ UtW
    WHiy = HiW.T @ Uty
    beta = jnp.linalg.solve(WHiW, WHiy)
    Vbeta = jnp.linalg.inv(WHiW)

    data = lk.null_batch_data(eval_, UtW, Uty, n_cvt)
    pab = lk._pab_rows(lk._base_row(hi[None, :], data, n_cvt), n_cvt)
    p_yy = pab[n_cvt][..., idx.yy][0]

    ve = p_yy / (n - n_cvt)
    vg = ve * lam
    se_beta = jnp.sqrt(jnp.diag(Vbeta) * ve)
    return vg, ve, beta, se_beta


@functools.partial(jax.jit, static_argnames=("n_cvt", "l_min", "l_max", "n_region"))
def fit_null(eval_, UtW, Uty, trace_G, n_cvt: int,
             l_min: float = 1e-5, l_max: float = 1e5,
             n_region: int = 10) -> NullFit:
    """Fit the covariate-only LMM (gemma.cpp:2704-2753)."""
    data = lk.null_batch_data(eval_, UtW, Uty, n_cvt)

    mle = calc_lambda(data, n_cvt, calc_null=True, reml=False,
                      l_min=l_min, l_max=l_max, n_region=n_region)
    remle = calc_lambda(data, n_cvt, calc_null=True, reml=True,
                        l_min=l_min, l_max=l_max, n_region=n_region)
    l_mle = mle.lam[0]
    l_remle = remle.lam[0]

    vg_m, ve_m, beta_m, se_m = _vg_ve_beta(eval_, UtW, Uty, l_mle, n_cvt)
    vg_r, ve_r, beta_r, se_r = _vg_ve_beta(eval_, UtW, Uty, l_remle, n_cvt)

    # CalcPve: se(lambda) from the REML curvature (lmm.cpp:2183-2205)
    _, d2 = lk.dev12(remle.lam, data, n_cvt, calc_null=True, reml=True)
    se_lam = jnp.sqrt(-1.0 / d2[0])
    pve = trace_G * l_remle / (trace_G * l_remle + 1.0)
    pve_se = trace_G / (trace_G * l_remle + 1.0) ** 2 * se_lam

    return NullFit(
        l_mle=l_mle, logl_mle=mle.logf[0],
        l_remle=l_remle, logl_remle=remle.logf[0],
        vg_mle=vg_m, ve_mle=ve_m, beta_mle=beta_m, se_beta_mle=se_m,
        vg_remle=vg_r, ve_remle=ve_r, beta_remle=beta_r, se_beta_remle=se_r,
        pve=pve, pve_se=pve_se,
    )


class AssocStats(NamedTuple):
    """Per-SNP summary statistics (SUMSTAT, lmm.h)."""
    beta: jax.Array
    se: jax.Array
    lambda_remle: jax.Array
    lambda_mle: jax.Array
    p_wald: jax.Array
    p_lrt: jax.Array
    p_score: jax.Array
    logl_H1: jax.Array


def assoc_block_impl(eval_, UtW, Uty, Utx_block, l_mle_null, logl_mle_H0,
                     n_cvt: int, mode: int,
                     l_min: float = 1e-5, l_max: float = 1e5,
                     n_region: int = 10) -> AssocStats:
    """Association statistics for one rotated SNP block (S, n).

    Utx_block rows are U'x for mean-imputed (uncentered) genotype
    vectors, exactly as LMM::Analyze feeds them (lmm.cpp:1589-1636).
    """
    S = Utx_block.shape[0]
    dtype = eval_.dtype
    data = lk.build_batch_data(eval_, UtW, Uty, Utx_block, n_cvt)

    zeros = jnp.zeros((S,), dtype)
    beta = zeros
    se = zeros
    lambda_remle = zeros
    lambda_mle = zeros
    p_wald = zeros
    p_lrt = zeros
    p_score = zeros
    logl_H1 = zeros

    if mode in (3, 4, 9):
        b_s, se_s, fstat_s, df = lk.score_stats(
            jnp.full((S,), l_mle_null, dtype), data, n_cvt)
        beta, se = b_s, se_s
        p_score = f_sf(fstat_s, 1.0, df)

    if mode in (1, 4):
        remle = calc_lambda(data, n_cvt, calc_null=False, reml=True,
                            l_min=l_min, l_max=l_max, n_region=n_region)
        lambda_remle = remle.lam
        logl_H1 = remle.logf
        b_w, se_w, fstat_w, df = lk.wald_stats(remle.lam, data, n_cvt)
        beta, se = b_w, se_w
        p_wald = f_sf(fstat_w, 1.0, df)

    if mode in (2, 4, 9):
        mle = calc_lambda(data, n_cvt, calc_null=False, reml=False,
                          l_min=l_min, l_max=l_max, n_region=n_region)
        lambda_mle = mle.lam
        logl_H1 = mle.logf
        p_lrt = chisq_sf(2.0 * (mle.logf - logl_mle_H0), 1.0)

    return AssocStats(beta=beta, se=se, lambda_remle=lambda_remle,
                      lambda_mle=lambda_mle, p_wald=p_wald, p_lrt=p_lrt,
                      p_score=p_score, logl_H1=logl_H1)


assoc_block = jax.jit(
    assoc_block_impl,
    static_argnames=("n_cvt", "mode", "l_min", "l_max", "n_region"))


def assoc_gxe_block_impl(eval_, UtW, Ut_env, Uty, Utx_block, Utxe_block,
                         l_mle_null, logl_mle_H0, n_cvt: int, mode: int,
                         l_min: float = 1e-5, l_max: float = 1e5,
                         n_region: int = 10) -> AssocStats:
    """GxE association (AnalyzeBimbamGXE, lmm.cpp:2283-2431).

    Per SNP the covariates expand to [W, env, x] (n_cvt+2) and the
    tested predictor is the interaction x*env; for the LRT the null
    model is re-fit per SNP (it contains x).  Each lane carries its own
    covariate matrix, so the block vmaps the single-SNP pipeline — the
    internal convergence masks keep lanes independent under vmap.
    """
    nc2 = n_cvt + 2
    dtype = eval_.dtype

    def one(utx, utxe):
        UtWe = jnp.concatenate([UtW, Ut_env[:, None], utx[:, None]], axis=1)
        data = lk.build_batch_data(eval_, UtWe, Uty, utxe[None, :], nc2)

        logl_H0 = jnp.zeros((), dtype)
        if mode in (2, 4):
            null = calc_lambda(data, nc2, calc_null=True, reml=False,
                               l_min=l_min, l_max=l_max, n_region=n_region)
            logl_H0 = null.logf[0]

        beta = se = lam_r = lam_m = p_w = p_l = p_s = logl_H1 = \
            jnp.zeros((), dtype)
        if mode in (3, 4, 9):
            b_s, se_s, f_s, df = lk.score_stats(
                jnp.full((1,), l_mle_null, dtype), data, nc2)
            beta, se = b_s[0], se_s[0]
            p_s = f_sf(f_s, 1.0, df)[0]
        if mode in (1, 4):
            remle = calc_lambda(data, nc2, calc_null=False, reml=True,
                                l_min=l_min, l_max=l_max, n_region=n_region)
            lam_r = remle.lam[0]
            logl_H1 = remle.logf[0]
            b_w, se_w, f_w, df = lk.wald_stats(remle.lam, data, nc2)
            beta, se = b_w[0], se_w[0]
            p_w = f_sf(f_w, 1.0, df)[0]
        if mode in (2, 4, 9):
            mle = calc_lambda(data, nc2, calc_null=False, reml=False,
                              l_min=l_min, l_max=l_max, n_region=n_region)
            lam_m = mle.lam[0]
            logl_H1 = mle.logf[0]
            p_l = chisq_sf(2.0 * (mle.logf[0] - logl_H0), 1.0)
        return AssocStats(beta=beta, se=se, lambda_remle=lam_r,
                          lambda_mle=lam_m, p_wald=p_w, p_lrt=p_l,
                          p_score=p_s, logl_H1=logl_H1)

    return jax.vmap(one)(Utx_block, Utxe_block)


assoc_gxe_block = jax.jit(
    assoc_gxe_block_impl,
    static_argnames=("n_cvt", "mode", "l_min", "l_max", "n_region"))


def assoc_gene_block_impl(eval_, UtW, Utx, Uty_block, n_cvt: int, mode: int,
                          l_min: float = 1e-5, l_max: float = 1e5,
                          n_region: int = 10) -> AssocStats:
    """Gene-expression association (AnalyzeGene, lmm.cpp:1365-1471).

    Roles are swapped: each gene's (rotated) expression vector is the
    response, the phenotype Utx is the fixed predictor.  The per-gene
    "null" replicates GEMMA's quirk of a calc_null=False fit with the
    x columns zeroed (equivalent to the true null through the ps_ww==0
    recurrence guard); the score test evaluates at that per-gene MLE.
    """
    dtype = eval_.dtype
    n = eval_.shape[0]
    zero_x = jnp.zeros((1, n), dtype)

    def one(uty):
        data0 = lk.build_batch_data(eval_, UtW, uty, zero_x, n_cvt)
        l_H0 = jnp.zeros((), dtype)
        logl_H0 = jnp.zeros((), dtype)
        if mode in (2, 3, 4, 9):
            null = calc_lambda(data0, n_cvt, calc_null=False, reml=False,
                               l_min=l_min, l_max=l_max, n_region=n_region)
            l_H0 = null.lam[0]
            logl_H0 = null.logf[0]

        data = lk.build_batch_data(eval_, UtW, uty, Utx[None, :], n_cvt)
        beta = se = lam_r = lam_m = p_w = p_l = p_s = logl_H1 = \
            jnp.zeros((), dtype)
        if mode in (3, 4, 9):
            b_s, se_s, f_s, df = lk.score_stats(
                jnp.full((1,), l_H0, dtype), data, n_cvt)
            beta, se = b_s[0], se_s[0]
            p_s = f_sf(f_s, 1.0, df)[0]
        if mode in (1, 4):
            remle = calc_lambda(data, n_cvt, calc_null=False, reml=True,
                                l_min=l_min, l_max=l_max, n_region=n_region)
            lam_r = remle.lam[0]
            logl_H1 = remle.logf[0]
            b_w, se_w, f_w, df = lk.wald_stats(remle.lam, data, n_cvt)
            beta, se = b_w[0], se_w[0]
            p_w = f_sf(f_w, 1.0, df)[0]
        if mode in (2, 4, 9):
            mle = calc_lambda(data, n_cvt, calc_null=False, reml=False,
                              l_min=l_min, l_max=l_max, n_region=n_region)
            lam_m = mle.lam[0]
            logl_H1 = mle.logf[0]
            p_l = chisq_sf(2.0 * (mle.logf[0] - logl_H0), 1.0)
        return AssocStats(beta=beta, se=se, lambda_remle=lam_r,
                          lambda_mle=lam_m, p_wald=p_w, p_lrt=p_l,
                          p_score=p_s, logl_H1=logl_H1)

    return jax.vmap(one)(Uty_block)


assoc_gene_block = jax.jit(
    assoc_gene_block_impl,
    static_argnames=("n_cvt", "mode", "l_min", "l_max", "n_region"))


def impute_mean(x_raw: np.ndarray) -> np.ndarray:
    """Mean-impute missing genotypes per SNP row (lmm.cpp:1589-1618).

    x_raw: (S, n) with NaN missing; mean over observed entries.
    Host-side numpy (feeds the device rotation matmul).
    """
    miss = np.isnan(x_raw)
    n_obs = np.maximum((~miss).sum(axis=1), 1)
    mean = np.where(miss, 0.0, x_raw).sum(axis=1) / n_obs
    out = np.where(miss, mean[:, None], x_raw)
    return out


@functools.partial(jax.jit, static_argnames=("dtype_name",))
def _impute_i8_jit(x_i8, dtype_name: str):
    x = x_i8.astype(jnp.dtype(dtype_name))
    miss = x_i8 < 0
    n_obs = jnp.maximum(jnp.sum(~miss, axis=1), 1)
    mean = jnp.sum(jnp.where(miss, 0.0, x), axis=1) / n_obs
    return jnp.where(miss, mean[:, None], x)


def impute_mean_i8(x_i8, dtype):
    """Device-side mean imputation for integral dosages shipped as
    int8 (missing = -1): the genotype block rides the wire at 1 byte
    per entry instead of 4-8 (PLINK .bed dosages are always in
    {0, 1, 2, NA}); same math as `impute_mean`."""
    return _impute_i8_jit(x_i8, jnp.dtype(dtype).name)
