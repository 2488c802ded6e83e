"""Plain linear model association (-lm 1..4; reference src/lm.cpp).

Per-SNP OLS with covariates projected out.  Everything reduces to
three projected inner products (CalcvPv, lm.cpp:224-264):

  xPwx = x'x - x'W (W'W)^-1 W'x
  xPwy = x'y - x'W (W'W)^-1 W'y
  yPwy = y'y - y'W (W'W)^-1 W'y      (shared across SNPs)

and the statistics (LmCalcP, lm.cpp:266-289): beta = xPwy/xPwx,
Wald F(1, df), score F(1, df), LRT chi-square(1) on
n (log yPwy - log yPxy), with df = n - c - 1.

TPU design: the per-SNP quantities for a whole block are two matmuls
((S,n)x(n,c) and (S,n)x(n,)) — one fused jit program per block shape.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gemma_tpu.ops.stats import f_sf, chisq_sf


class LmStats(NamedTuple):
    beta: jax.Array
    se: jax.Array
    p_wald: jax.Array
    p_lrt: jax.Array
    p_score: jax.Array


@functools.partial(jax.jit, static_argnames=("mode",))
def lm_block(W, y, X_block, mode: int = 51) -> LmStats:
    """OLS stats for one (S, n) mean-imputed genotype block."""
    n, c = W.shape
    df = float(n - c - 1)

    WtW = W.T @ W
    Wty = W.T @ y
    WtWi_Wty = jnp.linalg.solve(WtW, Wty)
    yPwy = y @ y - Wty @ WtWi_Wty

    WtX = jnp.matmul(W.T, X_block.T)            # (c, S)
    xPwx = jnp.sum(X_block * X_block, axis=1) - jnp.sum(
        WtX * jnp.linalg.solve(WtW, WtX), axis=0)
    xPwy = jnp.matmul(X_block, y) - WtX.T @ WtWi_Wty

    yPxy = yPwy - xPwy * xPwy / xPwx
    beta = xPwy / xPwx
    se_wald = jnp.sqrt(yPxy / (df * xPwx))
    se_score = jnp.sqrt(yPwy / (n * xPwx))

    p_wald = f_sf(beta * beta / (se_wald * se_wald), 1.0, df)
    p_score = f_sf(beta * beta / (se_score * se_score), 1.0, df)
    p_lrt = chisq_sf(n * (jnp.log(yPwy) - jnp.log(yPxy)), 1.0)

    se = se_score if mode == 53 else se_wald
    return LmStats(beta=beta, se=se, p_wald=p_wald, p_lrt=p_lrt,
                   p_score=p_score)


@functools.partial(jax.jit, static_argnames=("mode",))
def lm_gene_block(W, x, Y_block, mode: int = 51) -> LmStats:
    """Gene-expression OLS: the phenotype x is the (shared) predictor
    and each gene expression row of Y_block is a response
    (LM::AnalyzeGene, lm.cpp:290-384)."""
    n, c = W.shape
    df = float(n - c - 1)

    WtW = W.T @ W
    Wtx = W.T @ x
    WtWi_Wtx = jnp.linalg.solve(WtW, Wtx)
    xPwx = x @ x - Wtx @ WtWi_Wtx

    WtY = jnp.matmul(W.T, Y_block.T)            # (c, G)
    yPwy = jnp.sum(Y_block * Y_block, axis=1) - jnp.sum(
        WtY * jnp.linalg.solve(WtW, WtY), axis=0)
    xPwy = jnp.matmul(Y_block, x) - WtY.T @ WtWi_Wtx

    yPxy = yPwy - xPwy * xPwy / xPwx
    beta = xPwy / xPwx
    se_wald = jnp.sqrt(yPxy / (df * xPwx))
    se_score = jnp.sqrt(yPwy / (n * xPwx))

    p_wald = f_sf(beta * beta / (se_wald * se_wald), 1.0, df)
    p_score = f_sf(beta * beta / (se_score * se_score), 1.0, df)
    p_lrt = chisq_sf(n * (jnp.log(yPwy) - jnp.log(yPxy)), 1.0)

    se = se_score if mode == 53 else se_wald
    return LmStats(beta=beta, se=se, p_wald=p_wald, p_lrt=p_lrt,
                   p_score=p_score)
