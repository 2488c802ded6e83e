"""Matrix/vector centering and scaling (GEMMA mathfunc.cpp analogues).

These are the small dense transforms GEMMA applies to the relatedness
matrix and phenotype/covariate vectors before the eigendecomposition:

  * center_matrix     — G := P G P with P = I - 11'/n
                        (mathfunc.cpp `CenterMatrix(G)`)
  * center_matrix_w   — project a covariate matrix W out of G
                        (mathfunc.cpp `CenterMatrix(G, W)`)
  * center_vector     — subtract the mean (`CenterVector`)
  * standardize_vector— z-score (`StandardizeVector`)
  * scale_matrix      — divide by mean diagonal (`ScaleMatrix`)

All are jittable pure functions; dtype follows the input.
"""

from __future__ import annotations

import jax.numpy as jnp


def center_matrix(G):
    """Double-center a symmetric matrix: G - rowmean - colmean + grandmean."""
    n = G.shape[0]
    Gw = jnp.sum(G, axis=1)                       # G @ 1
    d = jnp.sum(Gw)                               # 1' G 1
    G = G - (Gw[:, None] + Gw[None, :]) / n + d / (n * n)
    return G


def center_matrix_w(G, W):
    """Project covariates out of G: (I-Pw) G (I-Pw)' with Pw = W(W'W)^-1 W'."""
    WtW = W.T @ W
    WtWiWt = jnp.linalg.solve(WtW, W.T)           # (c, n)
    GW = G @ W                                    # (n, c)
    Gtmp = GW @ WtWiWt                            # G Pw
    G = G - Gtmp - Gtmp.T
    WtGW = W.T @ GW                               # (c, c)
    G = G + WtWiWt.T @ (WtGW @ WtWiWt)            # + Pw G Pw
    return G


def center_vector(y):
    return y - jnp.mean(y)


def center_vector_w(y, W):
    """Residualize y against W: y - W (W'W)^-1 W'y (mathfunc CenterVector(y,W))."""
    WtW = W.T @ W
    Wty = W.T @ y
    return y - W @ jnp.linalg.solve(WtW, Wty)


def standardize_vector(y):
    y = y - jnp.mean(y)
    # GEMMA StandardizeVector divides by the population sd (1/n).
    sd = jnp.sqrt(jnp.mean(y * y))
    return y / sd


def scale_matrix(G):
    """Divide by the mean of the diagonal (mathfunc `ScaleMatrix`)."""
    d = jnp.mean(jnp.diag(G))
    return G / d
