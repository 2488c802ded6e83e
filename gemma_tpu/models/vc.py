"""Variance-component estimation: HE regression and REML-AI (-vc).

Reference src/vc.cpp.  Two individual-level estimators over a stack of
m kinship matrices K_i (n×n each) with covariates W and phenotype y:

  * vc_he (CalcVChe, vc.cpp:1503-1723) — Haseman-Elston / method of
    moments: project W out of each K and y, solve S pve = q where
    S_ij = tr(Kc_i Kc_j) - n r and q_i = y' Kc_i y - r y'y, with the
    sampling covariance of q built from the y'Kr K Kr y quadratic
    forms.
  * vc_reml_ai (CalcVCreml, vc.cpp:1726-1930) — REML via Newton on
    d logRL / d log(sigma2) with the average-information matrix
    yPK_iPK_jPy as (negated) curvature.  GEMMA drives GSL's hybridsj
    multiroot solver to a ||dev1||_1 < 1e-3 residual; here a damped
    Newton iteration reaches the same root (documented deviation: the
    trust-region trajectory differs, the fixed point does not).

Everything is dense matmul work over n×n matrices — MXU territory —
with the parameter space tiny (m+1 ≤ ~10).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gemma_tpu.ops.center import center_matrix_w, center_vector_w


@dataclasses.dataclass
class VcResult:
    sigma2: np.ndarray        # (m+1,) incl. residual
    se_sigma2: np.ndarray
    pve: np.ndarray           # (m,)
    se_pve: np.ndarray
    pve_total: float
    se_pve_total: float


def _scale_matrix(K):
    d = jnp.mean(jnp.diag(K))
    return K / d, d


@functools.partial(jax.jit, static_argnames=())
def _he_core(K_stack, W, y):
    """Device core of the HE regression; K_stack (m, n, n)."""
    m, n, _ = K_stack.shape
    c = W.shape[1]
    r = n / (n - c)

    # center/scale each K by W (vc.cpp:1531-1541)
    def prep(K):
        Kc = center_matrix_w(K, W)
        return _scale_matrix(Kc)

    K_scale, traceG_new = jax.vmap(prep)(K_stack)

    y_c = center_vector_w(y, W)
    var_y = jnp.var(y)
    var_y_new = jnp.var(y_c)
    y_s = (y_c - jnp.mean(y_c)) / jnp.sqrt(var_y_new)

    # Kry_i = (K_i - r I) y ; q_i = y' Kry_i
    Ky = jnp.einsum("mij,j->mi", K_scale, y_s)            # (m, n)
    Kry = Ky - r * y_s                                     # (m, n)
    q = Kry @ y_s                                          # (m,)

    # S_ij = tr(K_i K_j) - r n
    S = jnp.einsum("mij,kij->mk", K_scale, K_scale) - r * n

    # yKrKKry[i, l, j] = Kry_i' K_l Kry_j ; last slot: Kry_i' Kry_j
    KKry = jnp.einsum("lij,mj->lmi", K_scale, Kry)         # (l, m, n)
    ylkj = jnp.einsum("mi,lji->mlj", Kry, KKry)            # [i, l, j]
    rr = Kry @ Kry.T                                       # (m, m)

    Si = jnp.linalg.inv(S)
    pve_t = Si @ q                                         # transformed scale

    # qvar = 2 * (sum_l pve_l * yKrK_lKry + (1-sum pve) * KryKry)
    s_rem = 1.0 - jnp.sum(pve_t)
    qvar = 2.0 * (jnp.einsum("l,ilj->ij", pve_t, ylkj) + s_rem * rr)
    Var = Si @ qvar @ Si

    return (pve_t, Var, traceG_new, var_y, var_y_new, r)


def vc_he(K_stack: np.ndarray, W: np.ndarray, y: np.ndarray,
          v_traceG: np.ndarray) -> VcResult:
    """HE regression.  K_stack: (m, n, n) centered kinship matrices;
    v_traceG: their mean diagonals (after plain centering)."""
    pve_t, Var, traceG_new, var_y, var_y_new, r = [
        np.asarray(x) for x in _he_core(
            jnp.asarray(K_stack), jnp.asarray(W), jnp.asarray(y))]
    m = K_stack.shape[0]

    sigma2, se_sigma2, pve, se_pve = [], [], [], []
    s = 1.0
    v = 0.0
    pve_total = 0.0
    se_pve_total = 0.0
    for i in range(m):
        d = pve_t[i]
        scale_i = var_y_new / traceG_new[i]
        sigma2.append(d * scale_i)
        pve.append(d * scale_i * (v_traceG[i] / var_y))
        s -= d
        pve_total += d * scale_i * (v_traceG[i] / var_y)
        sd = np.sqrt(Var[i, i])
        se_sigma2.append(sd * scale_i)
        se_pve.append(sd * scale_i * (v_traceG[i] / var_y))
        for j in range(m):
            v += Var[i, j]
            se_pve_total += (Var[i, j]
                             * (var_y_new / traceG_new[i]) * (v_traceG[i] / var_y)
                             * (var_y_new / traceG_new[j]) * (v_traceG[j] / var_y))
    sigma2.append(s * r * var_y_new)
    se_sigma2.append(np.sqrt(max(v, 0.0)) * r * var_y_new)

    return VcResult(
        sigma2=np.asarray(sigma2), se_sigma2=np.asarray(se_sigma2),
        pve=np.asarray(pve), se_pve=np.asarray(se_pve),
        pve_total=float(pve_total),
        se_pve_total=float(np.sqrt(max(se_pve_total, 0.0))))


# ---------------------------------------------------------------------------
# REML with average information

@functools.partial(jax.jit, static_argnames=("noconstrain",))
def _reml_dev12(theta, K_stack, W, y, noconstrain: bool):
    """dev1 (m+1,) and AI dev2 (m+1, m+1) of logRL w.r.t. theta
    (= log sigma2, or sigma2 when unconstrained); UpdateParam +
    LogRL_dev12 (vc.cpp:168-407)."""
    m, n, _ = K_stack.shape
    sigma2 = theta if noconstrain else jnp.exp(theta)

    H = jnp.einsum("m,mij->ij", sigma2[:m], K_stack) + sigma2[m] * jnp.eye(
        n, dtype=y.dtype)
    Hi = jnp.linalg.inv(H)
    HiW = Hi @ W
    WtHiW = W.T @ HiW
    P = Hi - HiW @ jnp.linalg.solve(WtHiW, HiW.T)

    Py = P @ y
    KPy = jnp.concatenate([jnp.einsum("mij,j->mi", K_stack, Py),
                           Py[None, :]], axis=0)           # (m+1, n)
    PKPy = jnp.einsum("ij,mj->mi", P, KPy)                 # (m+1, n)

    tr = jnp.concatenate([jnp.einsum("ij,mij->m", P, K_stack),
                          jnp.trace(P)[None]])
    yPKPy = KPy @ Py                                       # (m+1,)
    dev1 = -0.5 * tr + 0.5 * yPKPy
    dev2 = -0.5 * jnp.einsum("mi,ki->mk", KPy, PKPy)
    if not noconstrain:
        dev1 = dev1 * sigma2
        dev2 = dev2 * sigma2[:, None] * sigma2[None, :]
    return dev1, dev2


def vc_reml_ai(K_stack: np.ndarray, W: np.ndarray, y: np.ndarray,
               v_traceG: np.ndarray, noconstrain: bool = False,
               max_iter: int = 100, tol: float = 1e-3) -> VcResult:
    """REML via Newton on the score equations with the AI matrix."""
    m = K_stack.shape[0]
    he = vc_he(K_stack, W, y, v_traceG)

    if noconstrain:
        theta = he.sigma2.copy()
    else:
        theta = np.log(np.where(he.sigma2 <= 0, 0.1, he.sigma2))

    Kd = jnp.asarray(K_stack)
    Wd = jnp.asarray(W)
    yd = jnp.asarray(y)

    dev1, dev2 = _reml_dev12(jnp.asarray(theta), Kd, Wd, yd, noconstrain)
    for _ in range(max_iter):
        if np.sum(np.abs(np.asarray(dev1))) < tol:
            break
        d2np = np.asarray(dev2)
        d1np = np.asarray(dev1)
        try:
            step = np.linalg.solve(d2np, d1np)
        except np.linalg.LinAlgError:
            step = np.linalg.pinv(d2np) @ d1np
        if not np.all(np.isfinite(step)):
            break  # boundary optimum (a component's sigma2 → 0)
        # damped Newton: halve until the residual shrinks
        res0 = np.sum(np.abs(np.asarray(dev1)))
        scale = 1.0
        for _ in range(12):
            theta_try = theta - scale * step
            if not noconstrain:
                theta_try = np.clip(theta_try, -30.0, 30.0)
            d1t, d2t = _reml_dev12(jnp.asarray(theta_try), Kd, Wd, yd,
                                   noconstrain)
            if np.all(np.isfinite(np.asarray(d1t))) and (
                    np.sum(np.abs(np.asarray(d1t))) < res0 or scale < 1e-3):
                break
            scale *= 0.5
        theta = theta_try
        dev1, dev2 = d1t, d2t

    Hess = np.asarray(dev2)
    try:
        Hinv = np.linalg.inv(Hess)
    except np.linalg.LinAlgError:
        Hinv = np.linalg.pinv(Hess)

    sigma2 = theta if noconstrain else np.exp(theta)
    if noconstrain:
        se_sigma2 = np.sqrt(np.maximum(-np.diag(Hinv), 0.0))
    else:
        se_sigma2 = np.sqrt(np.maximum(
            -sigma2 * sigma2 * np.diag(Hinv), 0.0))

    s = float(np.sum(v_traceG * sigma2[:m]) + sigma2[m])
    pve = v_traceG * sigma2[:m] / s
    pve_total = float(np.sum(pve))

    # delta-method se(pve) (vc.cpp:1853-1916)
    se_pve = np.zeros(m)
    se_pve_total = 0.0
    grads = np.zeros((m + 1, m + 1))  # grads[k, i] = d pve_k / d theta_i
    for k in range(m + 1):
        for i in range(m + 1):
            d1 = 1.0 if noconstrain else sigma2[i]
            if k < m:
                if i == k:
                    d1 *= v_traceG[k] * (s - sigma2[k] * v_traceG[k]) / (s * s)
                elif i == m:
                    d1 *= -1 * v_traceG[k] * sigma2[k] / (s * s)
                else:
                    d1 *= -1 * v_traceG[i] * v_traceG[k] * sigma2[k] / (s * s)
            else:
                if i == k:
                    d1 *= -1 * (s - sigma2[m]) / (s * s)
                else:
                    d1 *= v_traceG[i] * sigma2[m] / (s * s)
            grads[k, i] = d1
    for k in range(m + 1):
        var_k = -grads[k] @ Hinv @ grads[k]
        if k < m:
            se_pve[k] = np.sqrt(max(var_k, 0.0))
        else:
            se_pve_total = float(np.sqrt(max(var_k, 0.0)))

    return VcResult(sigma2=np.asarray(sigma2), se_sigma2=se_sigma2,
                    pve=pve, se_pve=se_pve, pve_total=pve_total,
                    se_pve_total=se_pve_total)


# ---------------------------------------------------------------------------
# ACL estimator (-vc 3)

@jax.jit
def _acl_moments(K_stack, W, y):
    """Device moments for the ACL fixed point (CalcVCacl vc.cpp:1933-2052).

    Each kinship is W-projected then correlation-standardized (diagonal
    forced to 1); y is W-residualized.  Returns the q vector, the S1/S2
    moment matrices and the per-individual colsum tensor n1[i, j, t] =
    sum_s (Ks_i ∘ Ks_j)[s, t] - 1 that both feed the h fixed point and
    the A matrices of the variance formula."""
    def prep(K):
        Kc = center_matrix_w(K, W)
        dd = jnp.diag(Kc)
        Ks = Kc / jnp.sqrt(jnp.outer(dd, dd))
        n = K.shape[0]
        return jnp.where(jnp.eye(n, dtype=bool), 1.0, Ks)

    Ks = jax.vmap(prep)(K_stack)                     # (m, n, n)
    y_s = center_vector_w(y, W)
    y2 = y_s * y_s
    y2_sum = jnp.sum(y2)

    q = jnp.einsum("mij,i,j->m", Ks, y_s, y_s) - y2_sum

    # n1[i, j, t] = colsums(Ks_i ∘ Ks_j)[t] - 1
    n1 = jnp.einsum("ita,jta->ija", Ks, Ks) - 1.0    # (m, m, n)
    S1 = 2.0 * jnp.einsum("ijt,t->ij", n1, y2)
    S2 = jnp.sum(n1, axis=2)
    return Ks, y_s, y2, y2_sum, q, n1, S1, S2


@jax.jit
def _acl_variance(Ks, y_s, n1, pve, tau_inv):
    """J matrix for the ACL sampling variance: A_i is Ks_i with its
    diagonal replaced by sum_j pve_j n1[i, j, :]; V = tau_inv sum_i
    pve_i Ks_i; J_ij = 2 Ay_i' V Ay_j (vc.cpp:2080-2124)."""
    m, n, _ = Ks.shape
    diag_new = jnp.einsum("ijt,j->it", n1, pve)           # (m, n)
    eye = jnp.eye(n, dtype=Ks.dtype)
    A = Ks * (1.0 - eye) + jnp.einsum("it,tu->itu", diag_new, eye)
    Ay = jnp.einsum("itu,u->it", A, y_s)                   # (m, n)
    V = tau_inv * jnp.einsum("i,itu->tu", pve, Ks)
    J = 2.0 * jnp.einsum("it,tu,ju->ij", Ay, V, Ay)
    return J


def vc_acl(K_stack: np.ndarray, W: np.ndarray, y: np.ndarray,
           v_traceG: np.ndarray, max_iter: int = 100,
           tol: float = 1e-3) -> VcResult:
    """ACL method-of-moments estimator (CalcVCacl, vc.cpp:1933-2220):
    alternate between tau_inv = var(y) - q'h/(n(n-1)) and the moment
    solve h = (S1 - tau_inv S2)^{-1} q until the relative change in
    tau_inv falls below 1e-3."""
    m, n, _ = K_stack.shape
    Ks, y_s, y2, y2_sum, q, n1, S1, S2 = _acl_moments(
        jnp.asarray(K_stack), jnp.asarray(W), jnp.asarray(y))
    q_np = np.asarray(q)
    S1_np, S2_np = np.asarray(S1), np.asarray(S2)
    y2s = float(y2_sum)

    # first loop pass overwrites the pre-loop tau_inv with the
    # pve=0 value y2_sum/n (the reference's pve vector starts zeroed)
    pve = np.zeros(m)
    tau_inv = y2s / n
    s_rel = 1.0
    for it in range(max_iter):
        d = float(q_np @ pve)
        tau_new = y2s / n - d / (n * (n - 1.0))
        if it > 0:
            s_rel = (tau_new - tau_inv) / tau_new
        tau_inv = tau_new
        S = S1_np - tau_inv * S2_np
        pve = np.linalg.solve(S, q_np)
        if it > 0 and abs(s_rel) <= tol:
            break

    J = np.asarray(_acl_variance(Ks, y_s, n1, jnp.asarray(pve),
                                 jnp.asarray(tau_inv)))
    Hi = np.linalg.inv(S2_np * tau_inv)
    Var = Hi @ J @ Hi

    pve_total = float(np.sum(pve))
    se_pve = np.sqrt(np.maximum(np.diag(Var), 0.0))
    sigma2 = np.concatenate([pve * tau_inv / np.asarray(v_traceG),
                             [(1.0 - pve_total) * tau_inv]])
    var_sum = float(np.sum(Var))
    se_sigma2 = np.concatenate([se_pve * tau_inv / np.asarray(v_traceG),
                                [np.sqrt(max(var_sum, 0.0)) * tau_inv]])
    return VcResult(sigma2=sigma2, se_sigma2=se_sigma2,
                    pve=np.asarray(pve), se_pve=se_pve,
                    pve_total=pve_total,
                    se_pve_total=float(np.sqrt(max(var_sum, 0.0))))
