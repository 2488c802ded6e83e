"""Independent dense verification of the CalcCRT port (ADVICE r2 #5).

Reference GEMMA cannot be built in this image (no GSL), so instead of
a golden-output comparison the einsum/kron implementation
(mvlmm_core.calc_crt) is checked against a from-scratch dense numpy
transcription of CalcCRT's math (mvlmm.cpp:2054-2300): explicit
per-individual d×d inverses, explicit (dc, dc) assembly loops over
(a, i, b, j), LU-free trace composition — no code shared with the
production path except the final formulas' structure.  A sign or
factor error in any of calc_crt's five einsum families (Hi
reconstruction, Qi back-rotation, M/MM assembly, block extraction,
trace accumulation) breaks the 1e-9 agreement.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gemma_tpu.models import mvlmm_core as core


def _vech_idx(i, j, d):
    # GetIndex (param.cpp / mvlmm.cpp convention), re-derived inline
    if j < i:
        i, j = j, i
    return (2 * d - i + 1) * i // 2 + (j - i)


def _dense_crt(eval_, X, Y, Vg, Ve, Hvar):
    """CalcCRT from first principles (dense, loops)."""
    d = Vg.shape[0]
    c = X.shape[0]
    n = eval_.shape[0]
    v_size = d * (d + 1) // 2
    dc = c * d

    # vech basis matrices in GetIndex order
    Ds = np.zeros((v_size, d, d))
    for i in range(d):
        for j in range(i, d):
            v = _vech_idx(i, j, d)
            Ds[v, i, j] = 1.0
            Ds[v, j, i] = 1.0

    Hi = np.stack([np.linalg.inv(eval_[k] * Vg + Ve) for k in range(n)])

    def assemble(weights, mats):
        """M[a*d+i, b*d+j] = sum_k w_k X[a,k] X[b,k] mats[k][i,j]."""
        M = np.zeros((dc, dc))
        for a in range(c):
            for b in range(c):
                blk = np.zeros((d, d))
                for k in range(n):
                    blk += weights[k] * X[a, k] * X[b, k] * mats[k]
                M[a * d:(a + 1) * d, b * d:(b + 1) * d] = blk
        return M

    ones = np.ones(n)
    Q = assemble(ones, Hi)
    Qi = np.linalg.inv(Q)

    HiD = [[Hi[k] @ Ds[v] @ Hi[k] for k in range(n)]
           for v in range(v_size)]
    Mg = [assemble(eval_, HiD[v]) for v in range(v_size)]
    Me = [assemble(ones, HiD[v]) for v in range(v_size)]

    s0 = (c - 1) * d
    Qi_si = np.linalg.inv(Qi[s0:s0 + d, s0:s0 + d])

    def sub(M):
        return M[s0:s0 + d, s0:s0 + d]

    B = C = D = 0.0
    # CalcCRT uses h = -Hessian_inv (mvlmm.cpp:2305-2307); mph_nr's
    # Hvar IS -H^{-1}, so h = Hvar directly
    h = Hvar
    for v1 in range(v_size):
        QiM_g1, QiM_e1 = Qi @ Mg[v1], Qi @ Me[v1]
        QiMQi_g1, QiMQi_e1 = QiM_g1 @ Qi, QiM_e1 @ Qi
        Cg1 = sub(QiMQi_g1) @ Qi_si
        Ce1 = sub(QiMQi_e1) @ Qi_si
        trCg1, trCe1 = -np.trace(Cg1), -np.trace(Ce1)
        for v2 in range(v1, v_size):
            QiM_g2, QiM_e2 = Qi @ Mg[v2], Qi @ Me[v2]
            QiMQi_g2, QiMQi_e2 = QiM_g2 @ Qi, QiM_e2 @ Qi
            Cg2 = sub(QiMQi_g2) @ Qi_si
            Ce2 = sub(QiMQi_e2) @ Qi_si
            trCg2, trCe2 = -np.trace(Cg2), -np.trace(Ce2)

            trCC_gg = np.trace(Cg1 @ Cg2)
            trCC_ge = np.trace(Cg1 @ Ce2) + np.trace(Ce1 @ Cg2)
            trCC_ee = np.trace(Ce1 @ Ce2)

            trB_gg = -np.trace(sub(QiM_g1 @ QiMQi_g2) @ Qi_si)
            trB_ge = -np.trace(sub(QiM_g1 @ QiMQi_e2
                                   + QiM_e1 @ QiMQi_g2) @ Qi_si)
            trB_ee = -np.trace(sub(QiM_e1 @ QiMQi_e2) @ Qi_si)

            # xHiDHiDHix with D_{v1} Hi D_{v2} single product order
            HiDD = [Hi[k] @ Ds[v1] @ Hi[k] @ Ds[v2] @ Hi[k]
                    for k in range(n)]
            MM_gg = assemble(eval_ ** 2, HiDD)
            MM_ge = assemble(eval_, HiDD)
            MM_ee = assemble(ones, HiDD)
            trB_gg += np.trace(sub(Qi @ MM_gg @ Qi) @ Qi_si)
            trB_ge += 2.0 * np.trace(sub(Qi @ MM_ge @ Qi) @ Qi_si)
            trB_ee += np.trace(sub(Qi @ MM_ee @ Qi) @ Qi_si)

            trD_gg, trD_ge, trD_ee = 2 * trB_gg, 2 * trB_ge, 2 * trB_ee

            h_gg = h[v1, v2]
            h_ge = h[v1, v2 + v_size]
            h_ee = h[v1 + v_size, v2 + v_size]
            mult = 1.0 if v1 == v2 else 2.0
            B += mult * (h_gg * trB_gg + h_ge * trB_ge + h_ee * trB_ee)
            C += mult * (h_gg * (trCC_gg + 0.5 * trCg1 * trCg2)
                         + h_ge * (trCC_ge + 0.5 * trCg1 * trCe2
                                   + 0.5 * trCe1 * trCg2)
                         + h_ee * (trCC_ee + 0.5 * trCe1 * trCe2))
            D += mult * (h_gg * (trCC_gg + 0.5 * trD_gg)
                         + h_ge * (trCC_ge + 0.5 * trD_ge)
                         + h_ee * (trCC_ee + 0.5 * trD_ee))

    return 2.0 * D - C, 2.0 * B, C


@pytest.mark.parametrize("d,c,n,seed", [(2, 2, 12, 0), (2, 3, 10, 1),
                                        (3, 2, 8, 2)])
def test_calc_crt_matches_dense(d, c, n, seed):
    rng = np.random.default_rng(seed)
    eval_ = np.abs(rng.gamma(2.0, 1.0, n))
    eval_[0] = 0.0
    A = rng.normal(size=(d, d))
    Vg = A @ A.T / d + 0.3 * np.eye(d)
    A = rng.normal(size=(d, d))
    Ve = A @ A.T / d + 0.3 * np.eye(d)
    X = np.vstack([np.ones((1, n)), rng.normal(size=(c - 1, n))])
    Y = rng.normal(size=(d, n))
    v2 = d * (d + 1)  # 2 * v_size
    Hraw = rng.normal(size=(v2, v2))
    Hvar = -(Hraw @ Hraw.T + 0.5 * np.eye(v2))   # symmetric -H^{-1}

    a_ref, b_ref, c_ref = _dense_crt(eval_, X, Y, Vg, Ve, Hvar)

    a, b, cc = core.calc_crt(
        jnp.asarray(eval_), jnp.asarray(X)[None], jnp.asarray(Y),
        jnp.asarray(Vg)[None], jnp.asarray(Ve)[None],
        jnp.asarray(Hvar)[None])
    np.testing.assert_allclose(float(a[0]), a_ref, rtol=1e-9)
    np.testing.assert_allclose(float(b[0]), b_ref, rtol=1e-9)
    np.testing.assert_allclose(float(cc[0]), c_ref, rtol=1e-9)
