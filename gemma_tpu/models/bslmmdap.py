"""BSLMM-DAP: deterministic approximation to BSLMM (-bslmm 4/5).

Reference src/bslmmdap.cpp.  Mode 14 computes, for every SNP, the
Bayes factor of the single-SNP model against the null on a grid of
(h, rho) hyper-parameters (DAP_CalcBF:573-646).  Mode 15 reads the
BF/hyp files back and runs an EM over the hyper grid and per-SNP prior
inclusion probabilities, optionally regressed on annotations
(DAP_EstimateHyper:682-860).

TPU-native: the single-SNP marginal has a closed form (the Omega
matrix is 1x1), so the full (SNPs × grid) BF table is one broadcast
computation — no loops, no Choleskies.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from gemma_tpu.models.logistic import (
    logistic_cat_fit, logistic_cat_pred, logistic_cont_fit,
    logistic_cont_pred, logistic_mixed_fit, logistic_mixed_pred)


def hyper_grid(h_min, h_max, h_ngrid, rho_min, rho_max, rho_ngrid,
               trace_G, ns_causal: int = 10):
    """(h, rho, sigma_a2, sigma_b2) rows of the DAP grid
    (bslmmdap.cpp:595-615)."""
    rows = []
    for i in range(h_ngrid):
        h = h_min + (h_max - h_min) * i / (h_ngrid - 1)
        for j in range(rho_ngrid):
            rho = rho_min + (rho_max - rho_min) * j / (rho_ngrid - 1)
            sa2 = h * rho / ((1 - h) * ns_causal)
            sb2 = h * (1 - rho) / (trace_G * (1 - h))
            rows.append((h, rho, sa2, sb2))
    return np.asarray(rows)


@jax.jit
def _bf_table(UtX, Uty, eval_, sa2, sb2, tau):
    """BF[t, ij] for all SNPs × grid points at once.

    Single-SNP marginal (CalcMarginal, bslmmdap.cpp:480-562) with the
    1x1 Omega closed form: Omega = 1 + sa2 * x'Hx.
    """
    n = Uty.shape[0]
    # per grid point ij: weights w = 1/(eval*sb2 + 1)   (G, n)
    w = 1.0 / (eval_[None, :] * sb2[:, None] + 1.0)
    logdet_H = -jnp.sum(jnp.log(w), axis=1)            # (G,)
    hi_yy = jnp.sum(w * (Uty * Uty)[None, :], axis=1)  # (G,)
    logm_null = -0.5 * logdet_H - 0.5 * tau * hi_yy + 0.5 * n * jnp.log(tau)

    # per SNP t and grid ij
    xHx = jnp.einsum("gn,nt->gt", w, UtX * UtX)         # (G, S)
    xHy = jnp.einsum("gn,nt->gt", w * Uty[None, :], UtX)
    logdet_O = jnp.log1p(sa2[:, None] * xHx)
    P_yy = hi_yy[:, None] - sa2[:, None] * xHy * xHy / (
        1.0 + sa2[:, None] * xHx)
    logm = (-0.5 * logdet_H[:, None] - 0.5 * logdet_O
            - 0.5 * tau * P_yy + 0.5 * n * jnp.log(tau))
    return jnp.exp(logm - logm_null[:, None]).T         # (S, G)


def dap_calc_bf(UtX, Uty, eval_, grid: np.ndarray):
    """BF table (ns_test, n_grid); tau = n / y'y (bslmmdap.cpp:588-590)."""
    tau = float(Uty.shape[0]) / float(Uty @ Uty)
    sa2 = jnp.asarray(grid[:, 2], UtX.dtype)
    sb2 = jnp.asarray(grid[:, 3], UtX.dtype)
    return np.asarray(_bf_table(UtX, Uty, eval_, sa2, sb2, tau))


def single_ct_regression(Ad0: np.ndarray, pip: np.ndarray, n_levels: int):
    """Closed-form prior update for one categorical annotation
    (bslmmdap.cpp:648-679).  Returns (coef per level, prior per SNP)."""
    coef = np.zeros(n_levels)
    prior = np.zeros(len(pip))
    for lv in range(n_levels):
        sel = Ad0 == lv
        mean_pip = pip[sel].mean() if sel.any() else 0.5
        coef[lv] = np.log(mean_pip / (1 - mean_pip))
        prior[sel] = mean_pip
    return coef, prior


def dap_estimate_hyper(vec_sa2, vec_sb2, wab, BF_blocks, rs_list,
                       Ac=None, Ad=None, n_levels=None,
                       max_iter: int = 100, tol: float = 1e-3):
    """EM over hyper-grid weights and per-SNP priors
    (DAP_EstimateHyper, bslmmdap.cpp:682-860).

    BF_blocks: list of (m_b, n_grid) arrays.  Returns
    (Hyper (n_grid, 5), pip (m,), coef).
    """
    n_grid = len(wab)
    m = sum(b.shape[0] for b in BF_blocks)
    kc = 0 if Ac is None else Ac.shape[1]
    kd = 0 if Ad is None else Ad.shape[1]

    prior = np.full(m, len(BF_blocks) / m)
    wab_cur = np.asarray(wab, dtype=np.float64)
    wab_new = wab_cur.copy()
    pip = np.zeros(m)
    coef = np.zeros(kc + (sum(n_levels) if n_levels else 0) + 1)

    logm_save = np.nan
    BF_flat = np.vstack(BF_blocks)                  # (m, n_grid)
    block_of = np.concatenate([
        np.full(b.shape[0], i) for i, b in enumerate(BF_blocks)])

    it = 0
    dif = 1.0
    while it < max_iter and dif > tol:
        # E step for gamma: pip ∝ prior/(1-prior) * sum_ij w_ij BF
        odds = prior / (1 - prior)
        d_all = (BF_flat @ wab_new) * odds          # (m,)
        for b in range(len(BF_blocks)):
            sel = block_of == b
            s = 1.0 + d_all[sel].sum()
            pip[sel] = d_all[sel] / s

        # E step for wab
        contrib = odds[:, None] * BF_flat * wab_cur[None, :]  # (m, grid)
        logs = np.zeros(n_grid)
        for b in range(len(BF_blocks)):
            sel = block_of == b
            logs += np.log1p(contrib[sel].sum(axis=0))
        logs -= logs.max()
        wab_new = np.exp(logs)
        wab_new /= wab_new.sum()

        # M step for the prior
        if kc == 0 and kd == 0:
            s = pip.mean()
            prior = np.full(m, s)
            coef = np.array([np.log(s / (1 - s))])
        elif kc == 0 and kd == 1:
            coef, prior = single_ct_regression(Ad[:, 0], pip, n_levels[0])
        elif kc == 0:
            coef = logistic_cat_fit(Ad, n_levels, pip)
            prior = logistic_cat_pred(coef, Ad, n_levels)
        elif kd == 0:
            coef = logistic_cont_fit(Ac, pip)
            prior = logistic_cont_pred(coef, Ac)
        else:
            coef = logistic_mixed_fit(Ad, n_levels, Ac, pip)
            prior = logistic_mixed_pred(coef, Ad, n_levels, Ac)
        prior = np.clip(prior, 1e-12, 1 - 1e-12)

        # marginal likelihood (per reference formula, bslmmdap.cpp:804-820)
        odds = prior / (1 - prior)
        d_all = (BF_flat @ wab_cur) * odds
        logm = 0.0
        for b in range(len(BF_blocks)):
            sel = block_of == b
            logm += np.log1p(d_all[sel].sum()) + \
                np.log(1 - prior[sel]).sum()
        if it > 0:
            dif = logm - logm_save
        logm_save = logm
        it += 1

    # map wab back to (h, rho) rows (bslmmdap.cpp:831-848)
    pi_hat = np.exp(coef[-1]) / (1 + np.exp(coef[-1]))
    Hyper = np.zeros((n_grid, 5))
    for ij in range(n_grid):
        sa2, sb2 = vec_sa2[ij], vec_sb2[ij]
        h = (pi_hat * m * sa2 + sb2) / (1 + pi_hat * m * sa2 + sb2)
        rho = pi_hat * m * sa2 / (pi_hat * m * sa2 + sb2)
        Hyper[ij] = (h, rho, sa2, sb2, wab_new[ij])
    return Hyper, pip, coef


# ---------------------------------------------------------------------------
# file IO (formats per BSLMMDAP::WriteResult / ReadFile_hyb / ReadFile_bf)

def write_hyp_bf(prefix: str, grid: np.ndarray, BF: np.ndarray,
                 snp_rows: list, block_size: int = 1000) -> None:
    n_grid = grid.shape[0]
    with open(prefix + ".hyp.txt", "w") as fh:
        fh.write("h\trho\tsa2\tsb2\tweight\n")
        for (h, rho, sa2, sb2) in grid:
            fh.write(f"{h:.6e}\t{rho:.6e}\t{sa2:.6e}\t{sb2:.6e}\t"
                     f"{1.0 / n_grid:.6e}\n")
    with open(prefix + ".bf.txt", "w") as fh:
        fh.write("chr\trs\tps\tn_miss")
        for i in range(n_grid):
            fh.write(f"\tBF{i + 1}")
        fh.write("\n")
        for t, s in enumerate(snp_rows):
            fh.write(f"{s['chr']}\t{s['rs']}\t{s['ps']}\t{s['n_miss']}")
            for v in BF[t]:
                fh.write(f"\t{v:.6e}")
            fh.write("\n")


def read_hyp(path: str):
    sa2, sb2, wab = [], [], []
    with open(path) as fh:
        next(fh)
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            sa2.append(float(parts[2]))
            sb2.append(float(parts[3]))
            wab.append(float(parts[4]))
    return np.asarray(sa2), np.asarray(sb2), np.asarray(wab)


def read_bf(path: str):
    """Blocks are delimited by a change in the second column
    (ReadFile_bf, bslmmdap.cpp:139-204)."""
    rs_list, blocks, cur = [], [], []
    block_id = None
    with open(path) as fh:
        next(fh)
        for line in fh:
            parts = line.replace(",", " ").split()
            if not parts:
                continue
            rs_list.append(parts[0])
            bid = parts[1]
            vals = [float(v) for v in parts[2:]]
            if block_id is None:
                block_id = bid
            elif bid != block_id:
                blocks.append(np.asarray(cur))
                cur = []
                block_id = bid
            cur.append(vals)
    if cur:
        blocks.append(np.asarray(cur))
    return rs_list, blocks


def write_dap_result(prefix: str, rs_list, Hyper: np.ndarray,
                     pip: np.ndarray, coef: np.ndarray) -> None:
    with open(prefix + ".hyp.txt", "w") as fh:
        fh.write("h\trho\tsa2\tsb2\tweight\n")
        for row in Hyper:
            fh.write("\t".join(f"{v:.6e}" for v in row) + "\t\n")
    with open(prefix + ".gamma.txt", "w") as fh:
        fh.write("rs\tgamma\n")
        for rs, p in zip(rs_list, pip):
            fh.write(f"{rs}\t{p:.6e}\n")
    with open(prefix + ".coef.txt", "w") as fh:
        fh.write("coef\n")
        for v in coef:
            fh.write(f"{v:.6e}\n")


def read_dap_annotations(path: str, rs_list):
    """Annotation file for -bslmm 5: header columns ending in `_c`/`_C`
    are continuous, other non-meta columns discrete (the BSLMMDAP
    ReadFile_cat overload, bslmmdap.cpp:209-331 + the header
    classification at gemma_io.cpp:2591-2604).

    Returns (Ac (m, kc) or None, Ad (m, kd) dense 0-based codes or
    None, n_levels list).  SNPs absent from the file get zeros."""
    import gzip
    import io as _io
    from gemma_tpu.models.mqs import parse_header

    opener = (lambda p: _io.TextIOWrapper(gzip.open(p, "rb"))) \
        if str(path).endswith(".gz") else open
    with opener(path) as fh:
        header = fh.readline().replace(",", " ").split()
        hdr = parse_header(" ".join(header))
        meta_pos = {hdr[k] for k in ("rs", "chr", "pos", "cm", "a1", "a0")
                    if hdr.get(k, 0)}
        catc_cols = [i for i, tok in enumerate(header)
                     if (i + 1) not in meta_pos and tok[-2:] in ("_c", "_C")]
        catd_cols = [i for i, tok in enumerate(header)
                     if (i + 1) not in meta_pos
                     and tok[-2:] not in ("_c", "_C")]
        rs2c, rs2d = {}, {}
        for line in fh:
            parts = line.replace(",", " ").split()
            if not parts:
                continue
            rs = parts[hdr["rs"] - 1] if hdr.get("rs", 0) else \
                f"{parts[hdr['chr'] - 1]}:{parts[hdr['pos'] - 1]}"
            if catc_cols and rs not in rs2c:
                rs2c[rs] = [float(parts[i]) for i in catc_cols]
            if catd_cols and rs not in rs2d:
                rs2d[rs] = [int(float(parts[i])) for i in catd_cols]

    kc, kd = len(catc_cols), len(catd_cols)
    m = len(rs_list)
    Ac = Ad = n_levels = None
    if kc:
        Ac = np.zeros((m, kc))
        for i, rs in enumerate(rs_list):
            if rs in rs2c:
                Ac[i] = rs2c[rs]
    if kd:
        Ad_raw = np.zeros((m, kd), dtype=np.int64)
        for i, rs in enumerate(rs_list):
            if rs in rs2d:
                Ad_raw[i] = rs2d[rs]
        # dense 0-based codes per column; n_levels = distinct count
        Ad = np.empty_like(Ad_raw)
        n_levels = []
        for j in range(kd):
            _, Ad[:, j] = np.unique(Ad_raw[:, j], return_inverse=True)
            n_levels.append(int(Ad[:, j].max()) + 1)
    return Ac, Ad, n_levels
