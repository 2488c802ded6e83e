"""MQS: summary-statistics variance-component estimation.

Reference: Zhou 2016 (MQS); code paths in vc.cpp (CalcVCss:1309-1501),
gemma_io.cpp (ReadFile_beta:3363-3551, Calcq:3716-3960,
BimbamKinUncentered:2753-2945) and param.cpp (compAKtoS:1325-1378,
JackknifeAKtoS:1596-1715, CalcS:1717-1809).

The pipeline: summary z-scores give the q vector (with block-jackknife
sampling variance Vq); reference genotypes give the S matrix
tr(Kc_i Kc_j) relating per-category kinships (with leave-one-individual
-out jackknife variance Svar); then sigma2 solves S pve = q.

TPU-native: per-category kinship accumulation is the same fused
impute/center/project/scale + matmul block kernel as -gk; the S and
jackknife statistics are whole-matrix einsums.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import scipy.stats

from gemma_tpu.ops.center import center_matrix, scale_matrix


# ---------------------------------------------------------------------------
# header-driven summary-stat reader

_HDR = {
    "rs": {"rs", "RS", "snp", "SNP", "snps", "SNPS", "snpid", "SNPID",
           "rsid", "RSID", "MarkerName"},
    "chr": {"chr", "CHR"},
    "pos": {"ps", "PS", "pos", "POS", "base_position", "BASE_POSITION",
            "bp", "BP"},
    "cm": {"cm", "CM"},
    "a1": {"a1", "A1", "allele1", "ALLELE1", "Allele1", "INC_ALLELE"},
    "a0": {"a0", "A0", "allele0", "ALLELE0", "Allele0", "a2", "A2",
           "allele2", "ALLELE2", "Allele2", "DEC_ALLELE"},
    "z": {"z", "Z", "z_score", "Z_SCORE", "zscore", "ZSCORE"},
    "beta": {"beta", "BETA", "b", "B"},
    "sebeta": {"se_beta", "SE_BETA", "se", "SE"},
    "chisq": {"chisq", "CHISQ", "chisquare", "CHISQUARE"},
    "p": {"p", "P", "pvalue", "PVALUE", "p-value", "P-VALUE"},
    "n": {"n", "N", "ntotal", "NTOTAL", "n_total", "N_TOTAL"},
    "nmis": {"nmis", "NMIS", "n_mis", "N_MIS", "n_miss", "N_MISS"},
    "nobs": {"nobs", "NOBS", "n_obs", "N_OBS"},
    "ncase": {"ncase", "NCASE", "n_case", "N_CASE"},
    "ncontrol": {"ncontrol", "NCONTROL", "n_control", "N_CONTROL"},
    "af": {"af", "AF", "maf", "MAF", "f", "F", "allele_freq",
           "ALLELE_FREQ", "allele_frequency", "ALLELE_FREQUENCY"},
    "var": {"var", "VAR"},
    "ws": {"window_size", "WINDOW_SIZE", "ws", "WS"},
    "cor": {"cor", "COR", "r", "R"},
}


def parse_header(line: str) -> dict:
    """Column-name → 1-based position map (ReadHeader_io semantics)."""
    cols = line.replace(",", " ").split()
    out = {"coln": len(cols)}
    for i, tok in enumerate(cols):
        for key, names in _HDR.items():
            if tok in names and key not in out:
                out[key] = i + 1
    return out


@dataclasses.dataclass
class BetaSummary:
    cat: np.ndarray      # (m,) category index
    ni: np.ndarray       # (m,) per-SNP sample size
    weight: np.ndarray   # (m,)
    z2: np.ndarray       # (m,)
    rs: list
    ni_total: int        # max sample size
    ns_total: int
    ns_test: int


def read_beta_summary(path: str, rs2cat: dict | None = None,
                      rs2w: dict | None = None) -> BetaSummary:
    """ReadFile_beta (gemma_io.cpp:3363-3551): z^2 from z, beta/se,
    chisq, or p columns; sample size from n or nmis+nobs or
    ncase+ncontrol."""
    import gzip
    import io as _io
    opener = (lambda p: _io.TextIOWrapper(gzip.open(p, "rb"))) \
        if str(path).endswith(".gz") else open

    cat, ni, weight, z2, rs_list = [], [], [], [], []
    ni_total = ns_total = ns_test = 0
    with opener(path) as fh:
        hdr = parse_header(fh.readline())
        for line in fh:
            parts = line.replace(",", " ").split()
            if not parts:
                continue

            def get(key, cast=float, default=0):
                c = hdr.get(key, 0)
                return cast(parts[c - 1]) if c else default

            rs = get("rs", str, "")
            if not rs:
                rs = f"{get('chr', str, '')}:{get('pos', str, '')}"
            n_total = int(get("n", float))
            if hdr.get("n", 0) == 0:
                if hdr.get("nmis", 0) and hdr.get("nobs", 0):
                    n_total = int(get("nmis", float) + get("nobs", float))
                else:
                    n_total = int(get("ncase", float) +
                                  get("ncontrol", float))

            if hdr.get("z", 0):
                zsq = get("z") ** 2
            elif hdr.get("beta", 0) and hdr.get("sebeta", 0):
                zsq = (get("beta") / get("sebeta")) ** 2
            elif hdr.get("chisq", 0):
                zsq = get("chisq")
            elif hdr.get("p", 0):
                zsq = scipy.stats.chi2.isf(get("p"), 1)
            else:
                zsq = 0.0

            ns_total += 1
            if ((rs2w is None or rs in rs2w)
                    and (rs2cat is None or rs in rs2cat) and zsq != 0):
                cat.append(rs2cat[rs] if rs2cat else 0)
                ni.append(n_total)
                weight.append(rs2w[rs] if rs2w else 1.0)
                z2.append(zsq)
                rs_list.append(rs)
                ni_total = max(ni_total, n_total)
                ns_test += 1

    return BetaSummary(
        cat=np.asarray(cat, np.int64), ni=np.asarray(ni, np.int64),
        weight=np.asarray(weight), z2=np.asarray(z2), rs=rs_list,
        ni_total=ni_total, ns_total=ns_total, ns_test=ns_test)


def read_categories(path: str):
    """-cat file: header + per-SNP 0/1 membership columns
    (ReadFile_cat, gemma_io.cpp:2634-2719).  Returns (rs2cat, n_vc)."""
    import gzip
    import io as _io
    opener = (lambda p: _io.TextIOWrapper(gzip.open(p, "rb"))) \
        if str(path).endswith(".gz") else open
    rs2cat = {}
    with opener(path) as fh:
        hdr = parse_header(fh.readline())
        meta_cols = sum(1 for k in ("rs", "chr", "pos", "cm", "a1", "a0")
                        if hdr.get(k, 0))
        n_vc = hdr["coln"] - meta_cols
        meta_pos = {hdr[k] for k in ("rs", "chr", "pos", "cm", "a1", "a0")
                    if hdr.get(k, 0)}
        for line in fh:
            parts = line.replace(",", " ").split()
            if not parts:
                continue
            rs = parts[hdr["rs"] - 1] if hdr.get("rs", 0) else \
                f"{parts[hdr['chr'] - 1]}:{parts[hdr['pos'] - 1]}"
            i_cat = 0
            for i, tok in enumerate(parts):
                if (i + 1) in meta_pos:
                    continue
                if tok in ("0", "1"):
                    if tok == "1" and rs not in rs2cat:
                        rs2cat[rs] = i_cat
                    i_cat += 1
    return rs2cat, n_vc


# ---------------------------------------------------------------------------
# q vector with block-jackknife variance (Calcq, gemma_io.cpp:3716-3960)

def calcq(n_block: int, cat, ni, weight, z2, n_vc: int):
    """Returns (Vq, q, s)."""
    cat = np.asarray(cat)
    ni = np.asarray(ni, np.float64)
    weight = np.asarray(weight, np.float64)
    z2 = np.asarray(z2, np.float64)

    vec_q = np.zeros(n_vc)
    vec_s = np.zeros(n_vc)
    n_snps = np.zeros(n_vc)
    np.add.at(vec_q, cat, (z2 - 1.0) * weight / ni)
    np.add.at(vec_s, cat, weight)
    np.add.at(n_snps, cat, 1.0)

    q = np.where(vec_s != 0, vec_q / np.where(vec_s != 0, vec_s, 1), 0.0)
    s = vec_s.copy()

    Vq = np.zeros((n_vc, n_vc))
    for l in range(n_vc):
        n_snp = int(n_snps[l] // n_block)
        if n_snp == 0:
            continue
        # assign block ids: the l'th category's SNPs advance the block
        # counter; other categories accumulate into the current block
        mat_q = np.zeros((n_block, n_vc))
        mat_s = np.zeros((n_block, n_vc))
        b = 0
        t = 0
        for i in range(len(cat)):
            c = cat[i]
            mat_q[b, c] += (z2[i] - 1.0) * weight[i]
            mat_s[b, c] += weight[i]
            if c == l:
                if b < n_block - 1:
                    if t < n_snp - 1:
                        t += 1
                    else:
                        b += 1
                        t = 0
                else:
                    t += 1

        # delete-block estimates, centered; entries failing the
        # validity check keep their raw accumulated value
        # (gemma_io.cpp:3813-3833)
        for i in range(n_vc):
            valid = (mat_s[:, i] != 0) & (vec_s[i] != mat_s[:, i])
            dvals = np.zeros(n_block)
            dvals[valid] = ((vec_q[i] - mat_q[valid, i]) /
                            (vec_s[i] - mat_s[valid, i]))
            mat_q[:, i] = np.where(valid, dvals, mat_q[:, i])
            m = dvals[valid].mean() if valid.any() else 0.0
            nz = mat_q[:, i] != 0
            mat_q[nz, i] -= m

        for i in range(n_vc):
            both = (mat_q[:, l] != 0) & (mat_q[:, i] != 0)
            nn = int(both.sum())
            d = 0.0
            if nn:
                d = (mat_q[both, l] * mat_q[both, i]).sum() / nn * (nn - 1)
            Vq[i, l] += d
            if i != l:
                Vq[l, i] = Vq[i, l]

    # halve off-diagonals (gemma_io.cpp:3943-3953)
    off = ~np.eye(n_vc, dtype=bool)
    Vq[off] /= 2.0
    return Vq, q, s


# ---------------------------------------------------------------------------
# per-category reference kinships (BimbamKinUncentered semantics)

def category_kinship(X_raw: np.ndarray, W: np.ndarray,
                     cats: np.ndarray, n_vc: int,
                     weights: np.ndarray | None = None):
    """Weighted, W-projected, variance-standardized (uncentered)
    per-category kinships (gemma_io.cpp:2797-2928).

    X_raw: (p, n) dosages over analyzed individuals (NaN missing);
    cats: (p,) category per SNP (-1 = excluded).
    Returns (K (n_vc, n, n), ns (n_vc,)).
    """
    p, n = X_raw.shape
    miss = np.isnan(X_raw)
    n_obs = np.maximum((~miss).sum(axis=1), 1)
    mean = np.where(miss, 0.0, X_raw).sum(axis=1) / n_obs
    Xc = np.where(miss, mean[:, None], X_raw) - mean[:, None]

    # project covariates out of each SNP
    WtW = W.T @ W
    proj = W @ np.linalg.solve(WtW, W.T @ Xc.T)   # (n, p)
    Xc = Xc - proj.T
    var = np.einsum("ij,ij->i", Xc, Xc) / n

    w = np.ones(p) if weights is None else np.asarray(weights)
    ok = (var != 0) & (cats >= 0)
    scale = np.where(ok, np.sqrt(np.where(ok, w / np.where(var != 0, var, 1),
                                          0.0)), 0.0)
    Xs = Xc * scale[:, None]

    K = np.zeros((n_vc, n, n))
    ns = np.zeros(n_vc, dtype=np.int64)
    for c in range(n_vc):
        sel = ok & (cats == c)
        ns[c] = int(sel.sum())
        if ns[c]:
            Xd = jnp.asarray(Xs[sel])
            Kd = jax.lax.dot_general(Xd, Xd, (((0,), (0,)), ((), ())))
            K[c] = np.asarray(Kd) / ns[c]
    return K, ns


# ---------------------------------------------------------------------------
# S matrix + jackknife variance

def comp_ak_to_s(A: np.ndarray, K: np.ndarray, n_cvt: int) -> np.ndarray:
    """S_ij from centered+scaled kinship stacks (compAKtoS,
    param.cpp:1325-1378).  A, K: (n_vc, n, n)."""
    n_vc, n, _ = A.shape
    S = np.zeros((n_vc, n_vc))
    for i in range(n_vc):
        for j in range(n_vc):
            Ai, Kj = A[i], K[j]
            tr_AK = np.sum(Ai * Kj)
            sum_A = Ai.sum() / n
            sum_K = Kj.sum() / n
            sum_AK = (Ai.sum(axis=1) @ Kj.sum(axis=1)) / n
            tr_A = np.trace(Ai) - sum_A
            tr_K = np.trace(Kj) - sum_K
            d = tr_AK - 2 * sum_AK + sum_A * sum_K
            if tr_A == 0 or tr_K == 0:
                d = 0.0
            else:
                d = d / (tr_A * tr_K) - 1.0 / (n - n_cvt)
            S[i, j] = d
    return S


def jackknife_ak_to_s(A: np.ndarray, K: np.ndarray, n_cvt: int,
                      S: np.ndarray):
    """Leave-one-individual-out jackknife of the S statistic
    (JackknifeAKtoS, param.cpp:1596-1715).  Returns (S_corrected, Svar).
    Vectorised over the left-out individual."""
    n_vc, n, _ = A.shape
    Svar = np.zeros((n_vc, n_vc))
    S_out = S.copy()

    rowA = [A[i].sum(axis=1) for i in range(n_vc)]
    rowK = [K[j].sum(axis=1) for j in range(n_vc)]

    for i in range(n_vc):
        Ai = A[i]
        rA = rowA[i]
        totA = Ai.sum()
        diagA = np.diag(Ai)
        sumA_t = (totA - 2 * rA + diagA) / (n - 1)
        trA_t = np.trace(Ai) - diagA
        for j in range(n_vc):
            Kj = K[j]
            rK = rowK[j]
            totK = Kj.sum()
            diagK = np.diag(Kj)
            sumK_t = (totK - 2 * rK + diagK) / (n - 1)
            trK_t = np.trace(Kj) - diagK

            AKprod = Ai * Kj
            rAK = AKprod.sum(axis=1)
            totAK = AKprod.sum()
            trAK_t = totAK - 2 * rAK + np.diag(AKprod)

            # sumAK[t] = sum_{l != t} (rA_l - A_lt)(rK_l - K_lt)/(n-1)
            P = (rA[:, None] - Ai) * (rK[:, None] - Kj)   # (l, t)
            sumAK_t = (P.sum(axis=0) - np.diag(P)) / (n - 1)

            denom = (trA_t - sumA_t) * (trK_t - sumK_t)
            d_t = trAK_t - 2 * sumAK_t + sumA_t * sumK_t
            good = ((trA_t - sumA_t) != 0) & ((trK_t - sumK_t) != 0)
            d_t = np.where(good,
                           d_t / np.where(good, denom, 1.0)
                           - 1.0 / (n - n_cvt - 1), 0.0)
            m = d_t.mean()
            v = (d_t * d_t).mean() - m * m
            Svar[i, j] = v * (n - 1)
            if n_cvt == 1:
                S_out[i, j] = n * S[i, j] - (n - 1) * m
    return S_out, Svar


def category_kinship_fetch(fetch, p: int, n: int, W: np.ndarray,
                           cats: np.ndarray, n_vc: int,
                           weights: np.ndarray | None = None,
                           block: int = 4096):
    """Streaming category_kinship: `fetch(lo, hi)` returns raw dosage
    rows [lo, hi) of the p-SNP set, (k, n) with NaN missing.  Peak
    memory is one block plus the (n_vc, n, n) accumulator — the
    reference's streamed compKtoS posture (vc.cpp:2220-2475,
    param.cpp:1717) instead of a (p, n) materialisation."""
    K = np.zeros((n_vc, n, n))
    ns = np.zeros(n_vc, dtype=np.int64)
    WtW_inv_Wt = np.linalg.solve(W.T @ W, W.T)
    w_all = np.ones(p) if weights is None else np.asarray(weights)
    for s in range(0, p, block):
        e = min(s + block, p)
        raw = fetch(s, e)
        miss = np.isnan(raw)
        n_obs = np.maximum((~miss).sum(axis=1), 1)
        mean = np.where(miss, 0.0, raw).sum(axis=1) / n_obs
        Xc = np.where(miss, mean[:, None], raw) - mean[:, None]
        Xc = Xc - (W @ (WtW_inv_Wt @ Xc.T)).T
        var = np.einsum("ij,ij->i", Xc, Xc) / n
        cb = cats[s:e]
        ok = (var != 0) & (cb >= 0)
        scale = np.where(ok, np.sqrt(np.where(
            ok, w_all[s:e] / np.where(var != 0, var, 1), 0.0)), 0.0)
        Xs = Xc * scale[:, None]
        for c in range(n_vc):
            sel = ok & (cb == c)
            k = int(sel.sum())
            if k:
                Xd = jnp.asarray(Xs[sel])
                Kd = jax.lax.dot_general(Xd, Xd, (((0,), (0,)), ((), ())))
                K[c] += np.asarray(Kd)
                ns[c] += k
    for c in range(n_vc):
        if ns[c]:
            K[c] /= ns[c]
    return K, ns


def calc_s_fetch(fetch, p: int, W: np.ndarray, cats: np.ndarray,
                 n_vc: int, weights: np.ndarray | None = None,
                 weights_a: np.ndarray | None = None):
    """Streaming calc_s: genotype passes via fetch(lo, hi), RSS
    bounded by block size (see category_kinship_fetch)."""
    n = W.shape[0]
    Kstack, ns = category_kinship_fetch(fetch, p, n, W, cats, n_vc,
                                        weights)
    Kc = np.stack([
        np.asarray(scale_matrix(center_matrix(jnp.asarray(Ki))))
        for Ki in Kstack])
    if weights_a is None:
        Ac = Kc
    else:
        Astack, _ = category_kinship_fetch(fetch, p, n, W, cats, n_vc,
                                           weights_a)
        Ac = np.stack([
            np.asarray(scale_matrix(center_matrix(jnp.asarray(Ai))))
            for Ai in Astack])
    S = comp_ak_to_s(Ac, Kc, W.shape[1])
    S, Svar = jackknife_ak_to_s(Ac, Kc, W.shape[1], S)
    return S, Svar, ns


def calc_s(X_raw: np.ndarray, W: np.ndarray, cats: np.ndarray, n_vc: int,
           weights: np.ndarray | None = None,
           weights_a: np.ndarray | None = None):
    """CalcS (param.cpp:1717-1809): per-category kinships → center +
    scale → S and jackknife Svar.  Returns (S, Svar, ns).

    `weights` builds the K stack (mapRS2wK); `weights_a`, when given,
    builds a separately-weighted A stack (mapRS2wA, the LDSC second
    pass of -vc 2 with summary stats) — otherwise A = K."""
    Kstack, ns = category_kinship(X_raw, W, cats, n_vc, weights)
    Kc = np.stack([
        np.asarray(scale_matrix(center_matrix(jnp.asarray(Ki))))
        for Ki in Kstack])
    if weights_a is None:
        Ac = Kc
    else:
        Astack, _ = category_kinship(X_raw, W, cats, n_vc, weights_a)
        Ac = np.stack([
            np.asarray(scale_matrix(center_matrix(jnp.asarray(Ai))))
            for Ai in Astack])
    S = comp_ak_to_s(Ac, Kc, W.shape[1])
    S, Svar = jackknife_ak_to_s(Ac, Kc, W.shape[1], S)
    return S, Svar, ns


# ---------------------------------------------------------------------------
# solve S pve = q (CalcVCss, vc.cpp:1309-1501)

@dataclasses.dataclass
class MqsResult:
    pve: np.ndarray
    se_pve: np.ndarray
    sigma2persnp: np.ndarray
    se_sigma2persnp: np.ndarray
    enrich: np.ndarray
    se_enrich: np.ndarray
    pve_total: float
    se_pve_total: float


def calc_vc_ss(Vq, S, Svar, q, s, df) -> MqsResult:
    n_vc = S.shape[0]
    Si = np.linalg.inv(S)
    pve = Si @ q
    sigma2persnp = pve / s

    qvar = Vq / (df * df)
    Var = Svar * np.outer(pve, pve) + qvar
    Var = Si @ Var @ Si

    se_pve = np.sqrt(np.diag(Var))
    se_sigma2persnp = se_pve / s

    pve_total = float(pve.sum())
    se_pve_total = float(np.sqrt(Var.sum()))

    s_pve = pve.sum()
    s_snp = s.sum()
    enrich = sigma2persnp * (s_snp / s_pve)

    T = np.empty((n_vc, n_vc))
    for i in range(n_vc):
        d = pve[i] / s_pve
        for j in range(n_vc):
            if i == j:
                T[i, j] = (1 - d) / s[i] * s_snp / s_pve
            else:
                T[i, j] = -d / s[i] * s_snp / s_pve
    VarEnrich = T @ Var @ T.T
    se_enrich = np.sqrt(np.diag(VarEnrich))

    return MqsResult(pve=pve, se_pve=se_pve, sigma2persnp=sigma2persnp,
                     se_sigma2persnp=se_sigma2persnp, enrich=enrich,
                     se_enrich=se_enrich, pve_total=pve_total,
                     se_pve_total=se_pve_total)
