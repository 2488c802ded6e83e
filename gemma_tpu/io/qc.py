"""Vectorised SNP quality control.

Replicates the per-SNP filter chain of the reference's first-pass
genotype readers — miss → maf → polymorphism → HWE → covariate-r²
(ReadFile_geno gemma_io.cpp:805-853, ReadFile_bed:1002-1046) — as
whole-matrix numpy ops over the analyzed individuals.

Statistics (recorded for every SNP, even filtered ones):
  * n_miss over analyzed individuals
  * maf = sum(dosage) / (2 * n_observed)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gemma_tpu.io.hwe import hwe_exact_p


@dataclasses.dataclass
class QcResult:
    indicator_snp: np.ndarray   # (p,) bool — SNP passes all filters
    n_miss: np.ndarray          # (p,) int
    missingness: np.ndarray     # (p,) float
    maf: np.ndarray             # (p,) float
    n_idv: np.ndarray           # (p,) int — observed count

    @property
    def ns_test(self) -> int:
        return int(self.indicator_snp.sum())


def run_qc(X_test: np.ndarray, W: np.ndarray,
           miss_level: float = 0.05, maf_level: float = 0.01,
           hwe_level: float = 0.0, r2_level: float = 0.9999,
           snp_set_mask: np.ndarray | None = None,
           plink_poly: bool = False) -> QcResult:
    """X_test: (p, ni_test) dosages over analyzed individuals, NaN missing.

    W: (ni_test, c) covariate matrix (with intercept).  snp_set_mask:
    False rows (from -snps) are excluded without computing stats
    (gemma_io.cpp:715-724).  plink_poly selects the .bed polymorphism
    rule (at least two genotype classes, gemma_io.cpp:1020-1023) over
    the BIMBAM rule (any two observed values differ, :782-821).
    """
    p, ni_test = X_test.shape
    miss = np.isnan(X_test)
    n_miss = miss.sum(axis=1)
    n_obs = ni_test - n_miss
    missingness = n_miss / ni_test
    g0 = np.where(miss, 0.0, X_test)
    with np.errstate(invalid="ignore", divide="ignore"):
        maf = g0.sum(axis=1) / (2.0 * n_obs)

    keep = np.ones(p, dtype=bool)
    if snp_set_mask is not None:
        keep &= snp_set_mask

    # -miss
    keep &= missingness <= miss_level
    # -maf (maf_level == -1 disables, set by -notsnp)
    if maf_level != -1:
        keep &= ~((maf < maf_level) | (maf > 1.0 - maf_level))

    # genotype class counts (for poly + HWE): reference bins
    # [0,0.5] → n_0, (0.5,1.5) → n_1, [1.5,2] → n_2 (gemma_io.cpp:767-775)
    obs = ~miss
    n_0 = ((X_test >= 0) & (X_test <= 0.5) & obs).sum(axis=1)
    n_1 = ((X_test > 0.5) & (X_test < 1.5) & obs).sum(axis=1)
    n_2 = ((X_test >= 1.5) & (X_test <= 2.0) & obs).sum(axis=1)

    # polymorphism
    if plink_poly:
        poly = ~(((n_0 + n_1) == 0) | ((n_1 + n_2) == 0) | ((n_2 + n_0) == 0))
    else:
        gmin = np.where(obs, X_test, np.inf).min(axis=1)
        gmax = np.where(obs, X_test, -np.inf).max(axis=1)
        poly = (n_obs > 0) & (gmin != gmax)
    keep &= poly

    # -hwe (only when enabled and maf filtering active)
    if hwe_level != 0 and maf_level != -1:
        for i in np.flatnonzero(keep):
            if hwe_exact_p(int(n_0[i]), int(n_2[i]), int(n_1[i])) < hwe_level:
                keep[i] = False

    # -r2: drop SNPs (nearly) in the covariate span, skipped when W is
    # just the intercept (gemma_io.cpp:845-850)
    if W.shape[1] != 1 and np.any(keep):
        sel = np.flatnonzero(keep)
        G = np.where(miss[sel], (2.0 * maf[sel])[:, None], X_test[sel])
        WtW = W.T @ W
        WtX = W.T @ G.T                          # (c, k)
        v_w = np.einsum("ck,ck->k", WtX, np.linalg.solve(WtW, WtX))
        v_x = np.einsum("kn,kn->k", G, G)
        with np.errstate(invalid="ignore", divide="ignore"):
            bad = v_w / v_x > r2_level
        keep[sel[bad]] = False

    return QcResult(indicator_snp=keep, n_miss=n_miss.astype(np.int64),
                    missingness=missingness, maf=maf,
                    n_idv=n_obs.astype(np.int64))


def qc_stats_from_i8(Xi8: np.ndarray, stat_mask: np.ndarray) -> np.ndarray:
    """The native parser's (p, 8) QC statistic array ([n_miss, sum,
    n_0, n_1, n_2, min, max, sumsq] over masked columns) computed from
    an int8 dosage block ({0,1,2}, -1 missing) with integer numpy ops —
    exact, and ~an order of magnitude cheaper than the float64 sweep
    (no NaN handling, 1/8th the bytes).  Used by the binary-sidecar and
    .bed backends where dosages are hard calls by construction."""
    Xm = Xi8[:, np.asarray(stat_mask, bool)]
    n_0 = (Xm == 0).sum(axis=1, dtype=np.int64)
    n_1 = (Xm == 1).sum(axis=1, dtype=np.int64)
    n_2 = (Xm == 2).sum(axis=1, dtype=np.int64)
    n_obs = n_0 + n_1 + n_2
    n_miss = Xm.shape[1] - n_obs
    s = n_1 + 2 * n_2
    sumsq = n_1 + 4 * n_2
    # min/max of observed values, derived from the class counts
    # (dosages are exactly {0,1,2}); zero-observation rows get
    # min > max so the BIMBAM polymorphism rule can never pass them
    gmin = np.where(n_0 > 0, 0.0, np.where(n_1 > 0, 1.0,
                    np.where(n_2 > 0, 2.0, np.inf)))
    gmax = np.where(n_2 > 0, 2.0, np.where(n_1 > 0, 1.0,
                    np.where(n_0 > 0, 0.0, -np.inf)))
    out = np.empty((Xm.shape[0], 8), dtype=np.float64)
    out[:, 0] = n_miss
    out[:, 1] = s
    out[:, 2] = n_0
    out[:, 3] = n_1
    out[:, 4] = n_2
    out[:, 5] = gmin
    out[:, 6] = gmax
    out[:, 7] = sumsq
    return out


def run_qc_from_stats(stats: np.ndarray, ni_test: int, W: np.ndarray,
                      geno=None, indicator_idv=None,
                      miss_level: float = 0.05, maf_level: float = 0.01,
                      hwe_level: float = 0.0, r2_level: float = 0.9999,
                      snp_set_mask: np.ndarray | None = None,
                      plink_poly: bool = False,
                      block_size: int = 8192) -> QcResult:
    """run_qc from the (p, 8) per-SNP statistic array the native
    parser fused into its tokenization pass ([n_miss, sum, n_0, n_1,
    n_2, min, max, sumsq] over analyzed individuals) — identical
    filter chain, no O(p·n) matrix sweep.  The covariate-r² filter
    (the only one needing actual genotypes) streams blocks of
    still-kept SNPs through `geno.block`."""
    p = stats.shape[0]
    n_miss = stats[:, 0]
    n_obs = ni_test - n_miss
    missingness = n_miss / ni_test
    with np.errstate(invalid="ignore", divide="ignore"):
        maf = stats[:, 1] / (2.0 * n_obs)

    keep = np.ones(p, dtype=bool)
    if snp_set_mask is not None:
        keep &= snp_set_mask
    keep &= missingness <= miss_level
    if maf_level != -1:
        keep &= ~((maf < maf_level) | (maf > 1.0 - maf_level))

    n_0, n_1, n_2 = stats[:, 2], stats[:, 3], stats[:, 4]
    if plink_poly:
        poly = ~(((n_0 + n_1) == 0) | ((n_1 + n_2) == 0)
                 | ((n_2 + n_0) == 0))
    else:
        poly = (n_obs > 0) & (stats[:, 5] != stats[:, 6])
    keep &= poly

    if hwe_level != 0 and maf_level != -1:
        for i in np.flatnonzero(keep):
            if hwe_exact_p(int(n_0[i]), int(n_2[i]),
                           int(n_1[i])) < hwe_level:
                keep[i] = False

    if W.shape[1] != 1 and np.any(keep):
        sel = np.flatnonzero(keep)
        WtW = W.T @ W
        for s in range(0, len(sel), block_size):
            sub = sel[s:s + block_size]
            Xb = geno.block(sub)[:, indicator_idv]
            G = np.where(np.isnan(Xb), (2.0 * maf[sub])[:, None], Xb)
            WtX = W.T @ G.T
            v_w = np.einsum("ck,ck->k", WtX, np.linalg.solve(WtW, WtX))
            v_x = np.einsum("kn,kn->k", G, G)
            with np.errstate(invalid="ignore", divide="ignore"):
                bad = v_w / v_x > r2_level
            keep[sub[bad]] = False

    return QcResult(indicator_snp=keep, n_miss=n_miss.astype(np.int64),
                    missingness=missingness, maf=maf,
                    n_idv=n_obs.astype(np.int64))


def run_qc_blocked(geno, indicator_idv: np.ndarray, W: np.ndarray,
                   block_size: int = 8192, snp_set_mask=None,
                   **kw) -> QcResult:
    """Blockwise run_qc over a (possibly streaming) genotype backend:
    per-SNP statistics are independent, so each block's QcResult
    concatenates exactly (the full matrix never materialises).

    Fast paths: statistics fused into the native parse (in-memory
    backend: geno.qc_stats for a matching mask; streaming backend:
    one native stats-only pass) skip the numpy matrix sweep entirely.
    """
    stats = None
    pre = getattr(geno, "qc_stats", None)
    if callable(pre):                      # streaming backend method
        try:
            stats = pre(indicator_idv)
        except Exception:
            stats = None
    elif pre is not None:                  # fused into in-memory parse
        mask = getattr(geno, "qc_stats_mask", None)
        if (mask is not None and mask.shape == indicator_idv.shape
                and np.array_equal(mask, indicator_idv)):
            stats = pre
    if stats is not None:
        return run_qc_from_stats(
            stats, int(indicator_idv.sum()), W, geno=geno,
            indicator_idv=indicator_idv, snp_set_mask=snp_set_mask,
            block_size=block_size, **kw)

    parts = []
    for s in range(0, geno.n_snps, block_size):
        sel = np.arange(s, min(s + block_size, geno.n_snps))
        mask = snp_set_mask[sel] if snp_set_mask is not None else None
        X_blk = geno.block(sel)[:, indicator_idv]
        parts.append(run_qc(X_blk, W, snp_set_mask=mask, **kw))
    return QcResult(
        indicator_snp=np.concatenate([p.indicator_snp for p in parts]),
        n_miss=np.concatenate([p.n_miss for p in parts]),
        missingness=np.concatenate([p.missingness for p in parts]),
        maf=np.concatenate([p.maf for p in parts]),
        n_idv=np.concatenate([p.n_idv for p in parts]),
    )
