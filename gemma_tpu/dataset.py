"""Dataset assembly: genotypes + phenotypes + covariates + indicators.

The analogue of PARAM::ReadFiles/ProcessCvtPhen/CheckCvt
(param.cpp:115-360, 1993-2097): decide which individuals are analyzed
(non-missing phenotypes × covariates × gxe × weights), normalise the
covariate matrix (add an intercept when absent), apply the -nind trim,
and run SNP QC over the analyzed individuals.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import os

from gemma_tpu.config import GemmaConfig
from gemma_tpu.io.bimbam import (read_bimbam_genotypes, annotate_snps,
                                 StreamingBimbamGenotypes)
from gemma_tpu.io.plink import read_plink
from gemma_tpu.io.readers import (
    read_pheno, read_covariates, read_anno, read_snp_set, read_gxe,
    read_weights,
)
from gemma_tpu.io.qc import run_qc, run_qc_blocked, QcResult
from gemma_tpu.io.tables import GenotypeData, SnpTable


@dataclasses.dataclass
class Dataset:
    geno: GenotypeData
    pheno: np.ndarray             # (ni_total, n_ph), NaN missing
    indicator_idv: np.ndarray     # (ni_total,) bool
    W: np.ndarray                 # (ni_test, n_cvt) covariates incl. intercept
    Y: np.ndarray                 # (ni_test, n_ph)
    qc: QcResult | None
    indicator_cvt: np.ndarray | None = None  # (ni_total,) bool
    cvt_all: np.ndarray | None = None        # (ni_total, n_cvt) normalized
    ids: list | None = None
    gxe: np.ndarray | None = None     # (ni_test,)
    weights: np.ndarray | None = None # (ni_test,)
    is_plink: bool = False
    snp_set: set | None = None
    ksnps: set | None = None          # LOCO kinship SNPs
    gwasnps: set | None = None        # LOCO association SNPs

    @property
    def ni_total(self) -> int:
        return self.indicator_idv.shape[0]

    @property
    def ni_test(self) -> int:
        return int(self.indicator_idv.sum())

    @property
    def n_cvt(self) -> int:
        return self.W.shape[1]

    def X_test(self) -> np.ndarray:
        """Genotypes restricted to analyzed individuals: (p, ni_test)."""
        return self.geno.X[:, self.indicator_idv]


def _normalize_covariates(cvt: np.ndarray, ind_idv: np.ndarray):
    """CheckCvt semantics (param.cpp:2099+): detect an intercept column
    (constant over analyzed rows); add a 1s column if absent; if every
    column is constant, collapse to a single intercept."""
    rows = cvt[ind_idv]
    if rows.shape[0] == 0:
        return np.ones((cvt.shape[0], 1))
    const_cols = [i for i in range(rows.shape[1])
                  if rows[:, i].min() == rows[:, i].max()]
    if len(const_cols) == rows.shape[1]:
        return np.ones((cvt.shape[0], 1))
    if not const_cols:
        return np.column_stack([cvt, np.ones(cvt.shape[0])])
    return cvt


def _trim_individuals(ind: np.ndarray, ni_max: int) -> np.ndarray:
    """-nind: keep only the first ni_max analyzed individuals
    (trim_individuals, param.cpp:74-91)."""
    if ni_max <= 0:
        return ind
    csum = np.cumsum(ind.astype(int))
    out = ind.copy()
    out[csum > ni_max] = False
    return out


def _concat_geno(parts: list) -> GenotypeData:
    """Concatenate per-file GenotypeData along the SNP axis (the
    mindicator_snp/msnpInfo multi-file model, param.cpp ReadFiles for
    -mg/-mbfile).  Per-SNP QC commutes with concatenation, so the
    merged table behaves exactly like per-file indicator vectors."""
    snps = SnpTable(
        chr=np.concatenate([p.snps.chr for p in parts]),
        rs=np.concatenate([p.snps.rs for p in parts]),
        cM=np.concatenate([p.snps.cM for p in parts]),
        pos=np.concatenate([p.snps.pos for p in parts]),
        a_minor=np.concatenate([p.snps.a_minor for p in parts]),
        a_major=np.concatenate([p.snps.a_major for p in parts]),
    )
    return GenotypeData(snps=snps, X=np.vstack([p.X for p in parts]))


def _read_list_file(path: str) -> list:
    with open(path) as fh:
        return [ln.strip() for ln in fh if ln.strip()]


def _bimbam_backend(path: str, stat_mask: np.ndarray | None = None):
    """In-memory vs streaming BIMBAM backend selection.

    Big inputs stream through the native reader with bounded RSS (the
    reference's two-pass posture, gemma_io.cpp:639/1418); small inputs
    materialise (faster for repeated passes).  GEMMA_TPU_STREAM=1/0
    forces; default switches on file size (1 GiB text / 256 MiB gz).

    stat_mask (analyzed-individual indicator, when known before the
    parse) fuses QC statistics into the in-memory tokenization pass;
    the streaming backend computes them in its own native pass later.
    """
    from gemma_tpu.io import native
    env = os.environ.get("GEMMA_TPU_STREAM", "auto")
    if env == "1":
        return StreamingBimbamGenotypes(path)
    if env == "auto" and native.available():
        thresh = (256 << 20) if str(path).endswith(".gz") else (1 << 30)
        if os.path.getsize(path) > thresh:
            return StreamingBimbamGenotypes(path)
    return read_bimbam_genotypes(path, stat_mask=stat_mask)


def load_dataset(cfg: GemmaConfig, need_qc: bool = True,
                 need_geno: bool = True) -> Dataset:
    ids = None
    is_plink = False
    geno = None
    deferred_geno_path = None

    if cfg.file_mbfile or cfg.file_mgeno:
        # -mbfile / -mg: list of genotype files sharing the individual
        # axis, concatenated along the SNP axis
        parts = []
        if cfg.file_mbfile:
            is_plink = True
            fam_pheno = None
            for prefix in _read_list_file(cfg.file_mbfile):
                g, ids, fam_pheno = read_plink(prefix, tuple(cfg.p_columns))
                parts.append(g)
            pheno = fam_pheno
            if cfg.file_pheno:
                pheno = read_pheno(cfg.file_pheno, tuple(cfg.p_columns))
        else:
            for path in _read_list_file(cfg.file_mgeno):
                parts.append(_bimbam_backend(path))
            pheno = read_pheno(cfg.file_pheno, tuple(cfg.p_columns))
        n_ind = {p.n_individuals for p in parts}
        if len(n_ind) != 1:
            raise ValueError("-mg/-mbfile genotype files disagree on the "
                             f"number of individuals: {sorted(n_ind)}")
        geno = _concat_geno(parts)
        if cfg.file_anno:
            annotate_snps(geno.snps, read_anno(cfg.file_anno))
    elif cfg.file_bfile:
        is_plink = True
        geno, ids, fam_pheno = read_plink(cfg.file_bfile,
                                          tuple(cfg.p_columns))
        pheno = fam_pheno
        if cfg.file_pheno:   # -p overrides .fam phenotypes
            pheno = read_pheno(cfg.file_pheno, tuple(cfg.p_columns))
    elif cfg.file_geno:
        # parse deferred until the analyzed-individual indicator is
        # known, so the native tokenization pass computes QC
        # statistics over exactly the analyzed columns (one pass
        # instead of parse + O(p·n) numpy sweep)
        deferred_geno_path = cfg.file_geno
        pheno = read_pheno(cfg.file_pheno, tuple(cfg.p_columns))
    elif not need_geno:
        pheno = read_pheno(cfg.file_pheno, tuple(cfg.p_columns))
        need_qc = False
    else:
        raise ValueError("no genotype file: use -g or -bfile")

    ni_total = pheno.shape[0]
    if geno is not None and geno.n_individuals != ni_total:
        raise ValueError(
            f"genotype file has {geno.n_individuals} individuals but "
            f"phenotype file has {ni_total}")

    # analyzed = all selected phenotypes present
    indicator_idv = ~np.isnan(pheno).any(axis=1)

    cvt = None
    ind_cvt = np.ones(ni_total, dtype=bool)
    if cfg.file_cvt:
        cvt, ind_cvt = read_covariates(cfg.file_cvt)
        indicator_idv &= ind_cvt

    gxe_all = None
    if cfg.file_gxe:
        gxe_all, ind_gxe = read_gxe(cfg.file_gxe)
        indicator_idv &= ind_gxe

    weights_all = None
    if cfg.file_weight:
        weights_all, ind_w = read_weights(cfg.file_weight)
        indicator_idv &= ind_w

    indicator_idv = _trim_individuals(indicator_idv, cfg.ni_max)

    # -sample: random subsample of the analyzed individuals, order
    # preserved (param.cpp:2040-2070; gsl_ran_choose keeps file order).
    # Deviation: numpy RNG stream, not GSL's — fixed -seed still gives
    # a reproducible subset.
    if cfg.ni_subsample:
        test_idx = np.flatnonzero(indicator_idv)
        if len(test_idx) < cfg.ni_subsample:
            raise ValueError(
                f"ni_test={len(test_idx)} smaller than -sample "
                f"{cfg.ni_subsample}")
        rng = np.random.default_rng(cfg.seed if cfg.seed >= 0 else None)
        keep = rng.choice(len(test_idx), cfg.ni_subsample, replace=False)
        drop = np.setdiff1d(np.arange(len(test_idx)), keep)
        indicator_idv[test_idx[drop]] = False

    if indicator_idv.sum() == 0:
        raise ValueError("number of analyzed individuals equals 0")

    if cvt is not None:
        cvt = _normalize_covariates(cvt, indicator_idv)
        W = cvt[indicator_idv]
        cvt_all = cvt
    else:
        cvt_all = np.ones((ni_total, 1))
        W = cvt_all[indicator_idv]

    Y = pheno[indicator_idv]
    gxe = gxe_all[indicator_idv] if gxe_all is not None else None
    weights = weights_all[indicator_idv] if weights_all is not None else None

    if deferred_geno_path is not None:
        geno = _bimbam_backend(
            deferred_geno_path,
            stat_mask=indicator_idv if need_qc else None)
        if cfg.file_anno:
            annotate_snps(geno.snps, read_anno(cfg.file_anno))
        if geno.n_individuals != ni_total:
            raise ValueError(
                f"genotype file has {geno.n_individuals} individuals "
                f"but phenotype file has {ni_total}")

    snp_set = read_snp_set(cfg.file_snps) if cfg.file_snps else None

    # LOCO: split SNPs by chromosome (param.cpp LOCO_set_Snps:52-66)
    ksnps = gwasnps = None
    if cfg.loco and geno is not None:
        ksnps, gwasnps = set(), set()
        for rs, chr_ in zip(geno.snps.rs, geno.snps.chr):
            if snp_set is not None and rs not in snp_set:
                continue
            if chr_ != cfg.loco:
                ksnps.add(rs)
            else:
                gwasnps.add(rs)
    if cfg.file_ksnps:
        ksnps = read_snp_set(cfg.file_ksnps)
    if cfg.file_gwasnps:
        gwasnps = read_snp_set(cfg.file_gwasnps)

    qc = None
    if need_qc:
        mask = None
        if snp_set is not None:
            mask = np.array([rs in snp_set for rs in geno.snps.rs])
        qc = run_qc_blocked(
            geno, indicator_idv, W, block_size=max(cfg.block_size, 8192),
            miss_level=cfg.miss_level, maf_level=cfg.maf_level,
            hwe_level=cfg.hwe_level, r2_level=cfg.r2_level,
            snp_set_mask=mask, plink_poly=is_plink)
        geno.snps.n_miss = qc.n_miss
        geno.snps.missingness = qc.missingness
        geno.snps.maf = qc.maf
        geno.snps.n_idv = qc.n_idv

    return Dataset(geno=geno, pheno=pheno, indicator_idv=indicator_idv,
                   W=W, Y=Y, qc=qc, indicator_cvt=ind_cvt, cvt_all=cvt_all,
                   ids=ids, gxe=gxe, weights=weights,
                   is_plink=is_plink, snp_set=snp_set, ksnps=ksnps,
                   gwasnps=gwasnps)
