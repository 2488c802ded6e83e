"""Typed run configuration — the PARAM hub analogue (param.h:119-370).

One dataclass holds every option; `gemma_tpu.cli` fills it from
GEMMA-compatible flags, and the Python API constructs it directly.
Defaults mirror GEMMA's help text (gemma.cpp:451-696).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

# analysis mode numbers (gemma.h:28-47)
M_LMM1, M_LMM2, M_LMM3, M_LMM4, M_LMM5, M_LMM9 = 1, 2, 3, 4, 5, 9
M_BSLMM1, M_BSLMM2, M_BSLMM3 = 11, 12, 13
M_KIN, M_KIN2 = 21, 22
M_GS, M_GS2 = 25, 26
M_GQ, M_GQ2 = 27, 28
M_EIGEN = 31
M_PREDICT, M_PREDICT2, M_PREDICT3 = 41, 42, 43
M_LM1, M_LM2, M_LM3, M_LM4 = 51, 52, 53, 54
M_VC1, M_VC2, M_VC3 = 61, 62, 63
M_CI1, M_CI2 = 66, 67
M_CALCCOR = 71
M_GW = 72


@dataclasses.dataclass
class GemmaConfig:
    # analysis mode
    a_mode: int = 0

    # input files
    file_geno: str = ""        # -g  BIMBAM mean genotypes
    file_bfile: str = ""       # -bfile PLINK prefix
    file_pheno: str = ""       # -p
    file_anno: str = ""        # -a
    file_cvt: str = ""         # -c
    file_gxe: str = ""         # -gxe
    file_weight: str = ""      # -widv
    file_kin: str = ""         # -k
    file_mk: str = ""          # -mk
    file_ku: str = ""          # -u
    file_kd: str = ""          # -d
    file_snps: str = ""        # -snps
    file_ksnps: str = ""       # -ksnps
    file_gwasnps: str = ""     # -gwasnps
    file_epm: str = ""         # -epm (estimated parameters, for -predict)
    file_ebv: str = ""         # -ebv
    file_emu: str = ""         # -emu
    file_beta: str = ""        # -beta (summary stats)
    file_cor: str = ""         # -cor
    file_gene: str = ""        # -gene (expression matrix)
    file_cat: str = ""         # -cat (SNP categories)
    file_study: str = ""       # -study (prefix of .q/.Vq/.size)
    file_ref: str = ""         # -ref (prefix of .S/.size)
    file_hyp: str = ""         # -hyp (DAP hyper grid file)
    file_bf: str = ""          # -bf (DAP Bayes factor file)
    file_mgeno: str = ""       # -mg (list of BIMBAM genotype files)
    file_mbfile: str = ""      # -mbfile (list of PLINK prefixes)
    file_mcat: str = ""        # -mcat (list of category files)
    file_catc: str = ""        # -catc (continuous categories)
    file_mcatc: str = ""       # -mcatc (list of continuous category files)
    file_wsnp: str = ""        # -wsnp (per-SNP weights for MQS)
    file_wcat: str = ""        # -wcat (per-category weight vectors)
    file_mstudy: str = ""      # -mstudy (list of -study prefixes)
    file_mref: str = ""        # -mref (list of -ref prefixes)
    file_read: str = ""        # -r (total read counts for -gene)

    # phenotype columns (-n, 1-based)
    p_columns: Sequence[int] = (1,)

    # output
    path_out: str = "./output"
    file_out: str = "result"

    # QC thresholds (param defaults; gemma help 451-696)
    miss_level: float = 0.05
    maf_level: float = 0.01
    hwe_level: float = 0.0
    r2_level: float = 0.9999
    notsnp: bool = False        # sets maf_level = -1

    # kinship / eigen
    k_mode: int = 1             # -km: 1 dense matrix, 2 id-id-value
    gk_mode: int = 1            # -gk: 1 centered, 2 standardized

    # LMM
    l_min: float = 1e-5
    l_max: float = 1e5
    n_region: int = 10
    loco: str = ""              # -loco chromosome

    # LOCO / subsetting
    ni_max: int = 0             # -nind (truncate to first N analyzed)
    ni_subsample: int = 0       # -sample (random subsample of N)
    seed: int = -1              # -seed (used for subsampling, MCMC)

    # mvLMM
    em_iter: int = 10000
    nr_iter: int = 100
    em_prec: float = 1e-4
    nr_prec: float = 1e-4
    p_nr: float = 0.001
    crt: int = 0

    # BSLMM priors / MCMC (param.h:202-218)
    h_min: float = -1.0
    h_max: float = -1.0
    rho_min: float = 0.0
    rho_max: float = 1.0
    logp_min: float = 0.0
    logp_max: float = 0.0
    pheno_mean: float = 0.0
    h_ngrid: int = 10
    rho_ngrid: int = 10
    s_min: int = 0
    s_max: int = 300
    w_step: int = 100000
    s_step: int = 1000000
    r_pace: int = 10
    w_pace: int = 1000
    n_mh: int = 10
    geo_mean: float = 2000.0
    h_scale: float = -1.0       # -hscale (MH proposal step for h)
    rho_scale: float = -1.0     # -rscale
    logp_scale: float = -1.0    # -pscale (input in log10 units)

    # VC
    noconstrain: bool = False   # -noconstrain: REML in sigma2 space
    v_pve: Sequence[float] = () # -pve (point estimates for -ci)
    window_bp: float = 0.0
    window_cm: float = 0.0
    window_ns: float = 0.0
    n_block: int = 200

    # varcov windows
    window_bp_cor: float = 1e6

    # runtime
    precision: str = "auto"     # float64 (CPU parity) / float32 (TPU) / auto
    block_size: int = 4096      # SNPs per device batch
    block_size_set: bool = False  # True when -block-size was explicit
    check: bool = True
    strict: bool = False        # -strict: escalate warnings to errors
    fpe_check: bool = True      # -no-fpe-check disables NaN debugging
    legacy: bool = False        # -legacy: pre-0.98 behaviour toggle
    debug: bool = False
    d_pace: int = 100000        # -pace progress stride
    quiet: bool = False         # -silence/--quiet
    checkpoint_every: int = 0   # -ckpt N: BSLMM MCMC checkpoint stride
    trace_dir: str = ""         # -trace: JAX profiler trace output dir
    est_column: Sequence[int] = ()  # -en columns in -epm file

    def __post_init__(self):
        if self.notsnp:
            self.maf_level = -1.0

    @property
    def n_ph(self) -> int:
        return len(self.p_columns)

    def out_prefix(self) -> str:
        return f"{self.path_out}/{self.file_out}"


_VALID_MODES = {1, 2, 3, 4, 5, 9, 11, 12, 13, 14, 15, 21, 22, 25, 26,
                27, 28, 31, 41, 42, 43, 51, 52, 53, 54, 61, 62, 63, 66,
                67, 71, 72}


def check_param(cfg: GemmaConfig) -> None:
    """Cross-flag validation (PARAM::CheckParam, param.cpp:504-990):
    threshold ranges, mode compatibility, LOCO restrictions, required
    companions for the summary-statistics modes."""
    import os

    def err(msg):
        raise ValueError(f"error! {msg}")

    if cfg.k_mode not in (1, 2):
        err(f"unknown kinship/relatedness input mode: {cfg.k_mode}")
    if cfg.a_mode not in _VALID_MODES:
        err(f"unknown analysis mode: {cfg.a_mode}. make sure -gk or "
            "-eigen or -lmm or -bslmm -predict or -calccov is "
            "specified correctly.")
    if cfg.miss_level > 1:
        err("missing level needs to be between 0 and 1. "
            f"current value = {cfg.miss_level}")
    if cfg.maf_level > 0.5:
        err("maf level needs to be between 0 and 0.5. "
            f"current value = {cfg.maf_level}")
    if cfg.hwe_level > 1:
        err("hwe level needs to be between 0 and 1. "
            f"current value = {cfg.hwe_level}")
    if cfg.r2_level > 1:
        err("r2 level needs to be between 0 and 1. "
            f"current value = {cfg.r2_level}")

    if cfg.loco:
        if not (cfg.a_mode in (1, 2, 3, 4, 9, 21, 22)):
            err("LOCO only works with LMM and K")
        if cfg.file_gxe:
            err("LOCO does not support GXE (yet)")
        if not cfg.file_anno:
            err("LOCO requires annotation file (-a switch)")
        if cfg.file_ksnps:
            err("LOCO does not allow -ksnps switch")
        if cfg.file_gwasnps:
            err("LOCO does not allow -gwasnps switch")

    # only LMM modes (and MVN prediction) handle multiple phenotypes
    # (param.cpp:653-663)
    if cfg.n_ph > 1 and cfg.a_mode not in (1, 2, 3, 4, 9, 43):
        err(f"the current analysis mode {cfg.a_mode} can not deal "
            "with multiple phenotypes.")
    if cfg.n_ph > 1 and cfg.file_gene:
        err("multiple phenotype analysis option not allowed with "
            "gene expression files.")
    if cfg.p_nr > 1:
        err("pnr value must be between 0 and 1. "
            f"current value = {cfg.p_nr}")

    if cfg.a_mode in (66, 67):
        if not cfg.file_beta:
            err("-ci requires -beta summary statistics")
        if not (cfg.file_ref or cfg.file_mref):
            err("-ci requires -ref or -mref")
    if cfg.a_mode == 67 and not cfg.file_wcat:
        err("-ci 2 requires -wcat weights (param.cpp:1238)")

    for name in ("file_geno", "file_pheno", "file_anno", "file_cvt",
                 "file_kin", "file_mk", "file_ku", "file_kd",
                 "file_snps", "file_ksnps", "file_gwasnps", "file_gxe",
                 "file_weight", "file_beta", "file_cat", "file_mcat",
                 "file_wsnp", "file_wcat", "file_epm", "file_ebv",
                 "file_gene", "file_hyp", "file_bf", "file_mgeno",
                 "file_mbfile", "file_mstudy", "file_mref"):
        path = getattr(cfg, name)
        if path and not os.path.exists(path):
            err(f"fail to open {name.replace('file_', '-')} file: {path}")
