from gemma_tpu.io.tables import SnpTable, GenotypeData
from gemma_tpu.io.bimbam import read_bimbam_genotypes
from gemma_tpu.io.plink import read_plink
from gemma_tpu.io.readers import (
    read_pheno,
    read_covariates,
    read_anno,
    read_snp_set,
    read_kinship,
    read_eigen_u,
    read_eigen_d,
    read_gxe,
    read_weights,
)
from gemma_tpu.io.qc import QcResult, run_qc
