from gemma_tpu.ops.stats import f_sf, chisq_sf, normal_cdf, normal_sf
from gemma_tpu.ops.center import (
    center_matrix,
    center_matrix_w,
    center_vector,
    standardize_vector,
    scale_matrix,
)
from gemma_tpu.ops.eigh import eigh_zeroed
from gemma_tpu.ops.kinship import KinshipAccumulator, compute_kinship_blocks
