from gemma_tpu.models.lmm.indices import ab_index, n_index, pab_indices
from gemma_tpu.models.lmm.likelihood import (
    LmmBatchData,
    build_batch_data,
    null_batch_data,
    logf,
    dev1,
    dev12,
    wald_stats,
    score_stats,
)
from gemma_tpu.models.lmm.optimize import calc_lambda, LambdaResult
from gemma_tpu.models.lmm.engine import (
    NullFit,
    AssocStats,
    fit_null,
    assoc_block,
    impute_mean,
)
