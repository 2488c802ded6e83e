"""gemma_tpu — a TPU-native linear mixed model GWAS engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
GEMMA (Genome-wide Efficient Mixed Model Association,
genetics-statistics/GEMMA).  Where GEMMA streams SNPs one at a time
through single-threaded C++ loops + OpenBLAS dgemm, this framework
batches tens of thousands of SNPs into device-resident tensors and
runs every per-SNP computation (REML lambda optimisation, Wald/LRT/
score statistics, kinship accumulation) as vectorised XLA programs
over a `jax.sharding.Mesh`.

Layering (bottom → top):
  ops/       dense math kernels: centering, eigendecomposition,
             kinship accumulation, survival functions, batched
             root-finding (Brent + Newton).
  io/        genotype/phenotype ingestion (BIMBAM text, PLINK .bed),
             QC filters, output writers (GEMMA-compatible formats).
  models/    statistical models: univariate LMM, linear model,
             multivariate LMM, variance components, BSLMM, prediction.
  parallel/  device mesh setup and SNP-axis / individual-axis sharding.
  utils/     run log (.log.txt), timers, validation.
"""

__version__ = "0.1.0"

VERSION_BANNER = f"gemma-tpu {__version__}"
