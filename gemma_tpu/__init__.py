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


def _enable_persistent_compile_cache():
    """Persistent XLA compilation cache: a CLI run is a fresh process,
    so without this every invocation repays jit compilation (the
    autodiff mvLMM Newton alone costs ~minutes to build).  Opt out
    with GEMMA_TPU_NO_CACHE=1."""
    import os
    if os.environ.get("GEMMA_TPU_NO_CACHE"):
        return
    try:
        import jax
        path = os.environ.get(
            "GEMMA_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "gemma_tpu",
                         "xla"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # the axon remote-compile tunnel costs ~0.4s even for tiny
        # eager ops, so cache everything
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()
