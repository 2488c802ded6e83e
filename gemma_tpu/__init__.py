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


def _cap_cpu_isa():
    """Cap XLA:CPU codegen at AVX512 when running on the CPU backend:
    this image's XLA defaults to the compile machine's full feature
    set (incl. AMX) and segfaults non-deterministically compiling
    large programs (observed on the BSLMM MCMC chain) after the VM
    migrated across host generations.  Must run before backend init;
    harmless for TPU processes (flag only affects the CPU backend)."""
    import os
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu":
        return
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_max_isa" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_cpu_max_isa=AVX512").strip()


_cap_cpu_isa()


def _enable_persistent_compile_cache():
    """Persistent XLA compilation cache: a CLI run is a fresh process,
    so without this every invocation repays jit compilation (the
    autodiff mvLMM Newton alone costs ~minutes to build).  Opt out
    with GEMMA_TPU_NO_CACHE=1."""
    import os
    if os.environ.get("GEMMA_TPU_NO_CACHE"):
        return
    # CPU-only processes (tests, dryruns) skip the cache entirely:
    # XLA:CPU AOT (de)serialization segfaults on this image for large
    # executables (observed in compilation_cache.put/get on the BSLMM
    # MCMC program), and CPU compiles are fast anyway — the cache only
    # pays for the axon TPU tunnel.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    try:
        import jax
        # key the cache by a host-CPU fingerprint: XLA:CPU serialises
        # AOT code for the exact compile machine, and loading an
        # artifact built for a different microarchitecture segfaults
        # (cpu_aot_loader "machine features mismatch" → SIGILL) —
        # observed when this VM migrated between host generations
        import hashlib
        import platform
        fp = platform.processor() or ""
        try:
            with open("/proc/cpuinfo") as fh:
                for line in fh:
                    if line.startswith(("model name", "flags")):
                        fp += line
                        if line.startswith("flags"):
                            break
        except OSError:
            pass
        tag = hashlib.sha1(fp.encode()).hexdigest()[:10]
        path = os.environ.get(
            "GEMMA_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "gemma_tpu",
                         f"xla-{tag}"))
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
