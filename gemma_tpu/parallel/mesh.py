"""Device mesh construction + multi-host initialization.

The reference is single-process with threaded BLAS (SURVEY.md §2.2);
all distribution here is new design.  The natural axes for mixed-model
GWAS are:

  * "snp" — data parallelism over the SNP axis: per-SNP association
    work and kinship partial sums are embarrassingly parallel; results
    merge with all_gather (assoc tables) or psum (K = sum_s x_s x_s').
  * "ind" — individual-axis model parallelism for the n×n kinship /
    eigendecomposition at biobank scale (2-D sharded matmuls; the
    distributed eigensolver lives in parallel/eigh.py).

Multi-host: `distributed_init()` (below) calls
`jax.distributed.initialize()` when coordinator env vars are present;
collectives then ride ICI within a slice and DCN across hosts, chosen
by XLA from the mesh layout.  The reference's analogue is a no-op —
it merely logs the OpenBLAS thread count (gemma.cpp:3170-3177).
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh

_distributed_initialized = False


def distributed_init() -> bool:
    """Initialize the multi-host JAX runtime when launched as part of a
    pod job.  Detection: the standard JAX coordination env vars
    (`JAX_COORDINATOR_ADDRESS`/`JAX_NUM_PROCESSES`/`JAX_PROCESS_ID`,
    or our `GEMMA_TPU_COORDINATOR` aliases).  Single-process runs
    (no env vars) skip initialization entirely.

    Returns True if `jax.distributed.initialize` was called.  Safe to
    call more than once.  Must run before the first backend touch; the
    CLI calls it at the top of `batch_run`.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    coord = (os.environ.get("GEMMA_TPU_COORDINATOR")
             or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not coord:
        return False
    nproc = os.environ.get("GEMMA_TPU_NUM_PROCESSES",
                           os.environ.get("JAX_NUM_PROCESSES"))
    pid = os.environ.get("GEMMA_TPU_PROCESS_ID",
                         os.environ.get("JAX_PROCESS_ID"))
    kwargs = {"coordinator_address": coord}
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _distributed_initialized = True
    return True


def device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: int | None = None, axis_names=("snp",),
              shape: tuple | None = None) -> Mesh:
    """Build a Mesh over the first n_devices devices.

    1-D by default (SNP data parallelism).  Pass shape=(a, b) with
    axis_names=("snp", "ind") for the 2-D kinship layout.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,)
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"mesh shape {shape} != {n_devices} devices")
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def default_mesh() -> Mesh:
    """The production drivers' mesh: all visible devices on the "snp"
    axis (GEMMA_TPU_MAX_DEVICES caps it, mainly for 1-vs-N equality
    tests).  A 1-device mesh degenerates to the single-chip program —
    shard_map over one shard adds no collectives — so run_gk/run_lmm
    use this unconditionally and the CLI path IS the multi-chip path.
    """
    n = len(jax.devices())
    cap = os.environ.get("GEMMA_TPU_MAX_DEVICES")
    if cap:
        n = max(1, min(n, int(cap)))
    return make_mesh(n, axis_names=("snp",))


def hbm_bytes_per_chip() -> int:
    """Per-chip HBM budget used by the n-axis scale-out heuristics
    (GEMMA_TPU_HBM_GB overrides; default 16 GB, the v5e/v5p-lite
    figure measured in PERF.md)."""
    gb = float(os.environ.get("GEMMA_TPU_HBM_GB", "16"))
    return int(gb * (1 << 30))


def kinship_mesh(n_individuals: int, itemsize: int) -> Mesh | None:
    """The 2-D (snp × ind) mesh for individual-axis kinship sharding
    (SURVEY §5.7: K is the quadratic object; one chip's HBM caps n).

    Returns None when the plain 1-D SNP mesh suffices — i.e. the
    replicated path stays the production default.  A 2-D mesh is used
    when:

      * GEMMA_TPU_MESH="snp=A,ind=B" requests it explicitly (tests,
        operators), or
      * more than one device is visible AND three K-sized buffers
        (accumulator + the eigensolver's working set) would not fit
        one chip's HBM.

    The ind axis gets as many devices as needed to fit K comfortably;
    the rest go to the snp axis.
    """
    devs = jax.devices()
    n_dev = len(devs)
    cap = os.environ.get("GEMMA_TPU_MAX_DEVICES")
    if cap:
        n_dev = max(1, min(n_dev, int(cap)))
    spec = os.environ.get("GEMMA_TPU_MESH")
    if spec:
        parts = dict(kv.split("=") for kv in spec.replace(" ", "")
                     .split(",") if kv)
        a = int(parts.get("snp", 1))
        b = int(parts.get("ind", 1))
        if a * b > n_dev:
            raise ValueError(
                f"GEMMA_TPU_MESH={spec} needs {a * b} devices, "
                f"{n_dev} visible")
        if b == 1:
            return None
        return make_mesh(a * b, axis_names=("snp", "ind"), shape=(a, b))
    k_bytes = n_individuals * n_individuals * itemsize
    if n_dev < 2:
        enforce = (jax.default_backend() != "cpu"
                   or "GEMMA_TPU_HBM_GB" in os.environ)
        if 3 * k_bytes > hbm_bytes_per_chip() and enforce:
            # fail fast with guidance instead of OOMing mid-run in the
            # replicated path (the reference's enforce culture,
            # debug.h:144-191): a single chip cannot hold the n² K
            # working set this run needs
            raise RuntimeError(
                f"kinship working set (3×{n_individuals}²×{itemsize}B "
                f"= {3 * k_bytes / (1 << 30):.1f} GiB) exceeds one "
                f"chip's HBM ({hbm_bytes_per_chip() / (1 << 30):.1f} "
                "GiB) and only one device is visible. Options: run on "
                "a multi-chip slice (the 2-D snp×ind mesh shards K "
                "automatically, or set GEMMA_TPU_MESH=snp=A,ind=B), "
                "use float32 (-precision float32), or raise "
                "GEMMA_TPU_HBM_GB if this chip has more memory.")
        return None
    if 3 * k_bytes <= hbm_bytes_per_chip():
        return None
    # smallest power-of-two ind axis that fits 3 K-shards per chip
    b = 2
    while (b < n_dev
           and 3 * k_bytes // b > hbm_bytes_per_chip()):
        b *= 2
    b = min(b, n_dev)
    a = n_dev // b
    return make_mesh(a * b, axis_names=("snp", "ind"), shape=(a, b))
