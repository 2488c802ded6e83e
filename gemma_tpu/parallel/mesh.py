"""Device mesh construction.

The reference is single-process with threaded BLAS (SURVEY.md §2.2);
all distribution here is new design.  The natural axes for mixed-model
GWAS are:

  * "snp" — data parallelism over the SNP axis: per-SNP association
    work and kinship partial sums are embarrassingly parallel; results
    merge with all_gather (assoc tables) or psum (K = sum_s x_s x_s').
  * "ind" — individual-axis model parallelism for the n×n kinship /
    eigendecomposition at biobank scale (2-D sharded matmuls; the
    distributed eigensolver lives in parallel/eigh.py).

Multi-host: `jax.distributed.initialize()` before mesh construction;
collectives ride ICI within a slice and DCN across hosts, chosen by
XLA from the mesh layout.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


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
