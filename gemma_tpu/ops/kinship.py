"""Kinship (genetic relatedness) matrix accumulation.

GEMMA builds K by streaming SNPs, centering each genotype vector and
accumulating rank-20k updates `K += X_batch X_batch'` through OpenBLAS
dgemm, then scaling by 1/ns (gemma_io.cpp `BimbamKin`:1418-1597,
`PlinkKin`:1599).  Two flavours:

  * -gk 1 (centered):     x := g - mean(g)            → K = XX'/p
  * -gk 2 (standardized): x := (g - mean)/sqrt(var)   → K = ZZ'/p

Per-SNP statistics replicate BimbamKin exactly (gemma_io.cpp:1487-1538):
mean over non-missing entries, *population* variance computed with
missing values imputed at the mean, missing entries contribute 0 after
centering, and var==0 SNPs skip the 1/sqrt(var) scaling.

TPU design: blocks of SNPs live as (block, n) tensors; imputation,
centering and scaling are fused elementwise VPU work and the
accumulation `K += X'X` is a single MXU matmul per block.  Multi-chip:
shard the SNP axis, accumulate per-shard partial K, `psum` over the
mesh (see gemma_tpu.parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def center_genotype_block(raw, scale: bool, n_total: int | None = None):
    """Impute/center (optionally standardize) a (block, n) dosage block.

    `raw` holds dosages with NaN for missing.  Returns the centered
    block plus a per-SNP validity mask is NOT needed here — QC happens
    upstream; rows already excluded are passed as all-NaN and come out
    as zeros, contributing nothing to K.

    `n_total` overrides the individual count used by the GEMMA variance
    formula: callers that pad the individual axis with all-missing
    columns (the 2-D mesh path) must pass the TRUE n, else the padded
    columns count into n_total/n_miss and skew every SNP's
    standardization by sqrt(n/n_pad).
    """
    miss = jnp.isnan(raw)
    if n_total is None:
        n_total = raw.shape[1]
    n_obs = jnp.sum(~miss, axis=1)
    n_obs_safe = jnp.maximum(n_obs, 1)
    g0 = jnp.where(miss, 0.0, raw)
    mean = jnp.sum(g0, axis=1) / n_obs_safe
    x = jnp.where(miss, 0.0, raw - mean[:, None])
    if scale:
        # GEMMA: var = (sum g^2 + mean^2*n_miss)/n_total - mean^2
        sumsq = jnp.sum(g0 * g0, axis=1)
        n_miss = n_total - n_obs
        var = (sumsq + mean * mean * n_miss) / n_total - mean * mean
        inv = jnp.where(var > 0.0, 1.0 / jnp.sqrt(jnp.maximum(var, 1e-300)), 1.0)
        x = x * inv[:, None]
    return x


@functools.partial(jax.jit, static_argnames=("scale",), donate_argnums=(0,))
def kinship_update(K, raw_block, scale: bool = False):
    """K += X'X for one (block, n) raw dosage block (NaN = missing)."""
    x = center_genotype_block(raw_block.astype(K.dtype), scale)
    return K + jax.lax.dot_general(
        x, x, (((0,), (0,)), ((), ())), preferred_element_type=K.dtype
    )


class KinshipAccumulator:
    """Streaming kinship builder: feed raw dosage blocks, finalize to K/ns.

    Host code parses/streams genotypes; each `update` is one fused XLA
    program (impute+center+scale+matmul).  Block sizes should be padded
    to a fixed set of shapes to avoid recompilation — pad rows with NaN
    (they contribute nothing).

    With `mesh`, each update is SNP-sharded over the devices: every
    device accumulates its shard's partial X'X and one psum merges
    them (the multi-chip rebirth of the 20k-SNP dgemm batch,
    gemma_io.cpp:1553-1561).  Blocks may then also arrive as int8
    dosages (missing = -1, the .bed wire format).
    """

    def __init__(self, n_individuals: int, scale: bool = False,
                 dtype=jnp.float32, mesh=None):
        self.n = n_individuals
        self.scale = scale
        self.K = jnp.zeros((n_individuals, n_individuals), dtype=dtype)
        self.ns_test = 0
        self._sharded_fn = None
        if mesh is not None:
            from gemma_tpu.parallel.shard import kinship_pipeline
            self._sharded_fn = kinship_pipeline(
                mesh, scale, jnp.dtype(dtype).name)

    def update(self, raw_block: np.ndarray, n_valid: int | None = None):
        """raw_block: (block, n) with NaN missing; all-NaN rows are padding."""
        if n_valid is None:
            n_valid = int(np.sum(~np.all(np.isnan(raw_block), axis=1)))
        if self._sharded_fn is not None:
            self.K = self._sharded_fn(self.K, raw_block)
        else:
            self.K = kinship_update(self.K, raw_block, scale=self.scale)
        self.ns_test += n_valid

    def finalize(self):
        if self.ns_test == 0:
            raise ValueError("no SNPs accumulated into kinship matrix")
        return self.K / self.ns_test


def triu_chunk_bounds(n: int, itemsize: int,
                      target_bytes: int = 1 << 20) -> tuple:
    """Row ranges [(a, b), ...] covering 0..n whose packed
    upper-triangle segments are each ~target_bytes — the chunk
    granularity for overlapping the device→host transfer with text
    writing (row i contributes n - i elements)."""
    per_row = np.arange(n, 0, -1, dtype=np.int64) * itemsize
    csum = np.concatenate([[0], np.cumsum(per_row)])
    bounds = []
    a = 0
    while a < n:
        b = int(np.searchsorted(csum, csum[a] + target_bytes,
                                side="left"))
        b = max(a + 1, min(b, n))
        bounds.append((a, b))
        a = b
    return tuple(bounds)


@functools.partial(jax.jit, static_argnames=("bounds",))
def pack_triu_chunks(K, bounds: tuple):
    """Packed upper triangle of symmetric K, split at `bounds` row
    ranges, as a tuple of 1-D segments from ONE device program (one
    program load on the axon tunnel, then each segment's host copy is
    issued async so text writing of earlier rows overlaps the
    transfer of later ones).

    Row-major within a chunk: rows a..b-1, row i packed as K[i, i:].
    Index math stays on device (no O(n²) host index constants)."""
    n = K.shape[0]
    out = []
    for a, b in bounds:
        lens = n - jnp.arange(a, b, dtype=jnp.int32)     # (b-a,)
        ends = jnp.cumsum(lens)
        m_c = int((b - a) * n - (a + b - 1) * (b - a) // 2)
        k = jnp.arange(m_c, dtype=jnp.int32)
        t = jnp.searchsorted(ends, k, side="right").astype(jnp.int32)
        i = a + t
        start = ends[t] - (n - i)
        j = i + (k - start)
        out.append(K[i, j])
    return tuple(out)


def compute_kinship_blocks(block_iter, n_individuals, scale=False, dtype=jnp.float32):
    """Build K from an iterator of (raw_block, n_valid) pairs."""
    acc = KinshipAccumulator(n_individuals, scale=scale, dtype=dtype)
    for raw_block, n_valid in block_iter:
        acc.update(raw_block, n_valid)
    return acc.finalize(), acc.ns_test
