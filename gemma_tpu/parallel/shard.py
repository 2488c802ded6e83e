"""SNP-axis sharded kernels via shard_map.

The moral equivalent of the reference's 20k-SNP dgemm batching
(lmm.cpp:1499, gemma_io.cpp:1553), spread over a device mesh:

  * kinship: each device accumulates X_shard' X_shard for its SNP
    shard; one psum over the "snp" axis produces the full n×n partial
    update (a ring reduce over ICI).
  * association: rotation U'x and the whole per-SNP REML/Wald pipeline
    run on each device's SNP shard independently; outputs come back
    SNP-sharded and are gathered on the host in file order.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gemma_tpu.models.lmm.engine import assoc_block_impl
from gemma_tpu.ops.kinship import center_genotype_block


def sharded_kinship_partial(mesh: Mesh, scale: bool = False):
    """Returns jitted fn(K, raw_block) with raw_block SNP-sharded.

    raw_block: (S, n) dosages (NaN missing), S divisible by the mesh
    size; K: (n, n) replicated accumulator.
    """

    def local_update(K, raw):
        x = center_genotype_block(raw.astype(K.dtype), scale)
        partial = jax.lax.dot_general(
            x, x, (((0,), (0,)), ((), ())), preferred_element_type=K.dtype)
        return K + jax.lax.psum(partial, "snp")

    fn = shard_map(
        local_update, mesh=mesh,
        in_specs=(P(), P("snp", None)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


def sharded_rotate_and_assoc(mesh: Mesh, n_cvt: int, mode: int,
                             l_min: float = 1e-5, l_max: float = 1e5,
                             n_region: int = 10):
    """Returns jitted fn(eval, UtW, Uty, U, X_block, l_mle_null,
    logl_mle_H0) with X_block SNP-sharded: rotation + association on
    each device's shard, outputs SNP-sharded."""

    def local(eval_, UtW, Uty, U, X_shard, l_mle_null, logl_mle_H0):
        Utx = jnp.matmul(X_shard, U, preferred_element_type=X_shard.dtype)
        return assoc_block_impl(
            eval_, UtW, Uty, Utx, l_mle_null, logl_mle_H0,
            n_cvt=n_cvt, mode=mode, l_min=l_min, l_max=l_max,
            n_region=n_region)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("snp", None), P(), P()),
        out_specs=P("snp"),
        check_vma=False,
    )
    return jax.jit(fn)
