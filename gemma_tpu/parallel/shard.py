"""SNP-axis sharded kernels via shard_map.

The moral equivalent of the reference's 20k-SNP dgemm batching
(lmm.cpp:1499, gemma_io.cpp:1553), spread over a device mesh:

  * kinship: each device accumulates X_shard' X_shard for its SNP
    shard; one psum over the "snp" axis produces the full n×n partial
    update (a ring reduce over ICI).
  * association: imputation, rotation U'x and the whole per-SNP
    REML/Wald pipeline run on each device's SNP shard independently;
    outputs come back SNP-sharded and are gathered on the host in
    file order.

These are the PRODUCTION kernels: run_gk/run_lmm call them through
`default_mesh()` for every block, on one chip or many (a 1-device
mesh traces to the plain single-chip program).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gemma_tpu.models.lmm.engine import assoc_block_impl
from gemma_tpu.ops.kinship import center_genotype_block
from gemma_tpu.ops.pack2 import unpack_bed


def _maybe_unpack(raw, n: int):
    """uint8 blocks are the 2-bit packed wire (ops/pack2): decode to
    the int8 dosage layout; int8/float blocks pass through."""
    if raw.dtype == jnp.uint8:
        return unpack_bed(raw, n)
    return raw


def impute_rows(x, dtype):
    """Per-SNP mean imputation on device, shard-safe (each row is
    whole on its device).  Integer input: missing = negative (the int8
    wire encoding); float input: missing = NaN.  Matches
    lmm.cpp:1589-1618 semantics."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        miss = x < 0
        xf = x.astype(dtype)
    else:
        miss = jnp.isnan(x)
        xf = x.astype(dtype)
    n_obs = jnp.maximum(jnp.sum(~miss, axis=1), 1)
    mean = jnp.sum(jnp.where(miss, 0.0, xf), axis=1) / n_obs
    return jnp.where(miss, mean[:, None], xf)


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


@functools.lru_cache(maxsize=None)
def assoc_pipeline(mesh: Mesh, n_cvt: int, mode: int,
                   l_min: float = 1e-5, l_max: float = 1e5,
                   n_region: int = 10):
    """The full production association step, cached per signature:
    fn(eval, UtW, Uty, U, X_raw, l_mle_null, logl_mle_H0) where X_raw
    is an UNIMPUTED (S, n) block — int8 with -1 missing (the .bed wire
    format) or float with NaN — SNP-sharded over the mesh.  Each
    device imputes, rotates and runs the batched REML/Wald pipeline on
    its shard (LMM::Analyze body, lmm.cpp:1474-1658)."""

    def local(eval_, UtW, Uty, U, X_raw, l_mle_null, logl_mle_H0):
        x = impute_rows(_maybe_unpack(X_raw, U.shape[0]), eval_.dtype)
        Utx = jnp.matmul(x, U, preferred_element_type=eval_.dtype)
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


@functools.lru_cache(maxsize=None)
def assoc_pipeline_2d(mesh: Mesh, n_cvt: int, mode: int,
                      l_min: float = 1e-5, l_max: float = 1e5,
                      n_region: int = 10):
    """Association step for the 2-D (snp × ind) mesh, where U comes out
    of the sharded eigendecomposition ROW-SHARDED over "ind" and must
    never be all-gathered (at biobank n the replicated U is exactly the
    n² buffer the n-axis scale-out exists to avoid — the 1-D
    assoc_pipeline's in_spec P() would do that gather).

    fn(eval, UtW, Uty, U, X_raw, l_mle_null, logl_mle_H0):
      * X_raw (S, n) SNP-sharded (int8 −1-missing or float NaN),
      * U (n, n) ind-sharded;
      * rotation: each device contracts its U row block against its
        SNP shard's matching columns, one psum over "ind" completes
        U'x (GSPMD emits this from the constraints);
      * Utx is then re-sharded over BOTH axes so the per-SNP
        REML/Wald pipeline runs on S/(snp·ind) lanes per device (no
        redundant compute across the ind axis);
      * outputs come back sharded over ("snp", "ind") on the SNP axis.

    jit + sharding constraints rather than shard_map: the layouts are
    uneven-shape tolerant and GSPMD chooses the collective placement.
    """
    from jax.sharding import NamedSharding

    snp_sh = NamedSharding(mesh, P("snp", None))
    ind_sh = NamedSharding(mesh, P("ind", None))
    both_sh = NamedSharding(mesh, P(("snp", "ind"), None))
    out_sh = NamedSharding(mesh, P(("snp", "ind")))

    def fn(eval_, UtW, Uty, U, X_raw, l_mle_null, logl_mle_H0):
        x = impute_rows(_maybe_unpack(X_raw, U.shape[0]), eval_.dtype)
        x = jax.lax.with_sharding_constraint(x, snp_sh)
        U = jax.lax.with_sharding_constraint(U, ind_sh)
        Utx = jnp.matmul(x, U, preferred_element_type=eval_.dtype)
        Utx = jax.lax.with_sharding_constraint(Utx, both_sh)
        st = assoc_block_impl(
            eval_, UtW, Uty, Utx, l_mle_null, logl_mle_H0,
            n_cvt=n_cvt, mode=mode, l_min=l_min, l_max=l_max,
            n_region=n_region)
        return jax.tree.map(
            lambda o: jax.lax.with_sharding_constraint(o, out_sh), st)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def kinship_2d_pipeline(mesh: Mesh, scale: bool, n_total: int | None = None):
    """2-D (snp × ind) kinship accumulation: K itself is row-sharded
    over the "ind" axis so the n×n accumulator never has to fit one
    chip's HBM (the n-axis scaling plan, SURVEY §5.7) — each device
    holds K[rows_of_my_ind_shard, :] and accumulates
    X_shard[:, my_rows]' X_shard for its SNP shard; one psum over
    "snp" merges the SNP partials.  Genotype blocks arrive SNP-sharded
    with full rows (centering is a per-row reduction), which is cheap:
    a block is (S, n) while K is (n, n).

    Returns jitted fn(K, raw_block): K (n, n) laid out P("ind", None),
    raw_block (S, n) SNP-sharded — int8 with negative missing (the
    .bed wire) or float with NaN.  n and S must divide the respective
    mesh axis sizes; run_gk pads n with all-missing columns (they
    center to exact zeros and the driver slices them off) and S with
    all-missing rows.  `n_total` is the TRUE individual count (pre-
    padding) fed to the GEMMA variance formula — without it, -gk 2
    would standardize against n_pad.
    """

    def local_update(K, raw):
        # K local: (n/ind, n); raw local: (S/snp, n)
        raw = _maybe_unpack(raw, K.shape[1])
        if jnp.issubdtype(raw.dtype, jnp.integer):
            raw = jnp.where(raw < 0, jnp.nan, raw.astype(K.dtype))
        x = center_genotype_block(raw.astype(K.dtype), scale,
                                  n_total=n_total)
        i = jax.lax.axis_index("ind")
        rows = jax.lax.dynamic_slice_in_dim(
            x, i * K.shape[0], K.shape[0], axis=1)     # (S/snp, n/ind)
        partial = jax.lax.dot_general(
            rows, x, (((0,), (0,)), ((), ())),
            preferred_element_type=K.dtype)            # (n/ind, n)
        return K + jax.lax.psum(partial, "snp")

    fn = shard_map(
        local_update, mesh=mesh,
        in_specs=(P("ind", None), P("snp", None)),
        out_specs=P("ind", None),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def kinship_pipeline(mesh: Mesh, scale: bool, dtype_name: str):
    """Production kinship update, cached per signature:
    fn(K, raw_block) — see sharded_kinship_partial.  raw_block may be
    float (NaN missing) or int8 (negative missing)."""

    def local_update(K, raw):
        raw = _maybe_unpack(raw, K.shape[1])
        if jnp.issubdtype(raw.dtype, jnp.integer):
            raw = jnp.where(raw < 0, jnp.nan, raw.astype(K.dtype))
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
