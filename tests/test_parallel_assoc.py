"""SNP-sharded kernels reproduce the single-device results exactly
(the collectives only partition work, never change the math)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gemma_tpu.parallel.mesh import make_mesh
from gemma_tpu.parallel.shard import (sharded_kinship_partial,
                                      sharded_rotate_and_assoc)
from gemma_tpu.models.lmm.engine import assoc_block_impl
from gemma_tpu.ops.kinship import center_genotype_block


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_assoc_matches_single_device():
    rng = np.random.default_rng(91)
    n, S = 128, 64
    eval_ = np.sort(np.abs(rng.gamma(1.5, 1.2, n))); eval_[:2] = 0.0
    UtW = rng.normal(0.9, 0.2, size=(n, 1))
    Uty = rng.normal(size=n) * np.sqrt(2.0 * eval_ + 1.0)
    U = np.linalg.qr(rng.normal(size=(n, n)))[0]
    X = rng.binomial(2, 0.3, size=(S, n)).astype(np.float64)

    args = (jnp.asarray(eval_), jnp.asarray(UtW), jnp.asarray(Uty))
    ref = assoc_block_impl(*args, jnp.asarray(X) @ jnp.asarray(U),
                           jnp.asarray(1.0, jnp.float64),
                           jnp.asarray(-200.0, jnp.float64),
                           n_cvt=1, mode=1)

    mesh = make_mesh(4, axis_names=("snp",))
    fn = sharded_rotate_and_assoc(mesh, n_cvt=1, mode=1)
    out = fn(*args, jnp.asarray(U), jnp.asarray(X),
             jnp.asarray(1.0, jnp.float64),
             jnp.asarray(-200.0, jnp.float64))
    np.testing.assert_allclose(np.asarray(out.p_wald),
                               np.asarray(ref.p_wald), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(out.beta),
                               np.asarray(ref.beta), rtol=1e-8)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_kinship_matches_single_device():
    rng = np.random.default_rng(92)
    n, S = 96, 64
    X = rng.binomial(2, 0.3, size=(S, n)).astype(np.float64)
    Xc = np.asarray(center_genotype_block(jnp.asarray(X), False))
    K_ref = Xc.T @ Xc

    mesh = make_mesh(4, axis_names=("snp",))
    fn = sharded_kinship_partial(mesh, scale=False)
    K = fn(jnp.zeros((n, n)), jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(K), K_ref, rtol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_kinship_2d_sharded_matches_single_device():
    """2-D (snp x ind) layout: K row-sharded over "ind" so the
    accumulator can exceed one chip's HBM; equality vs the plain
    single-device product at a shape that forces partitioning."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gemma_tpu.parallel.shard import kinship_2d_pipeline

    rng = np.random.default_rng(93)
    n, S = 64, 32                     # n splits 4-ways, S splits 2-ways
    X = rng.binomial(2, 0.3, size=(S, n)).astype(np.float64)
    X[rng.random(X.shape) < 0.05] = np.nan
    Xc = np.asarray(center_genotype_block(jnp.asarray(X), False))
    K_ref = Xc.T @ Xc

    mesh = make_mesh(8, axis_names=("snp", "ind"), shape=(2, 4))
    fn = kinship_2d_pipeline(mesh, False)
    K0 = jax.device_put(jnp.zeros((n, n)),
                        NamedSharding(mesh, P("ind", None)))
    K = fn(K0, jnp.asarray(X))
    # accumulate a second block too (streaming contract)
    K = fn(K, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(K), 2 * K_ref, rtol=1e-10)
    # the result stays row-sharded over "ind"
    shard_shapes = {s.data.shape for s in K.addressable_shards}
    assert shard_shapes == {(n // 4, n)}
