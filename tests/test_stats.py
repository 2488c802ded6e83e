import numpy as np
import scipy.stats
import jax.numpy as jnp

from gemma_tpu.ops.stats import f_sf, chisq_sf, normal_cdf


def test_f_sf_matches_scipy():
    x = np.array([0.0, 0.5, 1.0, 2.3, 10.0, 50.0])
    for df2 in [5.0, 100.0, 1407.0]:
        ours = np.asarray(f_sf(jnp.asarray(x, jnp.float64), 1.0, df2))
        ref = scipy.stats.f.sf(x, 1, df2)
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_f_sf_multi_df1():
    x = np.array([0.3, 1.7, 4.2])
    ours = np.asarray(f_sf(jnp.asarray(x, jnp.float64), 3.0, 421.0))
    ref = scipy.stats.f.sf(x, 3, 421)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)


def test_chisq_sf_matches_scipy():
    x = np.array([-1.0, 0.0, 0.3, 1.0, 5.0, 25.0])
    ours = np.asarray(chisq_sf(jnp.asarray(x, jnp.float64), 1.0))
    ref = scipy.stats.chi2.sf(np.maximum(x, 0.0), 1)
    ref[x <= 0] = 1.0
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-300)


def test_normal_cdf():
    x = np.array([-2.0, 0.0, 1.3])
    ours = np.asarray(normal_cdf(jnp.asarray(x, jnp.float64), 1.5))
    ref = scipy.stats.norm.cdf(x, scale=1.5)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)
