"""Sampling warp statistics."""
import numpy as np
import jax.numpy as jnp

from lighthouse2_tpu.core import sampling


def test_cosine_hemisphere():
    rng = np.random.RandomState(0)
    r0 = jnp.asarray(rng.rand(20000).astype(np.float32))
    r1 = jnp.asarray(rng.rand(20000).astype(np.float32))
    v = np.asarray(sampling.cosine_hemisphere(r0, r1))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-4)
    assert (v[:, 2] >= 0).all()
    # E[cos theta] = 2/3 for cosine-weighted
    np.testing.assert_allclose(v[:, 2].mean(), 2.0 / 3.0, atol=0.01)


def test_random_barycentrics_uniform():
    rng = np.random.RandomState(1)
    r = jnp.asarray(rng.rand(20000).astype(np.float32))
    u, v = sampling.random_barycentrics(r)
    u, v = np.asarray(u), np.asarray(v)
    w = 1.0 - u - v
    assert (u >= -1e-5).all() and (v >= -1e-5).all() and (w >= -1e-5).all()
    # uniform over triangle: E[u] = E[v] = E[w] = 1/3
    np.testing.assert_allclose([u.mean(), v.mean(), w.mean()], [1 / 3] * 3,
                               atol=0.01)
    # Var[u] = 1/18 for uniform barycentric
    np.testing.assert_allclose(u.var(), 1 / 18, atol=0.005)


def test_uniform_sphere():
    rng = np.random.RandomState(2)
    r0 = jnp.asarray(rng.rand(20000).astype(np.float32))
    r1 = jnp.asarray(rng.rand(20000).astype(np.float32))
    v = np.asarray(sampling.uniform_sphere(r0, r1))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-4)
    np.testing.assert_allclose(v.mean(0), [0, 0, 0], atol=0.02)
