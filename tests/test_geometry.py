"""Geometry primitive tests (Möller–Trumbore, AABB, ONB, Fresnel)."""
import numpy as np
import jax.numpy as jnp

from lighthouse2_tpu.core import geometry as g


def test_intersect_tri_basic():
    o = jnp.array([[0.0, 0.0, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    v0 = jnp.array([[-1.0, -1.0, 0.0]])
    e1 = jnp.array([[2.0, 0.0, 0.0]])
    e2 = jnp.array([[1.0, 2.0, 0.0]])
    t, u, v, hit = g.intersect_tri(o, d, v0, e1, e2)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-6)


def test_intersect_tri_miss_and_backface():
    o = jnp.array([[0.0, 0.0, 1.0], [5.0, 5.0, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    v0 = jnp.array([[-1.0, -1.0, 0.0]] * 2)
    e1 = jnp.array([[2.0, 0.0, 0.0]] * 2)
    e2 = jnp.array([[1.0, 2.0, 0.0]] * 2)
    t, u, v, hit = g.intersect_tri(o, d, v0, e1, e2)
    assert bool(hit[0]) and not bool(hit[1])
    # two-sided: flip winding still hits (Möller–Trumbore |a| test)
    t2, _, _, hit2 = g.intersect_tri(o, -d * jnp.array([[1.0], [1.0]]), v0, e1, e2)
    assert not bool(hit2[0])


def test_bruteforce_matches_single():
    rng = np.random.RandomState(1)
    v0 = jnp.asarray(rng.randn(50, 3).astype(np.float32))
    e1 = jnp.asarray(rng.randn(50, 3).astype(np.float32))
    e2 = jnp.asarray(rng.randn(50, 3).astype(np.float32))
    o = jnp.asarray(rng.randn(20, 3).astype(np.float32) * 3)
    d = g.normalize(jnp.asarray(rng.randn(20, 3).astype(np.float32)))
    t, p, u, v = g.intersect_bruteforce(o, d, v0, e1, e2, chunk=16)
    # verify against O(N*T) dense computation
    td, ud, vd, hd = g.intersect_tri(
        o[:, None], d[:, None], v0[None], e1[None], e2[None])
    td = np.where(np.asarray(hd), np.asarray(td), np.inf)
    best = td.min(1)
    miss = ~np.isfinite(best)
    np.testing.assert_allclose(
        np.where(miss, 0, np.asarray(t)), np.where(miss, 0, best), rtol=1e-5)
    assert np.array_equal(np.asarray(p) < 0, miss)


def test_occlusion_bruteforce():
    v0 = jnp.array([[-1.0, -1.0, 0.0]])
    e1 = jnp.array([[2.0, 0.0, 0.0]])
    e2 = jnp.array([[1.0, 2.0, 0.0]])
    o = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    occ = g.occluded_bruteforce(o, d, jnp.array([5.0, 5.0]), v0, e1, e2)
    assert bool(occ[0]) and not bool(occ[1])
    # tmax shorter than the hit → unoccluded
    occ2 = g.occluded_bruteforce(o, d, jnp.array([0.5, 0.5]), v0, e1, e2)
    assert not bool(occ2[0])


def test_onb_orthonormal():
    rng = np.random.RandomState(0)
    n = g.normalize(jnp.asarray(rng.randn(100, 3).astype(np.float32)))
    t, b = g.onb(n)
    np.testing.assert_allclose(np.asarray(g.dot(t, n)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.dot(b, n)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.dot(t, b)), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.length(t)), 1, atol=1e-5)


def test_tangent_world_roundtrip():
    rng = np.random.RandomState(0)
    n = g.normalize(jnp.asarray(rng.randn(50, 3).astype(np.float32)))
    v = g.normalize(jnp.asarray(rng.randn(50, 3).astype(np.float32)))
    vt = g.world_to_tangent(v, n)
    v2 = g.tangent_to_world(vt, n)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)


def test_reflect_refract():
    d = g.normalize(jnp.array([[1.0, -1.0, 0.0]]))
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = g.reflect(d, n)
    np.testing.assert_allclose(np.asarray(r), [[0.70710678, 0.70710678, 0.0]],
                               atol=1e-6)
    # refraction straight through at eta=1
    t, tir = g.refract(d, n, jnp.array([1.0]))
    np.testing.assert_allclose(np.asarray(t), np.asarray(d), atol=1e-6)
    assert not bool(tir[0])


def test_fresnel_limits():
    # normal incidence at eta=1.5: ((1-1.5)/(2.5))^2 ≈ 0.04
    f = g.fresnel_dielectric_exact(jnp.array([1.0]), jnp.array([1.0 / 1.5]))
    np.testing.assert_allclose(float(f[0]), 0.04, atol=1e-3)
    # grazing → 1
    f = g.fresnel_dielectric_exact(jnp.array([0.0]), jnp.array([1.0 / 1.5]))
    np.testing.assert_allclose(float(f[0]), 1.0, atol=1e-5)


def test_safe_origin_offsets():
    o = jnp.zeros((1, 3))
    # grazing ray (perpendicular to the normal) → offset rides the ray
    r = jnp.array([[1.0, 0.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    so = g.safe_origin(o, r, n, jnp.float32(1e-4))
    np.testing.assert_allclose(np.asarray(so), [[1e-4, 0, 0]], atol=1e-9)
    # ray along the normal → offset rides the normal
    so2 = g.safe_origin(o, n, n, jnp.float32(1e-4))
    np.testing.assert_allclose(np.asarray(so2), [[0, 1e-4, 0]], atol=1e-9)
