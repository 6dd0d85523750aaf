"""BVH builder invariants + traversal equivalence with brute force."""
import numpy as np
import jax
import jax.numpy as jnp

from lighthouse2_tpu.bvh.builder import build_sah_bvh
from lighthouse2_tpu.bvh.traverse import (
    build_device_bvh, bvh_intersect, bvh_occluded,
)
from lighthouse2_tpu.core.geometry import intersect_bruteforce, occluded_bruteforce, normalize


def random_tris(n, seed=0, spread=5.0):
    rng = np.random.RandomState(seed)
    c = rng.randn(n, 3).astype(np.float32) * spread
    v0 = c + rng.randn(n, 3).astype(np.float32) * 0.4
    v1 = c + rng.randn(n, 3).astype(np.float32) * 0.4
    v2 = c + rng.randn(n, 3).astype(np.float32) * 0.4
    return v0, v1, v2


def check_invariants(flat, v0, v1, v2):
    n = v0.shape[0]
    # all prims exactly once
    assert sorted(flat["prim"].tolist()) == list(range(n))
    # leaf counts sum to n
    assert flat["count"].sum() == n
    # node bounds contain their prims
    tmin = np.minimum(np.minimum(v0, v1), v2)
    tmax = np.maximum(np.maximum(v0, v1), v2)
    for ni in range(flat["n_nodes"]):
        cnt = flat["count"][ni]
        if cnt > 0:
            first = flat["left"][ni]
            prims = flat["prim"][first:first + cnt]
            assert (tmin[prims] >= flat["nmin"][ni] - 1e-4).all()
            assert (tmax[prims] <= flat["nmax"][ni] + 1e-4).all()
    # interior children bounds nested in parent
    for ni in range(flat["n_nodes"]):
        if flat["count"][ni] == 0:
            for ch in (flat["left"][ni], flat["right"][ni]):
                assert (flat["nmin"][ch] >= flat["nmin"][ni] - 1e-4).all()
                assert (flat["nmax"][ch] <= flat["nmax"][ni] + 1e-4).all()


def test_builder_invariants_small():
    v0, v1, v2 = random_tris(37, seed=3)
    check_invariants(build_sah_bvh(v0, v1, v2), v0, v1, v2)


def test_builder_invariants_larger():
    v0, v1, v2 = random_tris(3000, seed=5)
    flat = build_sah_bvh(v0, v1, v2)
    check_invariants(flat, v0, v1, v2)
    assert flat["count"].max() <= 4  # hard leaf cap


def test_builder_degenerate_identical_tris():
    # 100 identical triangles → degenerate centroids → median fallback
    v0 = np.zeros((100, 3), np.float32)
    v1 = np.tile(np.array([[1, 0, 0]], np.float32), (100, 1))
    v2 = np.tile(np.array([[0, 1, 0]], np.float32), (100, 1))
    flat = build_sah_bvh(v0, v1, v2)
    check_invariants(flat, v0, v1, v2)
    assert flat["count"].max() <= 4


def test_traversal_matches_bruteforce():
    v0, v1, v2 = random_tris(500, seed=7)
    bvh = build_device_bvh(v0, v1, v2)
    jv0, je1, je2 = jnp.asarray(v0), jnp.asarray(v1 - v0), jnp.asarray(v2 - v0)
    rng = np.random.RandomState(11)
    o = jnp.asarray(rng.randn(256, 3).astype(np.float32) * 8)
    d = normalize(jnp.asarray(rng.randn(256, 3).astype(np.float32)))
    t, p, u, v = jax.jit(
        lambda o, d: bvh_intersect(o, d, bvh, jv0, je1, je2))(o, d)
    tb, pb, ub, vb = intersect_bruteforce(o, d, jv0, je1, je2)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(pb))
    np.testing.assert_allclose(np.asarray(t), np.asarray(tb), rtol=1e-4)


def test_occlusion_matches_bruteforce():
    v0, v1, v2 = random_tris(300, seed=9)
    bvh = build_device_bvh(v0, v1, v2)
    jv0, je1, je2 = jnp.asarray(v0), jnp.asarray(v1 - v0), jnp.asarray(v2 - v0)
    rng = np.random.RandomState(13)
    o = jnp.asarray(rng.randn(200, 3).astype(np.float32) * 8)
    d = normalize(jnp.asarray(rng.randn(200, 3).astype(np.float32)))
    tmax = jnp.asarray(np.abs(rng.randn(200)).astype(np.float32) * 10)
    occ = jax.jit(lambda o, d, tm: bvh_occluded(o, d, tm, bvh, jv0, je1, je2))(o, d, tmax)
    occb = occluded_bruteforce(o, d, tmax, jv0, je1, je2)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occb))


def test_single_triangle_bvh():
    v0 = np.array([[0, 0, 0]], np.float32)
    v1 = np.array([[1, 0, 0]], np.float32)
    v2 = np.array([[0, 1, 0]], np.float32)
    bvh = build_device_bvh(v0, v1, v2)
    o = jnp.array([[0.2, 0.2, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    t, p, u, v = bvh_intersect(o, d, bvh, jnp.asarray(v0),
                               jnp.asarray(v1 - v0), jnp.asarray(v2 - v0))
    assert int(p[0]) == 0
    np.testing.assert_allclose(float(t[0]), 1.0, atol=1e-5)


def test_native_builder_matches_numpy():
    """The C++ builder (native/bvh_builder.cpp) and the numpy builder emit
    interchangeable trees: identical node counts, structurally valid, and
    identical closest-hit results."""
    from lighthouse2_tpu import native
    from lighthouse2_tpu.bvh.builder import build_sah_bvh_numpy
    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    v0, v1, v2 = random_tris(500, seed=21)
    rn = native.build_sah_bvh_native(v0, v1, v2)
    rp = build_sah_bvh_numpy(v0, v1, v2)
    assert rn["n_nodes"] == rp["n_nodes"]
    # every prim exactly once
    assert sorted(rn["prim"].tolist()) == list(range(500))
    # identical hits through the same traversal kernel
    from lighthouse2_tpu.bvh.traverse import DeviceBVH
    import numpy as _np

    def to_dev(r):
        nbox = _np.concatenate([r["nmin"].T, r["nmax"].T], 0).astype(_np.float32)
        e1 = (v1 - v0).astype(_np.float32)
        e2 = (v2 - v0).astype(_np.float32)
        tri9 = _np.concatenate([v0.T, e1.T, e2.T], 0).astype(_np.float32)
        return DeviceBVH(nbox=jnp.asarray(nbox), left=jnp.asarray(r["left"]),
                         right=jnp.asarray(r["right"]),
                         count=jnp.asarray(r["count"]),
                         prim=jnp.asarray(r["prim"]), tri9=jnp.asarray(tri9),
                         max_leaf=4)

    rng = np.random.RandomState(31)
    o = jnp.asarray(rng.randn(128, 3).astype(np.float32) * 8)
    d = normalize(jnp.asarray(rng.randn(128, 3).astype(np.float32)))
    tn, pn, _, _ = bvh_intersect(o, d, to_dev(rn))
    tp, pp, _, _ = bvh_intersect(o, d, to_dev(rp))
    np.testing.assert_array_equal(np.asarray(pn), np.asarray(pp))
    np.testing.assert_allclose(np.asarray(tn), np.asarray(tp), rtol=1e-5)
