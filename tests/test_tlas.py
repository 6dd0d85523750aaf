"""Two-level BVH (TLAS over cached per-mesh BLASes, bvh/tlas.py).

Reference behavior being matched: a node transform / animation rebuilds only
the top-level structure while per-mesh GASes persist
(rendercore_optix7/rendercore.cpp:387-428, core_mesh.cpp:36-133); traversal
results are identical to a from-scratch single-level build.
"""
import numpy as np
import jax
import jax.numpy as jnp

from lighthouse2_tpu.bvh.builder import build_sah_bvh
from lighthouse2_tpu.bvh.tlas import compose_two_level, transform_aabbs
from lighthouse2_tpu.bvh.traverse import device_bvh_from_flat, bvh_intersect
from lighthouse2_tpu.core.geometry import intersect_bruteforce, normalize
from lighthouse2_tpu.scene.host_scene import HostScene
from lighthouse2_tpu.scene.host_mesh import HostMesh

from tests.test_bvh import random_tris, check_invariants


def _mat(translate=(0, 0, 0), yaw=0.0, scale=1.0):
    c, s = np.cos(yaw), np.sin(yaw)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]],
                         np.float32) * scale
    m[:3, 3] = translate
    return m


def test_transform_aabbs_conservative():
    rng = np.random.RandomState(0)
    bmin = rng.randn(20, 3).astype(np.float32)
    bmax = bmin + np.abs(rng.randn(20, 3)).astype(np.float32)
    m = _mat((1, -2, 3), yaw=0.7, scale=1.3)
    wmin, wmax = transform_aabbs(bmin, bmax, m)
    # every transformed corner must lie inside the conservative box
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                corner = np.stack([
                    np.where(cx, bmax[:, 0], bmin[:, 0]),
                    np.where(cy, bmax[:, 1], bmin[:, 1]),
                    np.where(cz, bmax[:, 2], bmin[:, 2])], -1)
                w = corner @ m[:3, :3].T + m[:3, 3]
                assert (w >= wmin - 1e-4).all() and (w <= wmax + 1e-4).all()


def _compose_world(n_tris=160, n_inst=3, seed=2):
    v0, v1, v2 = random_tris(n_tris, seed=seed, spread=2.0)
    blas = build_sah_bvh(v0, v1, v2)
    mats = [_mat((6 * i - 6, 0.5 * i, 2 * i), yaw=0.4 * i, scale=1 + 0.2 * i)
            for i in range(n_inst)]
    entries = [(blas, m, i * n_tris) for i, m in enumerate(mats)]
    flat = compose_two_level(entries)
    wp = [np.concatenate([v @ m[:3, :3].T + m[:3, 3] for m in mats], 0)
          for v in (v0, v1, v2)]
    return flat, wp[0], wp[1], wp[2]


def test_compose_invariants():
    flat, w0, w1, w2 = _compose_world()
    n = w0.shape[0]
    assert flat["n_prims"] == n
    assert sorted(flat["prim"].tolist()) == list(range(n))
    assert flat["count"].sum() == n
    check_invariants(flat, w0, w1, w2)


def test_compose_traversal_matches_bruteforce():
    flat, w0, w1, w2 = _compose_world()
    bvh = device_bvh_from_flat(flat, w0, w1, w2)
    jv0 = jnp.asarray(w0)
    je1, je2 = jnp.asarray(w1 - w0), jnp.asarray(w2 - w0)
    rng = np.random.RandomState(5)
    o = jnp.asarray(rng.randn(256, 3).astype(np.float32) * 6)
    d = normalize(jnp.asarray(rng.randn(256, 3).astype(np.float32)))
    t, p, u, v = jax.jit(
        lambda o, d: bvh_intersect(o, d, bvh, jv0, je1, je2))(o, d)
    tb, pb, ub, vb = intersect_bruteforce(o, d, jv0, je1, je2)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(pb))
    np.testing.assert_allclose(np.asarray(t), np.asarray(tb), rtol=1e-4)


def _two_mesh_scene():
    scene = HostScene()
    m = scene.add_material(color=(0.7, 0.7, 0.7))
    scene.add_quad((0, 1, 0), (0, 0, 0), 8.0, 8.0, m)
    scene.add_quad((0, 0, 1), (0, 1, -2), 2.0, 2.0, m)
    scene.add_instance(0)
    n1 = scene.add_instance(1, _mat((1.5, 0.5, 0)))
    scene.add_instance(1, _mat((-1.5, 1.0, 0), yaw=0.8))
    scene.add_point_light((0, 3, 0), (20, 20, 20))
    return scene, n1


def test_blas_cache_and_counters():
    scene, n1 = _two_mesh_scene()
    scene.sync(rebuild_bvh=True)
    assert scene.build_stats == {"blas_builds": 2, "tlas_composes": 1}
    # moving one instance: TLAS recompose only, no BLAS rebuild
    scene.set_node_transform(n1, _mat((2.5, 0.5, 0.5), yaw=0.3))
    scene.sync(rebuild_bvh=True)
    assert scene.build_stats == {"blas_builds": 2, "tlas_composes": 2}


def test_two_level_matches_single_level():
    """Composed two-level tree finds the same hits as a from-scratch SAH
    build over the flattened world triangles."""
    scene, _ = _two_mesh_scene()
    ds = scene.sync(rebuild_bvh=True)
    w0, w1, w2 = (np.asarray(ds.tris.v0), np.asarray(ds.tris.v0 + ds.tris.e1),
                  np.asarray(ds.tris.v0 + ds.tris.e2))
    jv0, je1, je2 = ds.tris.v0, ds.tris.e1, ds.tris.e2
    rng = np.random.RandomState(9)
    o = jnp.asarray(rng.randn(200, 3).astype(np.float32) * 3 + (0, 1, 0))
    d = normalize(jnp.asarray(rng.randn(200, 3).astype(np.float32)))

    t2, p2, _, _ = jax.jit(
        lambda o, d: bvh_intersect(o, d, ds.bvh, jv0, je1, je2))(o, d)
    flat1 = build_sah_bvh(w0, w1, w2)
    bvh1 = device_bvh_from_flat(flat1, w0, w1, w2)
    t1, p1, _, _ = jax.jit(
        lambda o, d: bvh_intersect(o, d, bvh1, jv0, je1, je2))(o, d)
    np.testing.assert_array_equal(np.asarray(p2), np.asarray(p1))
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t1), rtol=1e-4)
