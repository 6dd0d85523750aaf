"""ClusterBVH + pallas packet-trace kernel tests (render/kernels/trace.py).

The kernel runs in pallas interpret mode on the CPU test backend — same
program, executed without Mosaic — and must agree exactly with the lockstep
JAX traversal (which itself is validated against brute force in test_bvh.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lighthouse2_tpu.bvh.builder import build_sah_bvh
from lighthouse2_tpu.bvh.traverse import (
    device_bvh_from_flat, bvh_intersect, bvh_occluded)
from lighthouse2_tpu.bvh.clusters import cut_clusters, build_cluster_bvh
from lighthouse2_tpu.render.kernels.trace import trace_cluster_bvh, BLOCK
from lighthouse2_tpu.core.geometry import BIG_T, normalize


def _scene(n_tris, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-1, 1, (n_tris, 3)).astype(np.float32)
    v0 = c + rng.uniform(-0.1, 0.1, (n_tris, 3)).astype(np.float32)
    v1 = c + rng.uniform(-0.1, 0.1, (n_tris, 3)).astype(np.float32)
    v2 = c + rng.uniform(-0.1, 0.1, (n_tris, 3)).astype(np.float32)
    return v0, v1, v2


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = normalize(jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)))
    return o, d


def test_cluster_cut_covers_all_prims():
    v0, v1, v2 = _scene(777, seed=2)
    cb = build_cluster_bvh(v0, v1, v2)
    prims = np.asarray(cb.tiles[:, 9, :]).ravel()       # ROW_PRIM
    real = np.sort(prims[prims >= 0]).astype(np.int64)
    np.testing.assert_array_equal(real, np.arange(777))
    # skip links: every node's skip target is > its own index, <= n_nodes
    meta = np.asarray(cb.meta)
    assert (meta[:, 0] > np.arange(cb.n_nodes)).all()
    assert (meta[:, 0] <= cb.n_nodes).all()


def test_cluster_trace_matches_lockstep():
    v0, v1, v2 = _scene(500)
    flat = build_sah_bvh(v0, v1, v2)
    bvh = device_bvh_from_flat(flat, v0, v1, v2)
    cb = cut_clusters(flat, v0, v1, v2)
    o, d = _rays(2048)
    t0, p0, u0, w0 = bvh_intersect(o, d, bvh)
    t1, p1, u1, w1 = trace_cluster_bvh(o, d, cb, BIG_T, interpret=True)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    m = np.asarray(p0) >= 0
    np.testing.assert_allclose(np.asarray(t0)[m], np.asarray(t1)[m],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u0)[m], np.asarray(u1)[m],
                               atol=1e-5)


def test_cluster_anyhit_matches_lockstep():
    v0, v1, v2 = _scene(300, seed=4)
    flat = build_sah_bvh(v0, v1, v2)
    bvh = device_bvh_from_flat(flat, v0, v1, v2)
    cb = cut_clusters(flat, v0, v1, v2)
    o, d = _rays(1024, seed=5)
    tmax = jnp.full((1024,), 1.5, jnp.float32)
    occ0 = bvh_occluded(o, d, tmax, bvh)
    occ1 = trace_cluster_bvh(o, d, cb, tmax, anyhit=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occ1))


def test_cluster_dead_lanes_miss():
    """tmax<=0 lanes (masked wavefront lanes) must return prim=-1/unoccluded
    without touching the scene."""
    v0, v1, v2 = _scene(64, seed=6)
    cb = build_cluster_bvh(v0, v1, v2)
    o, d = _rays(512, seed=7)
    tmax = jnp.where(jnp.arange(512) % 2 == 0, BIG_T, 0.0)
    t, p, u, w = trace_cluster_bvh(o, d, cb, tmax, interpret=True)
    assert (np.asarray(p)[1::2] == -1).all()
    occ = trace_cluster_bvh(o, d, cb, tmax, anyhit=True, interpret=True)
    assert not np.asarray(occ)[1::2].any()


def test_cluster_nonmultiple_block_padding():
    """Ray counts that don't fill a 1024-ray block are padded correctly."""
    v0, v1, v2 = _scene(100, seed=8)
    flat = build_sah_bvh(v0, v1, v2)
    bvh = device_bvh_from_flat(flat, v0, v1, v2)
    cb = cut_clusters(flat, v0, v1, v2)
    n = BLOCK + 37
    o, d = _rays(n, seed=9)
    t0, p0, _, _ = bvh_intersect(o, d, bvh)
    t1, p1, _, _ = trace_cluster_bvh(o, d, cb, BIG_T, interpret=True)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
