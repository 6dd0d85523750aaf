"""ClusterBVH + pallas packet-trace kernel tests (render/kernels/trace.py).

The kernel runs in pallas interpret mode on the CPU test backend — same
program, executed without Mosaic — and must agree with the lockstep JAX
traversal (which itself is validated against brute force in test_bvh.py).
Round 3: the kernel returns the winning triangle's full shading payload
(extracted by one-hot matmul); these tests pin the payload contract too.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lighthouse2_tpu.bvh.builder import build_sah_bvh
from lighthouse2_tpu.bvh.traverse import (
    device_bvh_from_flat, bvh_intersect, bvh_occluded, refine_hit_rows)
from lighthouse2_tpu.bvh.clusters import (
    cut_clusters, build_cluster_bvh, PAY_PRIM, PAY_V0, PAY_MAT, PAY_LTRI,
    PAY_N0, PAY_GEO_ROWS)
from lighthouse2_tpu.render.kernels.trace import (
    trace_cluster_bvh, bake_material_rows, BLOCK)
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


def _prim_of(payload):
    pr = np.asarray(payload[PAY_PRIM])
    return np.where(pr >= 0, pr.astype(np.int64), -1)


def test_cluster_cut_covers_all_prims():
    v0, v1, v2 = _scene(777, seed=2)
    cb = build_cluster_bvh(v0, v1, v2)
    prims = np.asarray(cb.pgeo[:, PAY_PRIM, :]).ravel()
    real = np.sort(prims[prims >= 0]).astype(np.int64)
    np.testing.assert_array_equal(real, np.arange(777))
    # skip links: every node's skip target is > its own index, <= n_nodes
    meta = np.asarray(cb.meta)            # [4, M] component-major
    assert (meta[0] > np.arange(cb.n_nodes)).all()
    assert (meta[0] <= cb.n_nodes).all()
    # interior nodes: right child inside (id+1, skip); left child is id+1;
    # the right child's subtree ends exactly at the parent's skip
    interior = meta[1] < 0
    ids = np.arange(cb.n_nodes)
    assert (meta[2][interior] > ids[interior] + 1).all()
    assert (meta[2][interior] < meta[0][interior]).all()
    assert (meta[0][meta[2][interior]] == meta[0][interior]).all()
    assert (~interior | ((meta[3] >= 0) & (meta[3] < 3))).all()
    assert cb.max_depth >= 2


def test_cluster_trace_matches_lockstep():
    v0, v1, v2 = _scene(500)
    flat = build_sah_bvh(v0, v1, v2)
    bvh = device_bvh_from_flat(flat, v0, v1, v2)
    cb = cut_clusters(flat, dict(v0=v0, v1=v1, v2=v2))
    o, d = _rays(2048)
    t0, p0, u0, w0 = bvh_intersect(o, d, bvh)
    t1, payload = trace_cluster_bvh(o, d, cb, BIG_T, interpret=True)
    p1 = _prim_of(payload)
    np.testing.assert_array_equal(np.asarray(p0), p1)
    m = np.asarray(p0) >= 0
    np.testing.assert_allclose(np.asarray(t0)[m], np.asarray(t1)[m],
                               rtol=2e-4)
    # refined (u,v) from the payload rows must match the lockstep hit
    _, u1, v1_, _ = refine_hit_rows(o, d, jnp.asarray(p1, jnp.int32),
                                    payload[PAY_V0:PAY_V0 + 9])
    np.testing.assert_allclose(np.asarray(u0)[m], np.asarray(u1)[m],
                               atol=1e-4)


def test_cluster_payload_rows_match_scene():
    """Extracted payload rows must be bit-exact copies of the baked tile
    data for the winning triangle (the reattach contract, render/fetch.py)."""
    v0, v1, v2 = _scene(300, seed=11)
    rng = np.random.default_rng(12)
    tri = dict(v0=v0, v1=v1, v2=v2,
               n0=rng.normal(size=v0.shape).astype(np.float32),
               mat=rng.integers(0, 5, v0.shape[0]).astype(np.int32),
               ltri=rng.integers(-1, 3, v0.shape[0]).astype(np.int32))
    cb = build_cluster_bvh(v0, v1, v2, tri=tri)
    o, d = _rays(1024, seed=13)
    t, payload = trace_cluster_bvh(o, d, cb, BIG_T, interpret=True)
    p = _prim_of(payload)
    m = p >= 0
    idx = p[m]
    np.testing.assert_array_equal(
        np.asarray(payload[PAY_V0])[m], v0[idx, 0])
    np.testing.assert_array_equal(
        np.asarray(payload[PAY_N0])[m], tri["n0"][idx, 0])
    np.testing.assert_array_equal(
        np.asarray(payload[PAY_MAT])[m], tri["mat"][idx].astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(payload[PAY_LTRI])[m], tri["ltri"][idx].astype(np.float32))


def test_cluster_material_bake_rows():
    """bake_material_rows must mirror the material pack through the tile
    mat ids, and the kernel must extract the winner's material row."""
    v0, v1, v2 = _scene(200, seed=14)
    rng = np.random.default_rng(15)
    mat = rng.integers(0, 4, v0.shape[0]).astype(np.int32)
    cb = build_cluster_bvh(v0, v1, v2, tri=dict(mat=mat))
    mpack = jnp.asarray(rng.normal(size=(22, 4)).astype(np.float32))
    paym = bake_material_rows(cb, mpack)
    o, d = _rays(512, seed=16)
    t, payload = trace_cluster_bvh(o, d, cb, BIG_T, paym=paym,
                                   interpret=True)
    p = _prim_of(payload)
    m = p >= 0
    got = np.asarray(payload[PAY_GEO_ROWS:PAY_GEO_ROWS + 22])[:, m]
    want = np.asarray(mpack)[:, mat[p[m]]]
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_cluster_anyhit_matches_lockstep():
    v0, v1, v2 = _scene(300, seed=4)
    flat = build_sah_bvh(v0, v1, v2)
    bvh = device_bvh_from_flat(flat, v0, v1, v2)
    cb = cut_clusters(flat, dict(v0=v0, v1=v1, v2=v2))
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
    t, payload = trace_cluster_bvh(o, d, cb, tmax, interpret=True)
    assert (_prim_of(payload)[1::2] == -1).all()
    occ = trace_cluster_bvh(o, d, cb, tmax, anyhit=True, interpret=True)
    assert not np.asarray(occ)[1::2].any()


def test_cluster_nonmultiple_block_padding():
    """Ray counts that don't fill a 1024-ray block are padded correctly."""
    v0, v1, v2 = _scene(100, seed=8)
    flat = build_sah_bvh(v0, v1, v2)
    bvh = device_bvh_from_flat(flat, v0, v1, v2)
    cb = cut_clusters(flat, dict(v0=v0, v1=v1, v2=v2))
    n = BLOCK + 37
    o, d = _rays(n, seed=9)
    t0, p0, _, _ = bvh_intersect(o, d, bvh)
    t1, payload = trace_cluster_bvh(o, d, cb, BIG_T, interpret=True)
    np.testing.assert_array_equal(np.asarray(p0), _prim_of(payload))


def test_cluster_multi_chunk_matches_single(monkeypatch):
    """The lax.map multi-chunk path (rays > CHUNK_BLOCKS*1024) must agree
    with the single-chunk result."""
    from lighthouse2_tpu.render.kernels import trace as TK
    v0, v1, v2 = _scene(400, seed=21)
    cb = build_cluster_bvh(v0, v1, v2)
    o, d = _rays(3 * BLOCK, seed=22)
    t1, pay1 = trace_cluster_bvh(o, d, cb, BIG_T, interpret=True)
    occ_t = jnp.full((3 * BLOCK,), 1.2, jnp.float32)
    occ1 = trace_cluster_bvh(o, d, cb, occ_t, anyhit=True, interpret=True)
    monkeypatch.setattr(TK, "CHUNK_BLOCKS", 1)
    t2, pay2 = trace_cluster_bvh(o, d, cb, BIG_T, interpret=True)
    occ2 = trace_cluster_bvh(o, d, cb, occ_t, anyhit=True, interpret=True)
    np.testing.assert_array_equal(_prim_of(pay1), _prim_of(pay2))
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ2))
