"""Scene-sharded rendering (parallel/scene_shard.py) — the instance-sharded
obligation (SURVEY §5.7/§5.8): sharded over a ("rays","scene") mesh must
produce the same image as the replicated single-chip render."""
import numpy as np
import jax
import pytest

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render.wavefront import AccumState, render_pass_jit
from lighthouse2_tpu.parallel.scene_shard import (
    make_mesh2d, render_pass_scene_sharded, shard_triangle_arrays)
from lighthouse2_tpu.scene.presets import cornell_box


def _setup(n=24):
    scene, cam = cornell_box(n, n)
    ds = scene.sync(rebuild_bvh=False)
    cfg = RenderConfig(width=n, height=n, spp_per_pass=2, max_path_length=4,
                       use_bvh=False)
    return ds, cam.get_view(), cfg


def test_shard_split_covers_all_triangles():
    ds, _, _ = _setup()
    sh = shard_triangle_arrays(ds.tris, 4)
    gid = np.asarray(sh["gid"]).ravel()
    t = ds.tris.count
    assert sorted(gid[gid >= 0].tolist()) == list(range(t))
    # padding is degenerate (e1 = e2 = 0 -> never hit)
    pad_mask = np.asarray(sh["gid"]) < 0
    e1 = np.asarray(sh["e1"])
    assert (np.abs(e1[pad_mask]) < 1e-20).all()


def test_scene_sharded_matches_replicated():
    assert jax.device_count() >= 8
    ds, view, cfg = _setup()
    st_ref, _ = render_pass_jit(ds, view, AccumState.make(cfg), cfg)
    mesh = make_mesh2d(2, 4)     # 2-way ray DP x 4-way scene sharding
    st_sh, stats = render_pass_scene_sharded(
        ds, view, AccumState.make(cfg), cfg, mesh)
    a = np.asarray(st_ref.accumulator)
    b = np.asarray(st_sh.accumulator)
    np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)
    assert int(stats["total_shadow"]) > 0


def test_scene_sharded_single_scene_shard_degenerates():
    """k=1 scene shard == pure ray DP == replicated image."""
    ds, view, cfg = _setup(16)
    st_ref, _ = render_pass_jit(ds, view, AccumState.make(cfg), cfg)
    mesh = make_mesh2d(8, 1)
    st_sh, _ = render_pass_scene_sharded(
        ds, view, AccumState.make(cfg), cfg, mesh)
    np.testing.assert_allclose(np.asarray(st_sh.accumulator),
                               np.asarray(st_ref.accumulator),
                               rtol=1e-4, atol=1e-5)


def _many_tri_scene(n=24):
    """A few-thousand-triangle scene (cornell + bumpy heightfield) so the
    per-shard BVHs are real trees, not single leaves."""
    from lighthouse2_tpu.scene.host_mesh import HostMesh
    from lighthouse2_tpu.scene.presets import cornell_box
    scene, cam = cornell_box(n, n)
    k = 24
    xs = np.linspace(-0.4, 0.4, k + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    rng = np.random.default_rng(3)
    gy = 0.12 + 0.04 * rng.standard_normal(gx.shape).astype(np.float32)
    verts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    idx = []
    for i in range(k):
        for j in range(k):
            a = i * (k + 1) + j
            b = (i + 1) * (k + 1) + j
            idx += [[a, b, a + 1], [b, b + 1, a + 1]]
    mesh = HostMesh.from_indexed_data(verts, np.asarray(idx, np.int32),
                                      material=1, name="bumpy")
    mid = scene.add_mesh(mesh)
    scene.add_instance(mid)
    ds = scene.sync(rebuild_bvh=True)
    cfg = RenderConfig(width=n, height=n, spp_per_pass=1, max_path_length=3,
                       use_bvh=True, intersector="lockstep")
    return ds, cam.get_view(), cfg


def test_scene_sharded_bvh_matches_replicated():
    """Sharded mode now traverses a per-shard BVH (VERDICT r3 #3): a
    few-thousand-tri scene sharded 4 ways must match the replicated BVH
    render."""
    assert jax.device_count() >= 8
    ds, view, cfg = _many_tri_scene()
    st_ref, _ = render_pass_jit(ds, view, AccumState.make(cfg), cfg)
    mesh = make_mesh2d(2, 4)
    st_sh, _ = render_pass_scene_sharded(
        ds, view, AccumState.make(cfg), cfg, mesh)
    np.testing.assert_allclose(np.asarray(st_sh.accumulator),
                               np.asarray(st_ref.accumulator),
                               rtol=2e-4, atol=2e-5)


def test_scene_sharded_grads_finite():
    """A sharded train step produces finite, nonzero gradients wrt the
    sharded vertex arrays AND the replicated material colors (VERDICT r3
    #3: 'reattach gradients via per-shard scatter-adds psum'd like the
    payload')."""
    import jax.numpy as jnp
    from lighthouse2_tpu.parallel.scene_shard import build_shard_bvhs
    ds, view, cfg = _setup(16)
    mesh = make_mesh2d(2, 4)
    sh0 = shard_triangle_arrays(ds.tris, 4)
    bvhs = build_shard_bvhs(ds.tris, 4)

    def loss(v0_sh, color):
        sh = dict(sh0, v0=v0_sh)
        s = ds.replace(materials=ds.materials.replace(color=color))
        st, _ = render_pass_scene_sharded(
            s, view, AccumState.make(cfg), cfg, mesh, sh=sh, shard_bvh=bvhs)
        return jnp.mean(st.accumulator[:, :3] ** 2)

    g_v0, g_col = jax.grad(loss, argnums=(0, 1))(sh0["v0"],
                                                 ds.materials.color)
    assert np.isfinite(np.asarray(g_v0)).all()
    assert np.isfinite(np.asarray(g_col)).all()
    assert float(jnp.abs(g_col).sum()) > 0.0
    assert float(jnp.abs(g_v0).sum()) > 0.0


@pytest.mark.slow
def test_scene_sharded_cluster_kernel_matches_lockstep():
    """The sharded mode's TPU hot path: per-shard ClusterBVHs traced by the
    pallas kernel (interpret mode here; VERDICT r4 #4 'wire the cluster
    kernel into scene sharding'). Must match the lockstep sharded render
    AND keep gradients flowing through the reattached payload pack."""
    import dataclasses
    import jax.numpy as jnp
    from lighthouse2_tpu.parallel.scene_shard import (
        build_shard_cluster_bvhs, _shard_pack)
    from lighthouse2_tpu.bvh import clusters as CL
    from lighthouse2_tpu.render.shading import material_pack

    assert jax.device_count() >= 8
    ds, view, cfg = _many_tri_scene(16)
    mesh = make_mesh2d(2, 4)
    st_ref, _ = render_pass_scene_sharded(
        ds, view, AccumState.make(cfg), cfg, mesh)      # lockstep shards
    kcfg = dataclasses.replace(cfg, intersector="cluster",
                               kernel_interpret=True)
    sh = shard_triangle_arrays(ds.tris, 4)
    cbvhs = build_shard_cluster_bvhs(sh)

    # reattach contract: the shard pack's columns must equal the baked tile
    # payload values bit-for-bit on real triangles
    pack0 = _shard_pack({k: v[0] for k, v in sh.items()},
                        material_pack(ds.materials))
    pg0 = np.asarray(cbvhs.pgeo[0])   # [CT, GEO_ROWS, 128] of shard 0
    pr = pg0[:, CL.PAY_PRIM, :]
    valid = pr >= 0
    # PAY_PRIM in tiles is the LOCAL id -> column index into the pack
    loc = np.where(valid, pr, 0).astype(np.int64)
    for row in (CL.PAY_V0, CL.PAY_E1 + 1, CL.PAY_E2 + 2, CL.PAY_N0,
                CL.PAY_UV0, CL.PAY_ALPHA, CL.PAY_MAT, CL.PAY_LOD):
        got = pg0[:, row, :][valid]
        want = np.asarray(pack0)[row][loc[valid]]
        np.testing.assert_array_equal(got, want)

    st_k, _ = render_pass_scene_sharded(
        ds, view, AccumState.make(kcfg), kcfg, mesh, sh=sh,
        shard_cbvh=cbvhs)
    np.testing.assert_allclose(np.asarray(st_k.accumulator),
                               np.asarray(st_ref.accumulator),
                               rtol=2e-3, atol=2e-4)

    def loss(v0_sh, color):
        sh2 = dict(sh, v0=v0_sh)
        s = ds.replace(materials=ds.materials.replace(color=color))
        st, _ = render_pass_scene_sharded(
            s, view, AccumState.make(kcfg), kcfg, mesh, sh=sh2,
            shard_cbvh=cbvhs)
        return jnp.mean(st.accumulator[:, :3] ** 2)

    g_v0, g_col = jax.grad(loss, argnums=(0, 1))(sh["v0"],
                                                 ds.materials.color)
    assert np.isfinite(np.asarray(g_v0)).all()
    assert np.isfinite(np.asarray(g_col)).all()
    assert float(jnp.abs(g_col).sum()) > 0.0
    assert float(jnp.abs(g_v0).sum()) > 0.0
