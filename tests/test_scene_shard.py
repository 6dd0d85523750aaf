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
