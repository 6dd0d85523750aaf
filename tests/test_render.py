"""End-to-end render tests: Cornell box, furnace/sky, NEE analytics,
determinism, converge/restart — the formalization of the reference's manual
validation methods (SURVEY.md §4)."""
import dataclasses

import numpy as np
import jax
import pytest

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render.wavefront import AccumState, render_pass_jit, finalize
from lighthouse2_tpu.scene.presets import cornell_box, single_triangle
from lighthouse2_tpu.scene.host_scene import HostScene
from lighthouse2_tpu.scene.camera import Camera


def render(scene, cam, config, passes=1):
    ds = scene.sync(rebuild_bvh=config.use_bvh)
    view = cam.get_view()
    st = AccumState.make(config)
    for _ in range(passes):
        st, stats = render_pass_jit(ds, view, st, config)
    return np.asarray(finalize(st)), st, stats


CFG = RenderConfig(width=32, height=32, spp_per_pass=4, max_path_length=4,
                   use_bvh=False)


def test_sky_only():
    """Empty scene → every pixel = sky radiance exactly (furnace property)."""
    scene = HostScene()
    scene.set_sky((0.3, 0.5, 0.7))
    cam = Camera(pixel_count=(16, 16))
    cfg = dataclasses.replace(CFG, width=16, height=16)
    img, _, _ = render(scene, cam, cfg)
    np.testing.assert_allclose(
        img.reshape(-1, 3), np.tile([[0.3, 0.5, 0.7]], (256, 1)), atol=1e-5)


def test_single_triangle_silhouette():
    scene, cam = single_triangle(32, 32)
    img, _, _ = render(scene, cam, dataclasses.replace(CFG, max_path_length=2))
    img = img.reshape(32, 32, 3)
    # center pixel hits the triangle (reddish, not sky gray)
    c = img[16, 16]
    assert c[0] > c[2]
    # corner pixel = sky
    np.testing.assert_allclose(img[0, 0], [0.1, 0.1, 0.1], atol=1e-4)


def test_point_light_analytic():
    """Direct lighting from one point light matches the closed form:
    L = albedo/pi * E * NdotL / r^2 (NEE path, single light → pickProb=1)."""
    scene = HostScene()
    mat = scene.add_material(name="floor", color=(0.6, 0.6, 0.6))
    scene.add_instance(scene.add_quad((0, 1, 0), (0, 0, 0), 20, 20, mat))
    # light far overhead → NdotL/r^2 nearly constant over the pixel footprint
    scene.add_point_light((0.0, 10.0, 0.0), (100.0, 100.0, 100.0))
    cam = Camera(pixel_count=(9, 9), fov=20)
    cam.look_at((0, 3.0, 3.0), (0, 0, 0))
    cfg = dataclasses.replace(CFG, width=9, height=9, max_path_length=1,
                              spp_per_pass=16)
    img, _, _ = render(scene, cam, cfg)
    img = img.reshape(9, 9, 3)
    # hit point ≈ origin: L = albedo/pi * E * NdotL / r^2 ≈ 0.6/pi * 100/100
    expect = 0.6 / np.pi * 100.0 / 100.0
    np.testing.assert_allclose(img[4, 4], expect, rtol=0.02)


def test_cornell_energy_and_layout():
    scene, cam = cornell_box(32, 32)
    img, st, stats = render(scene, cam, CFG, passes=2)
    img = img.reshape(32, 32, 3)
    assert img.max() > 0.5          # light visible
    assert img.mean() > 0.01
    assert np.isfinite(img).all()
    # left wall red-dominant, right wall green-dominant
    left = img[16, 2]
    right = img[16, 29]
    assert left[0] > left[1]
    assert right[1] > right[0]


def test_determinism():
    scene, cam = cornell_box(16, 16)
    cfg = dataclasses.replace(CFG, width=16, height=16)
    img1, _, _ = render(scene, cam, cfg, passes=2)
    img2, _, _ = render(scene, cam, cfg, passes=2)
    np.testing.assert_array_equal(img1, img2)


def test_bvh_equals_bruteforce_image():
    scene, cam = cornell_box(24, 24)
    cfg_b = dataclasses.replace(CFG, width=24, height=24, use_bvh=False)
    cfg_v = dataclasses.replace(CFG, width=24, height=24, use_bvh=True)
    img_b, _, _ = render(scene, cam, cfg_b)
    img_v, _, _ = render(scene, cam, cfg_v)
    np.testing.assert_allclose(img_b, img_v, atol=1e-5)


def test_progressive_accumulation_reduces_noise():
    scene, cam = cornell_box(16, 16)
    cfg = dataclasses.replace(CFG, width=16, height=16, spp_per_pass=2)
    ds = scene.sync(rebuild_bvh=False)
    view = cam.get_view()
    st = AccumState.make(cfg)
    st, _ = render_pass_jit(ds, view, st, cfg)
    img1 = np.asarray(finalize(st))
    for _ in range(7):
        st, _ = render_pass_jit(ds, view, st, cfg)
    img8 = np.asarray(finalize(st))
    ref_cfg = dataclasses.replace(cfg, spp_per_pass=16)
    ref, _, _ = render(scene, cam, ref_cfg, passes=4)
    # higher spp closer to the 64-spp reference
    e1 = np.abs(img1 - ref).mean()
    e8 = np.abs(img8 - ref).mean()
    assert e8 < e1


def test_converge_vs_restart_sample_count():
    scene, cam = cornell_box(8, 8)
    cfg = dataclasses.replace(CFG, width=8, height=8)
    ds = scene.sync(rebuild_bvh=False)
    view = cam.get_view()
    st = AccumState.make(cfg)
    st, _ = render_pass_jit(ds, view, st, cfg)
    st, _ = render_pass_jit(ds, view, st, cfg)
    assert int(st.sample_count) == 8  # 2 passes × spp 4
    st = AccumState.make(cfg)          # Restart
    assert int(st.sample_count) == 0


def test_stats_ray_counts():
    scene, cam = cornell_box(16, 16)
    cfg = dataclasses.replace(CFG, width=16, height=16)
    _, _, stats = render(scene, cam, cfg)
    ext = np.asarray(stats["extension_rays"])
    assert ext[0] == 16 * 16 * 4           # all primaries alive
    assert (np.diff(ext) <= 0).all()        # monotone occupancy decay
    assert int(stats["total_shadow"]) > 0
