"""Benchmark-scene pipeline + alpha-cutout tests (VERDICT r1 #4/#5).

The bathroom2-class procedural interior (scene/bench_scene.py) is the
headline-benchmark workload; these tests keep it loadable, its scale honest,
and render a smoke image of the low-detail variant. Alpha cutout reproduces
pathtracer.h:107-118 passthrough extension rays.
"""
import dataclasses

import numpy as np

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render.wavefront import AccumState, render_pass_jit, finalize
from lighthouse2_tpu.scene.host_scene import HostScene
from lighthouse2_tpu.scene.host_texture import HostTexture
from lighthouse2_tpu.scene.host_material import MAT_HASALPHA, MAT_SMOOTH
from lighthouse2_tpu.scene.camera import Camera


def test_bathroom_builds_at_scale():
    from lighthouse2_tpu.scene.bench_scene import bathroom
    scene, cam = bathroom(64, 64, detail=1)
    ds = scene.sync(rebuild_bvh=False)
    t = int(ds.tris.count)
    assert t >= 100_000, f"bathroom2-class means >=100k tris, got {t}"
    assert int(ds.lights.n_tri) >= 2          # panel + strip emissive quads
    assert int(ds.lights.n_spot) >= 1
    assert int(ds.lights.n_point) >= 1
    assert ds.textures.pool.shape[1] > 1      # real texel data
    assert len({int(m) for m in np.asarray(ds.tris.mat)}) >= 8


def test_bathroom_low_detail_renders():
    from lighthouse2_tpu.scene.bench_scene import bathroom
    scene, cam = bathroom(32, 32, detail=0)
    cfg = RenderConfig(width=32, height=32, spp_per_pass=2, max_path_length=4,
                       use_bvh=True)
    ds = scene.sync(rebuild_bvh=True)
    st, _ = render_pass_jit(ds, cam.get_view(), AccumState.make(cfg), cfg)
    img = np.asarray(finalize(st))
    assert np.isfinite(img).all()
    assert img.max() > 0.01                   # lights actually illuminate


def _alpha_scene():
    """A fully-transparent 'leaf' quad between the camera and an emissive
    wall: cutout rays must pass through and reach the light. (The texture is
    uniformly transparent so MIP averaging — spreadAngle is large at 16px —
    cannot raise the alpha above the 0.5 threshold.)"""
    scene = HostScene()
    tx = np.zeros((4, 4, 4), np.float32)
    tx[:, :] = (1, 1, 1, 0.0)      # fully transparent texels
    tex = scene.add_texture(HostTexture(tx, srgb=False))
    leaf = scene.add_material(name="leaf", color=(1, 1, 1), tex_diffuse=tex,
                              flags=MAT_SMOOTH | MAT_HASALPHA)
    light = scene.add_material(name="glow", color=(5.0, 5.0, 5.0))
    scene.add_instance(scene.add_quad((0, 0, 1), (0, 0, 0), 4, 4, leaf))
    scene.add_instance(scene.add_quad((0, 0, 1), (0, 0, -2), 8, 8, light))
    cam = Camera(pixel_count=(16, 16), fov=30)
    cam.look_at((0, 0, 5), (0, 0, 0))
    return scene, cam


def test_alpha_cutout_passthrough():
    scene, cam = _alpha_scene()
    cfg = RenderConfig(width=16, height=16, spp_per_pass=4, max_path_length=4,
                       use_bvh=True)
    ds = scene.sync(rebuild_bvh=True)
    st, _ = render_pass_jit(ds, cam.get_view(), AccumState.make(cfg), cfg)
    img = np.asarray(finalize(st)).reshape(16, 16, 3)
    centre = img[8, 8]
    assert centre.min() > 2.0, f"cutout ray must reach the light, got {centre}"


def test_alpha_cutout_flag_required():
    """Without MAT_HASALPHA the same texture must NOT cut out: the leaf is an
    opaque diffuse quad whose lights all sit behind it → near-black pixel."""
    scene, cam = _alpha_scene()
    scene.materials[0].flags = MAT_SMOOTH     # strip HASALPHA
    scene.dirty = True
    cfg = RenderConfig(width=16, height=16, spp_per_pass=4, max_path_length=4,
                       use_bvh=True)
    ds = scene.sync(rebuild_bvh=True)
    st, _ = render_pass_jit(ds, cam.get_view(), AccumState.make(cfg), cfg)
    img = np.asarray(finalize(st)).reshape(16, 16, 3)
    assert img[8, 8].max() < 2.0              # no passthrough anymore
