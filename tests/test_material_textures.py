"""Per-parameter material texture slots + MIP alpha rule
(common_classes.h:177-238 Vec3Value/ScalarValue slots;
host_texture.cpp:128-151 min-alpha MIP)."""
import dataclasses

import numpy as np

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render.wavefront import AccumState, render_pass_jit, finalize
from lighthouse2_tpu.scene.host_scene import HostScene
from lighthouse2_tpu.scene.host_texture import HostTexture
from lighthouse2_tpu.scene.camera import Camera


def test_mip_alpha_takes_min():
    """Alpha cutouts must not dissolve at distance: MIP alpha = min of the
    2x2 box (host_texture.cpp:128-151), colors still box-averaged."""
    px = np.zeros((8, 8, 4), np.float32)
    px[..., :3] = 0.5
    px[..., 3] = 1.0
    px[::2, ::2, 3] = 0.0          # 25% fully transparent texels
    t = HostTexture(px, srgb=False)
    m1 = t.mips[1]
    assert m1.shape[:2] == (4, 4)
    # every 2x2 box contains a zero-alpha texel -> min rule keeps alpha 0
    np.testing.assert_allclose(m1[..., 3], 0.0)
    # colors averaged normally
    np.testing.assert_allclose(m1[..., 0], 0.5, atol=1e-6)


def _mr_scene():
    """A floor with a half metallic / half rough MR texture under a light."""
    s = HostScene()
    # metallicRoughnessTexture: G=roughness, B=metallic; left half rough
    # dielectric, right half smooth metal
    mr = np.zeros((8, 8, 4), np.float32)
    # quad UV axes: u runs along scene depth, v along x -> texture ROWS
    # (v) split the floor into image-left vs image-right halves
    mr[:4, :, 1] = 1.0            # v<.5 (image left): roughness 1
    mr[:4, :, 2] = 0.0            # image left: metallic 0
    mr[4:, :, 1] = 0.1            # image right: roughness .1
    mr[4:, :, 2] = 1.0            # image right: metallic 1
    tid = s.add_texture(HostTexture(mr, srgb=False))
    mat = s.add_material(name="floor", color=(0.8, 0.4, 0.2),
                         metallic=1.0, roughness=1.0, tex_metal_rough=tid)
    s.add_instance(s.add_quad((0, 1, 0), (0, 0, 0), 4, 4, mat))
    s.add_point_light((0.0, 3.0, 2.0), (60.0, 60.0, 60.0))
    s.set_sky((0.05, 0.05, 0.05))
    cam = Camera(pixel_count=(32, 32), fov=45)
    cam.look_at((0, 2.5, 3.0), (0, 0, 0))
    return s, cam


def test_metallic_roughness_texture_drives_disney():
    scene, cam = _mr_scene()
    ds = scene.sync(rebuild_bvh=False)
    cfg = RenderConfig(width=32, height=32, spp_per_pass=8,
                       max_path_length=3, use_bvh=False, bsdf="disney")
    st = AccumState.make(cfg)
    for _ in range(4):
        st, _ = render_pass_jit(ds, cam.get_view(), st, cfg)
    img = np.asarray(finalize(st)).reshape(32, 32, 3)
    assert np.isfinite(img).all()
    left = img[20:28, 4:12].mean(axis=(0, 1))    # rough dielectric
    right = img[20:28, 20:28].mean(axis=(0, 1))  # smooth metal
    # the dielectric diffuse side reflects the base color diffusely; the
    # metal side kills diffuse (Disney: metallic lerps diffuse to 0), so
    # away from the specular highlight it is darker
    assert left.sum() > right.sum() * 1.3, (left, right)


def test_mr_texture_rides_the_payload_path():
    """Cluster-kernel payload shading must honor the MR texture identically
    to the gather path (material row 22 of the pack contract)."""
    import jax
    scene, cam = _mr_scene()
    ds = scene.sync(rebuild_bvh=True)
    base = RenderConfig(width=32, height=32, spp_per_pass=2,
                        max_path_length=2, use_bvh=True, bsdf="disney")
    imgs = {}
    for mode in ("lockstep", "cluster"):
        cfg = dataclasses.replace(base, intersector=mode,
                                  kernel_interpret=(mode == "cluster"))
        st, _ = render_pass_jit(ds, cam.get_view(), AccumState.make(cfg), cfg)
        imgs[mode] = np.asarray(finalize(st))
    np.testing.assert_allclose(imgs["cluster"], imgs["lockstep"],
                               rtol=1e-3, atol=1e-4)
