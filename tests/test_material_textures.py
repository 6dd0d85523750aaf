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


def test_uv_tangents_and_oriented_frame():
    """compute_uv_tangents (host_mesh.cpp:545-565) + the shading frame:
    T follows the uv-u direction, B the uv-v direction, degenerate uvs fall
    back to the ONB."""
    import jax.numpy as jnp
    from lighthouse2_tpu.scene.host_mesh import compute_uv_tangents
    from lighthouse2_tpu.core.geometry import oriented_frame
    # triangle in the xz plane with u along +x, v along +z
    v0 = np.array([[0, 0, 0]], np.float32)
    v1 = np.array([[2, 0, 0]], np.float32)
    v2 = np.array([[0, 0, 3]], np.float32)
    uv0 = np.array([[0, 0]], np.float32)
    uv1 = np.array([[1, 0]], np.float32)
    uv2 = np.array([[0, 1]], np.float32)
    t, b = compute_uv_tangents(v0, v1, v2, uv0, uv1, uv2)
    np.testing.assert_allclose(t, [[1, 0, 0]], atol=1e-6)
    np.testing.assert_allclose(b, [[0, 0, 1]], atol=1e-6)
    # degenerate uvs -> zero tangent
    tz, bz = compute_uv_tangents(v0, v1, v2, uv0, uv0, uv0)
    np.testing.assert_allclose(tz, 0.0)
    # oriented_frame keeps the uv direction, orthogonal to n, uv handedness
    n = jnp.array([[0.0, 1.0, 0.0]])
    tf, bf = oriented_frame(n, jnp.asarray(t), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(tf), [[1, 0, 0]], atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(bf)[0, 2]), 1.0, atol=1e-5)
    # zero tangent -> ONB fallback (still orthonormal)
    tf0, bf0 = oriented_frame(n, jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    assert abs(float(jnp.sum(tf0 * n))) < 1e-5
    assert abs(float(jnp.linalg.norm(tf0)) - 1.0) < 1e-5


def test_anisotropy_follows_uv_tangent():
    """Rotating the uv parameterization by 90 deg must rotate the
    anisotropic Disney highlight — the frame is author-controlled, not an
    arbitrary ONB (VERDICT r2 missing #3)."""
    import jax.numpy as jnp
    from lighthouse2_tpu.render import bsdf_disney
    from tests.test_bsdf import make_sd
    n = 1
    sd = make_sd(n, roughness=jnp.full(n, 0.3),
                 anisotropic=jnp.full(n, 0.9),
                 metallic=jnp.full(n, 1.0),
                 tangent=jnp.asarray([[1.0, 0, 0]]),
                 bitangent=jnp.asarray([[0.0, 1.0, 0]]))
    sd90 = sd.replace(tangent=jnp.asarray([[0.0, 1.0, 0]]),
                      bitangent=jnp.asarray([[-1.0, 0.0, 0]]))
    wo = jnp.asarray([[0.0, 0.0, 1.0]])
    # grazing wi tilted along x: value differs between the two frames
    wi = jnp.asarray([[0.6, 0.0, 0.8]])
    f_a, _ = bsdf_disney.evaluate(sd, sd.n_shading, wo, wi)
    f_b, _ = bsdf_disney.evaluate(sd90, sd.n_shading, wo, wi)
    assert not np.allclose(np.asarray(f_a), np.asarray(f_b), rtol=0.05), \
        (np.asarray(f_a), np.asarray(f_b))
