"""Gradient correctness: autodiff vs central finite differences
(BASELINE.json: pixel grads -> vertices, materials, light intensities,
allclose to finite differences), plus an inverse-rendering smoke test.

The renderer is deterministic in (scene, view, seeds), so f(p±εu) follows the
exact same sample paths and FD matches AD up to f32 rounding."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.diff.fd import check_grad
from lighthouse2_tpu.diff.params import (
    set_material_fields, set_light_radiance, displace_vertices,
)
from lighthouse2_tpu.diff.render import render_image, make_loss, optimize
from lighthouse2_tpu.scene.presets import cornell_box


def setup(use_bvh=False, w=12, h=12, paths=3):
    cfg = RenderConfig(width=w, height=h, spp_per_pass=1,
                       max_path_length=paths, use_bvh=use_bvh)
    scene, cam = cornell_box(w, h)
    ds = scene.sync(rebuild_bvh=use_bvh)
    return cfg, ds, cam.get_view()


# fixed projection weights make the scalar objective sensitive to all pixels
def proj_loss(cfg, ds, view, insert):
    rng = np.random.RandomState(7)
    wgt = jnp.asarray(rng.rand(cfg.width * cfg.height, 3).astype(np.float32))

    def f(p):
        img = render_image(insert(ds, p), view, cfg)
        return jnp.sum(img * wgt)

    return jax.jit(f)


def test_material_color_grad_matches_fd():
    cfg, ds, view = setup()
    f = proj_loss(cfg, ds, view,
                  lambda s, c: set_material_fields(s, color=c))
    worst, res = check_grad(f, ds.materials.color, eps=2e-3, n_dirs=3)
    assert worst < 0.03, res


def test_material_roughness_grad_matches_fd_disney():
    """Disney GGX roughness is smooth (lobe-pick CDF doesn't involve it), so
    FD matches AD. Lambert roughness gates a DISCRETE mirror/diffuse branch
    (lambert.h:103) — its decision derivative is invisible to the
    reparameterized estimator by design, so it is not FD-tested."""
    import dataclasses
    cfg, ds, view = setup()
    cfg = dataclasses.replace(cfg, bsdf="disney")
    m = ds.materials
    ds = ds.replace(materials=m.replace(
        specular=m.specular * 0.0 + 0.7, metallic=m.metallic * 0.0 + 0.4))
    f = proj_loss(cfg, ds, view,
                  lambda s, r: set_material_fields(
                      s, roughness=jnp.clip(r, 0.05, 1.0)))
    worst, res = check_grad(f, ds.materials.roughness * 0.0 + 0.5,
                            eps=2e-3, n_dirs=3)
    assert worst < 0.03, res


def test_light_radiance_grad_matches_fd():
    cfg, ds, view = setup()
    f = proj_loss(cfg, ds, view, set_light_radiance)
    worst, res = check_grad(f, ds.lights.tri_radiance, eps=2e-3, n_dirs=3)
    assert worst < 0.03, res
    # light grads must be strictly positive somewhere (more light = brighter)
    g = jax.grad(f)(ds.lights.tri_radiance)
    assert float(jnp.max(g)) > 0


def wall_scene(w=12, h=12, use_bvh=False):
    """Silhouette-free vertex-gradient fixture: a huge quad fills the whole
    view, lit by an area light behind the camera. FD-vs-AD equality for
    vertex positions is only well-posed away from visibility discontinuities
    (the reparameterized estimator drops silhouette jump terms by design —
    SURVEY.md §7.3.3); here no edge crosses any pixel for small eps."""
    from lighthouse2_tpu.scene.host_scene import HostScene
    from lighthouse2_tpu.scene.camera import Camera
    scene = HostScene()
    mat = scene.add_material(name="wall", color=(0.7, 0.6, 0.5))
    scene.add_instance(scene.add_quad((0, 0, 1), (0, 0, 0), 40, 40, mat))
    lmat = scene.add_material(name="light", color=(40.0, 35.0, 30.0))
    scene.add_instance(scene.add_quad((0, 0, -1), (0, 0, 6), 2, 2, lmat))
    cam = Camera(pixel_count=(w, h), fov=40.0)
    cam.look_at((0.0, 0.0, 3.0), (0.0, 0.0, 0.0))
    cfg = RenderConfig(width=w, height=h, spp_per_pass=1,
                       max_path_length=1, use_bvh=use_bvh)
    ds = scene.sync(rebuild_bvh=use_bvh)
    return cfg, ds, cam.get_view()


def _wall_only_dirs(f, ds, eps, n_dirs, seed):
    """check_grad restricted to the wall's 2 triangles (light fixed)."""
    from lighthouse2_tpu.diff.fd import directional_fd
    t = int(ds.tris.count)
    rng = np.random.RandomState(seed)
    g = jax.grad(f)(jnp.zeros((t, 3, 3), jnp.float32))
    worst, res = 0.0, []
    for _ in range(n_dirs):
        u = np.zeros((t, 3, 3), np.float32)
        u[:2] = rng.randn(2, 3, 3)
        u /= np.linalg.norm(u)
        ju = jnp.asarray(u)
        ad = float(jnp.vdot(g, ju))
        fd = directional_fd(f, jnp.zeros((t, 3, 3), jnp.float32), ju, eps)
        res.append((ad, fd))
        worst = max(worst, abs(ad - fd) / max(abs(ad), abs(fd), 1e-3))
    return worst, res, g


def test_vertex_position_grad_matches_fd():
    cfg, ds, view = wall_scene()
    f = proj_loss(cfg, ds, view, displace_vertices)
    worst, res, g = _wall_only_dirs(f, ds, eps=1e-3, n_dirs=3, seed=3)
    assert worst < 0.03, res
    assert float(jnp.max(jnp.abs(g))) > 0


def test_vertex_grad_with_bvh_matches_fd():
    """Reparameterized hits: traversal frozen, refine_hit differentiable."""
    cfg, ds, view = wall_scene(use_bvh=True)
    f = proj_loss(cfg, ds, view, displace_vertices)
    worst, res, g = _wall_only_dirs(f, ds, eps=1e-3, n_dirs=2, seed=4)
    assert worst < 0.03, res


def _cluster_cfg(cfg):
    """Run the SHIPPING TPU intersector (pallas cluster kernel) in interpret
    mode on the CPU test backend — VERDICT r2 item 3: the cluster-path
    gradient contract must be tested where it can't silently regress."""
    import dataclasses
    return dataclasses.replace(cfg, intersector="cluster",
                               kernel_interpret=True)


def test_vertex_grad_cluster_kernel_matches_fd():
    """Payload fetch + reattach_rows (render/fetch.py) on the cluster path
    must preserve the FD-vs-AD vertex gradient contract."""
    cfg, ds, view = wall_scene(use_bvh=True)
    f = proj_loss(_cluster_cfg(cfg), ds, view, displace_vertices)
    worst, res, g = _wall_only_dirs(f, ds, eps=1e-3, n_dirs=2, seed=4)
    assert worst < 0.03, res
    assert float(jnp.max(jnp.abs(g))) > 0


def test_material_color_grad_cluster_kernel_matches_fd():
    """Material gradients through the device-baked payload rows
    (bake_material_rows + reattach) vs finite differences."""
    cfg, ds, view = setup(use_bvh=True)
    f = proj_loss(_cluster_cfg(cfg), ds, view,
                  lambda s, c: set_material_fields(s, color=c))
    worst, res = check_grad(f, ds.materials.color, eps=2e-3, n_dirs=3)
    assert worst < 0.03, res


def test_cluster_kernel_image_matches_lockstep():
    """The payload shading path must produce the same image as the gather
    path (same scene, same seeds) — forward parity of the round-3 redesign."""
    import dataclasses
    cfg, ds, view = setup(use_bvh=True, w=16, h=16, paths=4)
    img_lock = render_image(ds, view,
                            dataclasses.replace(cfg, intersector="lockstep"))
    img_clus = render_image(ds, view, _cluster_cfg(cfg))
    np.testing.assert_allclose(np.asarray(img_clus), np.asarray(img_lock),
                               rtol=1e-4, atol=1e-5)


def test_vertex_grad_cornell_finite_nonzero():
    """Full Cornell box: vertex grads must be finite and nonzero (FD equality
    is not well-posed here — silhouettes cross pixels)."""
    cfg, ds, view = setup(use_bvh=True)
    t = int(ds.tris.count)
    f = proj_loss(cfg, ds, view, displace_vertices)
    g = jax.grad(f)(jnp.zeros((t, 3, 3), jnp.float32))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_inverse_rendering_recovers_material():
    """Optimize the walls' albedo toward a target render (flagship demo).

    The EMISSIVE material keeps its true radiance: clamping the light's
    color into the optimized [0, 0.98] albedo range made the target
    unreachable whenever any pixel directly saw the light — an irreducible
    residual that dominated the loss (surfaced by the r5 blue-noise default
    flip moving the pixel jitter)."""
    cfg, ds, view = setup(w=10, h=10, paths=2)
    true_color = ds.materials.color
    emissive = jnp.max(true_color, axis=-1, keepdims=True) > 1.0
    img_target = render_image(ds, view, cfg)

    start = jnp.clip(true_color * 0.4 + 0.2, 0.05, 0.95)
    loss = make_loss(img_target, view, cfg,
                     lambda s, c: set_material_fields(
                         s, color=jnp.where(emissive, true_color,
                                            jnp.clip(c, 0.0, 0.98))),
                     ds)
    params, hist = optimize(loss, start, steps=18, lr=8e-2)
    assert hist[-1] < 0.25 * hist[0], hist
