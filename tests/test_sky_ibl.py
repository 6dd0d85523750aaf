"""Skydome IBL importance sampling (render/sky.py + the sky NEE slot in
render/lights.py — host_skydome.cpp:20-47 IBL analog)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render.sky import (
    build_sky_cdf, sample_sky, sky_pdf, sample_skydome)
from lighthouse2_tpu.render.wavefront import (
    AccumState, render_pass_jit, finalize)
from lighthouse2_tpu.scene.host_scene import HostScene
from lighthouse2_tpu.scene.camera import Camera
from lighthouse2_tpu.scene.device_scene import DeviceSky


def _hot_sky(h=16, w=32, hot=40.0):
    """Dim sky with one bright texel band — the worst case for uniform
    (BSDF-only) sampling, the best case for IBL."""
    px = np.full((h, w, 3), 0.02, np.float32)
    px[5, 7] = hot
    return px


def _device_sky(px):
    pdf, cr, cc, e = build_sky_cdf(px)
    return DeviceSky(pixels=jnp.asarray(px), pdf=jnp.asarray(pdf),
                     cdf_rows=jnp.asarray(cr), cdf_cond=jnp.asarray(cc),
                     nee_energy=jnp.float32(e), has_ibl=True)


def test_cdf_tables_normalized():
    pdf, cdf_rows, cdf_cond, e = build_sky_cdf(_hot_sky())
    np.testing.assert_allclose(pdf.sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(cdf_rows[-1], 1.0, rtol=1e-5)
    np.testing.assert_allclose(cdf_cond[:, -1], 1.0, rtol=1e-4)
    assert e > 0


def test_sample_sky_pdf_consistency():
    """sky_pdf(sampled direction) must equal the pdf sample_sky reports, and
    the pdf must integrate to ~1 over the sphere (uniform-MC estimate)."""
    sky = _device_sky(_hot_sky())
    n = 8192
    key = jax.random.PRNGKey(0)
    r0, r1 = jax.random.uniform(key, (2, n))
    s = sample_sky(sky, r0, r1)
    back = sky_pdf(sky, s["dir"])
    np.testing.assert_allclose(np.asarray(back), np.asarray(s["pdf"]),
                               rtol=1e-3)
    # directions must be unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(s["dir"]), axis=-1), 1.0, atol=1e-5)
    # integral check E_uniform[pdf] * 4pi ~ 1 — on a SMOOTH sky (the hot
    # near-delta sky makes uniform-MC variance huge: ~23 expected hits)
    smooth = np.random.RandomState(3).uniform(
        0.2, 1.0, (16, 32, 3)).astype(np.float32)
    sky_s = _device_sky(smooth)
    k2 = jax.random.PRNGKey(1)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    est = float(jnp.mean(sky_pdf(sky_s, d))) * 4.0 * np.pi
    assert abs(est - 1.0) < 0.05, est


def test_sample_sky_hits_hot_texel():
    """Importance sampling concentrates on the bright texel: the hot texel
    (1/512 of the pixels, ~99% of the energy-weight) must receive the
    majority of samples, and the weighted estimator radiance/pdf must be an
    unbiased estimate of the total sky integral."""
    px = _hot_sky()
    sky = _device_sky(px)
    n = 4096
    r0, r1 = jax.random.uniform(jax.random.PRNGKey(2), (2, n))
    s = sample_sky(sky, r0, r1)
    frac_hot = float(jnp.mean(s["radiance"][:, 0] > 1.0))
    assert frac_hot > 0.5, frac_hot
    # integral estimate vs direct texel-sum integral
    est = float(jnp.mean(s["radiance"][:, 0] / jnp.maximum(s["pdf"], 1e-12)))
    h, w = px.shape[:2]
    th = np.pi * (np.arange(h) + 0.5) / h
    dw = (2 * np.pi / w) * (np.pi / h) * np.sin(th)
    truth = (px[..., 0] * dw[:, None]).sum()
    np.testing.assert_allclose(est, truth, rtol=0.05)


def test_bilinear_skydome_interpolates():
    px = np.zeros((4, 8, 3), np.float32)
    px[1, 3] = 8.0
    sky = DeviceSky(pixels=jnp.asarray(px))
    d = jnp.asarray([[0.0, 0.3, -1.0]]) / np.linalg.norm([0.0, 0.3, -1.0])
    near = sample_skydome(sky, d)
    bil = sample_skydome(sky, d, bilinear=True)
    assert np.isfinite(np.asarray(bil)).all()
    # bilinear is a convex combination -> never exceeds the nearest max
    assert np.asarray(bil).max() <= max(np.asarray(near).max(), 8.0) + 1e-5


def _env_scene(ibl_px):
    """A floor under an HDR environment — no analytic lights, the sky is
    the only illumination (BASELINE config 3 shape)."""
    s = HostScene()
    mat = s.add_material(name="floor", color=(0.6, 0.6, 0.6))
    s.add_instance(s.add_quad((0, 1, 0), (0, 0, 0), 8, 8, mat))
    s.set_sky(ibl_px)
    cam = Camera(pixel_count=(12, 12), fov=40)
    cam.look_at((0, 2.0, 4.0), (0, 0, 0))
    return s, cam


def test_ibl_nee_unbiased_and_converges_faster():
    """With a concentrated sky, IBL-on must (a) agree with IBL-off in the
    converged mean (unbiasedness of the added strategy + MIS), and (b) cut
    the error vs the converged reference at a small equal budget."""
    scene, cam = _env_scene(_hot_sky())
    ds = scene.sync(rebuild_bvh=False)
    view = cam.get_view()
    base = RenderConfig(width=12, height=12, spp_per_pass=8,
                        max_path_length=3, use_bvh=False,
                        clamp_fireflies=False)
    cfg_off = dataclasses.replace(base, sky_ibl=False)
    cfg_on = dataclasses.replace(base, sky_ibl=True)

    def run(cfg, passes, seed=0):
        st = AccumState.make(cfg)
        st = st.replace(cam_seed=jnp.uint32(0x12345678 + seed))
        for _ in range(passes):
            st, _ = render_pass_jit(ds, view, st, cfg)
        return np.asarray(finalize(st))

    ref_on = run(cfg_on, 60)
    ref_off = run(cfg_off, 240)
    # (a) same converged image (floor region dominates the mean)
    assert abs(ref_on.mean() - ref_off.mean()) / ref_off.mean() < 0.12, (
        ref_on.mean(), ref_off.mean())
    # (b) at an equal tiny budget, IBL error is much lower
    e_on = np.abs(run(cfg_on, 2, seed=7) - ref_on).mean()
    e_off = np.abs(run(cfg_off, 2, seed=7) - ref_on).mean()
    assert e_on < 0.5 * e_off, (e_on, e_off)


def test_sky_pixel_gradients_match_fd():
    """d(mean image)/d(sky pixel) via AD vs finite differences — gradients
    flow through both the miss lookup and the NEE sky samples."""
    scene, cam = _env_scene(_hot_sky(8, 16, hot=10.0))
    ds = scene.sync(rebuild_bvh=False)
    view = cam.get_view()
    cfg = dataclasses.replace(
        RenderConfig(width=8, height=8, spp_per_pass=4, max_path_length=2,
                     use_bvh=False, clamp_fireflies=False), sky_ibl=True)

    def loss(pixels):
        ds2 = ds.replace(sky=ds.sky.replace(pixels=pixels))
        st, _ = render_pass_jit(ds2, view, AccumState.make(cfg), cfg)
        return jnp.mean(st.accumulator[:, :3])

    g = jax.grad(loss)(ds.sky.pixels)
    # FD check on the hot texel's red channel (the dominant gradient)
    yi, xi = 5, 7
    eps = 0.05
    p0 = np.asarray(ds.sky.pixels)
    for (y, x) in [(yi, xi), (0, 0)]:
        pp = p0.copy(); pp[y, x, 0] += eps
        pm = p0.copy(); pm[y, x, 0] -= eps
        fd = (loss(jnp.asarray(pp)) - loss(jnp.asarray(pm))) / (2 * eps)
        ad = float(g[y, x, 0])
        np.testing.assert_allclose(ad, float(fd), rtol=0.05, atol=1e-6)
