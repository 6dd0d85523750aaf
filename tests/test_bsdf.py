"""BSDF correctness: Lambert + Disney sample/evaluate consistency, energy."""
import numpy as np
import jax.numpy as jnp

from lighthouse2_tpu.render import bsdf_lambert, bsdf_disney
from lighthouse2_tpu.render.shading import ShadingData
from lighthouse2_tpu.core.geometry import normalize, dot


def make_sd(n, **kw):
    d = dict(
        color=jnp.full((n, 3), 0.6), absorption=jnp.zeros((n, 3)),
        metallic=jnp.zeros(n), subsurface=jnp.zeros(n),
        specular=jnp.full(n, 0.5), roughness=jnp.ones(n),
        spec_tint=jnp.zeros(n), anisotropic=jnp.zeros(n),
        sheen=jnp.zeros(n), sheen_tint=jnp.zeros(n),
        clearcoat=jnp.zeros(n), clearcoat_gloss=jnp.ones(n),
        transmission=jnp.zeros(n), eta=jnp.ones(n),
        flags=jnp.zeros(n, jnp.int32),
        n_geom=jnp.tile(jnp.array([[0.0, 0, 1]]), (n, 1)),
        n_interp=jnp.tile(jnp.array([[0.0, 0, 1]]), (n, 1)),
        n_shading=jnp.tile(jnp.array([[0.0, 0, 1]]), (n, 1)),
        face_dir=jnp.ones(n), emissive=jnp.zeros(n, bool),
        ltri=jnp.full(n, -1, jnp.int32), area=jnp.ones(n),
        uv=jnp.zeros((n, 2)), lod=jnp.zeros(n),
        alpha_cutout=jnp.zeros(n, bool),
        tangent=jnp.zeros((n, 3)), bitangent=jnp.zeros((n, 3)),
    )
    d.update({k: jnp.asarray(v) for k, v in kw.items()})
    return ShadingData(**d)


def _rand_dirs(n, seed, up=True):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3).astype(np.float32)
    if up:
        v[:, 2] = np.abs(v[:, 2]) + 0.05
    return normalize(jnp.asarray(v))


def test_lambert_evaluate_diffuse():
    n = 16
    sd = make_sd(n)
    wo = _rand_dirs(n, 0)
    wi = _rand_dirs(n, 1)
    bsdf, pdf = bsdf_lambert.evaluate(sd, sd.n_shading, wo, wi)
    np.testing.assert_allclose(np.asarray(bsdf), 0.6 / np.pi, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pdf), np.abs(np.asarray(dot(wi, sd.n_shading))) / np.pi,
        rtol=1e-5)


def test_lambert_sample_energy():
    """E[bsdf·cos/pdf] = albedo for cosine-sampled Lambert."""
    n = 50000
    rng = np.random.RandomState(2)
    sd = make_sd(n)
    wo = normalize(jnp.tile(jnp.array([[0.3, 0.1, 1.0]]), (n, 1)))
    smp = bsdf_lambert.sample(
        sd, sd.n_shading, sd.n_geom, wo,
        jnp.ones(n), jnp.asarray(rng.rand(n).astype(np.float32)),
        jnp.asarray(rng.rand(n).astype(np.float32)))
    est = (np.asarray(smp["bsdf"])[:, 0]
           * np.abs(np.asarray(dot(smp["wi"], sd.n_shading)))
           / np.maximum(np.asarray(smp["pdf"]), 1e-9))
    ok = np.asarray(smp["pdf"]) > 1e-6
    np.testing.assert_allclose(est[ok].mean(), 0.6, rtol=0.02)
    assert not np.asarray(smp["specular"]).any()


def test_lambert_mirror_and_dielectric():
    n = 8
    sd = make_sd(n, roughness=jnp.zeros(n))
    wo = normalize(jnp.tile(jnp.array([[0.0, 0.5, 1.0]]), (n, 1)))
    smp = bsdf_lambert.sample(sd, sd.n_shading, sd.n_geom, wo, jnp.ones(n),
                              jnp.full(n, 0.3), jnp.full(n, 0.9))
    assert np.asarray(smp["specular"]).all()
    # mirror: wi = reflect(-wo, n) → z preserved, xy negated
    wi = np.asarray(smp["wi"])
    wo_n = np.asarray(wo)
    np.testing.assert_allclose(wi[:, 2], wo_n[:, 2], atol=1e-6)
    np.testing.assert_allclose(wi[:, :2], -wo_n[:, :2], atol=1e-6)
    # evaluate() refuses speculars
    _, pdf = bsdf_lambert.evaluate(sd, sd.n_shading, wo, smp["wi"])
    assert (np.asarray(pdf) == 0).all()
    # dielectric transmission: straight-through at eta 1
    sd2 = make_sd(n, transmission=jnp.ones(n), eta=jnp.ones(n),
                  roughness=jnp.zeros(n))
    smp2 = bsdf_lambert.sample(sd2, sd2.n_shading, sd2.n_geom, wo, jnp.ones(n),
                               jnp.full(n, 0.99), jnp.full(n, 0.5))
    wi2 = np.asarray(smp2["wi"])
    np.testing.assert_allclose(wi2, -wo_n, atol=1e-5)


def test_disney_diffuse_close_to_lambert():
    """Pure-diffuse Disney (rough 1, metal 0, no sheen/coat) ≈ Lambert scale."""
    n = 1000
    rng = np.random.RandomState(3)
    # specular=0 zeroes the GGX lobe weight so the pdf is pure cosine
    sd = make_sd(n, specular=jnp.zeros(n))
    wo = _rand_dirs(n, 4)
    wi = _rand_dirs(n, 5)
    v, p = bsdf_disney.evaluate(sd, sd.n_shading, wo, wi)
    v = np.asarray(v)
    assert np.isfinite(v).all()
    base = 0.6 / np.pi
    # disney diffuse includes retro-reflection with grazing boosts up to
    # (1+(fd90-1))^2; keep loose physical bounds
    assert (v[:, 0] > 0.1 * base).all() and (v[:, 0] < 8.0 * base).all()
    # pdf dominated by cosine lobe
    p = np.asarray(p)
    cosw = np.abs(np.asarray(dot(wi, sd.n_shading)))
    np.testing.assert_allclose(p, cosw / np.pi, rtol=0.05)


def test_disney_sample_evaluate_pdf_consistency():
    n = 20000
    rng = np.random.RandomState(6)
    sd = make_sd(
        n,
        metallic=jnp.full(n, 0.4), roughness=jnp.full(n, 0.4),
        sheen=jnp.full(n, 0.3), clearcoat=jnp.full(n, 0.5),
    )
    wo = normalize(jnp.tile(jnp.array([[0.4, -0.2, 0.9]]), (n, 1)))
    smp = bsdf_disney.sample(
        sd, sd.n_shading, sd.n_geom, wo, jnp.ones(n),
        jnp.asarray(rng.rand(n).astype(np.float32)),
        jnp.asarray(rng.rand(n).astype(np.float32)))
    ok = np.asarray(smp["pdf"]) > 1e-4
    assert ok.mean() > 0.8
    v, p = bsdf_disney.evaluate(sd, sd.n_shading, wo, smp["wi"])
    np.testing.assert_allclose(np.asarray(p)[ok], np.asarray(smp["pdf"])[ok],
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(v)[ok], np.asarray(smp["bsdf"])[ok],
                               rtol=1e-3)
    assert np.isfinite(np.asarray(smp["bsdf"])).all()


def test_disney_energy_bounded():
    """White-ish furnace: E[f cos / pdf] <= ~1 for a metal GGX surface."""
    n = 50000
    rng = np.random.RandomState(7)
    sd = make_sd(n, color=jnp.ones((n, 3)), metallic=jnp.ones(n),
                 roughness=jnp.full(n, 0.5))
    wo = normalize(jnp.tile(jnp.array([[0.2, 0.1, 1.0]]), (n, 1)))
    smp = bsdf_disney.sample(
        sd, sd.n_shading, sd.n_geom, wo, jnp.ones(n),
        jnp.asarray(rng.rand(n).astype(np.float32)),
        jnp.asarray(rng.rand(n).astype(np.float32)))
    pdf = np.asarray(smp["pdf"])
    ok = pdf > 1e-5
    est = (np.asarray(smp["bsdf"])[ok, 0]
           * np.abs(np.asarray(dot(smp["wi"], sd.n_shading)))[ok] / pdf[ok])
    m = est.mean() * ok.mean()
    assert 0.3 < m <= 1.05, m


def test_disney_render_smoke():
    """Cornell with Disney BSDF renders finite, non-black."""
    import dataclasses
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render.wavefront import AccumState, render_pass_jit, finalize
    from lighthouse2_tpu.scene.presets import cornell_box
    scene, cam = cornell_box(16, 16)
    cfg = RenderConfig(width=16, height=16, spp_per_pass=2, max_path_length=3,
                       use_bvh=False, bsdf="disney")
    ds = scene.sync(rebuild_bvh=False)
    st, _ = render_pass_jit(ds, cam.get_view(), AccumState.make(cfg), cfg)
    img = np.asarray(finalize(st))
    assert np.isfinite(img).all()
    assert img.max() > 0.1
