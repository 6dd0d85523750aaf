"""Sampling warp statistics."""
import numpy as np
import jax.numpy as jnp

from lighthouse2_tpu.core import sampling


def test_cosine_hemisphere():
    rng = np.random.RandomState(0)
    r0 = jnp.asarray(rng.rand(20000).astype(np.float32))
    r1 = jnp.asarray(rng.rand(20000).astype(np.float32))
    v = np.asarray(sampling.cosine_hemisphere(r0, r1))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-4)
    assert (v[:, 2] >= 0).all()
    # E[cos theta] = 2/3 for cosine-weighted
    np.testing.assert_allclose(v[:, 2].mean(), 2.0 / 3.0, atol=0.01)


def test_random_barycentrics_uniform():
    rng = np.random.RandomState(1)
    r = jnp.asarray(rng.rand(20000).astype(np.float32))
    u, v = sampling.random_barycentrics(r)
    u, v = np.asarray(u), np.asarray(v)
    w = 1.0 - u - v
    assert (u >= -1e-5).all() and (v >= -1e-5).all() and (w >= -1e-5).all()
    # uniform over triangle: E[u] = E[v] = E[w] = 1/3
    np.testing.assert_allclose([u.mean(), v.mean(), w.mean()], [1 / 3] * 3,
                               atol=0.01)
    # Var[u] = 1/18 for uniform barycentric
    np.testing.assert_allclose(u.var(), 1 / 18, atol=0.005)


def test_uniform_sphere():
    rng = np.random.RandomState(2)
    r0 = jnp.asarray(rng.rand(20000).astype(np.float32))
    r1 = jnp.asarray(rng.rand(20000).astype(np.float32))
    v = np.asarray(sampling.uniform_sphere(r0, r1))
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-4)
    np.testing.assert_allclose(v.mean(0), [0, 0, 0], atol=0.02)


def test_bluenoise_mask_properties():
    """Void-and-cluster mask: a permutation of ranks, blue spectrum proxy —
    local 2x2 neighborhoods must cover distant ranks (no clumping)."""
    import numpy as np
    from lighthouse2_tpu.core import bluenoise as bn
    m = bn.get_mask()
    n = bn.MASK_N
    assert m.shape == (n, n)
    ranks = np.sort(m.ravel())
    np.testing.assert_allclose(ranks, (np.arange(n * n) + 0.5) / (n * n),
                               atol=1e-6)
    # neighboring values should differ strongly (blue-noise property):
    # mean |diff| of a random field is 1/3; blue noise is higher
    dx = np.abs(m - np.roll(m, 1, 0)).mean()
    dy = np.abs(m - np.roll(m, 1, 1)).mean()
    assert dx > 0.34 and dy > 0.34, (dx, dy)


def test_bluenoise_sampler_stratification():
    """Per-pixel sample sequences are low-discrepancy: 64 samples of one
    dim fill [0,1) much more evenly than white noise would."""
    import numpy as np
    import jax.numpy as jnp
    from lighthouse2_tpu.core import bluenoise as bn
    mask = bn.device_mask()
    s = np.asarray([float(bn.sample(mask, 7, 11, i, 0)) for i in range(64)])
    assert ((0.0 <= s) & (s < 1.0)).all()
    # star discrepancy proxy: max gap between sorted samples
    gaps = np.diff(np.sort(np.concatenate([[0.0], s, [1.0]])))
    assert gaps.max() < 0.08, gaps.max()   # white noise: ~0.11 expected max
    # different pixels are decorrelated (different CP rotation)
    s2 = np.asarray([float(bn.sample(mask, 8, 11, i, 0)) for i in range(64)])
    assert np.abs(s - s2).mean() > 0.05


def test_bluenoise_render_integrates():
    """Blue-noise pass converges to the same mean as white noise (Cornell,
    many spp) — the sampler is unbiased."""
    import dataclasses
    import numpy as np
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render.wavefront import (
        AccumState, render_pass_jit, finalize)
    from lighthouse2_tpu.scene.presets import cornell_box
    scene, cam = cornell_box(16, 16)
    ds = scene.sync(rebuild_bvh=True)
    view = cam.get_view()
    imgs = {}
    for flag in (False, True):
        cfg = RenderConfig(width=16, height=16, spp_per_pass=16,
                           max_path_length=3, use_bvh=True, blue_noise=flag)
        st = AccumState.make(cfg)
        for _ in range(4):
            st, _ = render_pass_jit(ds, view, st, cfg)
        imgs[flag] = np.asarray(finalize(st))
    assert np.isfinite(imgs[True]).all()
    # unbiasedness: the image MEANS must agree (per-pixel |diff| would be
    # noise-dominated at this spp)
    rel = abs(imgs[True].mean() - imgs[False].mean()) / max(
        imgs[False].mean(), 1e-6)
    assert rel < 0.05, rel
