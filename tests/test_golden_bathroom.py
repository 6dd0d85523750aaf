"""Cross-backend golden regression on the REAL workload (VERDICT r3 #6):
the bathroom-class interior with disney BSDF + textures + sky IBL, rendered
by the CPU lockstep traversal AND the cluster kernel (interpret mode), must
agree — the PrimeRef validation methodology (apps/imguiapp/main.cpp:170) on
the scene the bench actually measures."""
import numpy as np
import jax.numpy as jnp
import pytest

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render.wavefront import AccumState, render_pass_jit
from lighthouse2_tpu.scene.bench_scene import bathroom

SIZE = 32


def _render(intersector):
    scene, cam = bathroom(SIZE, SIZE, detail=0)
    # sky IBL on: synthetic gradient equirect (the workload the headline
    # bench exercises has textures+disney; IBL joins here per VERDICT)
    h, w = 16, 32
    sky = np.zeros((h, w, 3), np.float32)
    sky[:, :, 2] = np.linspace(1.2, 0.1, h)[:, None]
    sky[:, :, 0] = 0.3
    scene.set_sky(sky)
    ds = scene.sync(rebuild_bvh=True)
    cfg = RenderConfig(width=SIZE, height=SIZE, spp_per_pass=1,
                       max_path_length=3, use_bvh=True, bsdf="disney",
                       sky_ibl=True, intersector=intersector,
                       kernel_interpret=(intersector == "cluster"))
    st, _ = render_pass_jit(ds, cam.get_view(), AccumState.make(cfg), cfg)
    return np.asarray(st.accumulator[:, :3])


def test_bathroom_golden_cross_backend():
    a = _render("lockstep")
    b = _render("cluster")
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # identical sampling decisions -> near-identical images; the only
    # differences are f32 op-order effects in the two intersectors
    np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-3)
    # absolute anchor: the golden frame is lit (sky + interior lights) and
    # in a stable brightness band; a transport regression (lost NEE, broken
    # MIS, dead texture path) moves this by far more
    mean = float(a.mean())
    assert 0.01 < mean < 10.0
    # structure: textured floor forces spatial variance
    assert float(a.std()) > 0.01
