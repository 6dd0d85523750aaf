"""Preview (rasterizer-class) core — BASELINE config 1 parity
(RenderCore_SoftRasterizer, rendercore.cpp:205-218)."""
import numpy as np

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render.cores.base import create_core
from lighthouse2_tpu.scene.presets import cornell_box


def test_preview_core_renders_layout():
    cfg = RenderConfig(width=32, height=32, spp_per_pass=1, use_bvh=True)
    core = create_core("preview", cfg)
    scene, cam = cornell_box(32, 32)
    ds = scene.sync(rebuild_bvh=True)
    stats = core.render(ds, cam.get_view())
    img = core.get_image()
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    # wall hues visible without any light transport
    left, right = img[16, 2], img[16, 29]
    assert left[0] > left[1]       # red wall
    assert right[1] > right[0]     # green wall
    # light quad shows as emissive (bright) at the ceiling centre
    assert img[2, 16].max() > 1.0
    # depth buffer: finite where geometry, ordered front-to-back
    assert np.isfinite(core.depth).all()   # closed box -> all hits
    assert stats["total_rays"] == 32 * 32


def test_preview_core_matches_pt_albedo_structure():
    """The preview's silhouette must match the path tracer's primary hits:
    pixels where PT sees the red wall must be red-dominant in the preview."""
    cfg = RenderConfig(width=24, height=24, spp_per_pass=1, use_bvh=True)
    scene, cam = cornell_box(24, 24)
    ds = scene.sync(rebuild_bvh=True)
    core = create_core("preview", cfg)
    core.render(ds, cam.get_view())
    img = core.get_image()
    # every pixel is either a surface (finite depth) or sky; cornell has no
    # sky holes from this camera
    assert (core.depth < 100).all()
    assert img.min() >= 0.0


def test_minimal_core_plots_vertices():
    """RenderCore_Minimal analog (rendercore.cpp:46-78): white vertex dots
    on black — the smallest valid backend must honor the core contract."""
    import numpy as np
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.scene.presets import cornell_box
    cfg = RenderConfig(width=64, height=64)
    core = create_core("minimal", cfg)
    scene, cam = cornell_box(64, 64)
    ds = scene.sync(rebuild_bvh=False)
    stats = core.render(ds, cam.get_view())
    img = core.get_image()
    assert img.shape == (64, 64, 3)
    lit = (img[:, :, 0] > 0.5).sum()
    assert 4 <= lit <= 64 * 64 // 4        # sparse white dots
    assert (img >= 0).all() and (img <= 1).all()
    assert "render_time" in stats
