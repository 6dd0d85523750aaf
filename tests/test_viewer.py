"""Scripted viewer session — app-loop parity with imguiapp
(main.cpp:123-153 probe/material-edit, :185-271 main loop)."""
import os

import numpy as np
import pytest

from lighthouse2_tpu.api import RenderAPI
from lighthouse2_tpu.apps.viewer_cli import ViewerSession
from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.scene.presets import cornell_box


@pytest.fixture
def session(tmp_path):
    cfg = RenderConfig(width=32, height=32, spp_per_pass=2, max_path_length=4,
                       use_bvh=True)
    api = RenderAPI.create("wavefront", cfg)
    api.scene, api.camera = cornell_box(32, 32)
    return ViewerSession(api, str(tmp_path / "frames"))


def test_scripted_session(session, tmp_path):
    session.run_script("""
# converge two passes
frames 2
# probe the red wall (left side of the image)
probe 2 16
# brighten the probed material and re-render (restart semantics)
mat color 0.9 0.1 0.1
frames 1
camera save {cam}
""".format(cam=tmp_path / "cam.json"))
    frames = sorted(os.listdir(session.out_dir))
    assert frames == ["frame_0000.png", "frame_0001.png", "frame_0002.png"]
    assert (tmp_path / "cam.json").exists()
    # the probe selected the red wall's material
    assert session.selected_mat >= 0
    name = session.api.scene.materials[session.selected_mat].name
    assert name == "red"
    # probe set focal distance to the wall hit
    assert 0.5 < session.api.camera.focal_distance < 10.0


def test_probe_sets_focal_and_material_edit_restarts(session):
    session.run_script("frames 2")
    spp_before = session.api.core.stats["spp"]
    assert spp_before == 4                     # 2 passes x 2 spp, converged
    session.run_script("probe 16 28")          # floor
    session.run_script("mat color 0.2 0.2 0.8")
    session.run_script("frames 1")
    # material change dirtied the scene -> accumulator restarted
    assert session.api.core.stats["spp"] == 2
    img = session.api.get_image()
    assert np.isfinite(img).all()


def test_camera_motion_restarts(session):
    session.run_script("frames 2")
    assert session.api.core.stats["spp"] == 4
    session.run_script("move 0.1 0 0\nframes 1")
    assert session.api.core.stats["spp"] == 2  # restart on camera move
    session.run_script("turn 5 0\nframes 1")
    assert session.api.core.stats["spp"] == 2


def test_debug_views(session, tmp_path):
    """--debug parity (VERDICT r3 #7): BVH visit-count heatmap
    (ColorDebugBVH, raytracer.cpp:102-120), filter G-buffer mosaic
    (finalize_shared.h:491-541) and the BVH::Print analog."""
    from lighthouse2_tpu.utils.image import read_png
    session.run_script(f"debug bvh {tmp_path}/bvh.png")
    session.run_script(f"debug gbuffer {tmp_path}/gb.png")
    session.run_script("debug tree")
    b = read_png(str(tmp_path / "bvh.png"))
    assert b.shape == (32, 32, 3)
    assert b.std() > 0          # structure, not a constant field
    g = read_png(str(tmp_path / "gb.png"))
    assert g.shape == (64, 64, 3)   # 2x2 mosaic of 32x32 views
    assert any("BVH" in line for line in session.log)


def test_frame_server_streams_latest_frame(session):
    """--serve analog: the live HTTP endpoint must hold the latest frame
    (the present-every-frame half of the reference's loop, main.cpp:270)."""
    import urllib.request
    from lighthouse2_tpu.apps.viewer_cli import FrameServer
    srv = FrameServer(0)
    try:
        session.server = srv
        session.run_line("snap")
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/", timeout=10).read()
        assert b"frame.png" in page
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/frame.png", timeout=10).read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        stats = urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/stats", timeout=10).read()
        assert b"render_time" in stats or stats == b"{}"
    finally:
        srv.close()
