"""ai_debugger app analog (apps/ai_debugger_cli.py) — builds a navmesh from
a scene, paths + steers an agent, renders the annotated frame
(apps/ai_debugger/main.cpp:29-144)."""
import os


def test_ai_debugger_cli_end_to_end(tmp_path):
    from lighthouse2_tpu.apps.ai_debugger_cli import main
    out = tmp_path / "nav.png"
    nav = tmp_path / "nav.npz"
    rc = main(["cornell", "--size", "64", "--spp", "2",
               "-o", str(out), "--save-navmesh", str(nav),
               "--steps", "10"])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 100
    assert nav.exists()
    # the serialized navmesh round-trips (navmesh_io.h analog)
    from lighthouse2_tpu.pathfinding.io import load_navmesh
    nm = load_navmesh(str(nav))
    assert nm.walkable.sum() > 0
