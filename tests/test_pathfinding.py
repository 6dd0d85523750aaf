"""PathFinding module tests (reference: lib/PathFinding; the reference has
no automated tests — SURVEY.md §4 — so these formalize its manual checks:
build a navmesh over a scene with an obstacle, path around it, steer agents,
round-trip serialization)."""
import numpy as np
import pytest

from lighthouse2_tpu.pathfinding import (
    NavMeshConfig, NavMeshBuilder, NavMeshNavigator, NavMeshAgents,
    NavMeshShader, save_navmesh, load_navmesh)
from lighthouse2_tpu.pathfinding.navigator import NoPathError
from lighthouse2_tpu.pathfinding.shader import _box_tris


def _ground(size=10.0, y=0.0):
    # wound so the face normal points +y (recast walkability is up-facing)
    s = size / 2
    quad = np.array([[[-s, y, -s], [s, y, s], [s, y, -s]],
                     [[-s, y, -s], [-s, y, s], [s, y, s]]], np.float32)
    return quad


def _box(lo, hi):
    return _box_tris(np.asarray(lo, np.float32), np.asarray(hi, np.float32))


@pytest.fixture(scope="module")
def obstacle_navmesh():
    """10x10 ground with a tall wall across the middle (gap at one end)."""
    tris = [_ground(10.0)]
    # wall from x=-5..3 at z in [-0.4, 0.4], 3 high: must detour via x>3
    tris.append(_box((-5.0, 0.0, -0.4), (3.0, 3.0, 0.4)))
    tris = np.concatenate(tris, 0)
    cfg = NavMeshConfig(cell_size=0.2, agent_radius=0.3,
                        agent_max_climb=0.3, min_region_area=0.2)
    return NavMeshBuilder(cfg).build(tris)


def test_build_walkable(obstacle_navmesh):
    nm = obstacle_navmesh
    assert nm.n_regions >= 1
    assert nm.walkable.sum() > 100
    # cell on open ground is walkable at ground level; the wall top is a
    # separate elevated region (like recast: roofs are their own regions)
    g = nm.world_to_cell((0.0, 0, -3.0))
    t = nm.world_to_cell((0.0, 0, 0.0))
    assert nm.is_walkable(*g) and abs(nm.floor[g]) < 0.2
    assert (not nm.is_walkable(*t)) or (
        nm.floor[t] > 2.0 and nm.region[t] != nm.region[g])


def test_down_facing_floor_rejected():
    """recast marks only up-facing triangles walkable; a floor wound so its
    normal points -y builds zero walkable area."""
    s = 5.0
    down = np.array([[[-s, 0, -s], [s, 0, -s], [s, 0, s]],
                     [[-s, 0, -s], [s, 0, s], [-s, 0, s]]], np.float32)
    nm = NavMeshBuilder(NavMeshConfig(cell_size=0.2)).build(down)
    assert nm.walkable.sum() == 0
    assert nm.n_regions == 0


def test_vertical_wall_obstructs():
    """Thin walls modeled as vertical quads (degenerate xz projection) must
    still block (recast voxelizes all triangles into blocking spans)."""
    tris = [_ground(10.0)]
    # zero-thickness vertical wall across the whole z range at x=0, 3 high
    w = np.array([[[0, 0, -5], [0, 3, -5], [0, 3, 5]],
                  [[0, 0, -5], [0, 3, 5], [0, 0, 5]]], np.float32)
    tris.append(w)
    cfg = NavMeshConfig(cell_size=0.2, agent_radius=0.2,
                        agent_max_climb=0.3, min_region_area=0.2)
    nm = NavMeshBuilder(cfg).build(np.concatenate(tris, 0))
    left = nm.world_to_cell((-3.0, 0, 0.0))
    right = nm.world_to_cell((3.0, 0, 0.0))
    assert nm.is_walkable(*left) and nm.is_walkable(*right)
    assert nm.region[left] != nm.region[right]
    nav = NavMeshNavigator(nm)
    with pytest.raises(NoPathError):
        nav.find_path((-3.0, 0, 0.0), (3.0, 0, 0.0))


def test_wall_top_requires_climb():
    """Wall top is a floor but disconnected from the ground (climb 3.0 >
    max_climb) -> separate region."""
    tris = np.concatenate([_ground(10.0),
                           _box((-2, 0, -2), (2, 3.0, 2))], 0)
    cfg = NavMeshConfig(cell_size=0.25, agent_radius=0.3,
                        agent_max_climb=0.4, min_region_area=0.2)
    nm = NavMeshBuilder(cfg).build(tris)
    assert nm.n_regions >= 2
    top = nm.world_to_cell((0.0, 0, 0.0))
    ground = nm.world_to_cell((0.0, 0, -4.0))
    assert nm.region[top] != nm.region[ground]
    assert abs(nm.floor[top] - 3.0) < 0.3


def test_find_path_detours(obstacle_navmesh):
    nav = NavMeshNavigator(obstacle_navmesh)
    path = nav.find_path((-3.0, 0, -3.0), (-3.0, 0, 3.0))
    assert len(path) >= 2
    np.testing.assert_allclose(path[0][[0, 2]], (-3, -3), atol=0.3)
    np.testing.assert_allclose(path[-1][[0, 2]], (-3, 3), atol=0.3)
    # the path must detour right of the wall end (x > 3 side is the only gap)
    assert path[:, 0].max() > 2.5
    # every adjacent segment passes the walkability raycast
    for a, b in zip(path[:-1], path[1:]):
        hit, _ = nav.raycast(a, b)
        assert not hit


def test_raycast_blocked(obstacle_navmesh):
    nav = NavMeshNavigator(obstacle_navmesh)
    hit, pt = nav.raycast((-3.0, 0, -3.0), (-3.0, 0, 3.0))
    assert hit
    assert pt[2] < 0.0  # stopped before the wall
    hit, _ = nav.raycast((-3.0, 0, -3.0), (3.0, 0, -3.0))
    assert not hit


def test_no_path_raises():
    # two islands
    tris = np.concatenate([
        _ground(4.0), _box_tris(np.array([8, 0, -2], np.float32),
                                np.array([12, 0.01, 2], np.float32))], 0)
    cfg = NavMeshConfig(cell_size=0.2, agent_radius=0.2, min_region_area=0.1)
    nm = NavMeshBuilder(cfg).build(tris)
    nav = NavMeshNavigator(nm)
    with pytest.raises(NoPathError):
        nav.find_path((0, 0, 0), (10.0, 0, 0))


def test_agents_reach_target(obstacle_navmesh):
    nav = NavMeshNavigator(obstacle_navmesh)
    agents = NavMeshAgents(nav, max_agents=4)
    a = agents.add_agent((-3.0, 0, -3.0))
    assert a.set_target((-3.0, 0, 3.0))
    for _ in range(400):
        agents.update(0.05)
        if a.arrived:
            break
    assert a.arrived
    np.testing.assert_allclose(a.position[[0, 2]], (-3, 3), atol=0.5)


def test_agent_pool_and_remove(obstacle_navmesh):
    nav = NavMeshNavigator(obstacle_navmesh)
    agents = NavMeshAgents(nav, max_agents=2)
    a = agents.add_agent((0, 0, -3))
    b = agents.add_agent((1, 0, -3))
    with pytest.raises(RuntimeError):
        agents.add_agent((2, 0, -3))
    agents.remove_agent(a)
    agents.add_agent((2, 0, -3))
    assert agents.active.sum() == 2
    assert not a.alive and b.alive


def test_serialization_roundtrip(tmp_path, obstacle_navmesh):
    p = tmp_path / "navmesh.npz"
    save_navmesh(p, obstacle_navmesh)
    nm2 = load_navmesh(p)
    np.testing.assert_array_equal(nm2.walkable, obstacle_navmesh.walkable)
    np.testing.assert_array_equal(nm2.region, obstacle_navmesh.region)
    np.testing.assert_allclose(nm2.floor[obstacle_navmesh.walkable],
                               obstacle_navmesh.floor[obstacle_navmesh.walkable])
    assert nm2.config.cell_size == obstacle_navmesh.config.cell_size
    # queries still work on the loaded navmesh
    nav = NavMeshNavigator(nm2)
    path = nav.find_path((-3.0, 0, -3.0), (-3.0, 0, 3.0))
    assert path[:, 0].max() > 2.5


def test_shader_adds_and_clears(obstacle_navmesh):
    from lighthouse2_tpu.scene.host_scene import HostScene
    scene = HostScene()
    shader = NavMeshShader(scene)
    n = shader.add_navmesh(obstacle_navmesh)
    assert n >= 1
    nav = NavMeshNavigator(obstacle_navmesh)
    path = nav.find_path((-3.0, 0, -3.0), (-3.0, 0, 3.0))
    shader.add_path(path)
    shader.add_agent((-3.0, 0, -3.0))
    n_nodes = len(scene.root_nodes)
    assert n_nodes >= n + 2
    shader.clear()
    # all shader nodes removed again
    assert len(shader._node_ids) == 0


def test_build_from_scene():
    from lighthouse2_tpu.scene.host_scene import HostScene
    from lighthouse2_tpu.scene.host_mesh import HostMesh
    scene = HostScene()
    mat = scene.add_material(color=(0.5, 0.5, 0.5))
    mid = scene.add_mesh(HostMesh.quad(
        (0, 1, 0), (0, 0, 0), 8.0, 8.0, mat))
    scene.add_instance(mid)
    cfg = NavMeshConfig(cell_size=0.25, agent_radius=0.25,
                        min_region_area=0.2)
    nm = NavMeshBuilder(cfg).build_from_scene(scene)
    assert nm.walkable.sum() > 50
