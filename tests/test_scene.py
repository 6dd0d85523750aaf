"""Host scene system tests: mesh building, lights extraction, scene graph,
camera, materials, API facade."""
import os

import numpy as np

from lighthouse2_tpu.scene.host_scene import HostScene, HostNode
from lighthouse2_tpu.scene.host_mesh import HostMesh
from lighthouse2_tpu.scene.camera import Camera
from lighthouse2_tpu.core.types import RenderConfig


def test_quad_geometry():
    m = HostMesh.quad((0, 1, 0), (0, 0, 0), 2.0, 2.0, 0)
    assert m.n_tris == 2
    # area of both tris = 4
    a = 0.5 * np.linalg.norm(np.cross(m.v1 - m.v0, m.v2 - m.v0), axis=1).sum()
    np.testing.assert_allclose(a, 4.0, rtol=1e-5)
    np.testing.assert_allclose(m.face_n, [[0, 1, 0]] * 2, atol=1e-6)


def test_mesh_normals_and_alphas():
    # a tent of two triangles sharing an edge → nonzero consistent alphas
    v = np.array([[0, 0, 0], [1, 0, 0], [0.5, 0.5, 0.5], [1.5, 0.5, 0.5]],
                 np.float32)
    idx = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    m = HostMesh.from_indexed_data(v, idx)
    assert np.isfinite(m.alpha).all()
    assert (m.alpha >= 0).all()
    n = np.linalg.norm(m.n0, axis=1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_emissive_extraction_and_sync():
    scene = HostScene()
    lm = scene.add_material(name="light", color=(10.0, 10.0, 10.0))
    wm = scene.add_material(name="wall", color=(0.5, 0.5, 0.5))
    scene.add_instance(scene.add_quad((0, -1, 0), (0, 2, 0), 1, 1, lm))
    scene.add_instance(scene.add_quad((0, 1, 0), (0, 0, 0), 4, 4, wm))
    ds = scene.sync(rebuild_bvh=False)
    assert int(ds.lights.n_tri) == 2            # quad = 2 emissive tris
    np.testing.assert_allclose(np.asarray(ds.lights.tri_area[:2]), 0.5)
    np.testing.assert_allclose(np.asarray(ds.lights.tri_energy[:2]), 30.0)
    # ltri mapping set on the emissive triangles only
    ltri = np.asarray(ds.tris.ltri)
    assert (ltri[:2] >= 0).all() and (ltri[2:] == -1).all()


def test_scene_graph_transform_chain():
    scene = HostScene()
    mat = scene.add_material(color=(0.5, 0.5, 0.5))
    mesh = scene.add_quad((0, 1, 0), (0, 0, 0), 2, 2, mat)
    child = HostNode(mesh_id=mesh, translation=(1.0, 0.0, 0.0))
    child.has_trs = True
    cid = scene.add_node(child, root=False)
    parent = HostNode(translation=(0.0, 5.0, 0.0), children=[cid])
    parent.has_trs = True
    scene.add_node(parent)
    ds = scene.sync(rebuild_bvh=False)
    c = np.asarray(ds.tris.v0).mean(0)
    # quad centre moved to (1, 5, 0)-ish
    assert abs(c[1] - 5.0) < 1e-5


def test_dirty_caching():
    scene = HostScene()
    mat = scene.add_material(color=(0.5, 0.5, 0.5))
    scene.add_instance(scene.add_quad((0, 1, 0), (0, 0, 0), 2, 2, mat))
    ds1 = scene.sync(rebuild_bvh=False)
    ds2 = scene.sync(rebuild_bvh=False)
    assert ds1 is ds2                       # cached
    scene.add_point_light((0, 1, 0), (1, 1, 1))
    ds3 = scene.sync(rebuild_bvh=False)
    assert ds3 is not ds1


def test_camera_view_pyramid():
    cam = Camera(pixel_count=(64, 64), fov=90.0)
    cam.look_at((0, 0, 0), (0, 0, -1))
    view = cam.get_view()
    center = 0.25 * (np.asarray(view.p1) + np.asarray(view.p2)
                     + np.asarray(view.p3)
                     + (np.asarray(view.p2) + np.asarray(view.p3)
                        - np.asarray(view.p1)))
    d = center - np.asarray(view.pos)
    d /= np.linalg.norm(d)
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)
    # fov 90 → image plane half-extent == focal distance
    half = 0.5 * np.linalg.norm(np.asarray(view.p2) - np.asarray(view.p1))
    np.testing.assert_allclose(half, float(view.focal_distance), rtol=1e-5)


def test_camera_serialization(tmp_path):
    cam = Camera(pixel_count=(32, 32), fov=55.0)
    cam.look_at((1, 2, 3), (0, 0, 0))
    p = os.path.join(tmp_path, "cam.json")
    cam.serialize(p)
    cam2 = Camera.deserialize(p)
    np.testing.assert_allclose(cam2.position, cam.position)
    np.testing.assert_allclose(cam2.direction, cam.direction, atol=1e-6)
    assert cam2.fov == 55.0


def test_render_api_end_to_end():
    from lighthouse2_tpu.api import RenderAPI
    from lighthouse2_tpu.scene.presets import cornell_box
    api = RenderAPI.create("wavefront", RenderConfig(
        width=16, height=16, spp_per_pass=2, max_path_length=3, use_bvh=False))
    scene, cam = cornell_box(16, 16)
    api.scene = scene
    api.camera = cam
    stats = api.render()
    assert stats["primary_rays"] == 16 * 16 * 2
    img = api.get_image()
    assert img.shape == (16, 16, 3)
    ldr = api.get_ldr_image()
    assert ldr.min() >= 0 and ldr.max() <= 1
    # converge accumulates
    api.render()
    assert api.core.stats["spp"] == 4
    # camera move restarts
    api.camera.look_at((0, 1, 3.0), (0, 1.2, 0))
    api.render()
    assert api.core.stats["spp"] == 2


def test_probe():
    from lighthouse2_tpu.api import RenderAPI
    from lighthouse2_tpu.scene.presets import single_triangle
    api = RenderAPI.create("wavefront", RenderConfig(
        width=16, height=16, spp_per_pass=1, use_bvh=False))
    scene, cam = single_triangle(16, 16)
    api.scene = scene
    api.camera = cam
    res = api.probe(8, 8)
    assert res["prim"] == 0
    assert res["material"] == 0
    assert 2.0 < res["distance"] < 4.0


def test_remove_node():
    scene = HostScene()
    mat = scene.add_material(color=(0.5, 0.5, 0.5))
    mesh = scene.add_quad((0, 1, 0), (0, 0, 0), 2, 2, mat)
    nid = scene.add_instance(mesh)
    scene.add_instance(mesh)
    assert len(scene.flatten_instances()) == 2
    scene.remove_node(nid)
    assert len(scene.flatten_instances()) == 1


def test_material_serde_roundtrip(tmp_path):
    """Material JSON save/load matched by name (host_scene.cpp:60-163 analog)."""
    from lighthouse2_tpu.scene.host_scene import HostScene
    s = HostScene()
    s.add_material(name="a", color=(0.1, 0.2, 0.3), roughness=0.4,
                   metallic=0.5, eta=1.33, transmission=0.7)
    s.add_material(name="b", color=(2.0, 2.0, 2.0))
    p = str(tmp_path / "mats.json")
    s.serialize_materials(p)

    s2 = HostScene()
    s2.add_material(name="b", color=(0.0, 0.0, 0.0))
    s2.add_material(name="a", color=(0.9, 0.9, 0.9))
    s2.add_material(name="c", color=(0.5, 0.5, 0.5))
    assert s2.deserialize_materials(p) == 2
    a = s2.materials[s2.find_material("a")]
    assert a.color == (0.1, 0.2, 0.3)
    assert abs(a.roughness - 0.4) < 1e-6 and abs(a.eta - 1.33) < 1e-6
    b = s2.materials[s2.find_material("b")]
    assert b.is_emissive()
    assert s2.materials[s2.find_material("c")].color == (0.5, 0.5, 0.5)
