"""OBJ / MTL / glTF / texture / animation loading tests (synthetic assets)."""
import base64
import json
import os

import numpy as np

from lighthouse2_tpu.scene.host_scene import HostScene
from lighthouse2_tpu.utils import image as im


OBJ_CUBE = """
mtllib cube.mtl
v -1 -1 -1
v 1 -1 -1
v 1 1 -1
v -1 1 -1
v -1 -1 1
v 1 -1 1
v 1 1 1
v -1 1 1
usemtl red
f 1 2 3 4
f 5 8 7 6
usemtl glass
f 1 5 6 2
f 3 7 8 4
f 2 6 7 3
f 1 4 8 5
"""

MTL = """
newmtl red
Kd 0.8 0.1 0.1
newmtl glass
Kd 1 1 1
d 0.1
Ni 1.5
"""


def test_obj_loading(tmp_path):
    objp = os.path.join(tmp_path, "cube.obj")
    with open(objp, "w") as f:
        f.write(OBJ_CUBE)
    with open(os.path.join(tmp_path, "cube.mtl"), "w") as f:
        f.write(MTL)
    scene = HostScene()
    mid = scene.load_obj(objp)
    mesh = scene.meshes[mid]
    assert mesh.n_tris == 12      # 6 quads fan-triangulated
    # materials registered
    ri = scene.find_material("red")
    gi = scene.find_material("glass")
    assert ri >= 0 and gi >= 0
    assert abs(scene.materials[gi].transmission - 0.9) < 1e-6
    assert abs(scene.materials[gi].eta - 1.5) < 1e-6
    # per-face material split: 2 red quads = 4 tris, 4 glass quads = 8 tris
    assert (mesh.mat == ri).sum() == 4
    assert (mesh.mat == gi).sum() == 8
    # renders without error
    scene.add_instance(mid)
    ds = scene.sync(rebuild_bvh=False)
    assert int(ds.tris.v0.shape[0]) == 12


def _make_gltf(tmp_path):
    """Two-triangle quad with TRS node + one LINEAR translation animation."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    times = np.array([0.0, 1.0], np.float32)
    trans = np.array([[0, 0, 0], [2, 0, 0]], np.float32)
    buf = pos.tobytes() + idx.tobytes() + b"\x00" * 0 + times.tobytes() + trans.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(buf),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(buf).decode()}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 12},
            {"buffer": 0, "byteOffset": 60, "byteLength": 8},
            {"buffer": 0, "byteOffset": 68, "byteLength": 24},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 2, "componentType": 5126, "count": 2, "type": "SCALAR"},
            {"bufferView": 3, "componentType": 5126, "count": 2, "type": "VEC3"},
        ],
        "materials": [{"name": "quadmat",
                       "pbrMetallicRoughness": {
                           "baseColorFactor": [0.2, 0.4, 0.8, 1.0],
                           "roughnessFactor": 0.5}}],
        "meshes": [{"name": "quad", "primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "nodes": [{"mesh": 0, "translation": [5, 0, 0], "name": "quadnode"}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
        "animations": [{
            "samplers": [{"input": 2, "output": 3, "interpolation": "LINEAR"}],
            "channels": [{"sampler": 0,
                          "target": {"node": 0, "path": "translation"}}],
        }],
    }
    p = os.path.join(tmp_path, "quad.gltf")
    with open(p, "w") as f:
        json.dump(doc, f)
    return p


def test_gltf_loading_and_animation(tmp_path):
    p = _make_gltf(tmp_path)
    scene = HostScene()
    roots = scene.load_gltf(p)
    assert len(roots) == 1
    assert len(scene.meshes) == 1
    assert scene.meshes[0].n_tris == 2
    m = scene.materials[scene.find_material("quadmat")]
    assert abs(m.roughness - 0.5) < 1e-6
    ds = scene.sync(rebuild_bvh=False)
    # node translation applied
    c = np.asarray(ds.tris.v0).mean(0)
    assert c[0] > 4.0
    # animation moves the node
    assert len(scene.animations) == 1
    # animation REPLACES node TRS: t=1 → translation (2,0,0) instead of (5,0,0)
    scene.animations[0].apply(scene, 1.0)
    ds2 = scene.sync(rebuild_bvh=False)
    c2 = np.asarray(ds2.tris.v0).mean(0)
    np.testing.assert_allclose(c2[0] - c[0], -3.0, atol=1e-5)
    # halfway: linear interpolation → (1,0,0)
    scene.animations[0].apply(scene, 0.5)
    c3 = np.asarray(scene.sync(rebuild_bvh=False).tris.v0).mean(0)
    np.testing.assert_allclose(c3[0] - c[0], -4.0, atol=1e-5)


def test_glb_loading(tmp_path):
    # wrap the same gltf into a glb container
    p = _make_gltf(tmp_path)
    with open(p) as f:
        doc = json.load(f)
    uri = doc["buffers"][0].pop("uri")
    bin_data = base64.b64decode(uri.split(",", 1)[1])
    js = json.dumps(doc).encode()
    js += b" " * ((4 - len(js) % 4) % 4)
    bin_pad = bin_data + b"\x00" * ((4 - len(bin_data) % 4) % 4)
    import struct
    glb = (b"glTF" + struct.pack("<II", 2, 12 + 8 + len(js) + 8 + len(bin_pad))
           + struct.pack("<II", len(js), 0x4E4F534A) + js
           + struct.pack("<II", len(bin_pad), 0x004E4942) + bin_pad)
    gp = os.path.join(tmp_path, "quad.glb")
    with open(gp, "wb") as f:
        f.write(glb)
    scene = HostScene()
    scene.load_gltf(gp)
    assert scene.meshes[0].n_tris == 2


def test_png_roundtrip(tmp_path):
    img = (np.random.RandomState(0).rand(13, 17, 3) * 255).astype(np.uint8)
    p = os.path.join(tmp_path, "t.png")
    im.write_png(p, img)
    back = im.read_png(p)
    np.testing.assert_array_equal(back, img)


def test_hdr_roundtrip(tmp_path):
    img = np.abs(np.random.RandomState(1).randn(9, 11, 3)).astype(np.float32) * 5
    p = os.path.join(tmp_path, "t.hdr")
    im.write_hdr(p, img)
    back = im.read_hdr(p)
    # RGBE: shared exponent → abs error up to 2^exp/256 ≈ 0.4% of the
    # per-pixel max
    err = np.abs(back - img)
    tol = img.max(axis=2, keepdims=True) * 0.004 + 1e-4
    assert (err <= tol).all()


def test_texture_mips_and_pool():
    from lighthouse2_tpu.scene.host_texture import HostTexture, build_texture_pool
    px = (np.random.RandomState(2).rand(16, 16, 3) * 255).astype(np.uint8)
    t = HostTexture(px, srgb=False)
    assert len(t.mips) == 5
    assert t.mips[1].shape[:2] == (8, 8)
    np.testing.assert_allclose(t.mips[1].mean(), t.mips[0].mean(), atol=1e-3)
    pool = build_texture_pool([t])
    assert int(pool.desc[0, 0, 1]) == 16
    assert pool.pool.shape[1] == 16 * 16 + 8 * 8 + 4 * 4 + 2 * 2 + 1


def test_texture_fetch_bilinear():
    import jax.numpy as jnp
    from lighthouse2_tpu.scene.host_texture import HostTexture, build_texture_pool
    from lighthouse2_tpu.render.textures import fetch_bilinear, fetch_trilinear
    px = np.zeros((4, 4, 3), np.float32)
    px[:, :2] = 1.0   # left half white
    t = HostTexture(px, srgb=False)
    pool = build_texture_pool([t])
    tid = jnp.zeros((3,), jnp.int32)
    uv = jnp.asarray([[0.125, 0.125], [0.875, 0.5], [0.5, 0.5]], jnp.float32)
    out = np.asarray(fetch_bilinear(pool, tid, uv, jnp.zeros((3,), jnp.int32)))
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[1, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(out[2, 0], 0.5, atol=1e-5)
    # top mip = average
    out = np.asarray(fetch_trilinear(pool, tid, uv, jnp.full((3,), 4.0)))
    np.testing.assert_allclose(out[:, 0], 0.5, atol=1e-5)


def test_skinning_pose():
    """Two-joint skin: verts weighted to joint1 follow its rotation
    (host_node.cpp:181-192 semantics)."""
    from lighthouse2_tpu.scene.host_mesh import HostMesh
    from lighthouse2_tpu.scene.host_scene import HostNode, HostSkin
    scene = HostScene()
    mat = scene.add_material(color=(0.5, 0.5, 0.5))
    verts = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 3], [1, 2, 3]], np.int32)
    joints = np.array([[0, 0, 0, 0]] * 2 + [[1, 0, 0, 0]] * 2, np.int32)
    weights = np.array([[1, 0, 0, 0]] * 4, np.float32)
    mesh = HostMesh.from_indexed_data(verts, idx, material=mat,
                                      joints=joints, weights=weights)
    mid = scene.add_mesh(mesh)
    j0 = scene.add_node(HostNode(name="j0"), root=True)
    j1 = scene.add_node(HostNode(name="j1", translation=(0, 5, 0)), root=True)
    scene.nodes[j1].has_trs = True
    skin = HostSkin([j0, j1], np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)))
    scene.skins.append(skin)
    n = HostNode(mesh_id=mid, skin_id=0)
    scene.add_node(n, root=True)
    ds = scene.sync(rebuild_bvh=False)
    v = np.asarray(ds.tris.v0)
    allv = np.concatenate([np.asarray(ds.tris.v0),
                           np.asarray(ds.tris.v0) + np.asarray(ds.tris.e1),
                           np.asarray(ds.tris.v0) + np.asarray(ds.tris.e2)])
    # vertices bound to joint 1 moved up by 5
    assert allv[:, 1].max() > 4.9


def test_jpeg_texture_loads(tmp_path):
    """JPEG textures load through HostTexture + the glTF image path
    (reference: FreeImage handles .jpg; utils/image.read_jpeg here)."""
    import numpy as np
    from PIL import Image
    from lighthouse2_tpu.scene.host_texture import HostTexture
    rgb = (np.linspace(0, 255, 32 * 32 * 3) % 256).astype(np.uint8)
    rgb = rgb.reshape(32, 32, 3)
    p = str(tmp_path / "t.jpg")
    Image.fromarray(rgb).save(p, quality=95)
    ht = HostTexture.load(p)
    assert ht.width == 32 and ht.height == 32
    assert len(ht.mips) == 5
    # decoded content resembles the source (JPEG is lossy; sRGB->linear)
    from lighthouse2_tpu.utils.image import read_jpeg
    dec = read_jpeg(p)
    assert dec.shape == (32, 32, 3)
    assert np.abs(dec.astype(int) - rgb.astype(int)).mean() < 12
