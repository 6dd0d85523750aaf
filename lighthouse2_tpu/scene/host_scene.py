"""HostScene — the scene database + device sync (reference: host_scene.cpp,
rendersystem.cpp:214-258).

The reference keeps crc64 dirty flags per object and pushes deltas through
CoreAPI setters each frame. Here `sync()` rebuilds the flattened world-space
SoA arrays in numpy when `dirty` is set and returns an immutable DeviceScene
pytree; unchanged scenes reuse the cached device arrays (same effect as the
TRACKCHANGES short-circuit, system.h:188-194).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from lighthouse2_tpu.scene.host_material import HostMaterial, materials_to_numpy
from lighthouse2_tpu.scene.host_mesh import HostMesh
from lighthouse2_tpu.scene.host_light import (
    HostPointLight, HostSpotLight, HostDirectionalLight, extract_area_lights,
)
from lighthouse2_tpu.scene.device_scene import (
    DeviceScene, DeviceTriangles, DeviceMaterials, DeviceSky,
    build_lights_np, empty_textures,
)


class HostNode:
    """Scene-graph node (host_node.h:28-63): TRS or matrix + optional mesh."""

    def __init__(self, mesh_id=-1, transform=None, translation=None,
                 rotation=None, scale=None, children=None, name="", skin_id=-1,
                 morph_weights=None):
        self.mesh_id = mesh_id
        self.matrix = np.eye(4, dtype=np.float32) if transform is None \
            else np.asarray(transform, np.float32)
        self.translation = np.zeros(3, np.float32) if translation is None \
            else np.asarray(translation, np.float32)
        self.rotation = np.array([0, 0, 0, 1], np.float32) if rotation is None \
            else np.asarray(rotation, np.float32)   # xyzw quaternion
        self.scale = np.ones(3, np.float32) if scale is None \
            else np.asarray(scale, np.float32)
        self.has_trs = transform is None and (
            translation is not None or rotation is not None or scale is not None)
        self.children = list(children) if children else []
        self.name = name
        self.skin_id = skin_id
        self.morph_weights = morph_weights
        self.combined = None  # world transform after update

    def local_transform(self):
        """node matrix = T·R·S·matrix (host_node.cpp:130-136)."""
        if not self.has_trs:
            return self.matrix
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = self.translation
        x, y, z, w = self.rotation
        r = np.eye(4, dtype=np.float32)
        r[:3, :3] = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ], np.float32)
        s = np.diag(list(self.scale) + [1.0]).astype(np.float32)
        return t @ r @ s @ self.matrix


class HostSkin:
    """glTF skin (host_mesh.h:25-35): joint node ids + inverse bind matrices."""

    def __init__(self, joint_nodes, inverse_bind_matrices):
        self.joint_nodes = list(joint_nodes)
        self.inverse_bind = np.asarray(inverse_bind_matrices, np.float32)


class HostScene:
    def __init__(self):
        self.materials: list[HostMaterial] = []
        self.meshes: list[HostMesh] = []
        self.nodes: list[HostNode] = []      # node pool
        self.root_nodes: list[int] = []      # indices into nodes
        self.skins: list[HostSkin] = []
        self.animations: list = []
        self.point_lights: list[HostPointLight] = []
        self.spot_lights: list[HostSpotLight] = []
        self.dir_lights: list[HostDirectionalLight] = []
        self.sky_pixels: "np.ndarray | None" = None   # [H,W,3] float32
        self.textures: list = []             # HostTexture list
        self.dirty = True
        self._cached = None
        self._blas_cache: dict = {}          # mesh_id -> (pose_fp, flat blas)
        # acceleration-structure build counters (CoreStats.bvhBuildTime
        # analog; lets tests assert static BLASes aren't rebuilt)
        self.build_stats = {"blas_builds": 0, "tlas_composes": 0}

    # -- construction API (RenderAPI analogs, render_api.h:28-69) ------------

    def add_material(self, material=None, **kw) -> int:
        if material is None:
            material = HostMaterial(**kw)
        self.materials.append(material)
        self.dirty = True
        return len(self.materials) - 1

    def find_material(self, name: str) -> int:
        for i, m in enumerate(self.materials):
            if m.name == name:
                return i
        return -1

    def serialize_materials(self, path) -> None:
        """Save all materials as JSON (host_scene.cpp:60-104 analog)."""
        from lighthouse2_tpu.scene.host_material import serialize_materials
        serialize_materials(self.materials, path)

    def deserialize_materials(self, path) -> int:
        """Load materials from JSON, matching into the scene BY NAME like the
        reference (host_scene.cpp:107-163). Returns the number matched."""
        from lighthouse2_tpu.scene.host_material import deserialize_materials
        n = 0
        for m in deserialize_materials(path):
            i = self.find_material(m.name)
            if i >= 0:
                self.materials[i] = m
                n += 1
        if n:
            self.dirty = True
        return n

    def add_mesh(self, mesh: HostMesh) -> int:
        self.meshes.append(mesh)
        self.dirty = True
        return len(self.meshes) - 1

    def add_quad(self, n, pos, width, height, mat_id) -> int:
        return self.add_mesh(HostMesh.quad(n, pos, width, height, mat_id))

    def add_node(self, node: HostNode, root=True) -> int:
        self.nodes.append(node)
        nid = len(self.nodes) - 1
        if root:
            self.root_nodes.append(nid)
        self.dirty = True
        return nid

    def add_instance(self, mesh_id: int, transform=None) -> int:
        """host_scene.cpp:399 analog: a root node referencing a mesh."""
        return self.add_node(HostNode(mesh_id=mesh_id, transform=transform))

    def set_node_transform(self, node_id: int, transform) -> None:
        """Move an instance (render_api.h SetNodeTransform analog). With the
        two-level BVH this costs a TLAS re-compose, not a BLAS rebuild."""
        n = self.nodes[node_id]
        n.matrix = np.asarray(transform, np.float32)
        n.has_trs = False
        self.dirty = True

    def remove_node(self, node_id: int):
        """host_scene.cpp:434 analog (keeps pool indices stable)."""
        if node_id in self.root_nodes:
            self.root_nodes.remove(node_id)
        self.nodes[node_id].mesh_id = -1
        self.nodes[node_id].children = []
        self.dirty = True

    def add_point_light(self, position, radiance) -> int:
        self.point_lights.append(HostPointLight(position, radiance))
        self.dirty = True
        return len(self.point_lights) - 1

    def add_spot_light(self, position, radiance, direction,
                       inner_deg=30.0, outer_deg=45.0) -> int:
        self.spot_lights.append(
            HostSpotLight(position, radiance, direction, inner_deg, outer_deg))
        self.dirty = True
        return len(self.spot_lights) - 1

    def add_directional_light(self, direction, radiance) -> int:
        self.dir_lights.append(HostDirectionalLight(direction, radiance))
        self.dirty = True
        return len(self.dir_lights) - 1

    def add_texture(self, texture) -> int:
        self.textures.append(texture)
        self.dirty = True
        return len(self.textures) - 1

    def load_obj(self, path, scale=1.0, flat_shaded=False) -> int:
        """AddMesh-from-OBJ (render_api.h AddMesh analog)."""
        from lighthouse2_tpu.scene.obj import load_obj
        return self.add_mesh(load_obj(path, scene=self, scale=scale,
                                      flat_shaded=flat_shaded))

    def load_gltf(self, path, transform=None) -> list:
        """AddScene analog (host_scene.cpp:230): loads a whole glTF scene
        graph; returns the new root node ids."""
        from lighthouse2_tpu.scene.gltf import load_gltf
        return load_gltf(path, self, transform)

    def set_sky(self, pixels) -> None:
        """Equirect HDR pixels [H,W,3] or a constant color tuple."""
        p = np.asarray(pixels, np.float32)
        if p.ndim == 1:
            p = p.reshape(1, 1, 3)
        self.sky_pixels = p
        self._sky_ibl = None
        self.dirty = True

    def load_sky(self, path: str, cache: bool = True) -> None:
        """Load an equirect HDR skydome with a binary side-cache of the
        decoded pixels AND the IBL pdf/cdf tables (`<path>.lh2sky.npz`,
        keyed by source mtime) — the host_skydome.cpp:82-96 `.bin` cache
        analog, extended to the importance-sampling tables."""
        import os
        cache = cache and not os.environ.get("LH2_NO_TEXCACHE")
        cpath = path + ".lh2sky.npz"
        if cache:
            try:
                key = np.float64(os.path.getmtime(path))
                with np.load(cpath) as z:
                    if float(z["key"]) == float(key):
                        self.sky_pixels = z["pixels"]
                        self._sky_ibl = (z["pdf"], z["cdf_rows"],
                                         z["cdf_cond"], float(z["nee"]))
                        self.dirty = True
                        return
            except (OSError, KeyError, ValueError):
                pass
        from lighthouse2_tpu.utils import image as im
        from lighthouse2_tpu.render.sky import build_sky_cdf
        px = np.asarray(im.read_hdr(path), np.float32)
        pdf, cdf_rows, cdf_cond, nee = build_sky_cdf(px)
        self.sky_pixels = px
        self._sky_ibl = (pdf, cdf_rows, cdf_cond, nee)
        self.dirty = True
        if cache:
            try:
                np.savez(cpath, key=np.float64(os.path.getmtime(path)),
                         pixels=px, pdf=pdf, cdf_rows=cdf_rows,
                         cdf_cond=cdf_cond, nee=np.float64(nee))
            except OSError:
                pass

    # -- scene-graph flatten (host_node.cpp:144-197 analog) ------------------

    def flatten_instances(self):
        """Walk root nodes, flatten transforms; returns [(mesh_id, world4x4, node)]."""
        out = []

        def walk(nid, parent):
            node = self.nodes[nid]
            world = parent @ node.local_transform()
            node.combined = world
            if node.mesh_id >= 0:
                out.append((node.mesh_id, world, node))
            for c in node.children:
                walk(c, world)

        eye = np.eye(4, dtype=np.float32)
        for r in self.root_nodes:
            walk(r, eye)
        return out

    def _posed_mesh(self, mesh: HostMesh, node: HostNode) -> HostMesh:
        """Apply skinning (host_node.cpp:181-192) / morph targets to a mesh."""
        posed = mesh
        if node.morph_weights is not None and mesh.morph_targets:
            posed = _apply_morph(mesh, np.asarray(node.morph_weights, np.float32))
        if node.skin_id >= 0 and mesh.joints is not None:
            posed = _apply_skin(posed, self, node)
        return posed

    def _mesh_blas(self, mesh_id: int, posed: HostMesh) -> dict:
        """Cached mesh-space SAH BLAS (core_mesh.cpp:36-133 GAS analog).

        Static meshes build once and persist across transform changes /
        TLAS re-composition. Posed (skinned/morphed) copies are keyed by a
        vertex-data fingerprint so a new pose rebuilds only that mesh."""
        from lighthouse2_tpu.bvh.builder import build_sah_bvh
        fp = None
        if posed is not self.meshes[mesh_id]:
            fp = hash(posed.v0.tobytes()) ^ hash(posed.v1.tobytes())
        entry = self._blas_cache.get(mesh_id)
        if entry is not None and entry[0] == fp:
            return entry[1]
        blas = build_sah_bvh(posed.v0, posed.v1, posed.v2)
        self._blas_cache[mesh_id] = (fp, blas)
        self.build_stats["blas_builds"] += 1
        return blas

    # -- device sync (rendersystem.cpp:214 analog) ---------------------------

    def sync(self, rebuild_bvh=True, two_level=True) -> DeviceScene:
        if not self.dirty and self._cached is not None:
            return self._cached
        instances = self.flatten_instances()
        blas_entries = None
        if not instances:
            # keep shapes non-empty: one degenerate triangle
            z = np.zeros((1, 3), np.float32)
            world = dict(v0=z, v1=z, v2=z, n0=z, n1=z, n2=z, face_n=z,
                         uv0=z[:, :2], uv1=z[:, :2], uv2=z[:, :2],
                         alpha=z, mat=np.zeros(1, np.int32))
        else:
            parts = []
            blas_entries = []
            tri_off = 0
            for mesh_id, world_m, node in instances:
                mesh = self._posed_mesh(self.meshes[mesh_id], node)
                parts.append(mesh.transformed(world_m))
                if rebuild_bvh and two_level:
                    blas_entries.append(
                        (self._mesh_blas(mesh_id, mesh), world_m, tri_off))
                tri_off += mesh.n_tris
            cat = lambda f: np.concatenate([getattr(p, f) for p in parts], 0)
            world = dict(
                v0=cat("v0"), v1=cat("v1"), v2=cat("v2"),
                n0=cat("n0"), n1=cat("n1"), n2=cat("n2"), face_n=cat("face_n"),
                uv0=cat("uv0"), uv1=cat("uv1"), uv2=cat("uv2"),
                alpha=cat("alpha"), mat=cat("mat"),
            )

        mats_np = materials_to_numpy(self.materials)
        tri_lights, ltri = extract_area_lights(
            world["v0"], world["v1"], world["v2"], world["mat"], mats_np["color"])

        e1 = world["v1"] - world["v0"]
        e2 = world["v2"] - world["v0"]
        cr = np.cross(e1, e2)
        area = 0.5 * np.linalg.norm(cr, axis=-1)
        inv_area = 1.0 / np.maximum(area, 1e-20)
        # triLOD = 0.5 log2(uv area / world area), 0 when no uvs (material_shared.h)
        uva = 0.5 * np.abs(
            (world["uv1"] - world["uv0"])[:, 0] * (world["uv2"] - world["uv0"])[:, 1]
            - (world["uv1"] - world["uv0"])[:, 1] * (world["uv2"] - world["uv0"])[:, 0])
        lod = np.where(uva > 0, 0.5 * np.log2(np.maximum(uva, 1e-20) * inv_area), 0.0)

        from lighthouse2_tpu.scene.host_mesh import compute_uv_tangents
        tanT, tanB = compute_uv_tangents(
            world["v0"], world["v1"], world["v2"],
            world["uv0"], world["uv1"], world["uv2"])
        tri9 = np.concatenate(
            [world["v0"].T, e1.T, e2.T], 0).astype(np.float32)
        tris = DeviceTriangles(
            tri9=jnp.asarray(tri9),
            tangent=jnp.asarray(tanT), bitangent=jnp.asarray(tanB),
            v0=jnp.asarray(world["v0"]), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
            n0=jnp.asarray(world["n0"]), n1=jnp.asarray(world["n1"]),
            n2=jnp.asarray(world["n2"]), face_n=jnp.asarray(world["face_n"]),
            uv0=jnp.asarray(world["uv0"]), uv1=jnp.asarray(world["uv1"]),
            uv2=jnp.asarray(world["uv2"]), alpha=jnp.asarray(world["alpha"]),
            mat=jnp.asarray(world["mat"]), ltri=jnp.asarray(ltri),
            area=jnp.asarray(area.astype(np.float32)),
            inv_area=jnp.asarray(inv_area.astype(np.float32)),
            lod=jnp.asarray(lod.astype(np.float32)),
        )
        s_param_maps = sum(
            (1 << bit) for bit, key in enumerate(
                ("tex_sheen", "tex_clearcoat", "tex_specular",
                 "tex_anisotropic", "tex_absorption"))
            if (mats_np[key] >= 0).any())
        s_base_maps = sum(
            (1 << bit) for bit, key in enumerate(
                ("tex_diffuse", "tex_normal", "tex_roughness",
                 "tex_metal_rough"))
            if (mats_np[key] >= 0).any())
        materials = DeviceMaterials(
            **{k: jnp.asarray(v) for k, v in mats_np.items()},
            s_param_maps=s_param_maps, s_base_maps=s_base_maps)
        lights = build_lights_np(
            tri_lights, self.point_lights, self.spot_lights, self.dir_lights)
        sky_px = (self.sky_pixels if self.sky_pixels is not None
                  else np.zeros((1, 1, 3), np.float32))
        if sky_px.shape[0] * sky_px.shape[1] > 1:
            # IBL tables (host_skydome.cpp:20-47 analog); reuse the
            # load_sky() cache when present, else build at sync
            if getattr(self, "_sky_ibl", None) is not None:
                pdf, cdf_rows, cdf_cond, nee_e = self._sky_ibl
            else:
                from lighthouse2_tpu.render.sky import build_sky_cdf
                pdf, cdf_rows, cdf_cond, nee_e = build_sky_cdf(sky_px)
            sky = DeviceSky(pixels=jnp.asarray(sky_px), pdf=jnp.asarray(pdf),
                            cdf_rows=jnp.asarray(cdf_rows),
                            cdf_cond=jnp.asarray(cdf_cond),
                            nee_energy=jnp.float32(nee_e), has_ibl=True)
        else:
            sky = DeviceSky(pixels=jnp.asarray(sky_px))

        bvh = None
        cbvh = None
        if rebuild_bvh:
            from lighthouse2_tpu.bvh.builder import build_sah_bvh
            from lighthouse2_tpu.bvh.traverse import device_bvh_from_flat
            from lighthouse2_tpu.bvh.clusters import cut_clusters
            if blas_entries:
                # two-level path: TLAS over cached per-mesh BLASes — a node
                # transform / animation re-composes boxes in O(nodes) instead
                # of re-running SAH over every world triangle (bvh/tlas.py;
                # ref rendercore_optix7/rendercore.cpp:387-428)
                from lighthouse2_tpu.bvh.tlas import compose_two_level
                flat = compose_two_level(blas_entries)
                self.build_stats["tlas_composes"] += 1
            else:
                flat = build_sah_bvh(world["v0"], world["v1"], world["v2"])
            bvh = device_bvh_from_flat(flat, world["v0"], world["v1"],
                                       world["v2"])
            # the pallas packet-traversal layout (render/kernels/trace.py);
            # shares the SAH topology, only re-cuts/re-flattens it. The
            # cluster tiles also bake the shading payload rows (normals, uvs,
            # alphas, ids, lod) so the kernel can extract them per hit.
            import os as _os
            cbvh = cut_clusters(
                flat, dict(world, ltri=ltri, lod=lod.astype(np.float32),
                           tangent=tanT, bitangent=tanB),
                # LH2_MIN_TPC=2 trades top-tree size (scalar walk length)
                # for fatter 256-tri leaves (more MXU work per visit) —
                # perf experiment knob, default 1
                min_tpc=int(_os.environ.get("LH2_MIN_TPC", "1")))

        if self.textures:
            from lighthouse2_tpu.scene.host_texture import build_texture_pool
            textures = build_texture_pool(self.textures)
        else:
            textures = empty_textures()

        scene = DeviceScene(tris=tris, materials=materials, lights=lights,
                            sky=sky, textures=textures, bvh=bvh, cbvh=cbvh)
        self._cached = scene
        self.dirty = False
        return scene


def _apply_morph(mesh: HostMesh, weights: np.ndarray) -> HostMesh:
    """Morph-target pose (host_mesh.cpp:639 SetPose(weights) analog)."""
    verts = mesh.base_vertices.copy()
    norms = mesh.base_normals.copy() if mesh.base_normals is not None else None
    for w, (dp, dn) in zip(weights, mesh.morph_targets):
        if w == 0.0:
            continue
        verts = verts + w * dp
        if norms is not None and dn is not None:
            norms = norms + w * dn
    if norms is not None:
        norms = norms / np.maximum(
            np.linalg.norm(norms, axis=-1, keepdims=True), 1e-20)
    return HostMesh.from_indexed_data(
        verts, mesh.indices, normals=norms, uvs=None,
        materials_per_tri=mesh.mat, name=mesh.name,
        joints=mesh.joints, weights=mesh.weights,
        morph_targets=mesh.morph_targets,
    )


def _apply_skin(mesh: HostMesh, scene: HostScene, node: HostNode) -> HostMesh:
    """Linear-blend skinning (host_node.cpp:181-192): v' = Σ wᵢ Jᵢ v with
    Jᵢ = meshTransform⁻¹ · jointWorld · inverseBind."""
    skin = scene.skins[node.skin_id]
    mesh_inv = np.linalg.inv(node.combined if node.combined is not None
                             else np.eye(4, dtype=np.float32))
    joint_mats = np.zeros((len(skin.joint_nodes), 4, 4), np.float32)
    for i, jn in enumerate(skin.joint_nodes):
        jw = scene.nodes[jn].combined
        if jw is None:
            jw = np.eye(4, dtype=np.float32)
        joint_mats[i] = mesh_inv @ jw @ skin.inverse_bind[i]
    w = mesh.weights                          # [V,4]
    j = mesh.joints                           # [V,4]
    m = np.einsum("vk,vkab->vab", w, joint_mats[j])   # [V,4,4]
    verts = np.einsum("vab,vb->va",
                      m, np.concatenate([mesh.base_vertices,
                                         np.ones((mesh.base_vertices.shape[0], 1),
                                                 np.float32)], -1))[:, :3]
    norms = None
    if mesh.base_normals is not None:
        nm = np.linalg.inv(m[:, :3, :3]).transpose(0, 2, 1)
        norms = np.einsum("vab,vb->va", nm, mesh.base_normals)
        norms = norms / np.maximum(np.linalg.norm(norms, axis=-1, keepdims=True), 1e-20)
    return HostMesh.from_indexed_data(
        verts, mesh.indices, normals=norms, materials_per_tri=mesh.mat,
        name=mesh.name, joints=mesh.joints, weights=mesh.weights,
        morph_targets=mesh.morph_targets,
    )
