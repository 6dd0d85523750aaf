"""DeviceScene — the HBM-resident SoA scene (RenderSystem→core upload analog).

The reference pushes scene deltas through CoreAPI_Base setters
(SetGeometry/SetInstance/SetMaterials/SetLights/SetSkyData, core_api_base.h:78-114)
into device buffers. Here the whole device scene is one immutable pytree of
jnp arrays, rebuilt (cheaply, host-side in numpy) whenever the host scene is
dirty and re-uploaded via device_put — the functional replacement for the
dirty-sync path in rendersystem.cpp:214-258.

Triangles are stored world-space-flattened over all instances for the
single-level path (a two-level TLAS path keeps per-mesh arrays; see bvh/).
Fat-triangle layout mirrors CoreTri (common_classes.h:57-91).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DeviceTriangles:
    v0: jnp.ndarray      # [T,3] vertex 0 (world space)
    e1: jnp.ndarray      # [T,3] v1-v0
    e2: jnp.ndarray      # [T,3] v2-v0
    n0: jnp.ndarray      # [T,3] vertex normals
    n1: jnp.ndarray
    n2: jnp.ndarray
    face_n: jnp.ndarray  # [T,3] geometric normal Nx/Ny/Nz (CoreTri.N)
    uv0: jnp.ndarray     # [T,2]
    uv1: jnp.ndarray
    uv2: jnp.ndarray
    alpha: jnp.ndarray   # [T,3] consistent-normal alphas (Reshetov)
    mat: jnp.ndarray     # [T] int32 material id
    ltri: jnp.ndarray    # [T] int32 area-light index or -1 (CoreTri.ltriIdx)
    area: jnp.ndarray    # [T]
    inv_area: jnp.ndarray  # [T]
    lod: jnp.ndarray     # [T] texture LOD base
    tri9: jnp.ndarray    # [9,T] v0/e1/e2 component-major (TPU gather layout)
    # per-tri uv tangent frame (CoreTri T/B, host_mesh.cpp:545-565); zero
    # vectors when the uv triangle is degenerate (shading falls back to ONB)
    tangent: jnp.ndarray = None    # [T,3]
    bitangent: jnp.ndarray = None  # [T,3]

    @property
    def count(self):
        return self.v0.shape[0]


@struct.dataclass
class DeviceMaterials:
    """Disney+Lambert superset, SoA (common_classes.h:177-238).

    Texture-or-constant slots become constant arrays + texture-id arrays
    (-1 = constant only).
    """
    color: jnp.ndarray            # [M,3] base color; emissive if any chan > 1
    metallic: jnp.ndarray         # [M]
    subsurface: jnp.ndarray
    specular: jnp.ndarray
    roughness: jnp.ndarray
    spec_tint: jnp.ndarray
    anisotropic: jnp.ndarray
    sheen: jnp.ndarray
    sheen_tint: jnp.ndarray
    clearcoat: jnp.ndarray
    clearcoat_gloss: jnp.ndarray
    transmission: jnp.ndarray     # refraction weight (Lambert path)
    reflection: jnp.ndarray       # specular mirror weight (Lambert path)
    eta: jnp.ndarray              # [M] index of refraction
    absorption: jnp.ndarray       # [M,3] Beer (ref stores 1-absorption; lambert.h:87-89)
    flags: jnp.ndarray            # [M] int32 (SMOOTH|HASALPHA)
    tex_diffuse: jnp.ndarray      # [M] int32 texture id or -1
    tex_normal: jnp.ndarray
    tex_roughness: jnp.ndarray
    tex_metal_rough: jnp.ndarray   # glTF metallicRoughnessTexture slot
    # per-param slots (Vec3Value/ScalarValue, common_classes.h:177-238)
    tex_sheen: jnp.ndarray = None
    tex_clearcoat: jnp.ndarray = None
    tex_specular: jnp.ndarray = None
    tex_anisotropic: jnp.ndarray = None
    tex_absorption: jnp.ndarray = None
    # STATIC bitmask of per-param maps present anywhere in the scene
    # (bit0 sheen, 1 clearcoat, 2 specular, 3 anisotropic, 4 absorption):
    # absent maps compile away entirely
    s_param_maps: int = struct.field(pytree_node=False, default=0)
    # STATIC bitmask for the base maps (bit0 diffuse, 1 normal,
    # 2 roughness, 3 metal_rough): each absent slot removes a trilinear
    # fetch site (8 pool gathers) from EVERY bounce. Default = all present
    # (scenes built without sync() stay conservative)
    s_base_maps: int = struct.field(pytree_node=False, default=0b1111)

    @property
    def count(self):
        return self.color.shape[0]


@struct.dataclass
class DeviceLights:
    """All four light types, padded SoA (common_classes.h:275-356)."""
    # emissive-triangle area lights (CoreLightTri)
    tri_v0: jnp.ndarray        # [LT,3]
    tri_v1: jnp.ndarray
    tri_v2: jnp.ndarray
    tri_centre: jnp.ndarray
    tri_n: jnp.ndarray
    tri_radiance: jnp.ndarray  # [LT,3]
    tri_area: jnp.ndarray      # [LT]
    tri_energy: jnp.ndarray    # [LT] sum of radiance components (host_light.cpp:41)
    tri_prim: jnp.ndarray      # [LT] int32 global triangle index (for MIS identity)
    # point lights
    point_pos: jnp.ndarray       # [LP,3]
    point_radiance: jnp.ndarray  # [LP,3]
    point_energy: jnp.ndarray    # [LP]
    # spot lights
    spot_pos: jnp.ndarray        # [LS,3]
    spot_radiance: jnp.ndarray
    spot_dir: jnp.ndarray
    spot_cos_inner: jnp.ndarray  # [LS]
    spot_cos_outer: jnp.ndarray
    spot_energy: jnp.ndarray
    # directional lights
    dir_dir: jnp.ndarray         # [LD,3]
    dir_radiance: jnp.ndarray
    dir_energy: jnp.ndarray
    # actual (unpadded) counts as device scalars
    n_tri: jnp.ndarray
    n_point: jnp.ndarray
    n_spot: jnp.ndarray
    n_dir: jnp.ndarray
    # STATIC presence counts (pytree-static): lets the light-sampling code
    # skip absent light types at trace time — each absent type removed ~15%
    # of the per-bounce NEE math on area-light-only scenes (cornell/bathroom)
    s_tri: int = struct.field(pytree_node=False, default=1)
    s_point: int = struct.field(pytree_node=False, default=1)
    s_spot: int = struct.field(pytree_node=False, default=1)
    s_dir: int = struct.field(pytree_node=False, default=1)


@struct.dataclass
class DeviceSky:
    """Equirectangular HDR skydome (host_skydome.cpp). Constant color when 1x1.

    IBL fields (host_skydome.cpp:20-47 analog, built by render/sky.py
    build_sky_cdf at sync): pixel-measure pdf + marginal/conditional CDFs +
    the NEE potential heuristic. `has_ibl` is static so non-IBL scenes
    compile the sampling code away."""
    pixels: jnp.ndarray  # [H,W,3] float32 linear radiance
    pdf: jnp.ndarray = None        # [H,W] pixel-measure probabilities
    cdf_rows: jnp.ndarray = None   # [H] marginal CDF over rows
    cdf_cond: jnp.ndarray = None   # [H,W] conditional CDF per row
    nee_energy: jnp.ndarray = None  # scalar potential (pi * mean luminance)
    has_ibl: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class DeviceTextures:
    """Pooled texel storage (the analog of the reference's 3 texel pools,
    CoreTexDesc common_classes.h:240-269). All texels live in one flat
    component-major [4,P] float32 pool (rays gather along the minor axis —
    TPU-fast layout); per-texture descriptors give MIP offsets/sizes.
    desc layout: [NTEX, MIPLEVELS, 3] int32 = (offset, width, height)."""
    pool: jnp.ndarray  # [4,P] float32 rgba, linear, component-major
    desc: jnp.ndarray  # [NTEX, MIPS, 3] int32


def empty_textures(mips: int = 5) -> DeviceTextures:
    return DeviceTextures(
        pool=jnp.zeros((4, 1), jnp.float32),
        desc=jnp.zeros((1, mips, 3), jnp.int32),
    )


@struct.dataclass
class DeviceScene:
    tris: DeviceTriangles
    materials: DeviceMaterials
    lights: DeviceLights
    sky: DeviceSky
    textures: DeviceTextures
    bvh: "object | None" = None   # DeviceBVH pytree (bvh/traverse.py) or None
    cbvh: "object | None" = None  # ClusterBVH pytree (bvh/clusters.py) or None


# ---------------------------------------------------------------------------
# numpy-side builders
# ---------------------------------------------------------------------------

def _pad_rows(a: np.ndarray, n: int) -> np.ndarray:
    if a.shape[0] >= n:
        return a[:n]
    pad = np.zeros((n - a.shape[0],) + a.shape[1:], a.dtype)
    return np.concatenate([a, pad], 0)


def build_lights_np(tri_lights: dict, points: list, spots: list, dirs: list) -> DeviceLights:
    """tri_lights: dict of stacked numpy arrays (may be empty); point/spot/dir:
    lists of host light objects (scene.host_light)."""
    lt = max(1, len(tri_lights.get("v0", [])))
    lp = max(1, len(points))
    ls = max(1, len(spots))
    ld = max(1, len(dirs))
    f3 = lambda: np.zeros((1, 3), np.float32)
    f1 = lambda: np.zeros((1,), np.float32)

    def stack_or(key, empty):
        v = tri_lights.get(key)
        if v is None or len(v) == 0:
            return empty()
        return np.asarray(v, np.float32)

    tri_prim = tri_lights.get("prim")
    tri_prim = (
        np.asarray(tri_prim, np.int32) if tri_prim is not None and len(tri_prim)
        else np.full((1,), -1, np.int32)
    )
    p_pos = np.stack([p.position for p in points], 0).astype(np.float32) if points else f3()
    p_rad = np.stack([p.radiance for p in points], 0).astype(np.float32) if points else f3()
    s_pos = np.stack([s.position for s in spots], 0).astype(np.float32) if spots else f3()
    s_rad = np.stack([s.radiance for s in spots], 0).astype(np.float32) if spots else f3()
    s_dir = np.stack([s.direction for s in spots], 0).astype(np.float32) if spots else f3()
    s_ci = np.array([s.cos_inner for s in spots], np.float32) if spots else f1()
    s_co = np.array([s.cos_outer for s in spots], np.float32) if spots else f1()
    d_dir = np.stack([d.direction for d in dirs], 0).astype(np.float32) if dirs else f3()
    d_rad = np.stack([d.radiance for d in dirs], 0).astype(np.float32) if dirs else f3()

    return DeviceLights(
        tri_v0=jnp.asarray(stack_or("v0", f3)),
        tri_v1=jnp.asarray(stack_or("v1", f3)),
        tri_v2=jnp.asarray(stack_or("v2", f3)),
        tri_centre=jnp.asarray(stack_or("centre", f3)),
        tri_n=jnp.asarray(stack_or("N", f3)),
        tri_radiance=jnp.asarray(stack_or("radiance", f3)),
        tri_area=jnp.asarray(stack_or("area", f1)),
        tri_energy=jnp.asarray(stack_or("energy", f1)),
        tri_prim=jnp.asarray(tri_prim),
        point_pos=jnp.asarray(p_pos),
        point_radiance=jnp.asarray(p_rad),
        point_energy=jnp.asarray(p_rad.sum(-1)),
        spot_pos=jnp.asarray(s_pos),
        spot_radiance=jnp.asarray(s_rad),
        spot_dir=jnp.asarray(s_dir),
        spot_cos_inner=jnp.asarray(s_ci),
        spot_cos_outer=jnp.asarray(s_co),
        spot_energy=jnp.asarray(s_rad.sum(-1)),
        dir_dir=jnp.asarray(d_dir),
        dir_radiance=jnp.asarray(d_rad),
        dir_energy=jnp.asarray(d_rad.sum(-1)),
        n_tri=jnp.int32(len(tri_lights.get("v0", []))),
        n_point=jnp.int32(len(points)),
        n_spot=jnp.int32(len(spots)),
        n_dir=jnp.int32(len(dirs)),
        s_tri=len(tri_lights.get("v0", [])),
        s_point=len(points),
        s_spot=len(spots),
        s_dir=len(dirs),
    )
