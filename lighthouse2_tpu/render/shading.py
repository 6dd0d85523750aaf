"""Shading-data assembly — the GetShadingData analog (material_shared.h:35-178).

Given hit (prim,u,v), interpolates normals/uvs with the OptiX7 barycentric
convention (w·A0 + u·A1 + v·A2, material_shared.h:77-81), applies
consistent-normal correction (Reshetov), back-face flip, and material/texture
parameter decode. Fully differentiable: all interpolation flows gradients to
the vertex and material arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from lighthouse2_tpu.core.geometry import dot, normalize, consistent_normal
from lighthouse2_tpu.scene.device_scene import DeviceScene


@struct.dataclass
class ShadingData:
    """Per-ray shading info (tools_shared.h:26-56 ShadingData analog)."""
    color: jnp.ndarray          # [N,3] base color (possibly textured)
    absorption: jnp.ndarray     # [N,3] Beer transmittance params
    metallic: jnp.ndarray       # [N]
    subsurface: jnp.ndarray
    specular: jnp.ndarray
    roughness: jnp.ndarray
    spec_tint: jnp.ndarray
    anisotropic: jnp.ndarray
    sheen: jnp.ndarray
    sheen_tint: jnp.ndarray
    clearcoat: jnp.ndarray
    clearcoat_gloss: jnp.ndarray
    transmission: jnp.ndarray
    eta: jnp.ndarray
    flags: jnp.ndarray          # [N] int32 material flags
    n_geom: jnp.ndarray         # [N,3] geometric (face) normal
    n_interp: jnp.ndarray       # [N,3] interpolated vertex normal
    n_shading: jnp.ndarray      # [N,3] final (consistent / bent) normal
    face_dir: jnp.ndarray       # [N] +1 front, -1 back
    emissive: jnp.ndarray       # [N] bool
    ltri: jnp.ndarray           # [N] int32 area-light slot of the hit tri
    area: jnp.ndarray           # [N] triangle area
    uv: jnp.ndarray             # [N,2]
    lod: jnp.ndarray            # [N] texture lambda
    alpha_cutout: jnp.ndarray   # [N] bool: HASALPHA material & texel.w < 0.5
                                # → passthrough ray (material_shared.h:122-126)
    tangent: jnp.ndarray        # [N,3] uv tangent (CoreTri.T; zero = none)
    bitangent: jnp.ndarray      # [N,3] uv bitangent


MAT_PACK_ROWS = 28


def material_pack(mats) -> jnp.ndarray:
    """The [28, M] component-major material table — float rows 0..17 then the
    int slots (flags, tex ids) as exact f32 rows 18..27. Row order is the
    contract shared by get_shading_data, the payload bake
    (render/kernels/trace.py bake_material_rows) and shading_from_payload."""
    fi = lambda a: a.astype(jnp.float32)[None]
    z = jnp.full_like(mats.flags, -1)
    return jnp.concatenate([
        mats.color.T,                             # 0:3
        mats.absorption.T,                        # 3:6
        mats.metallic[None], mats.subsurface[None],
        mats.specular[None], mats.roughness[None],
        mats.spec_tint[None], mats.anisotropic[None],
        mats.sheen[None], mats.sheen_tint[None],
        mats.clearcoat[None], mats.clearcoat_gloss[None],
        mats.transmission[None], mats.eta[None],  # 6..17
        fi(mats.flags),                           # 18
        fi(mats.tex_diffuse),
        fi(mats.tex_normal),
        fi(mats.tex_roughness),                   # 19..21
        fi(mats.tex_metal_rough),                 # 22 (glTF MR map)
        # per-param slots (Vec3Value/ScalarValue, common_classes.h:177-238)
        fi(mats.tex_sheen if mats.tex_sheen is not None else z),      # 23
        fi(mats.tex_clearcoat if mats.tex_clearcoat is not None else z),
        fi(mats.tex_specular if mats.tex_specular is not None else z),
        fi(mats.tex_anisotropic
           if mats.tex_anisotropic is not None else z),               # 26
        fi(mats.tex_absorption
           if mats.tex_absorption is not None else z),                # 27
    ], axis=0)


def shading_from_payload(scene: DeviceScene, d, t, payload, u, v,
                         spread_angle, consistent_normals=True,
                         geom_reattach=True):
    """GetShadingData from the trace kernel's extracted payload — ZERO
    per-primitive gathers (the round-3 gather-bound fix, STAGE_TIMES_r03).

    Gradients reattach through render/fetch.reattach_rows: forward is the
    free kernel payload, backward scatter-adds into the live scene packs.
    Deviation noted: n_geom is recomputed as normalize(e1×e2) (the true
    geometric normal of the world-space triangle) instead of the host-
    transformed CoreTri.N — identical direction for det>0 transforms."""
    from lighthouse2_tpu.render.fetch import reattach_rows
    from lighthouse2_tpu.bvh import clusters as CL
    tris, mats = scene.tris, scene.materials
    # indices always come from the detached payload; the DATA rows stay raw
    # so the scene-sharded path (whose payload is a differentiable psum of
    # per-shard gathers) keeps its gradient chain
    payload_sg = jax.lax.stop_gradient(payload)
    prim = payload_sg[CL.PAY_PRIM].astype(jnp.int32)
    prim = jnp.where(payload_sg[CL.PAY_PRIM] >= 0.0, prim, -1)
    mat = payload_sg[CL.PAY_MAT].astype(jnp.int32)
    mat_safe = jnp.where(prim >= 0, mat, 0)
    ltri = jnp.where(prim >= 0, payload_sg[CL.PAY_LTRI].astype(jnp.int32), -1)
    w = 1.0 - u - v

    if geom_reattach:
        # kernel payload: opaque to autodiff — reattach gradients to the
        # global packs (render/fetch.py)
        payload = payload_sg
        g9 = reattach_rows(tris.tri9, prim, payload[CL.PAY_V0:CL.PAY_V0 + 9])
        apack = jnp.concatenate([
            tris.n0.T, tris.n1.T, tris.n2.T,          # 0:9
            tris.uv0.T, tris.uv1.T, tris.uv2.T,       # 9:15
            tris.alpha.T,                             # 15:18
        ], axis=0)
        ga = reattach_rows(apack, prim, payload[CL.PAY_N0:CL.PAY_N0 + 18])
        lodb = reattach_rows(tris.lod[None], prim,
                             payload[CL.PAY_LOD:CL.PAY_LOD + 1])[0]
    else:
        # scene-sharded mode (parallel/scene_shard.py): no global triangle
        # arrays exist on any one device — consume the psum-assembled rows
        # directly; their gradients scatter-add into the per-shard arrays
        # through the payload assembly itself
        g9 = payload[CL.PAY_V0:CL.PAY_V0 + 9]
        ga = payload[CL.PAY_N0:CL.PAY_N0 + 18]
        lodb = payload[CL.PAY_LOD]

    def v3(rows, a):
        return jnp.stack([a[rows], a[rows + 1], a[rows + 2]], axis=-1)

    e1 = v3(3, g9)
    e2 = v3(6, g9)
    cr = jnp.cross(e1, e2)
    area = 0.5 * jnp.sqrt(jnp.maximum(dot(cr, cr), 1e-30))
    n_geom = normalize(cr)
    n_int = normalize(w[:, None] * v3(0, ga) + u[:, None] * v3(3, ga)
                      + v[:, None] * v3(6, ga))
    uv = (w[:, None] * jnp.stack([ga[9], ga[10]], -1)
          + u[:, None] * jnp.stack([ga[11], ga[12]], -1)
          + v[:, None] * jnp.stack([ga[13], ga[14]], -1))

    if geom_reattach:
        mpack = material_pack(mats)
        m = reattach_rows(mpack, mat_safe,
                          payload[CL.PAY_GEO_ROWS:
                                  CL.PAY_GEO_ROWS + MAT_PACK_ROWS])
    else:
        # sharded payload rows are a differentiable psum of per-shard
        # mpack gathers — consume them raw (reattach_rows' custom vjp
        # cannot express the cross-shard varying axes)
        m = payload[CL.PAY_GEO_ROWS:CL.PAY_GEO_ROWS + MAT_PACK_ROWS]
    mi = m[18:28].astype(jnp.int32)
    color = v3(0, m)
    rough = m[9]

    tan = v3(CL.PAY_TAN, payload)
    bit = v3(CL.PAY_BIT, payload)
    return _assemble_shading(scene, d, t, prim, u, v, w, spread_angle,
                             consistent_normals, n_geom, n_int, uv, m, mi,
                             color, rough, alpha3=(ga[15], ga[16], ga[17]),
                             area=area, ltri=ltri, lod_base=lodb,
                             tangent=tan, bitangent=bit)


def get_shading_data(scene: DeviceScene, d, t, prim, u, v, spread_angle,
                     consistent_normals=True):
    """Build ShadingData for hits (prim >= 0). Garbage (but finite) elsewhere.

    TPU layout note (measured): per-row gathers of [T,3] arrays put 3 in the
    lane dim (padded to 128 — 42x waste); instead all per-triangle and
    per-material data is packed component-major ([rows, T] / [rows, M]) and
    fetched with ONE gather along the minor axis each. The packs are built
    from the SoA fields inside the jit — XLA CSEs/hoists them across bounces,
    and gradients flow through the transposes back to the SoA arrays."""
    tris, mats = scene.tris, scene.materials
    p = jnp.maximum(prim, 0)
    w = 1.0 - u - v

    tpack = jnp.concatenate([
        tris.n0.T, tris.n1.T, tris.n2.T,          # 0:9
        tris.face_n.T,                            # 9:12
        tris.uv0.T, tris.uv1.T, tris.uv2.T,       # 12:18
        tris.alpha.T,                             # 18:21
        tris.area[None], tris.lod[None],          # 21, 22
        tris.tangent.T, tris.bitangent.T,         # 23:29
    ], axis=0)
    g = tpack[:, p]                               # [29, N] one gather

    def v3(rows, a=g):
        return jnp.stack([a[rows], a[rows + 1], a[rows + 2]], axis=-1)

    n_geom = v3(9)
    n_int = normalize(w[:, None] * v3(0) + u[:, None] * v3(3)
                      + v[:, None] * v3(6))
    uv = (w[:, None] * jnp.stack([g[12], g[13]], -1)
          + u[:, None] * jnp.stack([g[14], g[15]], -1)
          + v[:, None] * jnp.stack([g[16], g[17]], -1))

    mat = tris.mat[p]
    mpack = material_pack(mats)
    m = mpack[:, mat]                             # [23, N] one gather
    mi = m[18:28].astype(jnp.int32)               # flags, tex ids
    color = v3(0, m)
    rough = m[9]

    return _assemble_shading(scene, d, t, prim, u, v, w, spread_angle,
                             consistent_normals, n_geom, n_int, uv, m, mi,
                             color, rough, alpha3=(g[18], g[19], g[20]),
                             area=g[21], ltri=tris.ltri[p], lod_base=g[22],
                             tangent=v3(23, g), bitangent=v3(26, g))


def _assemble_shading(scene, d, t, prim, u, v, w, spread_angle,
                      consistent_normals, n_geom, n_int, uv, m, mi,
                      color, rough, alpha3, area, ltri, lod_base,
                      tangent=None, bitangent=None):
    """Shared tail of GetShadingData (textures, consistent normals, normal
    map, flags) for the gather and payload fetch paths."""
    if tangent is None:
        tangent = jnp.zeros_like(n_geom)
        bitangent = jnp.zeros_like(n_geom)

    def v3(rows, a):
        return jnp.stack([a[rows], a[rows + 1], a[rows + 2]], axis=-1)

    # texture fetches (diffuse/normal/roughness) with ray-cone LOD
    # lambda = triLOD + log2(coneWidth / |D·N|) (material_shared.h:116)
    cone_width = spread_angle * t
    lam = lod_base + jnp.log2(
        jnp.maximum(cone_width, 1e-20) / jnp.maximum(jnp.abs(dot(d, n_int)), 1e-6))
    tex_d = mi[1]
    has_any_tex = scene.textures.pool.shape[1] > 1
    # STATIC base-map presence bits (diffuse/normal/roughness/metal-rough):
    # each absent slot removes a whole trilinear fetch site (8 pool gathers)
    # from every bounce — the shade stage was gather-bound on scenes that
    # use only a subset of the slots
    bmaps = getattr(scene.materials, "s_base_maps", 0b1111) \
        if has_any_tex else 0
    alpha_cutout = jnp.zeros(t.shape, bool)
    metallic = m[6]
    if bmaps & 0b0001:
        from lighthouse2_tpu.render.textures import fetch_trilinear
        texel = fetch_trilinear(scene.textures, tex_d, uv, lam)
        color = jnp.where((tex_d >= 0)[:, None], color * texel[:, :3], color)
        # alpha cutout: HASALPHA material + diffuse texel alpha < 0.5 →
        # the shade stage turns this lane into a passthrough extension ray
        # (material_shared.h:122-126, pathtracer.h:107-118)
        from lighthouse2_tpu.scene.host_material import MAT_HASALPHA
        alpha_cutout = ((mi[0] & MAT_HASALPHA) != 0) & (tex_d >= 0) \
            & (texel[:, 3] < 0.5)
    if bmaps & 0b1100:
        from lighthouse2_tpu.render.textures import fetch_trilinear
        # glTF metallicRoughnessTexture: roughness in G, metallic in B
        # (common_classes.h per-param slots; gltf 2.0 pbrMetallicRoughness).
        # When BOTH a plain roughness map and an MR map are set, the MR map
        # wins (the slots are loader-exclusive; this pins the precedence)
        tex_r = mi[3]
        tex_mr = mi[4]
        if bmaps & 0b0100:
            rtex = fetch_trilinear(scene.textures, tex_r, uv, lam)
            rough = jnp.where(tex_r >= 0, rough * rtex[:, 0], rough)
        if bmaps & 0b1000:
            mrtex = fetch_trilinear(scene.textures, tex_mr, uv, lam)
            rough = jnp.where(tex_mr >= 0, m[9] * mrtex[:, 1], rough)
            metallic = jnp.where(tex_mr >= 0, m[6] * mrtex[:, 2], m[6])

    # per-param texture-or-constant slots (Vec3Value/ScalarValue,
    # common_classes.h:177-238): the constant scales the fetched texel.
    # Absent slots are compiled away via the STATIC presence bitmask
    sheen, clearcoat, spec_p = m[12], m[14], m[8]
    aniso, absorption = m[11], v3(3, m)
    pm = getattr(scene.materials, "s_param_maps", 0)
    if has_any_tex and pm:
        from lighthouse2_tpu.render.textures import fetch_trilinear as _ftp

        def scalar_map(bit, mi_row, const):
            if not (pm >> bit) & 1:
                return const
            tid = mi[mi_row]
            tex = _ftp(scene.textures, tid, uv, lam)
            return jnp.where(tid >= 0, const * tex[:, 0], const)

        sheen = scalar_map(0, 5, sheen)
        clearcoat = scalar_map(1, 6, clearcoat)
        spec_p = scalar_map(2, 7, spec_p)
        aniso = scalar_map(3, 8, aniso)
        if (pm >> 4) & 1:          # Vec3 slot: absorption reads .rgb
            tid = mi[9]
            tex = _ftp(scene.textures, tid, uv, lam)
            absorption = jnp.where((tid >= 0)[:, None],
                                   absorption * tex[:, :3], absorption)

    # consistent normal correction (tools_shared.h:297-311), backside flip
    alpha = w * alpha3[0] + u * alpha3[1] + v * alpha3[2]
    backside = dot(d, n_int) > 0
    if consistent_normals:
        n_in = jnp.where(backside[:, None], -n_int, n_int)
        n_c = consistent_normal(d, n_in, alpha)
        n_shading = jnp.where(backside[:, None], -n_c, n_c)
        n_shading = jnp.where((alpha > 0)[:, None], n_shading, n_int)
    else:
        n_shading = n_int

    # normal mapping — in the uv tangent frame when the mesh has one
    # (CoreTri.T/B, host_mesh.cpp:545-565), ONB fallback otherwise
    if bmaps & 0b0010:
        tex_n = mi[2]
        from lighthouse2_tpu.render.textures import fetch_trilinear as _ft
        from lighthouse2_tpu.core.geometry import oriented_frame
        nm = _ft(scene.textures, tex_n, uv, lam)
        n_tan = normalize(nm[:, :3] * 2.0 - 1.0)
        tb, bb = oriented_frame(n_shading, tangent, bitangent)
        n_mapped = normalize(tb * n_tan[:, 0:1] + bb * n_tan[:, 1:2]
                             + n_shading * n_tan[:, 2:3])
        n_shading = jnp.where((tex_n >= 0)[:, None], n_mapped, n_shading)

    face_dir = jnp.where(dot(d, n_geom) > 0, -1.0, 1.0)
    emissive = jnp.max(color, axis=-1) > 1.0          # host_material.h:79

    return ShadingData(
        color=color,
        absorption=absorption,
        metallic=metallic,
        subsurface=m[7],
        specular=spec_p,
        roughness=rough,
        spec_tint=m[10],
        anisotropic=aniso,
        sheen=sheen,
        sheen_tint=m[13],
        clearcoat=clearcoat,
        clearcoat_gloss=m[15],
        transmission=m[16],
        eta=m[17],
        flags=mi[0],
        n_geom=n_geom, n_interp=n_int, n_shading=n_shading,
        face_dir=face_dir, emissive=emissive,
        ltri=ltri, area=area, uv=uv, lod=lam,
        alpha_cutout=alpha_cutout,
        tangent=tangent, bitangent=bitangent,
    )
