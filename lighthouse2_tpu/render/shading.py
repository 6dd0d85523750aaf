"""Shading-data assembly — the GetShadingData analog (material_shared.h:35-178).

Given hit (prim,u,v), interpolates normals/uvs with the OptiX7 barycentric
convention (w·A0 + u·A1 + v·A2, material_shared.h:77-81), applies
consistent-normal correction (Reshetov), back-face flip, and material/texture
parameter decode. Fully differentiable: all interpolation flows gradients to
the vertex and material arrays.
"""
from __future__ import annotations

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
    ], axis=0)
    g = tpack[:, p]                               # [23, N] one gather

    def v3(rows, a=g):
        return jnp.stack([a[rows], a[rows + 1], a[rows + 2]], axis=-1)

    n_geom = v3(9)
    n_int = normalize(w[:, None] * v3(0) + u[:, None] * v3(3)
                      + v[:, None] * v3(6))
    uv = (w[:, None] * jnp.stack([g[12], g[13]], -1)
          + u[:, None] * jnp.stack([g[14], g[15]], -1)
          + v[:, None] * jnp.stack([g[16], g[17]], -1))

    mat = tris.mat[p]
    mpack = jnp.concatenate([
        mats.color.T,                             # 0:3
        mats.absorption.T,                        # 3:6
        mats.metallic[None], mats.subsurface[None],
        mats.specular[None], mats.roughness[None],
        mats.spec_tint[None], mats.anisotropic[None],
        mats.sheen[None], mats.sheen_tint[None],
        mats.clearcoat[None], mats.clearcoat_gloss[None],
        mats.transmission[None], mats.eta[None],  # 6..17
    ], axis=0)
    m = mpack[:, mat]                             # [18, N] one gather
    ipack = jnp.stack([mats.flags, mats.tex_diffuse, mats.tex_normal,
                       mats.tex_roughness], 0)
    mi = ipack[:, mat]                            # [4, N] int gather
    color = v3(0, m)
    rough = m[9]

    # texture fetches (diffuse/normal/roughness) with ray-cone LOD
    # lambda = triLOD + log2(coneWidth / |D·N|) (material_shared.h:116)
    cone_width = spread_angle * t
    lam = g[22] + jnp.log2(
        jnp.maximum(cone_width, 1e-20) / jnp.maximum(jnp.abs(dot(d, n_int)), 1e-6))
    tex_d = mi[1]
    has_any_tex = scene.textures.pool.shape[1] > 1
    alpha_cutout = jnp.zeros(p.shape, bool)
    if has_any_tex:
        from lighthouse2_tpu.render.textures import fetch_trilinear
        texel = fetch_trilinear(scene.textures, tex_d, uv, lam)
        color = jnp.where((tex_d >= 0)[:, None], color * texel[:, :3], color)
        # alpha cutout: HASALPHA material + diffuse texel alpha < 0.5 →
        # the shade stage turns this lane into a passthrough extension ray
        # (material_shared.h:122-126, pathtracer.h:107-118)
        from lighthouse2_tpu.scene.host_material import MAT_HASALPHA
        alpha_cutout = ((mi[0] & MAT_HASALPHA) != 0) & (tex_d >= 0) \
            & (texel[:, 3] < 0.5)
        tex_r = mi[3]
        rtex = fetch_trilinear(scene.textures, tex_r, uv, lam)
        rough = jnp.where(tex_r >= 0, rough * rtex[:, 0], rough)

    # consistent normal correction (tools_shared.h:297-311), backside flip
    alpha = w * g[18] + u * g[19] + v * g[20]
    backside = dot(d, n_int) > 0
    if consistent_normals:
        n_in = jnp.where(backside[:, None], -n_int, n_int)
        n_c = consistent_normal(d, n_in, alpha)
        n_shading = jnp.where(backside[:, None], -n_c, n_c)
        n_shading = jnp.where((alpha > 0)[:, None], n_shading, n_int)
    else:
        n_shading = n_int

    # normal mapping
    if has_any_tex:
        tex_n = mi[2]
        from lighthouse2_tpu.render.textures import fetch_trilinear as _ft
        from lighthouse2_tpu.core.geometry import tangent_to_world
        nm = _ft(scene.textures, tex_n, uv, lam)
        n_tan = normalize(nm[:, :3] * 2.0 - 1.0)
        n_mapped = normalize(tangent_to_world(n_tan, n_shading))
        n_shading = jnp.where((tex_n >= 0)[:, None], n_mapped, n_shading)

    face_dir = jnp.where(dot(d, n_geom) > 0, -1.0, 1.0)
    emissive = jnp.max(color, axis=-1) > 1.0          # host_material.h:79

    return ShadingData(
        color=color,
        absorption=v3(3, m),
        metallic=m[6],
        subsurface=m[7],
        specular=m[8],
        roughness=rough,
        spec_tint=m[10],
        anisotropic=m[11],
        sheen=m[12],
        sheen_tint=m[13],
        clearcoat=m[14],
        clearcoat_gloss=m[15],
        transmission=m[16],
        eta=m[17],
        flags=mi[0],
        n_geom=n_geom, n_interp=n_int, n_shading=n_shading,
        face_dir=face_dir, emissive=emissive,
        ltri=tris.ltri[p], area=g[21], uv=uv, lod=lam,
        alpha_cutout=alpha_cutout,
    )
