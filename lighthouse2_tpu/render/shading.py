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


def get_shading_data(scene: DeviceScene, d, t, prim, u, v, spread_angle,
                     consistent_normals=True):
    """Build ShadingData for hits (prim >= 0). Garbage (but finite) elsewhere."""
    tris, mats = scene.tris, scene.materials
    p = jnp.maximum(prim, 0)
    w = 1.0 - u - v

    n_geom = tris.face_n[p]
    n_int = normalize(w[:, None] * tris.n0[p] + u[:, None] * tris.n1[p]
                      + v[:, None] * tris.n2[p])
    uv = w[:, None] * tris.uv0[p] + u[:, None] * tris.uv1[p] + v[:, None] * tris.uv2[p]

    mat = tris.mat[p]
    color = mats.color[mat]
    rough = mats.roughness[mat]

    # texture fetches (diffuse/normal/roughness) with ray-cone LOD
    # lambda = triLOD + log2(coneWidth / |D·N|) (material_shared.h:116)
    cone_width = spread_angle * t
    lam = tris.lod[p] + jnp.log2(
        jnp.maximum(cone_width, 1e-20) / jnp.maximum(jnp.abs(dot(d, n_int)), 1e-6))
    tex_d = mats.tex_diffuse[mat]
    has_any_tex = scene.textures.pool.shape[0] > 1
    if has_any_tex:
        from lighthouse2_tpu.render.textures import fetch_trilinear
        texel = fetch_trilinear(scene.textures, tex_d, uv, lam)
        color = jnp.where((tex_d >= 0)[:, None], color * texel[:, :3], color)
        tex_r = mats.tex_roughness[mat]
        rtex = fetch_trilinear(scene.textures, tex_r, uv, lam)
        rough = jnp.where(tex_r >= 0, rough * rtex[:, 0], rough)

    # consistent normal correction (tools_shared.h:297-311), backside flip
    alpha = (w * tris.alpha[p][:, 0] + u * tris.alpha[p][:, 1]
             + v * tris.alpha[p][:, 2])
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
        tex_n = mats.tex_normal[mat]
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
        absorption=mats.absorption[mat],
        metallic=mats.metallic[mat],
        subsurface=mats.subsurface[mat],
        specular=mats.specular[mat],
        roughness=rough,
        spec_tint=mats.spec_tint[mat],
        anisotropic=mats.anisotropic[mat],
        sheen=mats.sheen[mat],
        sheen_tint=mats.sheen_tint[mat],
        clearcoat=mats.clearcoat[mat],
        clearcoat_gloss=mats.clearcoat_gloss[mat],
        transmission=mats.transmission[mat],
        eta=mats.eta[mat],
        flags=mats.flags[mat],
        n_geom=n_geom, n_interp=n_int, n_shading=n_shading,
        face_dir=face_dir, emissive=emissive,
        ltri=tris.ltri[p], area=tris.area[p], uv=uv, lod=lam,
    )
