"""Scene-sharded multi-chip rendering — the "instance-sharded" obligation
(SURVEY.md §5.7/§5.8; BASELINE "scene BVH replicated or instance-sharded").

When the scene is too large to replicate in HBM, its TRIANGLES are sharded
over a second mesh axis. Design (Ulysses-style all-to-all of ray results,
not ring forwarding — rays are independent so only per-hit REDUCTIONS cross
shards):

  - 2-D mesh ("rays", "scene"): the path index range is data-parallel over
    "rays" (exactly parallel/mesh.py); the triangle SoA is sharded over
    "scene" (leading axis = shard id, padded with degenerate triangles);
  - per bounce, every scene-shard intersects the full local ray wavefront
    against ITS triangles only (closest hit over the local subset);
  - the global winner per ray is the cross-shard argmin of t: the owning
    shard (ties -> lowest shard id) extracts the 64-row shading PAYLOAD
    from its local arrays — the same payload contract the TPU trace kernel
    produces (bvh/clusters.py PAY_*) — and one `psum` over "scene"
    assembles it everywhere. Shading then proceeds shard-locally with zero
    global gathers (render/shading.py shading_from_payload,
    geom_reattach=False);
  - occlusion = `psum` OR of local any-hit;
  - materials/lights/sky stay replicated (they are KB-scale).

Gradients w.r.t. geometry are a replicate-mode feature (the reattach packs
need the global arrays); the sharded mode targets forward rendering of
scenes beyond single-chip HBM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.bvh import clusters as CL
from lighthouse2_tpu.render.wavefront import (
    AccumState, generate_eye_rays, bounce_step, _finish_pass,
)
from lighthouse2_tpu.core.geometry import BIG_T


def make_mesh2d(n_ray_shards: int, n_scene_shards: int) -> Mesh:
    devs = np.array(jax.devices()[:n_ray_shards * n_scene_shards])
    return Mesh(devs.reshape(n_ray_shards, n_scene_shards),
                ("rays", "scene"))


def shard_triangle_arrays(tris, k: int):
    """Split the triangle SoA into k shards along the triangle axis (leading
    stacked axis = shard id), padding with degenerate triangles (e1=e2=0
    never hit). Returns a dict of [k, Tk, ...] arrays + global id map
    [k, Tk] (for stats/debug)."""
    t = int(tris.v0.shape[0])
    tk = -(-t // k)
    pad = k * tk - t

    def split(a, fill=0.0):
        a = np.asarray(a)
        if pad:
            padding = np.full((pad,) + a.shape[1:], fill, a.dtype)
            a = np.concatenate([a, padding], 0)
        return jnp.asarray(a.reshape(k, tk, *a.shape[1:]))

    gid = np.concatenate([np.arange(t, dtype=np.int32),
                          np.full(pad, -1, np.int32)])
    return dict(
        v0=split(tris.v0), e1=split(tris.e1), e2=split(tris.e2),
        n0=split(tris.n0), n1=split(tris.n1), n2=split(tris.n2),
        uv0=split(tris.uv0), uv1=split(tris.uv1), uv2=split(tris.uv2),
        alpha=split(tris.alpha, 1.0),
        mat=split(tris.mat), ltri=split(tris.ltri, -1),
        lod=split(tris.lod), tangent=split(tris.tangent),
        bitangent=split(tris.bitangent),
        gid=jnp.asarray(gid.reshape(k, tk)),
    )


def _local_payload(sh, prim, mine, mpack22):
    """Build the [PAY_ROWS, N] payload rows from LOCAL shard arrays for rays
    this shard won (`mine`); zeros elsewhere so psum over 'scene' assembles
    the global rows. Mirrors the cluster tile layout (bvh/clusters.py)."""
    n = prim.shape[0]
    p = jnp.where(mine, jnp.maximum(prim, 0), 0)
    rows = jnp.zeros((CL.PAY_ROWS, n), jnp.float32)

    def put3(r, a):
        return rows.at[r:r + 3].set(a[p].T)

    rows = put3(CL.PAY_V0, sh["v0"])
    rows = put3(CL.PAY_E1, sh["e1"])
    rows = put3(CL.PAY_E2, sh["e2"])
    rows = put3(CL.PAY_N0, sh["n0"])
    rows = put3(CL.PAY_N1, sh["n1"])
    rows = put3(CL.PAY_N2, sh["n2"])
    rows = rows.at[CL.PAY_UV0:CL.PAY_UV0 + 2].set(sh["uv0"][p].T)
    rows = rows.at[CL.PAY_UV1:CL.PAY_UV1 + 2].set(sh["uv1"][p].T)
    rows = rows.at[CL.PAY_UV2:CL.PAY_UV2 + 2].set(sh["uv2"][p].T)
    rows = put3(CL.PAY_ALPHA, sh["alpha"])
    rows = rows.at[CL.PAY_PRIM].set(sh["gid"][p].astype(jnp.float32))
    mat = sh["mat"][p]
    rows = rows.at[CL.PAY_MAT].set(mat.astype(jnp.float32))
    rows = rows.at[CL.PAY_LTRI].set(sh["ltri"][p].astype(jnp.float32))
    rows = rows.at[CL.PAY_LOD].set(sh["lod"][p])
    rows = rows.at[CL.PAY_VALID].set(1.0)
    rows = put3(CL.PAY_TAN, sh["tangent"])
    rows = put3(CL.PAY_BIT, sh["bitangent"])
    # material parameter rows (materials replicated; layout = material_pack)
    mrows = mpack22[:, mat]                                # [K, N]
    rows = rows.at[CL.PAY_GEO_ROWS:
                   CL.PAY_GEO_ROWS + mpack22.shape[0]].set(mrows)
    return jnp.where(mine[None, :], rows, 0.0)


def _shard_intersect(sh, mpack22, o, d, alive, axis="scene"):
    """Closest hit across scene shards: local brute force -> argmin combine
    -> winner's payload psum. Returns (t, prim_global, u, v, payload)."""
    from lighthouse2_tpu.core.geometry import intersect_bruteforce
    from lighthouse2_tpu.bvh.traverse import refine_hit_rows
    t_max = jnp.where(alive, BIG_T, 0.0)
    t, prim, u, v = intersect_bruteforce(o, d, sh["v0"], sh["e1"], sh["e2"])
    hit = (prim >= 0) & alive & (t < t_max)
    t = jnp.where(hit, t, BIG_T)

    tmin = jax.lax.pmin(t, axis)
    won = hit & (t <= tmin)
    ax = jax.lax.axis_index(axis)
    owner = jax.lax.pmin(jnp.where(won, ax, jnp.int32(1 << 30)), axis)
    mine = won & (ax == owner)

    payload = jax.lax.psum(_local_payload(sh, prim, mine, mpack22), axis)
    prim_g = payload[CL.PAY_PRIM]
    prim_g = jnp.where(payload[CL.PAY_VALID] > 0.0,
                       prim_g.astype(jnp.int32), -1)
    g9 = payload[CL.PAY_V0:CL.PAY_V0 + 9]
    rt, ru, rv, ok = refine_hit_rows(o, d, prim_g, g9)
    tmin = jnp.where(prim_g >= 0, rt, tmin)
    return tmin, prim_g, ru, rv, payload


def _shard_occluded(sh, o, d, t_max, axis="scene"):
    from lighthouse2_tpu.core.geometry import occluded_bruteforce
    occ = occluded_bruteforce(o, d, t_max, sh["v0"], sh["e1"], sh["e2"])
    return jax.lax.psum(occ.astype(jnp.int32), axis) > 0


def render_pass_scene_sharded(scene, view, state: AccumState,
                              config: RenderConfig, mesh: Mesh):
    """One progressive pass on a ("rays","scene") mesh with the triangle SoA
    sharded over "scene". Identical image to the replicated `render_pass`
    (same seeds per global path index)."""
    import dataclasses
    from lighthouse2_tpu.render.shading import material_pack
    config = dataclasses.replace(config, scene_sharded=True, use_bvh=False)
    n_scene = mesh.shape["scene"]
    n = config.n_paths
    assert n % mesh.shape["rays"] == 0
    sh = shard_triangle_arrays(scene.tris, n_scene)
    path_idx = jnp.arange(n, dtype=jnp.uint32)
    mpack22 = material_pack(scene.materials)

    def body(sh_local, scene_, view_, path_idx_, sample_base, cam_seed):
        paths = generate_eye_rays(view_, config, sample_base, path_idx_)
        nloc = paths["path_idx"].shape[0]
        zf = paths["bsdf_pdf"] * 0.0
        acc = jnp.zeros((nloc, 4), jnp.float32) + zf[:, None]
        isect = lambda o, d, alive: _shard_intersect(
            sh_local, mpack22, o, d, alive)
        occl = lambda o, d, tmax: _shard_occluded(sh_local, o, d, tmax)
        ext, conn = [], []
        for li in range(config.max_path_length):
            ext.append(jnp.sum(paths["alive"].astype(jnp.int32)))
            paths, acc, cam_seed, n_conn = bounce_step(
                scene_, view_, config, paths, acc, cam_seed, jnp.int32(li),
                intersect_fn=isect, occluded_fn=occl)
            conn.append(n_conn)
        stats = dict(extension_rays=jnp.stack(ext),
                     shadow_rays=jnp.stack(conn))
        acc_px, cam_seed, stats = _finish_pass(config, paths, acc, stats,
                                               path_idx_, cam_seed)
        acc_px = jax.lax.psum(acc_px, "rays")
        stats = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, "rays"), stats)
        return acc_px, cam_seed, stats

    # the stacked arrays enter shard_map with leading dim k -> each shard
    # sees [1, ...]; drop that axis before use
    def body_unstack(sh_stacked, *rest):
        sh_local = {k: v[0] for k, v in sh_stacked.items()}
        return body(sh_local, *rest)

    shard_fn = jax.shard_map(
        body_unstack, mesh=mesh,
        in_specs=(P("scene"), P(), P(), P("rays"), P(), P()),
        out_specs=(P(), P(), P()),
    )
    acc_delta, cam_seed, stats = shard_fn(
        sh, scene, view, path_idx, state.sample_count, state.cam_seed)
    return AccumState(
        accumulator=state.accumulator + acc_delta,
        sample_count=state.sample_count + config.spp_per_pass,
        cam_seed=cam_seed,
    ), stats
