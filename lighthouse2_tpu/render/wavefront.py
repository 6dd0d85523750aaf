"""The wavefront path tracer — rendercore_optix7's algorithm, TPU-native.

Reference loop (rendercore_optix7/rendercore.cpp:621-769 + kernels/
pathtracer.h:54-240): generate eye rays → per bounce {trace, shade with
NEE+MIS, emit compacted extension/shadow rays} → trace shadow batch →
finalize. Each stage is a kernel launch with a host-side counter read-back
per bounce.

Here the WHOLE frame is one jitted function: eye-ray generation, a
`lax.scan` over bounces (BVH traversal + shading + NEE shadow rays inside),
and scatter-add accumulation. Stream compaction becomes masked lanes — the
ray pool has a static [N = W·H·spp] shape and dead lanes idle (XLA-friendly;
occupancy is reported in stats like the reference's CoreStats ray counts).

Deliberate deviations from the reference (documented, SURVEY.md Appendix A):
  - implicit light hits after specular chains are weighted by
    throughput/bsdfPdf (the optix7 kernel drops both — a bug PrimeRef avoids);
  - point lights return their radiance (reference shadows the output var).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from lighthouse2_tpu.core import rng as rng_mod
from lighthouse2_tpu.core.geometry import (
    dot, normalize, safe_origin, intersect_bruteforce, occluded_bruteforce, BIG_T,
)
from lighthouse2_tpu.core.types import RenderConfig, ViewPyramid
from lighthouse2_tpu.render import bsdf_lambert
from lighthouse2_tpu.render.shading import get_shading_data
from lighthouse2_tpu.render.lights import (
    random_point_on_light, light_pick_prob, calculate_light_pdf,
    sky_pick_prob,
)
from lighthouse2_tpu.render.sky import sample_skydome, sky_pdf
from lighthouse2_tpu.scene.device_scene import DeviceScene
from lighthouse2_tpu.bvh.traverse import (
    bvh_intersect, bvh_occluded, refine_hit, refine_hit_rows,
)

EPSILON = 1e-4   # pathtracer epsilon for pdf cutoff


@struct.dataclass
class AccumState:
    """Progressive-accumulation state — the Converge/Restart checkpoint tuple
    (accumulator, samplesTaken, camRNGseed; rendercore.cpp:627-634).

    The regen executor (config.path_regen) extends the tuple with per-pixel
    completed-sample counts and the persistent in-flight path pool; both stay
    None on the classic fixed-spp executors."""
    accumulator: jnp.ndarray   # [W*H, 4]; .w accumulates primary depth
    sample_count: jnp.ndarray  # scalar int32 (samplesTaken)
    cam_seed: jnp.ndarray      # scalar uint32
    pixel_count: Any = None    # [W*H] f32 completed samples (regen mode)
    pool: Any = None           # (paths, depth, sample_k) persistent wavefront

    @staticmethod
    def make(config: RenderConfig) -> "AccumState":
        return AccumState(
            accumulator=jnp.zeros((config.width * config.height, 4), jnp.float32),
            sample_count=jnp.int32(0),
            cam_seed=jnp.uint32(rng_mod.CAM_RNG_SEED),
        )


def _clamp_intensity(contrib, clamp_value):
    """CLAMPINTENSITY (core_settings.h:190-193): scale so max comp <= clamp.

    The denominator is floored at clamp_value (only the v>clamp branch uses
    it) so the reciprocal vjp stays finite on zero-contribution lanes."""
    v = jnp.max(contrib, axis=-1, keepdims=True)
    vs = jnp.maximum(v, clamp_value)
    scale = jnp.where(v > clamp_value, clamp_value / vs, 1.0)
    return contrib * scale


def _fixnan(x):
    """FIXNAN_FLOAT3 (common_settings.h:57-66)."""
    return jnp.where(jnp.isfinite(x), x, 0.0)


def _masked_div(num, den, mask):
    """num/den where mask else 0, NaN-safe in forward AND backward.

    The naive `where(mask, num/max(den,1e-30), 0)` pattern overflows f32 in
    the vjp (1e30² = inf → inf·0 = nan), killing gradients — the reference
    never differentiates so it can't hit this. Mask the denominator first."""
    den_safe = jnp.where(mask, den, 1.0)
    num_shape_mask = mask if num.ndim == den.ndim else mask[..., None]
    return jnp.where(num_shape_mask, num / den_safe[..., None]
                     if num.ndim != den.ndim else num / den_safe, 0.0)


def _tiled_pixel(slot, w: int):
    """Map a ray slot to its pixel in 32x32-tile order (arithmetic only, no
    gather): slot s belongs to tile s>>10; within-tile s&1023 is row-major.
    One 1024-ray intersection-kernel block therefore covers one screen tile
    — the packet-coherence requirement of render/kernels/trace.py."""
    tiles_x = w // 32
    tile = slot >> jnp.uint32(10)
    within = slot & jnp.uint32(1023)
    tx = tile % jnp.uint32(tiles_x)
    ty = tile // jnp.uint32(tiles_x)
    lx = within & jnp.uint32(31)
    ly = within >> jnp.uint32(5)
    return (ty * 32 + ly) * jnp.uint32(w) + tx * 32 + lx


def untile_image(x, config: RenderConfig):
    """Inverse of _tiled_pixel over a [..., W*H, C] slot-ordered array →
    pixel-ordered, as a pure reshape/transpose (no gather)."""
    if not config.tiled():
        return x
    w, h = config.width, config.height
    lead = x.shape[:-2]
    c = x.shape[-1]
    x = x.reshape(*lead, h // 32, w // 32, 32, 32, c)
    x = jnp.moveaxis(x, -3, -4)      # [..., ty, ly, tx, lx, c]
    return x.reshape(*lead, h * w, c)


def generate_eye_rays(view: ViewPyramid, config: RenderConfig, sample_base,
                      path_idx=None, sample_idx=None):
    """Primary-ray generation (optix/.optix.cu:66-99 generateEyeRay):
    pixel jitter, 9-bladed lens DOF, optional barrel distortion.

    `path_idx` may be a shard of the global [0, W·H·spp) index range — that is
    how the parallel layer splits the wavefront across chips. `sample_idx`
    (regen executor) overrides the per-lane sample numbers — each lane then
    runs its own independent sample stream of its pixel."""
    w, h = config.width, config.height
    if path_idx is None:
        path_idx = jnp.arange(config.n_paths, dtype=jnp.uint32)
    path_idx = path_idx.astype(jnp.uint32)
    n = path_idx.shape[0]
    slot = path_idx % jnp.uint32(w * h)
    if config.tiled():
        pixel_idx = _tiled_pixel(slot, w).astype(jnp.int32)
    else:
        pixel_idx = slot.astype(jnp.int32)
    if sample_idx is None:
        seed = rng_mod.raygen_seed(path_idx,
                                   jnp.asarray(sample_base, jnp.uint32))
        sample_idx = (jnp.asarray(sample_base, jnp.uint32)
                      + path_idx // jnp.uint32(w * h))
    else:
        sample_idx = jnp.asarray(sample_idx, jnp.uint32)
        seed = rng_mod.raygen_seed(path_idx, sample_idx)

    seed, r0 = rng_mod.random_float(seed)
    seed, r1 = rng_mod.random_float(seed)
    seed, r2 = rng_mod.random_float(seed)
    seed, r3 = rng_mod.random_float(seed)
    if config.blue_noise:
        # camera AA/lens dims 0-3 for the first 256 spp (.optix.cu:72-79)
        from lighthouse2_tpu.core import bluenoise as bn
        mask = bn.device_mask()
        px = pixel_idx % w
        py = pixel_idx // w
        use_bn = sample_idx < 256
        r0 = jnp.where(use_bn, bn.sample(mask, px, py, sample_idx, 0), r0)
        r1 = jnp.where(use_bn, bn.sample(mask, px, py, sample_idx, 1), r1)
        r2 = jnp.where(use_bn, bn.sample(mask, px, py, sample_idx, 2), r2)
        r3 = jnp.where(use_bn, bn.sample(mask, px, py, sample_idx, 3), r3)

    right = view.p2 - view.p1
    up = view.p3 - view.p1

    # RandomPointOnLens (.optix.cu:52-64): 9-bladed aperture
    blade = jnp.floor(r2 * 9.0)
    r2b = (r2 - blade * (1.0 / 9.0)) * 9.0
    a1 = blade * (jnp.pi / 4.5)
    a2 = (blade + 1.0) * (jnp.pi / 4.5)
    x1, y1 = jnp.sin(a1), jnp.cos(a1)
    x2, y2 = jnp.sin(a2), jnp.cos(a2)
    flip = (r3 + r2b) > 1.0
    r3f = jnp.where(flip, 1.0 - r3, r3)
    r2f = jnp.where(flip, 1.0 - r2b, r2b)
    xr = x1 * r3f + x2 * r2f
    yr = y1 * r3f + y2 * r2f
    origin = view.pos[None] + view.aperture * (right[None] * xr[:, None]
                                               + up[None] * yr[:, None])

    sx = (pixel_idx % w).astype(jnp.float32)
    sy = (pixel_idx // w).astype(jnp.float32)
    u = (sx + r0) / w
    v = (sy + r1) / h
    pos_nodist = view.p1[None] + u[:, None] * right[None] + v[:, None] * up[None]

    # barrel distortion (.optix.cu:89-97)
    tx = sx / w - 0.5
    ty = sy / h - 0.5
    rr = tx * tx + ty * ty
    rq = jnp.sqrt(rr) * (1.0 + view.distortion * rr + view.distortion * rr * rr)
    theta = jnp.arctan2(tx, ty)
    bx = (jnp.sin(theta) * rq + 0.5) * w
    by = (jnp.cos(theta) * rq + 0.5) * h
    pos_dist = (view.p1[None] + ((bx + r0) / w)[:, None] * right[None]
                + ((by + r1) / h)[:, None] * up[None])
    pos_on_pixel = jnp.where(view.distortion == 0.0, pos_nodist, pos_dist)

    direction = normalize(pos_on_pixel - origin)
    # constants derive from path_idx so their varying-manual-axes match the
    # sharded inputs under shard_map(check_vma=True)
    zf = pixel_idx.astype(jnp.float32) * 0.0
    return dict(
        path_idx=path_idx,
        origin=origin,
        dir=direction,
        throughput=jnp.ones((n, 3), jnp.float32) + zf[:, None],
        bsdf_pdf=zf + 1.0,
        last_n=direction,                      # unused until first diffuse hit
        prev_specular=zf == 0.0,               # primary rays act as "via specular"
        n_diffuse=zf.astype(jnp.int32),
        alive=zf == 0.0,
        pixel=pixel_idx,
        sample=sample_idx,
    )


def _pick_intersector(scene: DeviceScene, config: RenderConfig) -> str:
    """Resolve config.intersector="auto": the pallas cluster kernel owns the
    TPU hot path; CPU keeps the lockstep JAX traversal (pallas interpret mode
    is only for kernel unit tests)."""
    if not config.use_bvh:
        return "brute"
    mode = config.intersector
    if mode == "auto":
        on_tpu = jax.default_backend() not in ("cpu",)
        mode = "cluster" if (on_tpu and getattr(scene, "cbvh", None)
                             is not None) else "lockstep"
    if mode == "cluster" and getattr(scene, "cbvh", None) is None:
        mode = "lockstep"
    if mode == "lockstep" and scene.bvh is None:
        mode = "brute"
    return mode


def prepare_cluster_pay(scene: DeviceScene, config: RenderConfig):
    """Per-pass payload-tile prep for the cluster intersector (material rows
    device-baked from the LIVE materials + concat with host geometry rows).
    Returns None on the other intersector paths. Call ONCE per pass and
    thread into _intersect — re-emitting it per bounce measured ~12 ms/pass
    (STAGE_TIMES_r03.json)."""
    if _pick_intersector(scene, config) != "cluster":
        return None
    from lighthouse2_tpu.render.kernels.trace import (
        bake_material_rows, prepare_pay_tiles)
    from lighthouse2_tpu.render.shading import material_pack
    paym = bake_material_rows(
        scene.cbvh, jax.lax.stop_gradient(material_pack(scene.materials)))
    return prepare_pay_tiles(scene.cbvh, paym)


def _intersect(scene: DeviceScene, o, d, config: RenderConfig, alive=None,
               pay_tiles=None, sort_key="dir"):
    """Closest hit. `alive` masks dead wavefront lanes with tmax=0 so the
    trace kernels skip them entirely (static-shape stream compaction).

    `sort_key`: coherence permutation before the cluster kernel — None for
    primary rays (already 32x32-tile coherent; sorting them measured WORSE,
    tools/visit_histogram.py), "dir" for bounce rays (origin-cell +
    direction-morton), "origin_octant" for spread-origin batches.

    Returns (t, prim, u, v, payload) — payload is the trace kernel's
    [PAY_ROWS, N] per-hit shading extract on the cluster path (zero
    downstream gathers; STAGE_TIMES_r03.json), None otherwise."""
    tris = scene.tris
    mode = _pick_intersector(scene, config)
    t_max = BIG_T if alive is None else jnp.where(
        jax.lax.stop_gradient(alive), BIG_T, 0.0)
    payload = None
    if mode == "cluster":
        from lighthouse2_tpu.render.kernels.trace import (
            trace_cluster_bvh, ray_sort_perm)
        from lighthouse2_tpu.render.fetch import reattach_rows
        from lighthouse2_tpu.bvh import clusters as CL
        if pay_tiles is None:
            pay_tiles = prepare_cluster_pay(scene, config)
        perm = inv = None
        # the sort machinery costs ~12 ms/site on the axon relay — only
        # worth it when the cluster union per block is actually large
        if (sort_key is not None and config.ray_sort
                and scene.cbvh.n_clusters >= 16):
            tmax_full = jnp.broadcast_to(jnp.asarray(
                jax.lax.stop_gradient(t_max), jnp.float32), (o.shape[0],))
            perm, inv = ray_sort_perm(jax.lax.stop_gradient(o),
                                      jax.lax.stop_gradient(d),
                                      tmax_full, scene.cbvh, key=sort_key)
        t, payload = trace_cluster_bvh(o, d, scene.cbvh, t_max,
                                       pay_tiles=pay_tiles,
                                       interpret=config.kernel_interpret,
                                       perm=perm, inv=inv)
        prim = jnp.where(payload[CL.PAY_PRIM] >= 0.0,
                         payload[CL.PAY_PRIM].astype(jnp.int32), -1)
        g9 = reattach_rows(tris.tri9, prim,
                           payload[CL.PAY_V0:CL.PAY_V0 + 9])
        rt, ru, rv, ok = refine_hit_rows(o, d, prim, g9)
        # fall back to the kernel t when the refine re-test loses an edge
        # hit (u/v==0 at f32) — rt=BIG_T would otherwise leak a 1e30 hit
        # position into shading (NaN gradients, corrupted NEE distances)
        t = jnp.where((prim >= 0) & ok, rt, t)
        return t, prim, ru, rv, payload
    if mode == "lockstep":
        t, prim, u, v = bvh_intersect(o, d, scene.bvh, tris.v0, tris.e1,
                                      tris.e2, t_max=t_max)
    else:
        t, prim, u, v = intersect_bruteforce(o, d, tris.v0, tris.e1, tris.e2,
                                             chunk=config.tri_chunk)
        if alive is not None:
            prim = jnp.where(alive, prim, -1)
    # differentiable refinement: recompute (t,u,v) from the winning triangle;
    # lanes the refine declines (edge/grazing hits) keep the traversal
    # values with detached gradients — finite instead of 1/det^2 blowups
    rt, ru, rv, ok = refine_hit(o, d, prim, tris.tri9)
    keep = (prim >= 0) & ok
    t = jnp.where(keep, rt, t)
    u = jnp.where(keep, ru, u)
    v = jnp.where(keep, rv, v)
    return t, prim, u, v, None


def make_shading(scene: DeviceScene, d, t, prim, u, v, spread_angle,
                 config: RenderConfig, payload=None):
    """GetShadingData via the kernel payload when available (cluster path),
    else via the packed gathers."""
    if payload is not None:
        from lighthouse2_tpu.render.shading import shading_from_payload
        return shading_from_payload(
            scene, d, t, payload, u, v, spread_angle,
            consistent_normals=config.consistent_normals,
            geom_reattach=not config.scene_sharded)
    return get_shading_data(scene, d, t, prim, u, v, spread_angle,
                            consistent_normals=config.consistent_normals)


def _occluded(scene: DeviceScene, o, d, t_max, config: RenderConfig):
    """Shadow-batch occlusion. Unsorted by default: shadow rays point at a
    few lights from tile-coherent origins and their measured block union is
    small (~24 on bathroom, vs ~12 ms/pass for the sort machinery);
    config.shadow_sort opts back in for many-light scenes."""
    tris = scene.tris
    mode = _pick_intersector(scene, config)
    if mode == "cluster":
        from lighthouse2_tpu.render.kernels.trace import (
            trace_cluster_bvh, ray_sort_perm)
        perm = inv = None
        if config.shadow_sort and scene.cbvh.n_clusters >= 16:
            tmax_full = jnp.broadcast_to(
                jnp.asarray(jax.lax.stop_gradient(t_max), jnp.float32),
                (o.shape[0],))
            perm, inv = ray_sort_perm(jax.lax.stop_gradient(o),
                                      jax.lax.stop_gradient(d),
                                      tmax_full, scene.cbvh,
                                      key="origin_octant")
        return trace_cluster_bvh(o, d, scene.cbvh, t_max, anyhit=True,
                                 interpret=config.kernel_interpret,
                                 perm=perm, inv=inv)
    if mode == "lockstep":
        return bvh_occluded(o, d, t_max, scene.bvh, tris.v0, tris.e1,
                            tris.e2)
    return occluded_bruteforce(o, d, t_max, tris.v0, tris.e1, tris.e2,
                               chunk=config.tri_chunk)


def trace_paths(scene: DeviceScene, view: ViewPyramid, config: RenderConfig,
                path_idx, sample_base, cam_seed):
    """Trace one wavefront of paths; returns (acc_delta [W·H,4], cam_seed',
    stats). `path_idx` may be a shard of the global index range (parallel
    layer) or None for all paths."""
    wh = config.width * config.height
    geo_eps = jnp.float32(config.geometry_epsilon)
    if config.bsdf == "disney":
        from lighthouse2_tpu.render import bsdf_disney as bsdf_mod
    else:
        bsdf_mod = bsdf_lambert

    paths = generate_eye_rays(view, config, sample_base, path_idx)
    n = paths["path_idx"].shape[0]
    zf = paths["bsdf_pdf"] * 0.0              # shard-varying zeros [n]
    # per-path radiance accumulation; reduced to pixels ONCE at the end
    # (scatter-adds inside the bounce loop serialize on TPU)
    acc = jnp.zeros((n, 4), jnp.float32) + zf[:, None]
    if config.filter_enabled:
        # SVGF G-buffers (RenderCore_Optix7Filter features; SURVEY §2.2):
        # indirect accumulator + primary-hit albedo/normal/depth/worldpos
        paths["acc_ind"] = jnp.zeros((n, 3), jnp.float32) + zf[:, None]
        paths["g_albedo"] = jnp.ones((n, 3), jnp.float32) + zf[:, None]
        paths["g_normal"] = jnp.zeros((n, 3), jnp.float32) + zf[:, None]
        paths["g_depth"] = zf
        paths["g_wpos"] = jnp.full((n, 3), 1e30, jnp.float32) + zf[:, None]

    zi0 = zf[0].astype(jnp.int32)             # shard-varying zero scalar
    stats0 = dict(
        extension_rays=jnp.zeros((config.max_path_length,), jnp.int32) + zi0,
        shadow_rays=jnp.zeros((config.max_path_length,), jnp.int32) + zi0,
    )

    pay_tiles = prepare_cluster_pay(scene, config)

    def bounce(carry, li):
        paths, acc, cam_seed, stats = carry
        n_alive = jnp.sum(paths["alive"].astype(jnp.int32))
        stats = dict(stats,
                     extension_rays=stats["extension_rays"].at[li].set(n_alive))
        # li is traced inside scan, so the primary bounce is peeled below to
        # give it its static no-sort treatment (tiled rays are already
        # coherent); scan iterations are all secondary -> "dir" key
        paths, acc, cam_seed, n_conn = bounce_step(
            scene, view, config, paths, acc, cam_seed, li,
            pay_tiles=pay_tiles, sort_key="dir")
        stats = dict(stats, shadow_rays=stats["shadow_rays"].at[li].set(n_conn))
        return (paths, acc, cam_seed, stats), None

    carry = (paths, acc, cam_seed, stats0)
    paths, acc, cam_seed, stats = carry
    n_alive0 = jnp.sum(paths["alive"].astype(jnp.int32))
    stats = dict(stats, extension_rays=stats["extension_rays"].at[0].set(
        n_alive0))
    paths, acc, cam_seed, n_conn0 = bounce_step(
        scene, view, config, paths, acc, cam_seed, jnp.int32(0),
        pay_tiles=pay_tiles, sort_key=None if config.tiled() else "dir")
    stats = dict(stats, shadow_rays=stats["shadow_rays"].at[0].set(n_conn0))
    (paths, acc, cam_seed, stats), _ = jax.lax.scan(
        bounce, (paths, acc, cam_seed, stats),
        jnp.arange(1, config.max_path_length))
    return _finish_pass(config, paths, acc, stats, path_idx, cam_seed)


def bounce_step(scene, view, config: RenderConfig, paths, acc, cam_seed, li,
                pay_tiles=None, intersect_fn=None, occluded_fn=None,
                sort_key="dir"):
    """One full bounce (trace + shade + occlude + apply), skipped via
    `lax.cond` when every lane is dead — the bounce-level analog of the
    reference terminating its loop when counters.extensionRays == 0
    (rendercore.cpp:723-726). The dead branch still advances camRNGseed so
    the sampling schedule is identical whether or not tail bounces run.
    Returns (paths, acc, cam_seed, n_shadow_connections)."""

    isect = intersect_fn or (lambda o, d, alive: _intersect(
        scene, o, d, config, alive, pay_tiles=pay_tiles, sort_key=sort_key))
    occl = occluded_fn or (lambda o, d, tmax: _occluded(scene, o, d, tmax,
                                                        config))

    def live(carry):
        paths, acc, cam_seed = carry
        t, prim, u, v, payload = isect(paths["origin"], paths["dir"],
                                       paths["alive"])
        paths2, acc2, cam_seed2, shadow = shade_bounce(
            scene, view, config, paths, acc, cam_seed, li, t, prim, u, v,
            payload=payload)
        occ = occl(shadow["o"], shadow["d"], shadow["tmax"])
        acc2, paths2 = apply_shadow(config, paths2, acc2, shadow, occ)
        n_conn = jnp.sum(shadow["conn_ok"].astype(jnp.int32))
        return paths2, acc2, cam_seed2, n_conn

    def dead(carry):
        paths, acc, cam_seed = carry
        cam_seed, _ = rng_mod.frame_r0(cam_seed, li + 1)
        n_conn = jnp.sum(jnp.zeros_like(paths["alive"], jnp.int32))
        return paths, acc, cam_seed, n_conn

    return jax.lax.cond(jnp.any(paths["alive"]), live, dead,
                        (paths, acc, cam_seed))


def _finish_pass(config, paths, acc, stats, path_idx, cam_seed):
    """Per-path → per-pixel reduction + stats totals (shared by the fused and
    staged executors)."""
    wh = config.width * config.height
    if path_idx is None:
        spp = config.spp_per_pass
        unt = lambda x: untile_image(x.reshape(spp, wh, -1), config)
        if config.filter_enabled:
            aux = dict(
                indirect=unt(paths["acc_ind"]).sum(0),
                albedo=unt(paths["g_albedo"]).mean(0),
                normal=unt(paths["g_normal"]).mean(0),
                depth=unt(paths["g_depth"]).mean(0)[:, 0],
                world_pos=unt(paths["g_wpos"]).mean(0),
            )
        acc = unt(acc).sum(0)
    else:
        acc = jnp.zeros((wh, 4), jnp.float32).at[paths["pixel"]].add(acc)

    stats = dict(
        stats,
        primary_rays=jnp.int32(paths["path_idx"].shape[0]),
        total_extension=jnp.sum(stats["extension_rays"]),
        total_shadow=jnp.sum(stats["shadow_rays"]),
    )
    if config.filter_enabled and path_idx is None:
        stats["filter_aux"] = aux
    return acc, cam_seed, stats


def shade_bounce(scene, view, config: RenderConfig, paths, acc, cam_seed, li,
                 t, prim, u, v, payload=None):
    """The shade stage for one bounce (pathtracer.h:54-240 minus the trace
    and shadow-trace launches). Returns (paths', acc', cam_seed', shadow)
    where `shadow` carries the NEE connection batch for the occlusion stage."""
    if config.bsdf == "disney":
        from lighthouse2_tpu.render import bsdf_disney as bsdf_mod
    else:
        bsdf_mod = bsdf_lambert
    geo_eps = jnp.float32(config.geometry_epsilon)
    path_length = li + 1                       # reference is 1-based
    is_primary = li == 0
    o, d = paths["origin"], paths["dir"]
    alive = paths["alive"]
    throughput = paths["throughput"]
    bsdf_pdf = paths["bsdf_pdf"]
    prim = jnp.where(alive, prim, -1)

    # primary depth into accumulator .w (pathtracer.h:81)
    depth = jnp.where(prim >= 0, t, 10000.0)
    # dead/miss lanes carry t = BIG_T; 1e30 squared overflows f32 to inf in
    # the NEE distance math, and inf primals turn masked-zero cotangents into
    # NaN vertex gradients (0 * inf). Sanitize t before any position math.
    t = jnp.where(prim >= 0, t, 1.0)
    acc = acc.at[:, 3].add(
        jnp.where(is_primary & alive, depth, 0.0))

    # ---- shade: sky on miss (pathtracer.h:84-91) -----------------------
    use_sky_nee = config.sky_ibl and getattr(scene.sky, "has_ibl", False)
    miss = alive & (prim < 0)
    if use_sky_nee:
        # MIS vs the sky-NEE strategy (the IBL analog of the implicit
        # area-light hit weighting, pathtracer.h:136-142); specular chains
        # keep the bsdf-only weight exactly like area lights
        p_sky = sky_pick_prob(scene.lights, scene.sky, o, paths["last_n"])
        denom_sky = bsdf_pdf + sky_pdf(scene.sky, d) * p_sky
        sky_rad = paths["throughput"] * sample_skydome(scene.sky, d)
        sky_mis = _masked_div(sky_rad, denom_sky, miss)
        sky_spec = _masked_div(sky_rad, bsdf_pdf, miss)
        sky_c = jnp.where(paths["prev_specular"][:, None], sky_spec, sky_mis)
    else:
        sky_c = _masked_div(paths["throughput"] * sample_skydome(scene.sky, d),
                            bsdf_pdf, miss)
    sky_c = _fixnan(_clamp_intensity(sky_c, config.clamp_value)
                    if config.clamp_fireflies else sky_c)

    def add_contrib(acc, paths, contrib, mask):
        """Route to direct (acc) or indirect (filter G-buffer) stream."""
        if config.filter_enabled:
            to_dir = paths["n_diffuse"] == 0
            acc = acc.at[:, :3].add(
                jnp.where((mask & to_dir)[:, None], contrib, 0.0))
            paths = dict(paths, acc_ind=paths["acc_ind"] + jnp.where(
                (mask & ~to_dir)[:, None], contrib, 0.0))
        else:
            acc = acc.at[:, :3].add(jnp.where(mask[:, None], contrib, 0.0))
        return acc, paths

    acc, paths = add_contrib(acc, paths, sky_c, miss)

    hit = alive & (prim >= 0)
    i_pos = o + t[:, None] * d
    sd = make_shading(scene, d, t, prim, u, v, view.spread_angle, config,
                      payload=payload)

    # alpha cutout → passthrough extension ray (pathtracer.h:107-118):
    # keep D/throughput/pdf, move the origin past the surface, skip ALL
    # shading at this vertex. Counts against max_path_length like the
    # reference (it re-emits through the normal extension counter).
    cutout = hit & sd.alpha_cutout
    pass_ok = cutout & (path_length < config.max_path_length)
    hit = hit & ~cutout

    # ---- implicit light hit (pathtracer.h:124-149) ---------------------
    ddotnl = -dot(d, sd.n_geom)
    lit = hit & sd.emissive & (ddotnl > 0)
    l_pdf = calculate_light_pdf(d, t, sd.area, sd.n_geom)
    pick_p = light_pick_prob(scene.lights, sd.ltri, o, paths["last_n"], i_pos,
                             sky=scene.sky if use_sky_nee else None)
    denom_mis = bsdf_pdf + l_pdf * pick_p
    c_mis = _masked_div(throughput * sd.color, denom_mis,
                        lit & (denom_mis > 0))
    c_spec = _masked_div(throughput * sd.color, bsdf_pdf, lit)
    c_light = jnp.where(paths["prev_specular"][:, None], c_spec, c_mis)
    if config.clamp_fireflies:
        c_light = _clamp_intensity(c_light, config.clamp_value)
    c_light = _fixnan(c_light)
    acc, paths = add_contrib(acc, paths, c_light, lit)

    if config.filter_enabled:
        # primary-hit features (filter core writes these at the first
        # vertex; kernels/pathtracer.h:98-122 in RenderCore_Optix7Filter)
        cap = is_primary & hit
        paths = dict(
            paths,
            g_albedo=jnp.where(cap[:, None], sd.color, paths["g_albedo"]),
            g_normal=jnp.where(cap[:, None],
                               sd.n_shading * sd.face_dir[:, None],
                               paths["g_normal"]),
            g_depth=jnp.where(cap, t, paths["g_depth"]),
            g_wpos=jnp.where(cap[:, None], i_pos, paths["g_wpos"]),
        )

    active = hit & ~sd.emissive

    # ---- prep (pathtracer.h:152-163) -----------------------------------
    cur_spec = bsdf_mod.is_specular_material(sd)
    cam_seed, r0_frame = rng_mod.frame_r0(cam_seed, path_length)
    seed = rng_mod.path_seed(paths["path_idx"], r0_frame)
    face_dir = sd.face_dir
    sd = sd.replace(absorption=jnp.where(
        (face_dir == 1.0)[:, None], 0.0, sd.absorption))
    throughput = _masked_div(throughput, bsdf_pdf, active)
    fn_flip = sd.n_shading * face_dir[:, None]

    if config.blue_noise:
        from lighthouse2_tpu.core import bluenoise as bn
        bn_mask = bn.device_mask()
        bn_px = paths["pixel"] % config.width
        bn_py = paths["pixel"] // config.width
        bn_dim0 = 4 * path_length

        def bn_or(r, dim, cap):
            use = paths["sample"] < cap
            return jnp.where(use, bn.sample(bn_mask, bn_px, bn_py,
                                            paths["sample"], bn_dim0 + dim), r)
    else:
        bn_or = lambda r, dim, cap: r

    # ---- NEE (pathtracer.h:165-204) ------------------------------------
    seed, r0 = rng_mod.random_float(seed)
    seed, r1 = rng_mod.random_float(seed)
    # blue-noise NEE dims 4/5+4*pathLength for the first 2 spp
    # (pathtracer.h:168-176)
    r0 = bn_or(r0, 4, 2)
    r1 = bn_or(r1, 5, 2)
    nee_mask = active & ~cur_spec
    if use_sky_nee:
        seed, r6 = rng_mod.random_float(seed)
        seed, r7 = rng_mod.random_float(seed)
        ls = random_point_on_light(scene.lights, r0, r1, i_pos, fn_flip,
                                   sky=scene.sky, r2=r6, r3=r7)
    else:
        ls = random_point_on_light(scene.lights, r0, r1, i_pos, fn_flip)
    l_vec = ls["point"] - i_pos
    dist = jnp.sqrt(jnp.maximum(dot(l_vec, l_vec), 1e-20))
    l_dir = l_vec / dist[:, None]
    n_dot_l = dot(l_dir, fn_flip)
    e_bsdf, e_pdf = bsdf_mod.evaluate(sd, sd.n_shading, -d, l_dir)
    if config.bsdf == "lambert":
        # BSDF_HAS_PURE_SPECULARS scale (lambert.h:19-30)
        e_bsdf = e_bsdf * sd.roughness[:, None]
    conn_ok = nee_mask & (n_dot_l > 0) & (ls["light_pdf"] > 0) & (e_pdf > 0)
    denom = ls["pick_prob"] * ls["light_pdf"] + e_pdf
    potential = (throughput * e_bsdf * ls["color"]
                 * _masked_div(n_dot_l, denom, conn_ok)[:, None])
    potential = _fixnan(potential)
    if config.clamp_fireflies:
        potential = _clamp_intensity(potential, config.clamp_value)
    shadow_o = safe_origin(i_pos, l_dir, sd.n_geom * face_dir[:, None], geo_eps)
    shadow_tmax = jnp.where(conn_ok, dist - 2.0 * geo_eps, 0.0)
    # the occlusion trace + contribution happen OUTSIDE this stage
    # (reference traces shadow batches separately; rendercore.cpp:741-748)
    shadow = dict(o=shadow_o, d=l_dir, tmax=shadow_tmax,
                  potential=potential, conn_ok=conn_ok,
                  to_direct=paths["n_diffuse"] == 0)

    # ---- bounce (pathtracer.h:207-239) ---------------------------------
    may_extend = active & (paths["n_diffuse"] < config.max_diffuse_bounces) \
        & (path_length < config.max_path_length)
    seed, r3 = rng_mod.random_float(seed)
    seed, r4 = rng_mod.random_float(seed)
    # blue-noise BSDF dims 6/7+4*pathLength for the first 256 spp
    # (pathtracer.h:210-217)
    r3 = bn_or(r3, 6, 256)
    r4 = bn_or(r4, 7, 256)
    smp = bsdf_mod.sample(sd, sd.n_shading, sd.n_geom, -d, t, r3, r4)
    ok_pdf = (smp["pdf"] >= EPSILON) & jnp.isfinite(smp["pdf"])
    new_spec = smp["specular"]

    # russian roulette (pathtracer.h:229-230)
    seed, r5 = rng_mod.random_float(seed)
    bounced = paths["n_diffuse"] > 0
    surv = jnp.minimum(1.0, jnp.max(smp["bsdf"], axis=-1))
    p_surv = jnp.where(new_spec | ~bounced, 1.0, surv)
    if not config.russian_roulette:
        p_surv = jnp.ones_like(p_surv)
    rr_ok = r5 <= p_surv

    extend = may_extend & ok_pdf & rr_ok
    new_throughput = (_masked_div(throughput, p_surv, extend)
                      * smp["bsdf"] * jnp.abs(dot(sd.n_shading, smp["wi"]))[:, None])
    new_throughput = _fixnan(new_throughput)
    new_o = safe_origin(i_pos, smp["wi"], sd.n_geom * face_dir[:, None], geo_eps)

    # passthrough lanes keep their original throughput (the pdf division is
    # postponed to the next REAL vertex, matching the reference keeping T4)
    pass_o = i_pos + geo_eps * d
    paths = dict(
        paths,
        origin=jnp.where(extend[:, None], new_o,
                         jnp.where(pass_ok[:, None], pass_o, o)),
        dir=jnp.where(extend[:, None], smp["wi"], d),
        throughput=jnp.where(extend[:, None], new_throughput,
                             jnp.where(pass_ok[:, None], paths["throughput"],
                                       throughput)),
        bsdf_pdf=jnp.where(extend, smp["pdf"],
                           jnp.where(pass_ok, bsdf_pdf,
                                     jnp.ones_like(bsdf_pdf))),
        last_n=jnp.where(extend[:, None], fn_flip, paths["last_n"]),
        prev_specular=jnp.where(extend, new_spec, paths["prev_specular"]),
        n_diffuse=paths["n_diffuse"] + (extend & ~new_spec).astype(jnp.int32),
        alive=extend | pass_ok,
    )
    return paths, acc, cam_seed, shadow


def apply_shadow(config: RenderConfig, paths, acc, shadow, occ):
    """Fold unoccluded NEE contributions into the accumulator
    (finalizeConnections analog, kernels/connections.h)."""
    lit_conn = shadow["conn_ok"] & ~occ
    if config.filter_enabled:
        to_dir = shadow["to_direct"]
        acc = acc.at[:, :3].add(jnp.where(
            (lit_conn & to_dir)[:, None], shadow["potential"], 0.0))
        paths = dict(paths, acc_ind=paths["acc_ind"] + jnp.where(
            (lit_conn & ~to_dir)[:, None], shadow["potential"], 0.0))
    else:
        acc = acc.at[:, :3].add(
            jnp.where(lit_conn[:, None], shadow["potential"], 0.0))
    return acc, paths


def render_pass(scene: DeviceScene, view: ViewPyramid, state: AccumState,
                config: RenderConfig):
    """One progressive pass of spp_per_pass samples/pixel. Returns
    (new AccumState, stats dict). Jit with config static."""
    acc_delta, cam_seed, stats = trace_paths(
        scene, view, config, None, state.sample_count, state.cam_seed)
    new_state = AccumState(
        accumulator=state.accumulator + acc_delta,
        sample_count=state.sample_count + config.spp_per_pass,
        cam_seed=cam_seed,
    )
    return new_state, stats


@functools.partial(jax.jit, static_argnames=("config",))
def render_pass_jit(scene, view, state, config):
    return render_pass(scene, view, state, config)


# ---------------------------------------------------------------------------
# Staged executor — per-stage jits with a host bounce loop.
#
# On the axon TPU runtime, large fused programs (the full bounce scan)
# degrade to one host round-trip per control-flow iteration (~25 ms each),
# while small programs run entirely on device. So the TPU path mirrors the
# reference's architecture literally: one launch per stage per bounce
# (rendercore.cpp:692-748), with the host loop driving device-resident state.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("config",))
def _stage_generate(view, sample_base, config):
    return generate_eye_rays(view, config, sample_base)


@functools.partial(jax.jit, static_argnames=("config",))
def _stage_prepare(scene, config):
    return prepare_cluster_pay(scene, config)


@functools.partial(jax.jit, static_argnames=("config", "sort_key"))
def _stage_trace(scene, o, d, alive, config, pay_tiles=None, sort_key="dir"):
    return _intersect(scene, o, d, config, alive, pay_tiles=pay_tiles,
                      sort_key=sort_key)


@functools.partial(jax.jit, static_argnames=("config",),
                   donate_argnames=("paths", "acc"))
def _stage_shade(scene, view, paths, acc, cam_seed, li, t, prim, u, v, config,
                 payload=None):
    n_alive = jnp.sum(paths["alive"].astype(jnp.int32))
    paths, acc, cam_seed, shadow = shade_bounce(
        scene, view, config, paths, acc, cam_seed, li, t, prim, u, v,
        payload=payload)
    n_conn = jnp.sum(shadow["conn_ok"].astype(jnp.int32))
    return paths, acc, cam_seed, shadow, n_alive, n_conn


@functools.partial(jax.jit, static_argnames=("config",))
def _stage_occlude(scene, o, d, tmax, config):
    return _occluded(scene, o, d, tmax, config)


@functools.partial(jax.jit, static_argnames=("config",),
                   donate_argnames=("paths", "acc"))
def _stage_apply(paths, acc, shadow, occ, config):
    acc, paths = apply_shadow(config, paths, acc, shadow, occ)
    return paths, acc


@functools.partial(jax.jit, static_argnames=("config",))
def _stage_finish(paths, acc, ext_counts, conn_counts, cam_seed, config):
    stats = dict(extension_rays=jnp.stack(ext_counts),
                 shadow_rays=jnp.stack(conn_counts))
    return _finish_pass(config, paths, acc, stats, None, cam_seed)


def render_pass_staged(scene: DeviceScene, view: ViewPyramid,
                       state: AccumState, config: RenderConfig):
    """Same result as render_pass, executed as per-stage launches. All state
    stays on device; NO readbacks happen here (they would degrade the axon
    session — see bench.py note)."""
    n = config.n_paths
    paths = _stage_generate(view, state.sample_count, config)
    acc = jnp.zeros((n, 4), jnp.float32)
    if config.filter_enabled:
        paths["acc_ind"] = jnp.zeros((n, 3), jnp.float32)
        paths["g_albedo"] = jnp.ones((n, 3), jnp.float32)
        paths["g_normal"] = jnp.zeros((n, 3), jnp.float32)
        paths["g_depth"] = jnp.zeros((n,), jnp.float32)
        paths["g_wpos"] = jnp.full((n, 3), 1e30, jnp.float32)
    cam_seed = state.cam_seed
    ext_counts = []
    conn_counts = []
    pay_tiles = _stage_prepare(scene, config)
    for li in range(config.max_path_length):
        t, prim, u, v, payload = _stage_trace(
            scene, paths["origin"], paths["dir"], paths["alive"], config,
            pay_tiles,
            sort_key=None if (li == 0 and config.tiled()) else "dir")
        paths, acc, cam_seed, shadow, n_alive, n_conn = _stage_shade(
            scene, view, paths, acc, cam_seed, jnp.int32(li), t, prim, u, v,
            config, payload=payload)
        occ = _stage_occlude(scene, shadow["o"], shadow["d"], shadow["tmax"],
                             config)
        paths, acc = _stage_apply(paths, acc, shadow, occ, config)
        ext_counts.append(n_alive)
        conn_counts.append(n_conn)
    acc_px, cam_seed, stats = _stage_finish(paths, acc, ext_counts,
                                            conn_counts, cam_seed, config)
    new_state = AccumState(
        accumulator=state.accumulator + acc_px,
        sample_count=state.sample_count + config.spp_per_pass,
        cam_seed=cam_seed,
    )
    return new_state, stats


def trace_paths_unrolled(scene, view, config: RenderConfig, state: AccumState):
    """The whole pass as ONE jittable function with the bounce loop unrolled
    in Python (no lax.scan). Measured fastest on the axon TPU runtime:
    155 ms vs 183 (scan) vs 187 (staged) on cornell 512², and XLA can fuse
    across bounce boundaries."""
    paths = generate_eye_rays(view, config, state.sample_count)
    n = config.n_paths
    acc = jnp.zeros((n, 4), jnp.float32)
    if config.filter_enabled:
        paths["acc_ind"] = jnp.zeros((n, 3), jnp.float32)
        paths["g_albedo"] = jnp.ones((n, 3), jnp.float32)
        paths["g_normal"] = jnp.zeros((n, 3), jnp.float32)
        paths["g_depth"] = jnp.zeros((n,), jnp.float32)
        paths["g_wpos"] = jnp.full((n, 3), 1e30, jnp.float32)
    cam_seed = state.cam_seed
    ext, conn = [], []
    pay_tiles = prepare_cluster_pay(scene, config)
    for li in range(config.max_path_length):
        ext.append(jnp.sum(paths["alive"].astype(jnp.int32)))
        sk = None if (li == 0 and config.tiled()) else "dir"

        def step(scene_, view_, paths_, acc_, cam_seed_, pay_tiles_,
                 li=li, sk=sk):
            return bounce_step(scene_, view_, config, paths_, acc_,
                               cam_seed_, jnp.int32(li),
                               pay_tiles=pay_tiles_, sort_key=sk)

        if config.remat:
            step = jax.checkpoint(step)
        paths, acc, cam_seed, n_conn = step(scene, view, paths, acc,
                                            cam_seed, pay_tiles)
        conn.append(n_conn)
    stats = dict(extension_rays=jnp.stack(ext), shadow_rays=jnp.stack(conn))
    return _finish_pass(config, paths, acc, stats, None, cam_seed)


@functools.partial(jax.jit, static_argnames=("config",),
                   donate_argnames=("state",))
def render_pass_unrolled(scene, view, state, config):
    acc_delta, cam_seed, stats = trace_paths_unrolled(scene, view, config,
                                                      state)
    new_state = AccumState(
        accumulator=state.accumulator + acc_delta,
        sample_count=state.sample_count + config.spp_per_pass,
        cam_seed=cam_seed,
    )
    return new_state, stats


# ---------------------------------------------------------------------------
# Path-regeneration executor (config.path_regen).
#
# The classic wavefront pays every dense per-bounce stage (trace, shade, NEE,
# occlude) on ALL W·H·spp lanes even after most paths have died — measured on
# bathroom at path 16, average live occupancy is ~30%, i.e. ~2/3 of the shade
# FLOPs touch dead lanes (STAGE_TIMES_r04.json finding_2). The reference
# compacts the launch instead (pathtracer.h:233 extensionRay counters); XLA's
# static shapes can't shrink a launch, so we do the dual: keep the pool FULL.
# Each bounce iteration, every dead lane immediately starts a fresh sample of
# its own pixel (Novák et al., "Path Regeneration for Interactive Path
# Tracing", Eurographics 2010 short). Lanes therefore complete samples
# asynchronously; per-pixel completed-sample counts ride AccumState and
# finalize() divides per pixel. The in-flight path pool persists across
# passes so no sample is ever truncated (zero truncation bias; the per-pixel
# mean is a standard ratio estimator, consistent as samples accumulate).
# ---------------------------------------------------------------------------

def make_regen_pool(view: ViewPyramid, config: RenderConfig):
    """Fresh persistent pool: every lane starts sample k of its pixel, where
    k = path_idx // (W·H) stratifies the spp lanes of one pixel. Per-lane
    sample numbers advance by spp on completion so two lanes of the same
    pixel never reuse a sample index."""
    wh = config.width * config.height
    path_idx = jnp.arange(config.n_paths, dtype=jnp.uint32)
    sample_k = path_idx // jnp.uint32(wh)
    paths = generate_eye_rays(view, config, 0, sample_idx=sample_k)
    # eager construction aliases buffers (last_n IS dir); donation in the
    # pass jit requires each leaf to own its buffer
    paths = {k: jnp.asarray(v).copy() for k, v in paths.items()}
    depth = jnp.zeros((config.n_paths,), jnp.int32)
    return paths, depth, sample_k


def trace_paths_regen(scene, view, config: RenderConfig, state: AccumState):
    """One pass of max_path_length full-occupancy bounce iterations over the
    persistent pool. Returns (acc_delta [W·H,4], count_delta [W·H], cam_seed',
    pool', stats)."""
    assert not config.filter_enabled, \
        "path_regen has no G-buffer stream; use the filter core's executor"
    wh = config.width * config.height
    spp = config.spp_per_pass
    paths, depth, sample_k = state.pool
    n = paths["path_idx"].shape[0]
    acc = jnp.zeros((n, 4), jnp.float32)
    count = jnp.zeros((n,), jnp.float32)
    cam_seed = state.cam_seed
    ext, conn = [], []
    pay_tiles = prepare_cluster_pay(scene, config)
    for _ in range(config.max_path_length):
        # regenerate: a dead lane completed its previous sample (credited at
        # death, below) — start the lane's NEXT sample of the SAME pixel.
        # The sample index advances BEFORE generation: the completed sample
        # already consumed the current index, and reusing it would repeat
        # the pixel jitter / lens point / blue-noise sequence (one
        # correlated sample per lane per pool restart). Live lanes' fresh
        # values are discarded by the where(), so only dead lanes observe
        # the incremented index.
        dead = jax.lax.stop_gradient(~paths["alive"])
        sample_k = sample_k + jnp.uint32(spp) * dead.astype(jnp.uint32)
        fresh = generate_eye_rays(view, config, 0, sample_idx=sample_k)
        paths = {k: jnp.where(dead if fresh[k].ndim == 1 else dead[:, None],
                              fresh[k], paths[k]) for k in fresh}
        depth = jnp.where(dead, 0, depth)
        ext.append(jnp.sum(paths["alive"].astype(jnp.int32)))

        # one bounce with PER-LANE depth: shade_bounce's path_length /
        # is_primary / rng / blue-noise math is already elementwise, so the
        # mixed-depth pool rides the exact same code as the classic executors
        def step(scene_, view_, paths_, acc_, cam_seed_, pay_tiles_, depth_):
            return bounce_step(scene_, view_, config, paths_, acc_,
                               cam_seed_, depth_, pay_tiles=pay_tiles_,
                               sort_key="dir")

        if config.remat:
            step = jax.checkpoint(step)
        paths, acc, cam_seed, n_conn = step(scene, view, paths, acc,
                                            cam_seed, pay_tiles, depth)
        depth = depth + paths["alive"].astype(jnp.int32)
        # credit the completed sample at DEATH (not at the next
        # regeneration): its energy entered `acc` this bounce, so energy and
        # count land in the same pass and finalize() is unbiased even at
        # low pass counts (the only residual bias is in-flight partial-path
        # NEE energy, which vanishes as samples accumulate)
        count = count + jax.lax.stop_gradient(
            ~paths["alive"]).astype(jnp.float32)
        conn.append(n_conn)

    unt = lambda x: untile_image(x.reshape(spp, wh, -1), config).sum(0)
    acc_px = unt(acc)
    count_px = unt(count[:, None])[:, 0]
    # NOTE regen stats semantics: "primary_rays" = samples COMPLETED this
    # pass (lanes restart asynchronously, so there is no per-pass primary
    # wavefront); per-pixel spp comes from AccumState.pixel_count, not
    # sample_count (see WavefrontCore.render).
    stats = dict(
        extension_rays=jnp.stack(ext),
        shadow_rays=jnp.stack(conn),
        primary_rays=jnp.sum(count).astype(jnp.int32),
        samples_completed=jnp.sum(count).astype(jnp.int32),
        total_extension=jnp.sum(jnp.stack(ext)),
        total_shadow=jnp.sum(jnp.stack(conn)),
    )
    return acc_px, count_px, cam_seed, (paths, depth, sample_k), stats


@functools.partial(jax.jit, static_argnames=("config",),
                   donate_argnames=("state",))
def _render_pass_regen_jit(scene, view, state, config):
    acc_delta, count_px, cam_seed, pool, stats = trace_paths_regen(
        scene, view, config, state)
    new_state = AccumState(
        accumulator=state.accumulator + acc_delta,
        sample_count=state.sample_count + config.spp_per_pass,
        cam_seed=cam_seed,
        pixel_count=state.pixel_count + count_px,
        pool=pool,
    )
    return new_state, stats


def ensure_regen_state(view, state: AccumState, config: RenderConfig):
    """Attach a fresh pool + zero counts to a classic AccumState (restart)."""
    if state.pool is not None:
        return state
    return state.replace(
        pool=make_regen_pool(view, config),
        pixel_count=jnp.zeros((config.width * config.height,), jnp.float32))


def render_pass_regen(scene, view, state: AccumState, config: RenderConfig):
    state = ensure_regen_state(view, state, config)
    return _render_pass_regen_jit(scene, view, state, config)


def render_pass_auto(scene, view, state, config):
    """Pick the executor: fused scan jit on CPU / virtual devices (fast
    compile), unrolled one-jit on TPU (fast execution); the regen executor
    owns both backends when config.path_regen."""
    if config.path_regen:
        return render_pass_regen(scene, view, state, config)
    if jax.default_backend() in ("cpu",):
        return render_pass_jit(scene, view, state, config)
    return render_pass_unrolled(scene, view, state, config)


def finalize(state: AccumState):
    """accumulator / samplesTaken → linear HDR image [W*H,3]
    (finalize_shared.h:29-45). Regen states divide per pixel by the
    completed-sample counts instead of the global samplesTaken."""
    if state.pixel_count is not None:
        cnt = jnp.maximum(state.pixel_count, 1.0)
        return state.accumulator[:, :3] / cnt[:, None]
    spp = jnp.maximum(state.sample_count, 1).astype(jnp.float32)
    return state.accumulator[:, :3] / spp
