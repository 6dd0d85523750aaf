"""Pixel probe — click-to-inspect (reference: core probe counters
core_settings.h:114-116, consumed at apps/imguiapp/main.cpp:123-134).

Casts a single center-pixel primary ray and reports hit identity.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lighthouse2_tpu.core.geometry import normalize, intersect_bruteforce
from lighthouse2_tpu.bvh.traverse import bvh_intersect


def _pixel_rays(view, config):
    """Pixel-centre primary rays in scanline order, [W*H, 3] each."""
    w, h = config.width, config.height
    right = view.p2 - view.p1
    up = view.p3 - view.p1
    i = jnp.arange(w * h)
    u = ((i % w).astype(jnp.float32) + 0.5) / w
    v = ((i // w).astype(jnp.float32) + 0.5) / h
    p = view.p1[None] + u[:, None] * right[None] + v[:, None] * up[None]
    o = jnp.broadcast_to(view.pos[None], (w * h, 3))
    return o, normalize(p - view.pos[None])


def _colormap(x):
    """Simple 3-stop heat colormap for [0,1] scalars → [...,3]."""
    x = np.clip(np.asarray(x, np.float32), 0.0, 1.0)
    r = np.clip(2.0 * x, 0, 1)
    g = np.clip(2.0 * x - 0.5, 0, 1) * np.clip(2.0 - 2.0 * x, 0, 1)
    b = np.clip(1.0 - 2.0 * x, 0, 1)
    return np.stack([r, g, b], -1)


def bvh_heatmap(scene, view, config) -> np.ndarray:
    """BVH cost heatmap [H,W,3] — the ColorDebugBVH debug view
    (RenderCore_Bart/raytracer.cpp:102-120). On the lockstep path the value
    is the per-RAY traversal step count; on the cluster-kernel path it is
    the per-1024-ray-block cluster-visit count (the quantity that governs
    TPU trace cost — render/kernels/trace.py PAY_STAT rows)."""
    from lighthouse2_tpu.render.wavefront import _pick_intersector
    o, d = _pixel_rays(view, config)
    mode = _pick_intersector(scene, config)
    if mode == "cluster":
        from lighthouse2_tpu.render.kernels.trace import (
            trace_cluster_bvh, PAY_STAT_VISITS)
        _, payload = trace_cluster_bvh(o, d, scene.cbvh, 1e30,
                                       interpret=config.kernel_interpret)
        counts = np.asarray(payload[PAY_STAT_VISITS])
    elif scene.bvh is not None:
        from lighthouse2_tpu.bvh.traverse import bvh_intersect_counts
        counts = np.asarray(
            bvh_intersect_counts(o, d, scene.bvh)[4]).astype(np.float32)
    else:
        counts = np.zeros((config.width * config.height,), np.float32)
    peak = max(float(counts.max()), 1.0)
    img = _colormap(counts / peak)
    return img.reshape(config.height, config.width, 3)


def gbuffer_views(scene, view, config) -> np.ndarray:
    """Filter G-buffer debug mosaic [2H,2W,3] — albedo / shading normal /
    depth / world position (the F4 multi-view, finalize_shared.h:491-541)."""
    import dataclasses
    import jax
    from lighthouse2_tpu.render.wavefront import AccumState, render_pass_jit
    cfg = dataclasses.replace(config, filter_enabled=True, spp_per_pass=1)
    _, stats = render_pass_jit(scene, view, AccumState.make(cfg), cfg)
    aux = jax.tree_util.tree_map(np.asarray, stats["filter_aux"])
    h, w = cfg.height, cfg.width
    alb = aux["albedo"].reshape(h, w, 3)
    nrm = aux["normal"].reshape(h, w, 3) * 0.5 + 0.5
    dep = aux["depth"].reshape(h, w)
    dvis = _colormap(dep / max(float(dep[np.isfinite(dep)].max()
                                     if np.isfinite(dep).any() else 1.0),
                               1e-6))
    wp = aux["world_pos"].reshape(h, w, 3)
    wvis = np.clip(np.abs(wp - np.floor(wp)), 0, 1)
    wvis = np.where(np.isfinite(wvis), wvis, 0.0)
    top = np.concatenate([alb, nrm], axis=1)
    bot = np.concatenate([dvis, wvis], axis=1)
    return np.clip(np.concatenate([top, bot], axis=0), 0.0, 1.0)


def bvh_print(scene) -> str:
    """BVH::Print analog (RenderCore_Bart/bvh.cpp:304-314): tree shape
    statistics for whichever structures the scene carries."""
    lines = []
    if getattr(scene, "bvh", None) is not None:
        b = scene.bvh
        count = np.asarray(b.count)
        leaves = count > 0
        lines.append(
            f"BVH2 (lockstep): {count.shape[0]} nodes, "
            f"{int(leaves.sum())} leaves, "
            f"{int(count[leaves].sum())} prim slots, "
            f"max leaf size {int(count.max())}, "
            f"mean {float(count[leaves].mean()):.2f}")
    if getattr(scene, "cbvh", None) is not None:
        from lighthouse2_tpu.bvh.clusters import PAY_VALID
        c = scene.cbvh
        valid = int(np.asarray(c.pgeo[:, PAY_VALID, :] > 0).sum())
        lines.append(
            f"ClusterBVH: {c.n_nodes} top nodes, {c.n_clusters} clusters x "
            f"{c.tiles_per_cluster} tile(s), depth {c.max_depth}, "
            f"{c.n_prims} prims ({valid} tile slots used, "
            f"{c.n_clusters * c.tiles_per_cluster * 128} capacity)")
    return "\n".join(lines) if lines else "no acceleration structures"


def probe_pixel(scene, view, config, x: int, y: int) -> dict:
    right = view.p2 - view.p1
    up = view.p3 - view.p1
    u = (x + 0.5) / config.width
    v = (y + 0.5) / config.height
    p = view.p1 + u * right + v * up
    o = view.pos[None]
    d = normalize(p - view.pos)[None]
    tris = scene.tris
    if config.use_bvh and scene.bvh is not None:
        t, prim, bu, bv = bvh_intersect(o, d, scene.bvh, tris.v0, tris.e1, tris.e2)
    else:
        t, prim, bu, bv = intersect_bruteforce(o, d, tris.v0, tris.e1, tris.e2)
    prim_i = int(prim[0])
    mat = int(tris.mat[prim_i]) if prim_i >= 0 else -1
    return dict(prim=prim_i, material=mat,
                distance=float(t[0]) if prim_i >= 0 else float("inf"),
                u=float(bu[0]), v=float(bv[0]))
