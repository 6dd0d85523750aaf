"""Closest-kernel visit/sub-packet statistics + per-visit cost on bathroom
(primary + bounce1). Uses the kernel's PAY_STAT rows. One process."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import numpy as np
import jax
import jax.numpy as jnp

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render import wavefront as wf
from lighthouse2_tpu.core.geometry import BIG_T
from lighthouse2_tpu.scene.bench_scene import bathroom
from lighthouse2_tpu.render.kernels.trace import (
    trace_cluster_bvh, ray_sort_perm, prepare_pay_tiles, PAY_STAT_VISITS,
    PAY_STAT_SUBS, BLOCK)

REPS = 10
scene, cam = bathroom(512, 512)
ds = scene.sync(rebuild_bvh=True)
view = cam.get_view()
cfg = RenderConfig(width=512, height=512, spp_per_pass=1, max_path_length=8,
                   use_bvh=True)
pay_tiles = jax.block_until_ready(prepare_pay_tiles(ds.cbvh, None))

snap = lambda *xs: tuple(x + jnp.zeros_like(x) if x.dtype != jnp.bool_
                         else x & True for x in xs)
paths = wf._stage_generate(view, jnp.int32(0), cfg)
acc = jnp.zeros((cfg.n_paths, 4), jnp.float32)
cam_seed = jnp.uint32(0x12345678)
rays = {"primary": snap(paths["origin"], paths["dir"], paths["alive"])}
t, prim, u, v, payload = wf._stage_trace(ds, paths["origin"], paths["dir"],
                                         paths["alive"], cfg)
paths, acc, cam_seed, shadow, _, _ = wf._stage_shade(
    ds, view, paths, acc, cam_seed, jnp.int32(0), t, prim, u, v, cfg,
    payload=payload)
rays["bounce1"] = snap(paths["origin"], paths["dir"], paths["alive"])


@functools.partial(jax.jit, static_argnames=("sort",))
def traced(o, d, tmax0, sort):
    perm = inv = None
    if sort:
        perm, inv = ray_sort_perm(o, d, tmax0, ds.cbvh, key="dir")
    t, pay = trace_cluster_bvh(o, d, ds.cbvh, tmax0, pay_tiles=pay_tiles,
                               perm=perm, inv=inv)
    # stats live in BLOCK-sized runs of the PERMUTED layout; undo the inv by
    # re-permuting... simplest: return stats rows before un-permute is not
    # accessible here, so take per-block stats from the un-permuted rows'
    # unique values instead (each block's count is broadcast to 1024 lanes)
    return t, pay[PAY_STAT_VISITS], pay[PAY_STAT_SUBS]


@functools.partial(jax.jit, static_argnames=("sort", "ablate"))
def loop_trace(o, d, tmax0, sort, ablate=""):
    perm = inv = None
    if sort:
        perm, inv = ray_sort_perm(o, d, tmax0, ds.cbvh, key="dir")

    def body(i, tm):
        t, _pay = trace_cluster_bvh(o, d, ds.cbvh, tm, pay_tiles=pay_tiles,
                                    perm=perm, inv=inv, ablate=ablate)
        return tm + 0.0 * t
    return jax.lax.fori_loop(0, REPS, body, tmax0)


ABLATES = [a for a in os.environ.get("ABLATES", "").split(",")] \
    if os.environ.get("ABLATES") is not None else [""]
ONLY = os.environ.get("ONLY", "")   # e.g. "bounce1:sorted,primary"
out = {}
for name, (o, d, aliveish) in rays.items():
    tm0 = jnp.where(aliveish, BIG_T, 0.0)
    for sort in ((False, True) if name != "primary" else (False,)):
        if ONLY:
            tag = f"{name}:{'sorted' if sort else 'unsorted'}"
            if tag not in ONLY and name not in ONLY.split(","):
                continue
        t, vis, subs = jax.block_until_ready(traced(o, d, tm0, sort))
        vis = np.asarray(vis)
        subs = np.asarray(subs)
        tot_blocks = vis.shape[0] // BLOCK
        tot_visits = float(vis.mean()) * tot_blocks
        tot_subs = float(subs.mean()) * tot_blocks
        for ab in ABLATES:
            x = jax.block_until_ready(loop_trace(o, d, tm0, sort, ab))
            t0 = time.perf_counter()
            x = jax.block_until_ready(loop_trace(o, d, tm0, sort, ab))
            ms = (time.perf_counter() - t0) / REPS * 1e3
            row = dict(ms=round(ms, 2),
                       visits_per_block=round(float(vis.mean()), 1),
                       subs_per_block=round(float(subs.mean()), 1),
                       us_per_visit=round(ms * 1e3 / max(tot_visits, 1), 2),
                       us_per_sub=round(ms * 1e3 / max(tot_subs, 1), 2))
            print(name, "sort=", sort, "ablate=", ab or "none",
                  json.dumps(row), flush=True)
            out[f"{name}_sort{sort}_{ab or 'none'}"] = row
print(json.dumps(out))
