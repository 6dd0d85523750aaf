"""Full-pass attribution on bathroom at the bench path length: capture the
REAL wavefront at every bounce, microbench closest+anyhit+sort for each, and
compare the sum against the measured full pass. One process; kernel compiles
are shared across bounces (same shapes)."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render import wavefront as wf
from lighthouse2_tpu.core.geometry import BIG_T
from lighthouse2_tpu.scene.bench_scene import bathroom
from lighthouse2_tpu.render.kernels.trace import (
    trace_cluster_bvh, ray_sort_perm, prepare_pay_tiles)

SIZE = int(os.environ.get("BENCH_SIZE", "512"))
PLEN = int(os.environ.get("BENCH_PATHLEN", "16"))
REPS = 5

scene, cam = bathroom(SIZE, SIZE)
ds = scene.sync(rebuild_bvh=True)
view = cam.get_view()
cfg = RenderConfig(width=SIZE, height=SIZE, spp_per_pass=1,
                   max_path_length=PLEN, use_bvh=True)
pay_tiles = jax.block_until_ready(prepare_pay_tiles(ds.cbvh, None))

# ---- capture per-bounce wavefronts from the staged loop ----
snap = lambda *xs: tuple(x + jnp.zeros_like(x) if x.dtype != jnp.bool_
                         else x & True for x in xs)
paths = wf._stage_generate(view, jnp.int32(0), cfg)
acc = jnp.zeros((cfg.n_paths, 4), jnp.float32)
cam_seed = jnp.uint32(0x12345678)
bounces = []
for li in range(PLEN):
    bounces.append(dict(
        rays=snap(paths["origin"], paths["dir"], paths["alive"]),
        live=int(np.asarray(paths["alive"]).sum())))
    t, prim, u, v, payload = wf._stage_trace(
        ds, paths["origin"], paths["dir"], paths["alive"], cfg,
        pay_tiles, sort_key=None if li == 0 else "dir")
    paths, acc, cam_seed, shadow, _, _ = wf._stage_shade(
        ds, view, paths, acc, cam_seed, jnp.int32(li), t, prim, u, v, cfg,
        payload=payload)
    bounces[-1]["shadow"] = snap(shadow["o"], shadow["d"], shadow["tmax"])
    bounces[-1]["conn"] = int(np.asarray(shadow["conn_ok"]).sum())


@functools.partial(jax.jit, static_argnames=("sort",))
def loop_closest(o, d, tmax0, sort):
    perm = inv = None
    if sort:
        perm, inv = ray_sort_perm(o, d, tmax0, ds.cbvh, key="dir")

    def body(i, tm):
        t, _p = trace_cluster_bvh(o, d, ds.cbvh, tm, pay_tiles=pay_tiles,
                                  perm=perm, inv=inv)
        return tm + 0.0 * t
    return jax.lax.fori_loop(0, REPS, body, tmax0)


@jax.jit
def loop_anyhit(o, d, tmax0):
    def body(i, tm):
        occ = trace_cluster_bvh(o, d, ds.cbvh, tm, anyhit=True)
        return tm + 0.0 * occ.astype(jnp.float32)
    return jax.lax.fori_loop(0, REPS, body, tmax0)


@jax.jit
def loop_sort(o, d, tmax0):
    def body(i, tm):
        perm, inv = ray_sort_perm(o, d, tm, ds.cbvh, key="dir")
        return tm + 0.0 * perm.astype(jnp.float32)[inv]
    return jax.lax.fori_loop(0, REPS, body, tmax0)


def bench1(fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / REPS * 1e3


tot_c = tot_a = tot_s = 0.0
for li, b in enumerate(bounces):
    o, d, alive = b["rays"]
    tm0 = jnp.where(alive, BIG_T, 0.0)
    ms_c = bench1(loop_closest, o, d, tm0, li > 0)
    so, sd_, stm = b["shadow"]
    ms_a = bench1(loop_anyhit, so, sd_, stm)
    ms_s = bench1(loop_sort, o, d, tm0) if li > 0 else 0.0
    tot_c += ms_c
    tot_a += ms_a
    tot_s += ms_s
    print(f"bounce {li:2d}: live {b['live']:7d} conn {b['conn']:7d} "
          f"closest {ms_c:7.2f} ms  anyhit {ms_a:6.2f} ms  sort {ms_s:5.2f} ms",
          flush=True)

# full pass for comparison
state = wf.AccumState.make(cfg)
st = wf.render_pass_unrolled(ds, view, state, cfg)
jax.block_until_ready(st[0].accumulator)
t0 = time.perf_counter()
st2 = wf.render_pass_unrolled(ds, view, st[0], cfg)
jax.block_until_ready(st2[0].accumulator)
full = (time.perf_counter() - t0) * 1e3
print(json.dumps(dict(full_pass_ms=round(full, 1),
                      sum_closest_ms=round(tot_c, 1),
                      sum_anyhit_ms=round(tot_a, 1),
                      sum_sort_ms=round(tot_s, 1),
                      unattributed_ms=round(full - tot_c - tot_a - tot_s,
                                            1))))
