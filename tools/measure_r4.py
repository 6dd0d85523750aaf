"""Round-4 opening measurement: where do bathroom's ms/pass actually go?

In-jit repetition (one dispatch per measurement, no readbacks inside timed
regions — axon relay degrades permanently on device->host sync)."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render import wavefront as wf
from lighthouse2_tpu.core.geometry import BIG_T

SIZE = int(os.environ.get("BENCH_SIZE", "512"))
PLEN = int(os.environ.get("BENCH_PATHLEN", "8"))
SCENE = os.environ.get("BENCH_SCENE", "bathroom")
REPS = int(os.environ.get("REPS", "10"))

if SCENE == "bathroom":
    from lighthouse2_tpu.scene.bench_scene import bathroom
    scene, cam = bathroom(SIZE, SIZE)
else:
    from lighthouse2_tpu.scene.presets import cornell_box
    scene, cam = cornell_box(SIZE, SIZE)
ds = scene.sync(rebuild_bvh=True)
view = cam.get_view()
print(f"scene={SCENE} tris={ds.cbvh.n_prims} clusters={ds.cbvh.n_clusters} "
      f"top_nodes={ds.cbvh.n_nodes} tpc={ds.cbvh.tiles_per_cluster}",
      flush=True)

results = {"scene": SCENE, "size": SIZE, "plen": PLEN,
           "n_clusters": int(ds.cbvh.n_clusters)}


def timeit(tag, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{tag:40s} {dt*1e3:9.2f} ms", flush=True)
    results[tag] = round(dt * 1e3, 2)
    return out


# ---- full pass, sort on vs off ----
for sort in (() if os.environ.get("SKIP_FULL") else (True, False)):
    cfg = RenderConfig(width=SIZE, height=SIZE, spp_per_pass=1,
                       max_path_length=PLEN, use_bvh=True, ray_sort=sort)
    state = wf.AccumState.make(cfg)
    step = lambda st, cfg=cfg: wf.render_pass_unrolled(ds, view, st, cfg)[0]
    timeit(f"full_pass sort={sort}", step, state)

# ---- capture realistic ray sets ----
cfg = RenderConfig(width=SIZE, height=SIZE, spp_per_pass=1,
                   max_path_length=PLEN, use_bvh=True)
snap = lambda *xs: tuple(x + jnp.zeros_like(x) if x.dtype != jnp.bool_
                         else x & True for x in xs)  # _stage_shade donates
paths = wf._stage_generate(view, jnp.int32(0), cfg)
acc = jnp.zeros((cfg.n_paths, 4), jnp.float32)
cam_seed = jnp.uint32(0x12345678)
rays = {"primary": snap(paths["origin"], paths["dir"], paths["alive"])}
shadow = None
for li in range(2):
    t, prim, u, v, payload = wf._stage_trace(ds, paths["origin"],
                                             paths["dir"], paths["alive"],
                                             cfg)
    paths, acc, cam_seed, shadow, _, _ = wf._stage_shade(
        ds, view, paths, acc, cam_seed, jnp.int32(li), t, prim, u, v, cfg,
        payload=payload)
    rays[f"bounce{li+1}"] = snap(paths["origin"], paths["dir"],
                                 paths["alive"])
rays["shadow1"] = snap(shadow["o"], shadow["d"], shadow["tmax"])

from lighthouse2_tpu.render.kernels.trace import (
    trace_cluster_bvh, ray_sort_perm, prepare_pay_tiles)

pay_tiles = jax.block_until_ready(prepare_pay_tiles(ds.cbvh, None))


@functools.partial(jax.jit, static_argnames=("anyhit", "sort"))
def loop_trace(o, d, tmax0, anyhit, sort):
    def body(i, tm):
        perm = inv = None
        if sort:
            perm, inv = ray_sort_perm(o, d, tm, ds.cbvh)
        if anyhit:
            occ = trace_cluster_bvh(o, d, ds.cbvh, tm, anyhit=True,
                                    perm=perm, inv=inv)
            return tm + 0.0 * occ.astype(jnp.float32)
        t, _pay = trace_cluster_bvh(o, d, ds.cbvh, tm,
                                    pay_tiles=pay_tiles, perm=perm, inv=inv)
        return tm + 0.0 * t
    return jax.lax.fori_loop(0, REPS, body, tmax0)


@jax.jit
def loop_sort_only(o, d, tmax0):
    def body(i, tm):
        perm, inv = ray_sort_perm(o, d, tm, ds.cbvh)
        return tm + 0.0 * perm.astype(jnp.float32)[inv]
    return jax.lax.fori_loop(0, REPS, body, tmax0)


for name, (o, d, aliveish) in rays.items():
    if name.startswith("shadow"):
        tmax0 = aliveish
        anyhit = True
    else:
        tmax0 = jnp.where(aliveish, BIG_T, 0.0)
        anyhit = False
    n_live = int(jnp.sum(tmax0 > 0))
    results[f"{name}_live"] = n_live
    for sort in (False, True):
        dt = timeit(f"trace {name} sort={sort} (x{REPS})",
                    lambda o=o, d=d, t=tmax0, a=anyhit, s=sort:
                    loop_trace(o, d, t, a, s), n=1)
    o, d, tmax0_ = rays[name][0], rays[name][1], tmax0
    timeit(f"sort_perm {name} (x{REPS})",
           lambda o=o, d=d, t=tmax0_: loop_sort_only(o, d, t), n=1)

print(json.dumps(results))
