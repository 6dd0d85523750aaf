"""Kernel-internals ablation driver: times the closest-hit cluster kernel on
captured bathroom bounce-1 rays under TRACE_ABLATE variants (subprocess per
variant — the flag is read at import). Attribution for STAGE_TIMES_r04."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import functools, os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np
import jax, jax.numpy as jnp
from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render import wavefront as wf
from lighthouse2_tpu.core.geometry import BIG_T
from lighthouse2_tpu.scene.bench_scene import bathroom

REPS = 10
scene, cam = bathroom(512, 512)
ds = scene.sync(rebuild_bvh=True)
view = cam.get_view()
cfg = RenderConfig(width=512, height=512, spp_per_pass=1, max_path_length=8,
                   use_bvh=True)
d = np.load("/tmp/bounce1_rays.npz")
o = jnp.asarray(d["o"]); dd = jnp.asarray(d["d"]); tm0 = jnp.asarray(d["tm"])
from lighthouse2_tpu.render.kernels.trace import (
    trace_cluster_bvh, ray_sort_perm, prepare_pay_tiles, PAY_STAT_VISITS,
    PAY_STAT_SUBS)
pay_tiles = jax.block_until_ready(prepare_pay_tiles(ds.cbvh, None))

@jax.jit
def loop_trace(o, d, tmax0):
    perm, inv = ray_sort_perm(o, d, tmax0, ds.cbvh, key="dir")
    def body(i, tm):
        t, _pay = trace_cluster_bvh(o, d, ds.cbvh, tm, pay_tiles=pay_tiles,
                                    perm=perm, inv=inv)
        return tm + 0.0 * t
    return jax.lax.fori_loop(0, REPS, body, tmax0)

out = jax.block_until_ready(loop_trace(o, dd, tm0))
t0 = time.perf_counter()
out = jax.block_until_ready(loop_trace(o, dd, tm0))
dt = (time.perf_counter() - t0) / REPS

# visit stats from one un-looped call
perm, inv = ray_sort_perm(o, dd, tm0, ds.cbvh, key="dir")
t, pay = trace_cluster_bvh(o, dd, ds.cbvh, tm0, pay_tiles=pay_tiles,
                           perm=perm, inv=inv)
vis = np.asarray(pay[PAY_STAT_VISITS])[::1024]
subs = np.asarray(pay[PAY_STAT_SUBS])[::1024]
print("RESULT", json.dumps(dict(
    ablate=os.environ.get("TRACE_ABLATE", ""),
    ms=round(dt * 1e3, 2),
    visits_mean=float(np.mean(vis)), visits_p90=float(np.percentile(vis, 90)),
    subs_mean=float(np.mean(subs)),
)))
""" % {"repo": REPO}

import json as _json


def capture_rays():
    """One-time: capture bounce-1 rays to /tmp."""
    sys.path.insert(0, REPO)
    import numpy as np
    import jax.numpy as jnp
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render import wavefront as wf
    from lighthouse2_tpu.core.geometry import BIG_T
    from lighthouse2_tpu.scene.bench_scene import bathroom
    scene, cam = bathroom(512, 512)
    ds = scene.sync(rebuild_bvh=True)
    view = cam.get_view()
    cfg = RenderConfig(width=512, height=512, spp_per_pass=1,
                       max_path_length=8, use_bvh=True)
    snap = lambda x: x + jnp.zeros_like(x)
    paths = wf._stage_generate(view, jnp.int32(0), cfg)
    acc = jnp.zeros((cfg.n_paths, 4), jnp.float32)
    cam_seed = jnp.uint32(0x12345678)
    t, prim, u, v, payload = wf._stage_trace(ds, paths["origin"],
                                             paths["dir"], paths["alive"],
                                             cfg)
    paths, acc, cam_seed, shadow, _, _ = wf._stage_shade(
        ds, view, paths, acc, cam_seed, jnp.int32(0), t, prim, u, v, cfg,
        payload=payload)
    import numpy as np
    np.savez("/tmp/bounce1_rays.npz",
             o=np.asarray(paths["origin"]), d=np.asarray(paths["dir"]),
             tm=np.asarray(jnp.where(paths["alive"], BIG_T, 0.0)))
    print("captured", int(np.asarray(paths["alive"]).sum()), "live rays")


def main():
    if not os.path.exists("/tmp/bounce1_rays.npz"):
        capture_rays()
    variants = os.environ.get(
        "VARIANTS",
        ",nopay,nopaydma;nopay,nobm,subs,nosubmask,noslab").replace(
        ";", ",").split(",") if False else [
        "", "nopay", "nopaydma,nopay", "nobm", "subs", "nosubmask",
        "nopay,nopaydma,nobm", "subs,nopaydma,nobm"]
    if os.environ.get("VARIANTS"):
        variants = os.environ["VARIANTS"].split(";")
    for v in variants:
        env = dict(os.environ, TRACE_ABLATE=v)
        r = subprocess.run([sys.executable, "-c", WORKER], env=env,
                           capture_output=True, text=True, timeout=1200)
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        if line:
            print(line[-1][7:], flush=True)
        else:
            print(_json.dumps({"ablate": v, "error":
                               (r.stderr or r.stdout)[-400:]}), flush=True)


if __name__ == "__main__":
    main()
