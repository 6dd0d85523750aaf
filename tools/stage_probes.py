"""Direct in-jit microbenches of the non-trace hot stages on real regen-mode
wavefront data (bathroom 512x512): shadow sort, anyhit kernel, NEE light
sampling, trilinear texture fetch, per-pass payload prep. Complements
ablate_pass.py whose stubs cascade (zeroed materials turn every bounce
specular and kill NEE downstream — the r4/r5 'bake mystery').

Usage: python tools/stage_probes.py   (TPU)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache"))

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.core.geometry import BIG_T
from lighthouse2_tpu.render import wavefront as wf
from lighthouse2_tpu.scene.bench_scene import bathroom

REPS = 10
SIZE = int(os.environ.get("BENCH_SIZE", "512"))

scene, cam = bathroom(SIZE, SIZE)
ds = scene.sync(rebuild_bvh=True)
view = cam.get_view()
cfg = RenderConfig(width=SIZE, height=SIZE, spp_per_pass=1,
                   max_path_length=8, use_bvh=True)

# ---- capture a real bounce-1 state + its NEE shadow batch ----------------
paths = wf._stage_generate(view, jnp.int32(0), cfg)
acc = jnp.zeros((cfg.n_paths, 4), jnp.float32)
t, prim, u, v, payload = wf._stage_trace(ds, paths["origin"], paths["dir"],
                                         paths["alive"], cfg)
snap = jax.block_until_ready
# snapshot BEFORE _stage_shade (the stage jits donate their inputs)
p_o = snap(paths["origin"] + 0.0)
p_d = snap(paths["dir"] + 0.0)
t_s = snap(t + 0.0)
u_s = snap(u + 0.0)
v_s = snap(v + 0.0)
paths2, acc2, cs2, shadow, _, _ = wf._stage_shade(
    ds, view, paths, acc, jnp.uint32(0x12345678), jnp.int32(0), t, prim, u,
    v, cfg, payload=payload)
sh_o = snap(shadow["o"] + 0.0)
sh_d = snap(shadow["d"] + 0.0)
sh_t = snap(shadow["tmax"] + 0.0)
b_o = snap(paths2["origin"] + 0.0)
b_d = snap(paths2["dir"] + 0.0)
b_alive = snap(paths2["alive"] & True)
# shading inputs at the bounce-1 hit
i_pos = snap(p_o + t_s[:, None] * p_d)
n_flip = snap(jnp.tile(jnp.array([[0., 1., 0.]], jnp.float32),
                       (cfg.n_paths, 1)))


def bench(fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / REPS * 1e3


def loop(body):
    @jax.jit
    def run(*args):
        def it(i, c):
            r = body(i, *args)
            return c + r
        return jax.lax.fori_loop(0, REPS, it, 0.0)
    return run


out = {}

# 1. shadow octant sort (perm + inverse build)
from lighthouse2_tpu.render.kernels.trace import (
    ray_sort_perm, trace_cluster_bvh, prepare_pay_tiles)

def sort_body(i, o, d, tm):
    perm, inv = ray_sort_perm(o + 0.0 * i, d, tm, ds.cbvh,
                              key="origin_octant")
    return (perm[0] + inv[0]).astype(jnp.float32)

out["shadow_sort_ms"] = round(bench(loop(sort_body), sh_o, sh_d, sh_t), 2)

def dsort_body(i, o, d, tm):
    perm, inv = ray_sort_perm(o + 0.0 * i, d, tm, ds.cbvh, key="dir")
    return (perm[0] + inv[0]).astype(jnp.float32)

out["bounce_sort_ms"] = round(bench(loop(dsort_body), b_o, b_d,
                                    jnp.where(b_alive, BIG_T, 0.0)), 2)

# 2. anyhit kernel on the real shadow batch (sorted / unsorted)
def any_body(sort):
    def body(i, o, d, tm):
        tm = tm + 0.0 * i
        perm = inv = None
        if sort:
            perm, inv = ray_sort_perm(o, d, tm, ds.cbvh,
                                      key="origin_octant")
        occ = trace_cluster_bvh(o, d, ds.cbvh, tm, anyhit=True,
                                perm=perm, inv=inv)
        return occ.astype(jnp.float32)[0]
    return body

out["anyhit_sorted_ms"] = round(
    bench(loop(any_body(True)), sh_o, sh_d, sh_t), 2)
out["anyhit_unsorted_ms"] = round(
    bench(loop(any_body(False)), sh_o, sh_d, sh_t), 2)

# 3. NEE light sampling (random_point_on_light incl. potentials + CDF pick)
from lighthouse2_tpu.render.lights import (
    random_point_on_light, potential_contributions)

def nee_body(i, ip, nf):
    r0 = jnp.full((ip.shape[0],), 0.3) + 0.0 * i
    r1 = jnp.full((ip.shape[0],), 0.7)
    ls = random_point_on_light(ds.lights, r0, r1, ip, nf)
    return ls["light_pdf"][0]

out["nee_sample_ms"] = round(bench(loop(nee_body), i_pos, n_flip), 2)

def pot_body(i, ip, nf):
    pot, _ = potential_contributions(ds.lights, ip + 0.0 * i, nf)
    return pot[0, 0]

out["nee_potentials_ms"] = round(bench(loop(pot_body), i_pos, n_flip), 2)

# 4. trilinear texture fetch at the bounce-1 hits (base color site)
from lighthouse2_tpu.render.textures import fetch_trilinear
uv = snap(jnp.stack([u_s, v_s], -1))
tid = snap(jnp.zeros((cfg.n_paths,), jnp.int32))

def tex_body(i, uv_, tid_):
    texel = fetch_trilinear(ds.textures, tid_, uv_ + 0.0 * i,
                            jnp.zeros((uv_.shape[0],)))
    return texel[0, 0]

try:
    out["tex_trilinear_ms"] = round(bench(loop(tex_body), uv, tid), 2)
except Exception as e:
    out["tex_trilinear_ms"] = f"error {str(e)[-80:]}"

# 5. per-pass payload prep (bake + flat pack)
def prep_body(i, _x):
    pt = wf.prepare_cluster_pay(ds, cfg)
    return pt[0, 0] + 0.0 * i

out["prepare_pay_ms"] = round(bench(loop(prep_body), jnp.float32(0)), 2)

# 6. regen raygen (one full-pool generate + merge)
def gen_body(i, _x):
    fresh = wf.generate_eye_rays(view, cfg, 0,
                                 sample_idx=jnp.uint32(i)
                                 + jnp.zeros((cfg.n_paths,), jnp.uint32))
    return fresh["dir"][0, 0]

out["raygen_ms"] = round(bench(loop(gen_body), jnp.float32(0)), 2)

print(json.dumps(out))


# 7. residual shade decomposition: payload shading assembly + bsdf math
if os.environ.get("PROBE_SHADE"):
    from lighthouse2_tpu.render.wavefront import make_shading, _intersect
    from lighthouse2_tpu.render import bsdf_lambert as BL

    pay_full = jax.jit(lambda o, d, al: _intersect(
        ds, o, d, cfg, al, pay_tiles=wf.prepare_cluster_pay(ds, cfg),
        sort_key="dir"))
    t2, prim2, u2, v2, payload2 = pay_full(p_o, p_d,
                                           jnp.ones_like(b_alive))
    payload2 = snap(payload2 + 0.0)
    t2s = snap(t2 + 0.0)
    prim2s = snap(prim2 + 0)
    u2s = snap(u2 + 0.0)
    v2s = snap(v2 + 0.0)

    def shade_body(i, pay, tt, pr, uu, vv):
        sd = make_shading(ds, p_d, tt + 0.0 * i, pr, uu, vv,
                          jnp.float32(1e-3), cfg, payload=pay)
        return sd.color[0, 0]

    out["make_shading_ms"] = round(
        bench(loop(shade_body), payload2, t2s, prim2s, u2s, v2s), 2)

    sd0 = make_shading(ds, p_d, t2s, prim2s, u2s, v2s, jnp.float32(1e-3),
                       cfg, payload=payload2)
    sd0 = jax.tree_util.tree_map(lambda a: snap(a + 0 * a), sd0)

    def bsdf_body(i, nf):
        r3 = jnp.full((cfg.n_paths,), 0.3) + 0.0 * i
        r4 = jnp.full((cfg.n_paths,), 0.6)
        smp = BL.sample(sd0, sd0.n_shading, sd0.n_geom, -p_d,
                        jnp.ones((cfg.n_paths,)), r3, r4)
        e, ep = BL.evaluate(sd0, sd0.n_shading, -p_d, smp["wi"])
        return smp["pdf"][0] + ep[0]

    out["bsdf_sample_eval_ms"] = round(bench(loop(bsdf_body), n_flip), 2)

    # full bounce_step (trace+shade+occlude+apply) for the per-bounce total
    pool_paths, depth0, sk0 = wf.make_regen_pool(view, cfg)
    pool_paths = {k: snap(v + (0 * v if v.dtype != jnp.bool_ else False))
                  for k, v in pool_paths.items()}
    pay_t = snap(wf.prepare_cluster_pay(ds, cfg))

    @jax.jit
    def bounce_once(paths_, acc_, pay_tiles_):
        p2, a2, cs, nc = wf.bounce_step(
            ds, view, cfg, paths_, acc_, jnp.uint32(1), jnp.int32(1),
            pay_tiles=pay_tiles_, sort_key="dir")
        return a2

    a0 = jnp.zeros((cfg.n_paths, 4), jnp.float32)
    r = jax.block_until_ready(bounce_once(pool_paths, a0, pay_t))
    t0 = time.perf_counter()
    for _ in range(5):
        r = jax.block_until_ready(bounce_once(pool_paths, a0, pay_t))
    out["full_bounce_step_ms"] = round((time.perf_counter() - t0) / 5 * 1e3,
                                       2)

    print(json.dumps({k: out[k] for k in
                      ("make_shading_ms", "bsdf_sample_eval_ms",
                       "full_bounce_step_ms")}))
