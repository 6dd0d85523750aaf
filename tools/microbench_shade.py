"""Attribute the shade-stage cost: in-jit repetition of each sub-piece
(get_shading_data / refine_hit / lights / bsdf / blue-noise / full shade)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 20


def main():
    import jax
    import jax.numpy as jnp
    import functools
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render import wavefront as wf
    from lighthouse2_tpu.render.shading import get_shading_data
    from lighthouse2_tpu.render.lights import (
        random_point_on_light, light_pick_prob)
    from lighthouse2_tpu.bvh.traverse import refine_hit
    from lighthouse2_tpu.render import bsdf_lambert

    size = int(os.environ.get("BENCH_SIZE", "512"))
    scene_name = os.environ.get("BENCH_SCENE", "cornell")
    cfg = RenderConfig(width=size, height=size, spp_per_pass=1,
                       max_path_length=8, use_bvh=True)
    if scene_name == "bathroom":
        from lighthouse2_tpu.scene.bench_scene import bathroom
        scene, cam = bathroom(size, size)
    else:
        from lighthouse2_tpu.scene.presets import cornell_box
        scene, cam = cornell_box(size, size)
    ds = scene.sync(rebuild_bvh=True)
    view = cam.get_view()

    paths = wf._stage_generate(view, jnp.int32(0), cfg)
    o = paths["origin"] + 0.0
    d = paths["dir"] + 0.0
    alive = paths["alive"] & True
    pix = paths["pixel"] + 0
    samp = paths["sample"] + 0
    t, prim, u, v = wf._stage_trace(ds, o, d, alive, cfg)
    t, prim, u, v = t + 0.0, prim + 0, u + 0.0, v + 0.0
    i_pos = o + t[:, None] * d

    def timeit(name, fn, carry0):
        """fn(carry) -> tuple of outputs; iterations chain through carry so
        XLA can neither DCE nor overlap them."""
        def body(i, c):
            outs = fn(c)
            dep = sum(jnp.sum(x).astype(jnp.float32) for x in outs
                      if jnp.issubdtype(x.dtype, jnp.inexact))
            return c + (0.0 * dep).astype(c.dtype)
        wrapped = jax.jit(lambda c: jax.lax.fori_loop(0, REPS, body, c))
        jax.block_until_ready(wrapped(carry0))
        t0 = time.perf_counter()
        jax.block_until_ready(wrapped(carry0))
        dt = (time.perf_counter() - t0) / REPS
        print(name, round(dt * 1e3, 3), "ms")
        return dt

    res = {}
    res["refine_hit"] = timeit(
        "refine_hit", lambda o_: refine_hit(o_, d, prim, ds.tris.tri9)[:2], o)
    res["shading_data"] = timeit(
        "get_shading_data",
        lambda d_: (get_shading_data(ds, d_, t, prim, u, v, view.spread_angle,
                                     consistent_normals=cfg.consistent_normals)
                    .color,), d)
    sd = get_shading_data(ds, d, t, prim, u, v, view.spread_angle,
                          consistent_normals=cfg.consistent_normals)
    res["lights_pick"] = timeit(
        "random_point_on_light",
        lambda ip: (random_point_on_light(
            ds.lights, u, v, ip, sd.n_shading)["point"],), i_pos)
    res["light_pick_prob"] = timeit(
        "light_pick_prob",
        lambda ip: (light_pick_prob(ds.lights, sd.ltri, o, d, ip),), i_pos)
    res["bsdf_eval"] = timeit(
        "bsdf eval+sample",
        lambda d_: (bsdf_lambert.evaluate(sd, sd.n_shading, -d_, d_)[0],
                    bsdf_lambert.sample(sd, sd.n_shading, sd.n_geom, -d_,
                                        t, u, v)["wi"]), d)
    if cfg.blue_noise:
        from lighthouse2_tpu.core import bluenoise as bn
        mask = bn.device_mask()
        res["bluenoise_x4"] = timeit(
            "blue noise x4",
            lambda s: tuple(bn.sample(mask, pix % size, pix // size,
                                      s, k) for k in range(4)), samp)

    # the full shade_bounce for reference
    acc = jnp.zeros((cfg.n_paths, 4), jnp.float32)
    res["full_shade"] = timeit(
        "full shade_bounce",
        lambda o_: (wf.shade_bounce(ds, view, cfg,
                                    dict(paths, origin=o_), acc,
                                    jnp.uint32(1), jnp.int32(1),
                                    t, prim, u, v)[1],), o)
    print(json.dumps({k: round(vv * 1e3, 3) for k, vv in res.items()}))


if __name__ == "__main__":
    main()
