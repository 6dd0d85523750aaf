"""Device-side microbench of the trace kernel (in-jit repetition, one
dispatch) — attributes the fused-pass time without axon dispatch noise.

Chains iterations through tmax so XLA cannot DCE or parallelize them."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 20


def bench_fn(fn, *args):
    import jax
    out = jax.block_until_ready(fn(*args))   # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / REPS, out


def main():
    import jax
    import jax.numpy as jnp
    import functools
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render import wavefront as wf
    from lighthouse2_tpu.core.geometry import BIG_T

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

    # realistic ray distributions: primary rays (coherent) and the rays
    # entering bounce 2 (incoherent), captured from a real pass
    paths = wf._stage_generate(view, jnp.int32(0), cfg)
    snap = lambda *xs: tuple(x + jnp.zeros_like(x) if x.dtype != jnp.bool_
                             else x & True for x in xs)
    rays = {"primary": snap(paths["origin"], paths["dir"], paths["alive"])}
    acc = jnp.zeros((cfg.n_paths, 4), jnp.float32)
    cam_seed = jnp.uint32(0x12345678)
    for li in range(2):
        t, prim, u, v = wf._stage_trace(ds, paths["origin"], paths["dir"],
                                        paths["alive"], cfg)
        paths, acc, cam_seed, shadow, _, _ = wf._stage_shade(
            ds, view, paths, acc, cam_seed, jnp.int32(li), t, prim, u, v, cfg)
    rays["bounce2"] = snap(paths["origin"], paths["dir"], paths["alive"])
    rays["shadow"] = snap(shadow["o"], shadow["d"], shadow["tmax"])

    from lighthouse2_tpu.render.kernels.trace import trace_cluster_bvh

    @functools.partial(jax.jit, static_argnames=("anyhit",))
    def loop_trace(o, d, tmax0, anyhit):
        def body(i, carry):
            tm = carry
            if anyhit:
                occ = trace_cluster_bvh(o, d, ds.cbvh, tm, anyhit=True)
                return tm + 0.0 * occ.astype(jnp.float32)
            t, prim, u, v = trace_cluster_bvh(o, d, ds.cbvh, tm)
            return tm + 0.0 * t
        return jax.lax.fori_loop(0, REPS, body, tmax0)

    results = {"scene": scene_name, "size": size,
               "n_paths": int(cfg.n_paths)}
    for name, (o, d, aliveish) in rays.items():
        if name == "shadow":
            tmax0 = aliveish
            anyhit = True
        else:
            tmax0 = jnp.where(aliveish, BIG_T, 0.0)
            anyhit = False
        dt, _ = bench_fn(lambda o=o, d=d, t=tmax0, a=anyhit:
                         loop_trace(o, d, t, a))
        n_live = int(jnp.sum((tmax0 > 0)))
        results[name] = {
            "ms_per_call": round(dt * 1e3, 3),
            "live_rays": n_live,
            "mrays_s": round(n_live / dt / 1e6, 2),
        }
        print(name, results[name])

    # the full unrolled pass for comparison
    state = wf.AccumState.make(cfg)
    st = jax.block_until_ready(wf.render_pass_unrolled(ds, view, state, cfg))
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        st, stats = wf.render_pass_unrolled(ds, view, st[0] if isinstance(st, tuple) else st, cfg)
        st = (jax.block_until_ready(st), stats)
        st = st[0]
    dt_full = (time.perf_counter() - t0) / n
    results["full_pass_ms"] = round(dt_full * 1e3, 2)
    print("full pass ms:", results["full_pass_ms"])
    print(json.dumps(results))


if __name__ == "__main__":
    main()
