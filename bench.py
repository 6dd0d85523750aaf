"""Benchmark driver — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md): Mrays/s/chip forward. Until the bathroom2
asset pipeline lands, the workload is the Cornell box at 512x512, spp 1,
max_path_length 8, BVH on — rays counted exactly like the reference's
CoreStats (extension + shadow rays; apps/imguiapp/main.cpp:222-233).
Baseline target: 100 Mrays/s/chip (BASELINE.json north star).

IMPORTANT (axon relay): device→host readbacks permanently degrade the
session (+~24ms per dispatch afterwards), so the timed loop keeps
everything on device and stats are read back only after timing ends.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 100.0


def _enable_compile_cache():
    """Persistent jit cache (the PTX-cache analog, rendercore.cpp:133-160)."""
    import jax
    cache = os.environ.get("JAX_CACHE_DIR",
                           os.path.join(os.path.dirname(__file__),
                                        ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def scaling_main():
    """BENCH_SCALING=1: rays/s vs device count (scaling-efficiency rig,
    BASELINE.md >=80% target). Runs on whatever devices exist — the real
    chip(s), or a virtual CPU mesh under
    XLA_FLAGS=--xla_force_host_platform_device_count=N."""
    import jax
    from lighthouse2_tpu.scene.presets import cornell_box
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.parallel.distributed import measure_scaling

    size = int(os.environ.get("BENCH_SIZE", "256"))
    cfg = RenderConfig(width=size, height=size, spp_per_pass=1,
                       max_path_length=8, use_bvh=True)
    scene, cam = cornell_box(size, size)
    ds = scene.sync(rebuild_bvh=True)
    rows = measure_scaling(ds, cam.get_view(), cfg)
    eff = rows[-1]["efficiency"] if rows else 0.0
    print(json.dumps({
        "metric": f"rays/s scaling efficiency at {rows[-1]['devices']} devices"
                  if rows else "scaling (no runs)",
        "value": round(eff, 4),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.80, 4),
        "table": [{k: round(v, 4) if isinstance(v, float) else v
                   for k, v in r.items()} for r in rows],
    }))


def _bench_scene(size):
    """BENCH_SCENE=cornell (default) | bathroom (the bathroom2-class
    procedural interior, scene/bench_scene.py — BASELINE configs 3-5)."""
    name = os.environ.get("BENCH_SCENE", "cornell")
    if name == "bathroom":
        from lighthouse2_tpu.scene.bench_scene import bathroom
        return name, *bathroom(size, size)
    from lighthouse2_tpu.scene.presets import cornell_box
    return "cornell", *cornell_box(size, size)


def main():
    import jax
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render.wavefront import AccumState, render_pass_auto

    size = int(os.environ.get("BENCH_SIZE", "512"))
    paths = int(os.environ.get("BENCH_PATHLEN", "8"))
    backward = bool(os.environ.get("BENCH_BACKWARD"))
    cfg = RenderConfig(width=size, height=size, spp_per_pass=1,
                       max_path_length=paths, use_bvh=True)
    scene_name, scene, cam = _bench_scene(size)
    ds = scene.sync(rebuild_bvh=True)
    view = cam.get_view()

    if backward:
        # forward+backward: grad of an image loss wrt material colors —
        # the headline metric includes the backward wavefront (BASELINE.md)
        import jax.numpy as jnp
        import functools

        @functools.partial(jax.jit, static_argnames=("config",))
        def fb_pass(scene_, view_, state, config, target):
            def loss_fn(color):
                s = scene_.replace(
                    materials=scene_.materials.replace(color=color))
                from lighthouse2_tpu.render.wavefront import render_pass
                st, stats = render_pass(s, view_, state, config)
                img = st.accumulator[:, :3]
                return jnp.mean((img - target) ** 2), (st, stats)
            (_, (st, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(scene_.materials.color)
            return st, stats, grads

        target = jax.numpy.zeros((size * size, 3), jax.numpy.float32)
        step = lambda st: fb_pass(ds, view, st, cfg, target)[:2]
    else:
        step = lambda st: render_pass_auto(ds, view, st, cfg)

    state = AccumState.make(cfg)
    # warmup / compile (NO readbacks before or during the timed loop)
    state, stats = step(state)
    jax.block_until_ready(state.accumulator)

    n_passes = int(os.environ.get("BENCH_PASSES", "10"))
    all_stats = []
    t0 = time.perf_counter()
    for _ in range(n_passes):
        state, stats = step(state)
        all_stats.append(stats)
    jax.block_until_ready(state.accumulator)
    dt = time.perf_counter() - t0

    # readbacks only AFTER timing
    total_rays = sum(int(s["total_extension"]) + int(s["total_shadow"])
                     for s in all_stats)
    mrays = total_rays / dt / 1e6
    mode = "forward+backward" if backward else "forward"
    print(json.dumps({
        "metric": f"Mrays/s/chip {mode} ({scene_name} {size}x{size}, "
                  f"path {paths})",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    _enable_compile_cache()
    if os.environ.get("BENCH_SCALING"):
        scaling_main()
    else:
        main()
