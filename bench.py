"""Benchmark driver — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Headline metric (BASELINE.md): **Mrays/s/chip forward+backward on the
bathroom2-class interior** (scene/bench_scene.py, 129k tris). The default
run measures the triple {cornell-fwd, bathroom-fwd, bathroom-fwd+bwd} and
reports the headline with the others in "extra", plus the virtual-mesh
scaling table written to BENCH_SCALING.json (>=80% target, BASELINE.md).

Env knobs: BENCH_QUICK=1 (cornell-fwd only), BENCH_SCENE/BENCH_BACKWARD/
BENCH_SIZE/BENCH_PATHLEN/BENCH_PASSES (single-workload mode),
BENCH_SCALING=1 (scaling table only — run under JAX_PLATFORMS=cpu with
--xla_force_host_platform_device_count=N).

IMPORTANT (axon relay): device→host readbacks permanently degrade the
session (+~24ms per dispatch afterwards), so timed loops keep everything
on device and stats are read back only after timing ends.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 100.0
REPO = os.path.dirname(os.path.abspath(__file__))


def _enable_compile_cache():
    """Persistent jit cache (the PTX-cache analog, rendercore.cpp:133-160)."""
    import jax
    cache = os.environ.get("JAX_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _make_scene(name, size):
    if name == "bathroom":
        from lighthouse2_tpu.scene.bench_scene import bathroom
        return bathroom(size, size)
    from lighthouse2_tpu.scene.presets import cornell_box
    return cornell_box(size, size)


def run_workload(scene_name: str, backward: bool, size: int, paths: int,
                 n_passes: int) -> float:
    """Mrays/s for one workload (rays = extension + shadow, CoreStats
    convention, apps/imguiapp/main.cpp:222-233)."""
    import jax
    import jax.numpy as jnp
    import functools
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render.wavefront import (
        AccumState, render_pass_auto, render_pass)

    cfg = RenderConfig(width=size, height=size, spp_per_pass=1,
                       max_path_length=paths, use_bvh=True)
    scene, cam = _make_scene(scene_name, size)
    ds = scene.sync(rebuild_bvh=True)
    view = cam.get_view()

    if backward:
        # forward+backward: grad of an image loss wrt material colors —
        # the headline includes the backward wavefront (BASELINE.md)
        @functools.partial(jax.jit, static_argnames=("config",))
        def fb_pass(scene_, view_, state, config, target):
            def loss_fn(color):
                s = scene_.replace(
                    materials=scene_.materials.replace(color=color))
                st, stats = render_pass(s, view_, state, config)
                img = st.accumulator[:, :3]
                return jnp.mean((img - target) ** 2), (st, stats)
            (_, (st, stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(scene_.materials.color)
            return st, stats, grads

        target = jnp.zeros((size * size, 3), jnp.float32)
        step = lambda st: fb_pass(ds, view, st, cfg, target)[:2]
    else:
        step = lambda st: render_pass_auto(ds, view, st, cfg)

    state = AccumState.make(cfg)
    # warmup / compile (NO readbacks before or during the timed loop)
    state, stats = step(state)
    jax.block_until_ready(state.accumulator)

    all_stats = []
    t0 = time.perf_counter()
    for _ in range(n_passes):
        state, stats = step(state)
        all_stats.append(stats)
    jax.block_until_ready(state.accumulator)
    dt = time.perf_counter() - t0

    total_rays = sum(int(s["total_extension"]) + int(s["total_shadow"])
                     for s in all_stats)
    return total_rays / dt / 1e6


def scaling_main():
    """BENCH_SCALING=1: rays/s vs device count (scaling-efficiency rig,
    BASELINE.md >=80% target). Runs on whatever devices exist — real
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


def _capture_scaling_artifact():
    """Run the scaling rig in a clean CPU-8-device subprocess (the in-process
    axon plugin owns the TPU backend) and persist BENCH_SCALING.json."""
    env = dict(os.environ)
    env["BENCH_SCALING"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["BENCH_SIZE"] = env.get("BENCH_SCALING_SIZE", "128")
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags
                            + " --xla_force_host_platform_device_count=8"
                            ).strip()
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, timeout=1200)
        line = out.stdout.strip().splitlines()[-1]
        data = json.loads(line)
        data["note"] = (
            "measured on VIRTUAL CPU devices sharing one host's cores - "
            "validates the sharded path's correctness/overhead shape only; "
            "absolute efficiency is only meaningful on a real multi-chip "
            "pod (ICI), where per-device work is truly parallel")
        with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
            json.dump(data, f, indent=1)
        return data
    except Exception as e:  # scaling failure must not kill the headline
        return {"error": str(e)[-300:]}


def main():
    size = int(os.environ.get("BENCH_SIZE", "512"))
    paths = int(os.environ.get("BENCH_PATHLEN", "8"))

    if os.environ.get("BENCH_SCENE") or os.environ.get("BENCH_BACKWARD"):
        # single-workload mode (tooling / ablation use)
        scene_name = os.environ.get("BENCH_SCENE", "cornell")
        backward = bool(os.environ.get("BENCH_BACKWARD"))
        n_passes = int(os.environ.get("BENCH_PASSES", "10"))
        mrays = run_workload(scene_name, backward, size, paths, n_passes)
        mode = "forward+backward" if backward else "forward"
        print(json.dumps({
            "metric": f"Mrays/s/chip {mode} ({scene_name} {size}x{size}, "
                      f"path {paths})",
            "value": round(mrays, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        }))
        return

    quick = bool(os.environ.get("BENCH_QUICK"))
    extra = {}
    extra["cornell_fwd_mrays"] = round(
        run_workload("cornell", False, size, paths, 10), 3)
    if quick:
        print(json.dumps({
            "metric": f"Mrays/s/chip forward (cornell {size}x{size}, "
                      f"path {paths})",
            "value": extra["cornell_fwd_mrays"],
            "unit": "Mrays/s",
            "vs_baseline": round(
                extra["cornell_fwd_mrays"] / BASELINE_MRAYS, 4),
        }))
        return

    extra["bathroom_fwd_mrays"] = round(
        run_workload("bathroom", False, size, paths, 3), 3)
    headline = run_workload("bathroom", True, size, paths, 2)
    scaling = _capture_scaling_artifact()
    if isinstance(scaling, dict) and "value" in scaling:
        extra["scaling_efficiency_8dev"] = scaling["value"]

    print(json.dumps({
        "metric": f"Mrays/s/chip forward+backward (bathroom {size}x{size}, "
                  f"path {paths})",
        "value": round(headline, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(headline / BASELINE_MRAYS, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    _enable_compile_cache()
    if os.environ.get("BENCH_SCALING"):
        scaling_main()
    else:
        main()
