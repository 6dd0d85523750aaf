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


def main():
    import jax
    from lighthouse2_tpu.scene.presets import cornell_box
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render.wavefront import AccumState, render_pass_auto

    size = int(os.environ.get("BENCH_SIZE", "512"))
    paths = int(os.environ.get("BENCH_PATHLEN", "8"))
    cfg = RenderConfig(width=size, height=size, spp_per_pass=1,
                       max_path_length=paths, use_bvh=True)
    scene, cam = cornell_box(size, size)
    ds = scene.sync(rebuild_bvh=True)
    view = cam.get_view()

    state = AccumState.make(cfg)
    # warmup / compile (NO readbacks before or during the timed loop)
    state, stats = render_pass_auto(ds, view, state, cfg)
    jax.block_until_ready(state.accumulator)

    n_passes = int(os.environ.get("BENCH_PASSES", "10"))
    all_stats = []
    t0 = time.perf_counter()
    for _ in range(n_passes):
        state, stats = render_pass_auto(ds, view, state, cfg)
        all_stats.append(stats)
    jax.block_until_ready(state.accumulator)
    dt = time.perf_counter() - t0

    # readbacks only AFTER timing
    total_rays = sum(int(s["total_extension"]) + int(s["total_shadow"])
                     for s in all_stats)
    mrays = total_rays / dt / 1e6
    print(json.dumps({
        "metric": f"Mrays/s/chip forward (cornell {size}x{size}, path {paths})",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
    }))


if __name__ == "__main__":
    main()
