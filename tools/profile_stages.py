"""Per-stage wall-time attribution on the real TPU (VERDICT r2 item 1).

Runs the staged executor (one jit per stage, mirroring the reference's
per-launch pipeline, rendercore.cpp:692-748) and times each stage with
block_until_ready. Writes STAGE_TIMES_r03.json at the repo root:

  {scene: {stage: seconds_per_pass, ...,
           mrays_forward: ..., breakdown_pct: {...}}}

Run in its own process (axon session degradation note in bench.py applies:
this process does readbacks, the bench process must not).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile_scene(name, size=512, path_len=8, reps=5):
    import jax
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render import wavefront as wf

    cfg = RenderConfig(width=size, height=size, spp_per_pass=1,
                       max_path_length=path_len, use_bvh=True)
    if name == "bathroom":
        from lighthouse2_tpu.scene.bench_scene import bathroom
        scene, cam = bathroom(size, size)
    else:
        from lighthouse2_tpu.scene.presets import cornell_box
        scene, cam = cornell_box(size, size)
    ds = scene.sync(rebuild_bvh=True)
    view = cam.get_view()

    stages = {k: 0.0 for k in
              ("generate", "trace", "shade", "occlude", "apply", "finish")}

    def run_pass(state, record):
        n = cfg.n_paths
        t0 = time.perf_counter()
        paths = wf._stage_generate(view, state.sample_count, cfg)
        jax.block_until_ready(paths["origin"])
        if record:
            stages["generate"] += time.perf_counter() - t0
        import jax.numpy as jnp
        acc = jnp.zeros((n, 4), jnp.float32)
        cam_seed = state.cam_seed
        ext_counts, conn_counts = [], []
        for li in range(cfg.max_path_length):
            t0 = time.perf_counter()
            t, prim, u, v = wf._stage_trace(ds, paths["origin"], paths["dir"],
                                            paths["alive"], cfg)
            jax.block_until_ready(t)
            if record:
                stages["trace"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            paths, acc, cam_seed, shadow, n_alive, n_conn = wf._stage_shade(
                ds, view, paths, acc, cam_seed, jnp.int32(li), t, prim, u, v,
                cfg)
            jax.block_until_ready(acc)
            if record:
                stages["shade"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            occ = wf._stage_occlude(ds, shadow["o"], shadow["d"],
                                    shadow["tmax"], cfg)
            jax.block_until_ready(occ)
            if record:
                stages["occlude"] += time.perf_counter() - t0
            t0 = time.perf_counter()
            paths, acc = wf._stage_apply(paths, acc, shadow, occ, cfg)
            jax.block_until_ready(acc)
            if record:
                stages["apply"] += time.perf_counter() - t0
            ext_counts.append(n_alive)
            conn_counts.append(n_conn)
        t0 = time.perf_counter()
        acc_px, cam_seed, stats = wf._stage_finish(
            paths, acc, ext_counts, conn_counts, cam_seed, cfg)
        jax.block_until_ready(acc_px)
        if record:
            stages["finish"] += time.perf_counter() - t0
        new_state = wf.AccumState(
            accumulator=state.accumulator + acc_px,
            sample_count=state.sample_count + cfg.spp_per_pass,
            cam_seed=cam_seed)
        return new_state, stats

    state = wf.AccumState.make(cfg)
    state, stats = run_pass(state, record=False)  # compile
    total_rays = 0
    t_all = time.perf_counter()
    for _ in range(reps):
        state, stats = run_pass(state, record=True)
        total_rays += int(stats["total_extension"]) + int(stats["total_shadow"])
    t_all = time.perf_counter() - t_all

    per_pass = {k: v / reps for k, v in stages.items()}
    tot = sum(per_pass.values())
    return {
        "scene": name,
        "size": size,
        "path_len": path_len,
        "seconds_per_pass": {k: round(v, 5) for k, v in per_pass.items()},
        "total_s_per_pass": round(tot, 5),
        "breakdown_pct": {k: round(100.0 * v / tot, 1)
                          for k, v in per_pass.items()},
        "mrays_forward_staged": round(total_rays / t_all / 1e6, 3),
    }


def main():
    out = {}
    for name in sys.argv[1:] or ["cornell", "bathroom"]:
        out[name] = profile_scene(name)
        print(json.dumps(out[name]))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "STAGE_TIMES_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
