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
                 n_passes: int, grads: str = "all",
                 ray_sort: bool = True, regen: bool = False) -> float:
    """Mrays/s for one workload (rays = extension + shadow, CoreStats
    convention, apps/imguiapp/main.cpp:222-233).

    backward=True differentiates the UNROLLED executor (the same one the
    forward headline uses — round-3 differentiated the slower scan
    executor). grads="materials" takes d(loss)/d(material colors) only;
    grads="all" also includes vertex positions (reparameterized hits +
    per-pass tile rebake) and area-light radiance — the full BASELINE
    gradient contract. regen=True runs the path-regeneration executor
    (persistent full-occupancy pool, wavefront.py trace_paths_regen)."""
    import jax
    import jax.numpy as jnp
    import functools
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render.wavefront import (
        AccumState, render_pass_auto, trace_paths_unrolled,
        trace_paths_regen, ensure_regen_state)

    cfg = RenderConfig(width=size, height=size, spp_per_pass=1,
                       max_path_length=paths, use_bvh=True,
                       ray_sort=ray_sort, remat=backward, path_regen=regen)
    scene, cam = _make_scene(scene_name, size)
    ds = scene.sync(rebuild_bvh=True)
    view = cam.get_view()

    if backward:
        from lighthouse2_tpu.diff.params import (
            set_material_fields, set_light_radiance, displace_vertices)

        @functools.partial(jax.jit, static_argnames=("config",))
        def fb_pass(scene_, view_, state, config, target, params):
            def loss_fn(p):
                s = set_material_fields(scene_, color=p["color"])
                if "light" in p:
                    s = set_light_radiance(s, p["light"])
                if "offset" in p:
                    s = displace_vertices(s, p["offset"])
                if config.path_regen:
                    acc_delta, count_px, cam_seed, pool, stats = \
                        trace_paths_regen(s, view_, config, state)
                    img = (acc_delta[:, :3]
                           / jnp.maximum(count_px, 1.0)[:, None])
                    st = AccumState(
                        accumulator=state.accumulator + acc_delta,
                        sample_count=state.sample_count
                        + config.spp_per_pass,
                        cam_seed=cam_seed,
                        pixel_count=state.pixel_count + count_px,
                        pool=pool)
                    return jnp.mean((img - target) ** 2), st
                acc_delta, cam_seed, stats = trace_paths_unrolled(
                    s, view_, config, state)
                img = acc_delta[:, :3]
                st = AccumState(
                    accumulator=state.accumulator + acc_delta,
                    sample_count=state.sample_count + config.spp_per_pass,
                    cam_seed=cam_seed)
                return jnp.mean((img - target) ** 2), st
            (_, st), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return st, g

        params = {"color": ds.materials.color}
        if grads == "all":
            params["light"] = ds.lights.tri_radiance
            params["offset"] = jnp.zeros((ds.tris.count, 3, 3), jnp.float32)
        target = jnp.zeros((size * size, 3), jnp.float32)

        def step(st):
            st2, g = fb_pass(ds, view, st, cfg, target, params)
            # thread the gradients through so the end-of-loop sync waits for
            # the FULL backward chain — blocking on the accumulator alone
            # lets a lazy relay report the forward outputs ready while the
            # vjp is still in flight (measured: a 2-pass fwd+bwd "finishing"
            # in 1.7 ms)
            return st2, {"total_extension": jnp.int32(0), "grads": g}

        # ray counts for the rate come from one forward stats pass (the
        # backward step function does not thread stats; per-pass counts
        # vary <1% with the sample index)
        _, stats0 = render_pass_auto(ds, view, AccumState.make(cfg), cfg)
        fixed_rays = int(stats0["total_extension"]) + int(
            stats0["total_shadow"])
    else:
        step = lambda st: render_pass_auto(ds, view, st, cfg)
        fixed_rays = None

    state = AccumState.make(cfg)
    if regen:
        state = ensure_regen_state(view, state, cfg)
    # warmup / compile (NO readbacks before or during the timed loop)
    state, stats = step(state)
    jax.block_until_ready((state, stats))

    all_stats = []
    t0 = time.perf_counter()
    for _ in range(n_passes):
        state, stats = step(state)
        all_stats.append(stats)
    jax.block_until_ready((state, stats))
    dt = time.perf_counter() - t0

    if fixed_rays is not None:
        total_rays = fixed_rays * n_passes
    else:
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

    from lighthouse2_tpu.parallel.distributed import collective_bytes_per_pass
    from lighthouse2_tpu.parallel.mesh import make_mesh, replicate_scene

    size = int(os.environ.get("BENCH_SIZE", "256"))
    cfg = RenderConfig(width=size, height=size, spp_per_pass=1,
                       max_path_length=8, use_bvh=True)
    scene, cam = cornell_box(size, size)
    ds = scene.sync(rebuild_bvh=True)
    view = cam.get_view()
    rows = measure_scaling(ds, view, cfg)
    # weak scaling: fixed rays/device — the shape that means something on a
    # virtual CPU mesh (VERDICT r3 weak #2) and on real pods alike
    weak_rows = measure_scaling(ds, view, cfg, weak=True)
    # measured collective traffic of the compiled 8-device pass + analytic
    # ICI bound at v5e link bandwidth
    import jax
    nd = min(8, len(jax.devices()))
    try:
        comm = collective_bytes_per_pass(
            replicate_scene(ds, make_mesh(nd)), view, cfg, make_mesh(nd))
        comm = {k: (round(v, 4) if isinstance(v, float) else v)
                for k, v in comm.items()}
    except Exception as e:
        comm = {"error": str(e)[-200:]}
    eff = rows[-1]["efficiency"] if rows else 0.0
    rnd = lambda rs: [{k: round(v, 4) if isinstance(v, float) else v
                       for k, v in r.items()} for r in rs]
    print(json.dumps({
        "metric": f"rays/s scaling efficiency at {rows[-1]['devices']} devices"
                  if rows else "scaling (no runs)",
        "value": round(eff, 4),
        "unit": "fraction",
        "vs_baseline": round(eff / 0.80, 4),
        "table": rnd(rows),
        "weak_scaling_table": rnd(weak_rows),
        "collective_bytes_per_pass_8dev": comm,
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


def _emit(obj):
    """Every bench line is printed COMPLETE and FLUSHED the moment it is
    known — the reference prints its stats every frame
    (apps/imguiapp/main.cpp:222-233), and round 4 proved that a bench that
    prints only at exit leaves a timed-out driver with nothing (BENCH_r04 =
    rc 124, parsed null)."""
    print(json.dumps(obj), flush=True)


def main():
    t_start = time.perf_counter()
    # total wall budget; workloads after the headline run only while time
    # remains (the driver's own timeout is unknown — stay well inside it)
    budget = float(os.environ.get("BENCH_TIME_BUDGET", "420"))
    left = lambda: budget - (time.perf_counter() - t_start)
    size = int(os.environ.get("BENCH_SIZE", "512"))
    # reference parity: MAXPATHLENGTH 16 (rendercore_optix7/core_settings.h:25)
    paths = int(os.environ.get("BENCH_PATHLEN", "16"))

    if os.environ.get("BENCH_SCENE") or os.environ.get("BENCH_BACKWARD"):
        # single-workload mode (tooling / ablation use)
        scene_name = os.environ.get("BENCH_SCENE", "cornell")
        backward = bool(os.environ.get("BENCH_BACKWARD"))
        n_passes = int(os.environ.get("BENCH_PASSES", "10"))
        mrays = run_workload(scene_name, backward, size, paths, n_passes,
                             grads=os.environ.get("BENCH_GRADS", "all"),
                             ray_sort=not os.environ.get("BENCH_NO_SORT"),
                             regen=bool(os.environ.get("BENCH_REGEN")))
        mode = "forward+backward" if backward else "forward"
        _emit({
            "metric": f"Mrays/s/chip {mode} ({scene_name} {size}x{size}, "
                      f"path {paths})",
            "value": round(mrays, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / BASELINE_MRAYS, 4),
        })
        return

    if os.environ.get("BENCH_QUICK"):
        v = round(run_workload("cornell", False, size, paths, 10), 3)
        _emit({
            "metric": f"Mrays/s/chip forward (cornell {size}x{size}, "
                      f"path {paths})",
            "value": v,
            "unit": "Mrays/s",
            "vs_baseline": round(v / BASELINE_MRAYS, 4),
        })
        return

    # HEADLINE FIRST (BASELINE.md metric): fwd+bwd on bathroom through the
    # regen executor with the full gradient contract — materials + vertices
    # + light radiance ("pixel grads -> vertices, materials, light
    # intensities"). Printed and flushed BEFORE anything else runs.
    extra = {}
    headline = run_workload("bathroom", True, size, paths, 2, grads="all",
                            regen=True)

    def emit_headline():
        _emit({
            "metric": f"Mrays/s/chip forward+backward (bathroom "
                      f"{size}x{size}, path {paths}, "
                      f"grads=materials+vertices+lights, regen)",
            "value": round(headline, 3),
            "unit": "Mrays/s",
            "vs_baseline": round(headline / BASELINE_MRAYS, 4),
            "extra": dict(extra),
        })

    emit_headline()

    # secondary workloads enrich "extra" while the budget lasts; each
    # re-emits the SAME headline value so EVERY printed line is a complete,
    # valid artifact whether the driver keeps the first or the last
    secondary = [
        # the committed forward configuration (regen executor)
        ("bathroom_fwd_mrays",
         lambda: run_workload("bathroom", False, size, paths, 3,
                              regen=True)),
        ("cornell_fwd_mrays",
         lambda: run_workload("cornell", False, size, paths, 10)),
        # classic fixed-spp executor (round-3 workload, kept for trend)
        ("bathroom_fwd_classic_mrays",
         lambda: run_workload("bathroom", False, size, paths, 3)),
        # materials-only backward (round-3 headline workload, for trend)
        ("bathroom_fwdbwd_materials_mrays",
         lambda: run_workload("bathroom", True, size, paths, 2,
                              grads="materials")),
    ]
    for key, fn in secondary:
        if left() < 90.0:   # do not start a workload the budget can't absorb
            break
        try:
            extra[key] = round(fn(), 3)
        except Exception as e:     # a secondary failure must not eat the line
            extra[key] = f"error: {str(e)[-120:]}"
        emit_headline()

    # the CPU-mesh scaling subprocess spends up to 20 min and its artifact
    # is already committed (BENCH_SCALING.json) — opt-in only
    if os.environ.get("BENCH_FULL"):
        scaling = _capture_scaling_artifact()
        if isinstance(scaling, dict) and "value" in scaling:
            extra["scaling_efficiency_8dev"] = scaling["value"]
            emit_headline()


def golden_main():
    """--golden: run the committed golden frame (utils/golden.py) through
    the CLUSTER KERNEL on the real chip and compare against the committed
    CPU-lockstep anchor — cross-backend parity checked on hardware once per
    round, not only in interpret mode (VERDICT r4 #6)."""
    from lighthouse2_tpu.utils import golden
    b = golden_run = golden.render_golden("cluster")
    dm = abs(float(b.mean()) - golden.ANCHOR_MEAN)
    ds_ = abs(float(b.std()) - golden.ANCHOR_STD)
    ok = bool(dm < 2e-3 and ds_ < 2e-3 and float(
        (abs(b)).max()) < 1e6)
    _emit({
        "metric": "golden bathroom cluster-kernel parity (TPU)",
        "value": round(float(b.mean()), 6),
        "unit": "mean radiance",
        "vs_baseline": 1.0 if ok else 0.0,
        "extra": {"anchor_mean": golden.ANCHOR_MEAN,
                  "anchor_std": golden.ANCHOR_STD,
                  "tpu_mean": round(float(b.mean()), 6),
                  "tpu_std": round(float(b.std()), 6),
                  "pass": ok},
    })
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    _enable_compile_cache()
    if "--golden" in sys.argv or os.environ.get("BENCH_GOLDEN"):
        golden_main()
    elif os.environ.get("BENCH_SCALING"):
        scaling_main()
    else:
        main()
