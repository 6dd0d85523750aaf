"""Fused-pass attribution by stage stubbing: monkeypatch each stage to a
trivial stand-in and measure the full-pass delta. The sum of deltas +
residual = baseline; each delta is that stage's true (fused, overlapped)
marginal cost."""
import sys
import time

sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render import wavefront as wf
from lighthouse2_tpu.scene.presets import cornell_box

import os
SIZE = int(os.environ.get("BENCH_SIZE", "512"))
PLEN = int(os.environ.get("BENCH_PATHLEN", "8"))

if os.environ.get("BENCH_SCENE") == "bathroom":
    from lighthouse2_tpu.scene.bench_scene import bathroom
    scene, cam = bathroom(SIZE, SIZE)
else:
    scene, cam = cornell_box(SIZE, SIZE)
ds = scene.sync(rebuild_bvh=True)
view = cam.get_view()
REGEN = bool(os.environ.get("BENCH_REGEN"))   # attribute the regen executor
cfg = RenderConfig(width=SIZE, height=SIZE, spp_per_pass=1,
                   max_path_length=PLEN, use_bvh=True, path_regen=REGEN)


def bench():
    jax.clear_caches()   # force re-trace so monkeypatches take effect
    state = wf.AccumState.make(cfg)
    if REGEN:
        state = wf.ensure_regen_state(view, state, cfg)
        run = wf.render_pass_regen
    else:
        run = wf.render_pass_unrolled
    st, _ = run(ds, view, state, cfg)
    jax.block_until_ready(st.accumulator)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        st, _ = run(ds, view, st, cfg)
    jax.block_until_ready(st.accumulator)
    return (time.perf_counter() - t0) / n * 1e3


base = bench()
print(f"{'baseline':34s} {base:8.2f} ms/pass")

import lighthouse2_tpu.render.wavefront as W
import lighthouse2_tpu.render.shading as SH
import lighthouse2_tpu.render.lights as L
import lighthouse2_tpu.render.bsdf_lambert as BL
import lighthouse2_tpu.bvh.traverse as TR
from lighthouse2_tpu.render.kernels import trace as TK

saved = {}


def patch(mod, name, fn):
    saved[(mod, name)] = getattr(mod, name)
    setattr(mod, name, fn)


def unpatch():
    for (mod, name), fn in saved.items():
        setattr(mod, name, fn)
    saved.clear()


def measure(tag, patches):
    for mod, name, fn in patches:
        patch(mod, name, fn)
    try:
        dt = bench()
    finally:
        unpatch()
    print(f"{tag:34s} {dt:8.2f} ms/pass   delta {base-dt:7.2f}")


# 1. occlusion stubbed (never occluded)
measure("no occlude", [
    (W, "_occluded", lambda scene, o, d, tmax, config: jnp.zeros(
        o.shape[0], bool)),
])

# 2. closest-hit trace stubbed (always hits prim 0 at t=1, zero payload)
from lighthouse2_tpu.bvh import clusters as CL


def fake_intersect(scene, o, d, config, alive=None, pay_tiles=None,
                   sort_key=None):
    n = o.shape[0]
    prim = jnp.zeros((n,), jnp.int32)
    t = jnp.ones((n,), jnp.float32)
    u = jnp.full((n,), 0.3, jnp.float32)
    v = jnp.full((n,), 0.3, jnp.float32)
    payload = jnp.zeros((CL.PAY_ROWS, n), jnp.float32)
    return t, prim, u, v, payload
measure("no trace(closest)+refine", [(W, "_intersect", fake_intersect)])

# 3. hit refinement stubbed (keep kernel t,u,v; both intersector paths)
measure("no refine_hit", [
    (W, "refine_hit", lambda o, d, prim, tri9: (
        jnp.ones(o.shape[0], jnp.float32), jnp.zeros(o.shape[0], jnp.float32),
        jnp.zeros(o.shape[0], jnp.float32), prim >= 0)),
    (W, "refine_hit_rows", lambda o, d, prim, g9: (
        jnp.ones(o.shape[0], jnp.float32), jnp.zeros(o.shape[0], jnp.float32),
        jnp.zeros(o.shape[0], jnp.float32), prim >= 0)),
])

# 3b. per-pass material-row bake stubbed (cluster path only)
measure("no bake_material_rows", [
    (TK, "bake_material_rows", lambda cbvh, mpack: jnp.zeros(
        (cbvh.pgeo.shape[0], CL.PAY_MAT_ROWS, CL.CLUSTER_LANES),
        jnp.float32)),
])


# 4. shading data stubbed (covers payload + gather paths via make_shading)
def fake_sd(scene, d, t, prim, u, v, spread, config=None, payload=None,
            consistent_normals=True):
    n = d.shape[0]
    one = jnp.ones((n,), jnp.float32)
    zero = jnp.zeros((n,), jnp.float32)
    nrm = jnp.tile(jnp.array([[0., 1., 0.]], jnp.float32), (n, 1))
    return SH.ShadingData(
        color=jnp.full((n, 3), 0.5), absorption=jnp.zeros((n, 3)),
        metallic=zero, subsurface=zero, specular=zero, roughness=one,
        spec_tint=zero, anisotropic=zero, sheen=zero, sheen_tint=zero,
        clearcoat=zero, clearcoat_gloss=zero, transmission=zero,
        eta=one, flags=jnp.zeros((n,), jnp.int32),
        n_geom=nrm, n_interp=nrm, n_shading=nrm, face_dir=one,
        emissive=zero > 1, ltri=jnp.full((n,), -1, jnp.int32), area=one,
        uv=jnp.zeros((n, 2)), lod=zero, alpha_cutout=zero > 1,
        tangent=jnp.zeros((n, 3)), bitangent=jnp.zeros((n, 3)))


measure("no get_shading_data", [
    (W, "make_shading",
     lambda scene, d, t, prim, u, v, spread, config, payload=None:
     fake_sd(scene, d, t, prim, u, v, spread)),
])

# 5. lights stubbed
def fake_rpol(lights, r0, r1, i_pos, n, **kw):
    m = i_pos.shape[0]
    return dict(point=i_pos + 1.0, color=jnp.ones((m, 3)),
                light_pdf=jnp.ones((m,)), pick_prob=jnp.ones((m,)))
measure("no light sampling", [
    (W, "random_point_on_light", fake_rpol),
    (W, "light_pick_prob", lambda lights, ltri, o, n, p, **kw: jnp.ones(
        p.shape[0], jnp.float32)),
    (W, "calculate_light_pdf", lambda d, t, area, n: jnp.ones(
        t.shape[0], jnp.float32)),
])

# 7. texture fetches stubbed (constant texel) — isolates the trilinear
# gather cost inside the shading assembly
import lighthouse2_tpu.render.textures as TX
measure("no texture fetch", [
    (TX, "fetch_trilinear", lambda tex, tid, uv, lam: jnp.ones(
        (uv.shape[0], 4), jnp.float32)),
    (SH, "fetch_trilinear", lambda tex, tid, uv, lam: jnp.ones(
        (uv.shape[0], 4), jnp.float32)) if hasattr(SH, "fetch_trilinear")
    else (TX, "fetch_bilinear", TX.fetch_bilinear),
])

# 5b. regen raygen stubbed (the regen executor regenerates dead lanes every
# bounce iteration -> 16 generate_eye_rays calls/pass vs 1 classic)
if REGEN:
    def const_gen(view_, config_, sample_base, path_idx=None,
                  sample_idx=None):
        n = config_.n_paths if path_idx is None else path_idx.shape[0]
        pidx = (jnp.arange(n, dtype=jnp.uint32) if path_idx is None
                else path_idx.astype(jnp.uint32))
        z = jnp.zeros((n,), jnp.float32)
        d = jnp.tile(jnp.array([[0., 0., 1.]], jnp.float32), (n, 1))
        return dict(path_idx=pidx, origin=d * 0.0, dir=d,
                    throughput=jnp.ones((n, 3), jnp.float32),
                    bsdf_pdf=z + 1.0, last_n=d, prev_specular=z == 0.0,
                    n_diffuse=z.astype(jnp.int32), alive=z == 0.0,
                    pixel=pidx.astype(jnp.int32) % (config_.width
                                                    * config_.height),
                    sample=jnp.zeros((n,), jnp.uint32))
    measure("no regen raygen", [(W, "generate_eye_rays", const_gen)])

# 6. bsdf stubbed
def fake_eval(sd, n, wo, wi):
    return jnp.full((n.shape[0], 3), 0.3), jnp.full((n.shape[0],), 0.3)
def fake_sample(sd, iN, N, wo, t, r3, r4):
    return dict(wi=iN, pdf=jnp.full((iN.shape[0],), 0.5),
                bsdf=jnp.full((iN.shape[0], 3), 0.3),
                specular=jnp.zeros((iN.shape[0],), bool))
measure("no bsdf", [
    (BL, "evaluate", fake_eval), (BL, "sample", fake_sample),
])
print("note: deltas overlap; residual = generate/finish/accum/control")
