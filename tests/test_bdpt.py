"""BDPT core tests (render/bdpt.py — RenderCore_OptixPrime_BDPT analog,
rendercore.cpp:507-690). Three families per the round-2 verdict:

  1. estimator consistency: BDPT converges to the same image as the PT on
     the Cornell box (wrong MIS weights bias the estimator, so this is the
     end-to-end MIS check);
  2. MIS weight algebra: for a fixed geometric path, the balance-heuristic
     weights the chain functions produce for every strategy that samples it
     must sum to 1 (tested with synthetic scalar pdfs through
     _eye_ratio_chain/_light_ratio_chain — exercises the index mapping and
     delta gating directly);
  3. variance advantage: an indirect-luminaire (uplight) scene whose lit
     ceiling patch is tiny — the eye walk rarely finds it, every light walk
     starts on it, so BDPT's error against a converged reference must be
     well below the PT's at equal budget.

These tests caught (and now guard) a real estimator bug: light-walk vertices
landing ON an emissive surface were connected as if diffuse reflectors with
albedo = radiance, overcounting by up to 3x on uplight scenes (fixed in
render/bdpt.py by gating connections on ~y_emissive).
"""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render.wavefront import (
    AccumState, render_pass_jit, finalize)
from lighthouse2_tpu.render.bdpt import (
    render_pass_bdpt_jit, _eye_ratio_chain, _light_ratio_chain)
from lighthouse2_tpu.scene.presets import cornell_box
from lighthouse2_tpu.scene.host_scene import HostScene
from lighthouse2_tpu.scene.camera import Camera


def _render(scene, cam, cfg, passes, core="pt", state=None):
    ds = scene.sync(rebuild_bvh=cfg.use_bvh)
    view = cam.get_view()
    st = AccumState.make(cfg) if state is None else state
    fn = render_pass_bdpt_jit if core == "bdpt" else render_pass_jit
    for _ in range(passes):
        st, stats = fn(ds, view, st, cfg)
    return np.asarray(finalize(st)), st, stats


# ---------------------------------------------------------------------------
# 1. estimator consistency
# ---------------------------------------------------------------------------

def test_bdpt_cornell_matches_pt():
    """BDPT and PT are unbiased estimators of the same integral: their
    converged Cornell images must agree. Any MIS weight error (double count
    or missing strategy) shifts the BDPT mean and fails this.

    Path-space matching: PT at max_path_length L integrates paths of up to
    L+2 vertices while BDPT's 5+5 side caps give up to 11 — so the walls are
    dimmed to albedo 0.35, making the >10-vertex tail ~0.35^8 ≈ 2e-4 of the
    signal, far below the tolerance."""
    scene, cam = cornell_box(16, 16)
    for i, m in enumerate(scene.materials):
        if max(m.color) <= 1.0:        # dim the non-emissive materials
            scene.materials[i] = m.replace(
                color=tuple(0.48 * c for c in m.color))
    # clamp OFF: the firefly clamp is a deliberate bias and the two
    # estimators clamp differently (PT loses ~35% of this scene's energy to
    # it; BDPT's per-strategy contributions — especially the r5 t=1 splats
    # — stay below the clamp). Estimator consistency must be compared on
    # the unbiased estimators (measured: ratio 0.995 unclamped vs 1.50
    # clamped, round-5 notes).
    cfg = RenderConfig(width=16, height=16, spp_per_pass=8,
                       max_path_length=8, use_bvh=False,
                       clamp_fireflies=False)
    img_pt, _, _ = _render(scene, cam, cfg, passes=24, core="pt")
    img_bd, _, _ = _render(scene, cam, cfg, passes=24, core="bdpt")
    img_pt = img_pt.reshape(16, 16, 3)
    img_bd = img_bd.reshape(16, 16, 3)
    assert np.isfinite(img_bd).all()
    # means agree tightly, per-pixel agrees to MC noise
    assert abs(img_bd.mean() - img_pt.mean()) / img_pt.mean() < 0.04
    err = np.abs(img_bd - img_pt).mean() / (img_pt.mean() + 1e-9)
    assert err < 0.25, f"mean |BDPT-PT| {err:.3f} of mean brightness"


def test_bdpt_stats_and_depth():
    """Sanity of the CoreStats analog + the .w primary-depth channel."""
    scene, cam = cornell_box(8, 8)
    cfg = RenderConfig(width=8, height=8, spp_per_pass=2,
                       max_path_length=4, use_bvh=False)
    _, st, stats = _render(scene, cam, cfg, passes=1, core="bdpt")
    assert int(stats["total_extension"]) > 0
    assert int(stats["total_shadow"]) > 0
    assert int(st.sample_count) == 2
    depth = np.asarray(st.accumulator[:, 3])
    assert (depth > 0).all()           # every pixel saw a primary segment


# ---------------------------------------------------------------------------
# 2. MIS weight algebra (balance heuristic sums to 1 over the family)
# ---------------------------------------------------------------------------

def _vert(pdf_fwd, pdf_rev_prev=0.0, delta=False, n=1):
    z = jnp.zeros((n,))
    return dict(pdf_fwd=z + pdf_fwd, pdf_rev_prev=z + pdf_rev_prev,
                delta=jnp.zeros((n,), bool) | delta)


def test_mis_weights_sum_to_one_t3():
    """Fixed geometric path camera->z1->light (3 vertices). THREE strategies
    sample it now that light tracing exists (VERDICT r4 #8): A=(0,3)
    implicit hit, B=(1,2) light-sample connection, C=(2,1) light tracing to
    the lens. Balance weights from the chain code must sum to 1."""
    p_c = 0.60     # camera->z1 area pdf (the eye walk records it for t=1)
    p_z2 = 0.37    # area pdf of the light vertex under the eye walk (BSDF)
    q_y0 = 1.84    # area pdf of the light vertex under light sampling
    q_y1 = 0.90    # area pdf of z1 under the light walk (emission dir)
    nd = jnp.zeros((1,), bool)

    # A: eye [z1, z2]; junction rev pdfs: z2 <- q_y0, z1 <- q_y1
    everts = [_vert(p_c), _vert(p_z2)]
    w_a = 1.0 / (1.0 + _eye_ratio_chain(
        everts, 1, jnp.asarray([q_y0]), jnp.asarray([q_y1]), 5, 0))

    # B: eye [z1]; light [y0]. Junction z1<->y0: rev of z1 is q_y1,
    # rev of y0 is p_z2
    se = _eye_ratio_chain([_vert(p_c)], 0, jnp.asarray([q_y1]),
                          jnp.zeros((1,)), 5, 1)
    y0 = dict(pdf_fwd=jnp.asarray([q_y0]), pdf_rev_prev=jnp.zeros((1,)),
              delta=nd)
    sl = _light_ratio_chain([y0], 1, jnp.asarray([p_z2]), jnp.zeros((1,)),
                            t=2, max_eye=5, delta_light=nd)
    w_b = 1.0 / (1.0 + se + sl)

    # C: light [y0, y1(=z1)] to the lens: rev of y1 is the camera pdf p_c,
    # rev of y0 (given camera-incoming at y1) is p_z2
    y1 = dict(pdf_fwd=jnp.asarray([q_y1]), pdf_rev_prev=jnp.zeros((1,)),
              delta=nd)
    sl = _light_ratio_chain([y0, y1], 2, jnp.asarray([p_c]),
                            jnp.asarray([p_z2]), t=1, max_eye=5,
                            delta_light=nd)
    w_c = 1.0 / (1.0 + sl)

    np.testing.assert_allclose(np.asarray(w_a + w_b + w_c), 1.0, rtol=1e-6)
    # closed-form balance check: w_i = p_i / sum(p)
    p_a, p_b, p_cs = p_c * p_z2, p_c * q_y0, q_y0 * q_y1
    np.testing.assert_allclose(np.asarray(w_a),
                               p_a / (p_a + p_b + p_cs), rtol=1e-6)


def test_mis_weights_sum_to_one_t4():
    """4-vertex diffuse path camera->z1->z2->light; strategies (0,4), (1,3),
    (2,2) and the light-tracing (3,1). The four balance weights must sum to
    1 — exercises the k>=2 chain indexing on both sides incl. the lens
    terms."""
    p_c, p_z2, p_z3 = 0.60, 0.9, 0.21   # eye-walk area pdfs of z1, z2, z3
    q_y0, q_y1, q_y2 = 1.3, 0.47, 0.8   # light-walk pdfs of z3, z2, z1
    nd = jnp.zeros((1,), bool)

    # (0,4): eye [z1,z2,z3]; rev_top=q_y0, rev_top1=q_y1; the k=3 (lens)
    # term reads z1's light-walk rev pdf q_y2 from z2.pdf_rev_prev
    ev = [_vert(p_c, 0.0), _vert(p_z2, q_y2), _vert(p_z3, 0.0)]
    w_a = 1.0 / (1.0 + _eye_ratio_chain(
        ev, 2, jnp.asarray([q_y0]), jnp.asarray([q_y1]), 5, 0))

    # (1,3): eye [z1,z2]; light [y0]. Junction z2<->y0.
    se = _eye_ratio_chain(ev[:2], 1, jnp.asarray([q_y1]),
                          jnp.asarray([q_y2]), 5, 1)
    y0 = dict(pdf_fwd=jnp.asarray([q_y0]), pdf_rev_prev=jnp.zeros((1,)),
              delta=nd)
    sl = _light_ratio_chain([y0], 1, jnp.asarray([p_z3]), jnp.zeros((1,)),
                            t=3, max_eye=5, delta_light=nd)
    w_b = 1.0 / (1.0 + se + sl)

    # (2,2): eye [z1]; light [y0,y1]. Junction z1<->y1.
    se = _eye_ratio_chain(ev[:1], 0, jnp.asarray([q_y2]), jnp.zeros((1,)),
                          5, 2)
    y1 = dict(pdf_fwd=jnp.asarray([q_y1]), pdf_rev_prev=jnp.zeros((1,)),
              delta=nd)
    sl = _light_ratio_chain([y0, y1], 2, jnp.asarray([p_z2]),
                            jnp.asarray([p_z3]), t=2, max_eye=5,
                            delta_light=nd)
    w_c = 1.0 / (1.0 + se + sl)

    # (3,1): light [y0,y1,y2(=z1)] to the lens; rev of y2 is p_c; the k=3
    # term reads y0's eye rev pdf p_z3 from y1.pdf_rev_prev
    y1d = dict(y1, pdf_rev_prev=jnp.asarray([p_z3]))
    y2 = dict(pdf_fwd=jnp.asarray([q_y2]), pdf_rev_prev=jnp.zeros((1,)),
              delta=nd)
    sl = _light_ratio_chain([y0, y1d, y2], 3, jnp.asarray([p_c]),
                            jnp.asarray([p_z2]), t=1, max_eye=5,
                            delta_light=nd)
    w_d = 1.0 / (1.0 + sl)

    np.testing.assert_allclose(np.asarray(w_a + w_b + w_c + w_d), 1.0,
                               rtol=1e-6)
    p_a = p_c * p_z2 * p_z3
    p_bb = p_c * p_z2 * q_y0
    p_cc = p_c * q_y0 * q_y1
    p_dd = q_y0 * q_y1 * q_y2
    np.testing.assert_allclose(np.asarray(w_a),
                               p_a / (p_a + p_bb + p_cc + p_dd), rtol=1e-6)


def test_mis_delta_vertex_gates_strategy():
    """A delta (specular) junction vertex cannot be a connection endpoint:
    the (1, t) alternative through it is gated out — but the light-tracing
    family (2,1), which samples z1 from the LIGHT side and connects z1 to
    the lens, survives (z1 is diffuse)."""
    p_c, q_y0, q_y1 = 0.5, 2.0, 1.0
    ev = [_vert(p_c), _vert(0.5, delta=True)]   # z2 specular
    s = _eye_ratio_chain(ev, 1, jnp.asarray([q_y0]), jnp.asarray([q_y1]),
                         5, 0)
    # k=1 (strategy (1,2)) converts delta z2 -> gated; k=2 (strategy (2,1))
    # converts z1 too and survives with ratio (q_y0*q_y1)/(0.5*p_c)
    np.testing.assert_allclose(np.asarray(s),
                               q_y0 * q_y1 / (0.5 * p_c), rtol=1e-6)
    # with max_light=1 the light side cannot hold 2 vertices: fully gated
    s1 = _eye_ratio_chain(ev, 1, jnp.asarray([q_y0]), jnp.asarray([q_y1]),
                          1, 0)
    np.testing.assert_allclose(np.asarray(s1), 0.0)


# ---------------------------------------------------------------------------
# 3. variance advantage on a hard-to-reach light
# ---------------------------------------------------------------------------

def _uplight_scene():
    """Indirect luminaire: a small bright quad just under the ceiling,
    emitting UP. NEE from the room always sees the light's back face
    (rejected), so the PT only finds energy when a diffuse bounce happens to
    land on the small lit ceiling patch. Every BDPT light subpath STARTS by
    hitting that patch, and strategy (2,t) connections carry it to every eye
    vertex — the textbook BDPT variance win that survives without t=1."""
    s = HostScene()
    white = s.add_material(name="white", color=(0.7, 0.7, 0.7))
    lightm = s.add_material(name="light", color=(400.0, 400.0, 400.0))
    # floor, ceiling, back wall
    s.add_instance(s.add_quad((0, 1, 0), (0, 0, 0), 4, 4, white))
    s.add_instance(s.add_quad((0, -1, 0), (0, 2.0, 0), 4, 4, white))
    s.add_instance(s.add_quad((0, 0, 1), (0, 1.0, -2.0), 4, 2.2, white))
    # small uplight just below the ceiling: the lit ceiling patch is tiny
    # and ultra-bright, so the eye walk rarely finds it
    s.add_instance(s.add_quad((0, 1, 0), (0, 1.92, 0), 0.15, 0.15, lightm))
    cam = Camera(pixel_count=(12, 12), fov=45)
    cam.look_at((0.0, 1.0, 3.0), (0.0, 0.8, 0.0))
    return s, cam


def test_bdpt_beats_pt_on_occluded_light():
    """Run K independent equal-budget estimates of the uplight image with
    each core and compare their error against a converged reference: the
    BDPT estimates must be closer (the reference's whole reason for
    shipping a BDPT core). PT misses most of the energy at this budget
    because the eye walk must land on the tiny lit ceiling patch."""
    scene, cam = _uplight_scene()
    # clamping ON for both cores — the reference's production setting
    # (CLAMPFIREFLIES); it tames the near-singular connection G spikes the
    # same way it tames PT fireflies, so the comparison stays fair
    cfg = RenderConfig(width=12, height=12, spp_per_pass=16,
                       max_path_length=4, use_bvh=False,
                       clamp_fireflies=True, russian_roulette=False)
    ds = scene.sync(rebuild_bvh=False)
    view = cam.get_view()

    def runs(core, k=8):
        means = []
        for i in range(k):
            st = AccumState.make(cfg)
            # independent estimates: offset the sampling schedule per run
            st = st.replace(sample_count=jnp.int32(257 * i),
                            cam_seed=jnp.uint32(0x12345678 + 977 * i))
            fn = render_pass_bdpt_jit if core == "bdpt" else render_pass_jit
            st2, _ = fn(ds, view, st, cfg)
            img = np.asarray(st2.accumulator[:, :3]) / cfg.spp_per_pass
            means.append(img.mean())
        return np.array(means)

    # converged reference (BDPT converges orders faster here; estimator
    # agreement with PT is covered by test_bdpt_cornell_matches_pt)
    st = AccumState.make(cfg)
    for _ in range(40):
        st, _ = render_pass_bdpt_jit(ds, view, st, cfg)
    ref = np.asarray(st.accumulator[:, :3]).mean() / float(st.sample_count)

    pt = runs("pt")
    bd = runs("bdpt")
    assert bd.mean() > 0
    err_pt = np.abs(pt - ref).mean()
    err_bd = np.abs(bd - ref).mean()
    assert err_bd < 0.7 * err_pt, (
        f"BDPT err {err_bd:.4g} !< 0.7*PT err {err_pt:.4g} "
        f"(ref {ref:.4g}, means {bd.mean():.4g} vs {pt.mean():.4g})")
