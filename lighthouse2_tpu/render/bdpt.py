"""Bidirectional path tracer — RenderCore_OptixPrime_BDPT, TPU-native.

Reference: lib/RenderCore_OptixPrime_BDPT — `BiPathState` keeps 19 float4 of
eye+light vertex state per path (core_settings.h:105-128) and drives stage
kernels constructionLightPos / constructionEyePos / extendEyePath /
extendLightPath / connectionPath / finalizeContribution through an
OptiX-Prime query loop (rendercore.cpp:56-90, 507-690), with MAXPATHLENGTH 5
on each side (core_settings.h:45-47).

TPU redesign: instead of one evolving state machine per CUDA thread, both
subpaths are materialized as STATIC lists of vertex SoA batches ([N] lanes
per vertex, S<=5 vertices per side — everything static-shaped, one jit for
the whole frame):

  1. light walk:  y0 ~ Sample_Le (lights.sample_emission) then S_l-1 BSDF
     extensions; eye walk: z1.. from generate_eye_rays then BSDF extensions.
     Each walk is a Python loop over static depth; each step is one batched
     BVH trace over all N lanes.
  2. every (s>=1, t>=2) strategy is one dense [N] connection batch: evaluate
     both junction BSDFs, geometry term, one batched visibility trace.
  3. s=0 strategies (implicit light hits) accumulate during the eye walk.

  4. t=1 strategies (r5): every light vertex y_{s-1} additionally connects
     to ONE sampled lens point and SPLATS into the pixel its projection
     through the lens lands in (light tracing; the reference's
     camera-connection machinery, core_settings.h:105-128 imagePlane /
     camera pdfs). The camera importance/pdf uses the FILM measure
     p_omega = f_ax^2/(A_film cos^3) (PBRT PerspectiveCamera::We
     convention) in both the splat weight and every MIS chain, so all
     strategies share one path measure; with wh*spp light paths per pass
     and finalize's /spp the splats land unscaled.

MIS: balance heuristic over the strategies this core actually samples.
Veach's pdf-ratio recurrence (the reference's d-quantities) runs as a static
loop over stored per-vertex forward/reverse area pdfs — delta vertices are
remapped to 1 and their flanking strategies gated out, exactly the classic
formulation. DELIBERATE SCOPE (documented deviations from the reference):

  - light subpaths start from area + point lights (the reference's BDPT
    likewise drives light paths from the tri-light tables); spot/dir
    lights contribute through the eye-walk strategies.
  - sky contributes via s=0 misses only (weight 1 — no other strategy
    samples the skydome).
  - t=1 ignores barrel distortion, and delta-POSITION lights are not
    splatted directly (cameras do not image delta lights; no other
    strategy samples that 2-vertex class, so no MIS interaction exists).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# debug: scale the t=1 (light tracing) splats; 0 disables the family while
# keeping its MIS presence — used to bisect estimator-consistency failures
_T1_SCALE = float(os.environ.get("BDPT_T1_SCALE", "1.0"))
# debug: drop the t=1 family from the MIS chains too (the pre-r5 estimator)
_T1_CHAINS = not os.environ.get("BDPT_NO_T1_CHAINS")

from lighthouse2_tpu.core import rng as rng_mod
from lighthouse2_tpu.core.geometry import dot, normalize, safe_origin
from lighthouse2_tpu.core.types import RenderConfig, ViewPyramid
from lighthouse2_tpu.render import bsdf_lambert
from lighthouse2_tpu.render.lights import sample_emission, emission_pick_prob
from lighthouse2_tpu.render.shading import get_shading_data
from lighthouse2_tpu.render.sky import sample_skydome
from lighthouse2_tpu.render.wavefront import (
    AccumState, generate_eye_rays, _intersect, _occluded, _clamp_intensity,
    _fixnan, untile_image,
)

# per-side depth cap (RenderCore_OptixPrime_BDPT/core_settings.h:45-47)
LIGHT_DEPTH = 5
EYE_DEPTH = 5


def _remap0(x):
    """Veach remap: 0 pdf (delta / unset) contributes a neutral ratio."""
    return jnp.where(x != 0.0, x, 1.0)


def _f_pdf(bsdf_mod, config, sd, wo, wi):
    """Junction BSDF evaluate: (f [N,3], solid-angle pdf [N]).

    For the lambert module the diffuse lobe is picked with prob `roughness`
    (lambert.h:72-125 picks mirror with 1-roughness without folding it into
    the returned pdf); scaling BOTH f and pdf by roughness makes the
    connection strategies consistent with the sampled-walk marginals — the
    same compensation the PT applies via BSDF_HAS_PURE_SPECULARS."""
    f, pdf = bsdf_mod.evaluate(sd, sd.n_shading, wo, wi)
    if config.bsdf == "lambert":
        f = f * sd.roughness[:, None]
        pdf = pdf * sd.roughness
    return f, pdf


def _to_area(pdf_sa, cos_at_target, dist2):
    """Solid-angle pdf at the sampling vertex -> area pdf at the target."""
    return pdf_sa * jnp.abs(cos_at_target) / jnp.maximum(dist2, 1e-12)


def _walk(scene, config: RenderConfig, bsdf_mod, o, d, beta, pdf_fwd1_sa,
          seed, depth, cos_from_prev=None, pay_tiles=None):
    """Shared BSDF random walk (extendEyePath / extendLightPath analog).

    o/d: first segment ray; beta [N,3]: throughput arriving at vertex 1
    (all pdf divisions applied); pdf_fwd1_sa: solid-angle pdf of d at the
    origin (None -> pdf_fwd of vertex 1 stays unset/remapped — the eye side
    never needs it because t'=1 strategies are not sampled).

    Returns (vertices, misses): `vertices[i]` is a dict of [N] arrays for
    vertex i+1 of the walk — pos, sd, d_in, dist_in, beta, pdf_fwd (area),
    valid, delta; vertices[i]["pdf_rev_prev"] is the walk-reverse area pdf
    of vertex i (computed at vertex i+1). `misses[i]` = (mask, beta) of
    lanes that escaped on segment i (for the eye side's sky accumulation).
    """
    n = d.shape[0]
    alive = jnp.ones((n,), bool) if beta.ndim else None
    alive = jnp.isfinite(beta[:, 0])          # all-true, shard-safe
    verts = []
    misses = []
    for i in range(depth):
        t, prim, u, v, payload = _intersect(scene, o, d, config, alive,
                                            pay_tiles=pay_tiles)
        hit = alive & (prim >= 0)
        misses.append((alive & (prim < 0), beta, d))
        t = jnp.where(hit, t, 1.0)
        from lighthouse2_tpu.render.wavefront import make_shading
        sd = make_shading(scene, d, t, prim, u, v, jnp.float32(0.0), config,
                          payload=payload)
        pos = o + t[:, None] * d
        dist2 = jnp.maximum(t * t, 1e-12)
        cos_here = jnp.abs(dot(d, sd.n_shading))
        if i == 0:
            pdf_fwd = (jnp.zeros((n,)) if pdf_fwd1_sa is None
                       else _to_area(pdf_fwd1_sa, cos_here, dist2))
        else:
            pdf_fwd = _to_area(pdf_fwd_sa_next, cos_here, dist2)
        vert = dict(pos=pos, sd=sd, d_in=d, dist_in2=dist2,
                    beta=beta, pdf_fwd=pdf_fwd, valid=hit,
                    delta=bsdf_mod.is_specular_material(sd),
                    emissive=hit & sd.emissive,
                    pdf_rev_prev=jnp.zeros((n,)))

        # sample the continuation (also yields the reverse pdf of vertex i-1)
        seed, r3 = rng_mod.random_float(seed)
        seed, r4 = rng_mod.random_float(seed)
        smp = bsdf_mod.sample(sd, sd.n_shading, sd.n_geom, -d, t, r3, r4)
        f_s, pdf_s = smp["bsdf"], smp["pdf"]
        if config.bsdf == "lambert":
            # consistent marginal pdf for the diffuse lobe (see _f_pdf);
            # the beta ratio f/pdf is unchanged so only MIS sees the scale
            pdf_marg = jnp.where(smp["specular"], 0.0, pdf_s * sd.roughness)
        else:
            pdf_marg = jnp.where(smp["specular"], 0.0, pdf_s)
        ok = hit & ~sd.emissive & (smp["pdf"] > 1e-6) & jnp.isfinite(smp["pdf"])
        cos_out = jnp.abs(dot(smp["wi"], sd.n_shading))
        new_beta = jnp.where(
            ok[:, None],
            beta * smp["bsdf"] * (cos_out / jnp.maximum(smp["pdf"], 1e-12))[:, None],
            0.0)
        new_beta = _fixnan(new_beta)

        # reverse pdf of the PREVIOUS vertex: resample -d_in at this vertex
        # with the new outgoing direction as wo, converted to area at prev
        _, pdf_rev_sa = _f_pdf(bsdf_mod, config, sd, smp["wi"], -d)
        if i > 0:
            cos_prev = jnp.abs(dot(d, _prev_ns))
        elif cos_from_prev is not None:
            cos_prev = cos_from_prev          # light origin normal
        else:
            cos_prev = jnp.ones((n,))         # eye origin (never used)
        vert["pdf_rev_prev"] = _to_area(jnp.where(ok, pdf_rev_sa, 0.0),
                                        cos_prev, dist2)
        verts.append(vert)

        o = safe_origin(pos, smp["wi"], sd.n_geom * sd.face_dir[:, None],
                        jnp.float32(config.geometry_epsilon))
        d = jnp.where(ok[:, None], smp["wi"], d)
        beta = new_beta
        alive = ok
        pdf_fwd_sa_next = pdf_marg
        _prev_ns = sd.n_shading
    return verts, misses


def _eye_ratio_chain(everts, j, pdf_rev_top, pdf_rev_top1, max_light, s_base):
    """Eye-side MIS sum for a junction at eye vertex everts[j] (= z_{t-1},
    t=j+2). Alternative strategies move k=1.. eye vertices to the light
    side: term k <-> strategy (s_base+k, t-k), included for t-k>=2 while
    s_base+k <= max_light, plus the k=j+1 term <-> the LIGHT-TRACING
    strategy (s_base+t-1, 1) — every surface vertex light-sampled, the
    path ending on the lens (its camera vertex is shared by all
    strategies, so its pdf cancels; z_1's own pdf_fwd is the camera-side
    area pdf the eye walk now records). pdf_rev_top/top1 are the
    junction-updated reverse area pdfs of z_{t-1} / z_{t-2}."""
    t = j + 2
    sum_ri = jnp.zeros_like(everts[j]["pdf_fwd"])
    ri = 1.0
    for k in range(1, j + 2):              # k=j+1 <-> t'=1 (light tracing)
        # everts[m] == z_{m+1}; step k converts z_{t-k} == everts[j+1-k]
        zi = everts[j + 1 - k]
        if k == 1:
            rev = pdf_rev_top
        elif k == 2:
            rev = pdf_rev_top1
        else:
            # walk-stored: rev pdf of z_{t-k} was computed at z_{t-k+1}
            rev = everts[j + 2 - k]["pdf_rev_prev"]
        ri = ri * _remap0(rev) / _remap0(zi["pdf_fwd"])
        if s_base + k > max_light:
            continue
        if t - k >= 2:
            znew = everts[j - k]           # z_{t-k-1}, new eye endpoint
            gate = ~zi["delta"] & ~znew["delta"]
            sum_ri = sum_ri + jnp.where(gate, ri, 0.0)
        elif _T1_CHAINS:                   # t-k == 1: lens endpoint
            gate = ~zi["delta"]
            sum_ri = sum_ri + jnp.where(gate, ri, 0.0)
    return sum_ri


def _light_ratio_chain(lverts, s, pdf_rev_top, pdf_rev_top1, t, max_eye,
                       delta_light):
    """Light-side MIS sum for a junction at light vertex lverts[s-1]
    (= y_{s-1}). Term k <-> strategy (s-k, t+k), included iff t+k-1 <=
    max_eye (eye walk can store that many surface vertices)."""
    sum_ri = jnp.zeros_like(lverts[0]["pdf_fwd"])
    ri = 1.0
    for k in range(1, s + 1):
        yi = lverts[s - k]                 # y_{s-k} being converted
        if k == 1:
            rev = pdf_rev_top
        elif k == 2:
            rev = pdf_rev_top1
        else:
            rev = lverts[s - k + 1]["pdf_rev_prev"]
        ri = ri * _remap0(rev) / _remap0(yi["pdf_fwd"])
        if t + k - 1 <= max_eye:
            if s - k >= 1:
                ynew = lverts[s - k - 1]
                gate = ~yi["delta"] & ~ynew["delta"]
            else:                          # strategy (0, t+s): pure PT hit
                gate = ~yi["delta"] & ~delta_light
            sum_ri = sum_ri + jnp.where(gate, ri, 0.0)
    return sum_ri


def trace_paths_bdpt(scene, view: ViewPyramid, config: RenderConfig,
                     sample_base, cam_seed):
    """One full BDPT wavefront: returns (acc_delta [W*H,4], cam_seed', stats)."""
    bsdf_mod = bsdf_lambert
    if config.bsdf == "disney":
        from lighthouse2_tpu.render import bsdf_disney as bsdf_mod  # noqa
    geo_eps = jnp.float32(config.geometry_epsilon)
    n = config.n_paths
    s_l = min(LIGHT_DEPTH, config.max_path_length)
    s_e = min(EYE_DEPTH, config.max_path_length)

    # ---- eye subpath --------------------------------------------------------
    from lighthouse2_tpu.render.wavefront import prepare_cluster_pay
    pay_tiles = prepare_cluster_pay(scene, config)
    paths = generate_eye_rays(view, config, sample_base)
    eseed = rng_mod.raygen_seed(paths["path_idx"] ^ jnp.uint32(0x9E3779B9),
                                jnp.asarray(sample_base, jnp.uint32))
    # camera measurement geometry (ViewPyramid.imagePlane analog,
    # camera.cpp:111-115): the FILM-measure importance/pdf p_omega =
    # f_ax^2 / (A_film cos^3 theta) (the plane spanned by p1/p2/p3 at axial
    # distance f_ax; PBRT PerspectiveCamera::We convention). Using the full
    # film area in BOTH z_1's forward pdf and the t=1 splat weight puts
    # every strategy's pdf in one common measure, so the balance-heuristic
    # ratios stay consistent while the splat bookkeeping (wh*spp light
    # paths per pass, finalize divides by spp) lands each pixel's t=1
    # component unscaled. Barrel distortion is ignored for t=1 (documented
    # deviation).
    right = view.p2 - view.p1
    up = view.p3 - view.p1
    plane_n = normalize(jnp.cross(right, up)[None])[0]
    view_dir = (view.p1 + 0.5 * right + 0.5 * up) - view.pos
    plane_n = plane_n * jnp.sign(dot(view_dir[None], plane_n[None])[0])
    a_film = jnp.linalg.norm(jnp.cross(right, up))
    f_ax = dot(view.p1[None] - paths["origin"],
               jnp.broadcast_to(plane_n, paths["origin"].shape))
    cos_eye = jnp.maximum(dot(paths["dir"], jnp.broadcast_to(
        plane_n, paths["dir"].shape)), 1e-6)
    p_omega_eye = (f_ax * f_ax) / (a_film * cos_eye ** 3)
    everts, emisses = _walk(scene, config, bsdf_mod, paths["origin"],
                            paths["dir"], paths["throughput"], p_omega_eye,
                            eseed, s_e, pay_tiles=pay_tiles)

    # ---- light subpath ------------------------------------------------------
    lseed = rng_mod.raygen_seed(paths["path_idx"] ^ jnp.uint32(0x85EBCA6B),
                                jnp.asarray(sample_base, jnp.uint32))
    lseed, r0 = rng_mod.random_float(lseed)
    lseed, r1 = rng_mod.random_float(lseed)
    lseed, r2 = rng_mod.random_float(lseed)
    lseed, r3 = rng_mod.random_float(lseed)
    le = sample_emission(scene.lights, r0, r1, r2, r3)
    any_light = (scene.lights.n_tri + scene.lights.n_point) > 0
    y0_beta = jnp.where(
        any_light,
        le["radiance"] / jnp.maximum(le["pdf_pos"], 1e-12)[:, None], 0.0)
    y0 = dict(pos=le["origin"], ns=le["normal"], beta=y0_beta,
              pdf_fwd=le["pdf_pos"], delta=jnp.zeros((n,), bool),
              delta_pos=le["delta_pos"], ltri=le["ltri"],
              valid=jnp.broadcast_to(any_light, (n,)))
    # beta arriving at y1 = Le * cos0 / (pdf_pos * pdf_dir)  (delta lights:
    # cos0 := 1 — uniform-sphere emission carries no cosine)
    cos0 = jnp.where(le["delta_pos"], 1.0,
                     jnp.abs(dot(le["dir"], le["normal"])))
    y1_beta = y0_beta * (cos0 / jnp.maximum(le["pdf_dir"], 1e-12))[:, None]
    l_origin = jnp.where(le["delta_pos"][:, None], le["origin"],
                         le["origin"] + geo_eps * le["normal"])
    lverts, _ = _walk(scene, config, bsdf_mod, l_origin, le["dir"],
                      jnp.where(y0["valid"][:, None], y1_beta, 0.0),
                      le["pdf_dir"], lseed, s_l - 1, cos_from_prev=cos0,
                      pay_tiles=pay_tiles)

    acc = jnp.zeros((n, 4), jnp.float32)
    n_conn_rays = jnp.int32(0)
    n_ext_rays = jnp.int32(n * (s_e + max(s_l - 1, 0)))

    def clamp(c):
        c = _fixnan(c)
        return _clamp_intensity(c, config.clamp_value) \
            if config.clamp_fireflies else c

    # ---- s=0: sky on miss + implicit emissive hits --------------------------
    for m, (miss, beta_m, d_m) in enumerate(emisses):
        sky_c = beta_m * sample_skydome(scene.sky, d_m)
        acc = acc.at[:, :3].add(jnp.where(miss[:, None], clamp(sky_c), 0.0))
    for j, z in enumerate(everts):
        t_strat = j + 2
        lit = z["emissive"] & (dot(z["d_in"], z["sd"].n_geom) < 0)
        contrib = z["beta"] * z["sd"].color
        # MIS vs strategies (k, t-k): junction rev pdfs from Sample_Le pdfs
        pick = emission_pick_prob(scene.lights, z["sd"].ltri)
        rev_top = pick / jnp.maximum(z["sd"].area, 1e-12)
        cos_l = jnp.abs(dot(z["d_in"], z["sd"].n_shading))
        pdf_dir_sa = cos_l * (1.0 / jnp.pi)
        if j >= 1:
            zp = everts[j - 1]
            rev_top1 = _to_area(pdf_dir_sa,
                                jnp.abs(dot(z["d_in"], zp["sd"].n_shading)),
                                z["dist_in2"])
        else:
            rev_top1 = jnp.zeros((n,))
        sum_ri = _eye_ratio_chain(everts, j, rev_top, rev_top1,
                                  max_light=s_l, s_base=0)
        w = 1.0 / (1.0 + sum_ri)
        acc = acc.at[:, :3].add(
            jnp.where(lit[:, None], clamp(contrib * w[:, None]), 0.0))

    # primary depth into .w (parity with the PT accumulator contract)
    if everts:
        acc = acc.at[:, 3].add(jnp.where(everts[0]["valid"],
                                         jnp.sqrt(everts[0]["dist_in2"]),
                                         10000.0))

    # ---- connections (s>=1, t>=2) -------------------------------------------
    for s in range(1, s_l + 1):
        yv = y0 if s == 1 else lverts[s - 2]
        for j in range(len(everts)):
            z = everts[j]
            t_strat = j + 2
            zsd = z["sd"]
            conn = z["pos"]  # placeholder for readability
            w_vec = yv["pos"] - z["pos"]
            dist2 = jnp.maximum(dot(w_vec, w_vec), 1e-12)
            dist = jnp.sqrt(dist2)
            dir_zy = w_vec / dist[:, None]

            # junction cosines (signed gates against outward normals)
            z_out_n = zsd.n_geom * zsd.face_dir[:, None]
            cos_z_g = dot(dir_zy, z_out_n)
            cos_z = jnp.abs(dot(dir_zy, zsd.n_shading))
            if s == 1:
                cos_y_g = jnp.where(yv["delta_pos"], 1.0,
                                    dot(-dir_zy, yv["ns"]))
                cos_y = jnp.abs(cos_y_g)
                f_y = jnp.ones((n, 3))
                pdf_y_toward_z_sa = jnp.where(
                    yv["delta_pos"], 1.0 / (4.0 * jnp.pi),
                    jnp.abs(cos_y_g) * (1.0 / jnp.pi))
                y_valid = yv["valid"]
                y_delta = yv["delta"]
                y_beta = yv["beta"]
            else:
                ysd = yv["sd"]
                y_out_n = ysd.n_geom * ysd.face_dir[:, None]
                cos_y_g = dot(-dir_zy, y_out_n)
                cos_y = jnp.abs(dot(dir_zy, ysd.n_shading))
                f_y, _ = _f_pdf(bsdf_mod, config, ysd, -yv["d_in"], -dir_zy)
                pdf_y_toward_z_sa = _f_pdf(bsdf_mod, config, ysd,
                                           -yv["d_in"], -dir_zy)[1]
                # a light-walk vertex ON an emissive surface is a path
                # terminal, not a reflector: connecting through it would
                # treat radiance as albedo (its classes are exactly the
                # (s-1, t) strategies' implicit endpoints — double count)
                y_valid = yv["valid"] & ~yv["emissive"]
                y_delta = yv["delta"]
                y_beta = yv["beta"]

            f_z, pdf_z_toward_y_sa = _f_pdf(bsdf_mod, config, zsd,
                                            -z["d_in"], dir_zy)
            ok = (z["valid"] & ~z["emissive"] & y_valid & ~z["delta"]
                  & ~y_delta & (cos_z_g > 0) & (cos_y_g > 0))

            g_term = cos_z * cos_y / dist2
            contrib = z["beta"] * f_z * g_term[:, None] * f_y * y_beta

            # visibility
            sh_o = safe_origin(z["pos"], dir_zy, z_out_n, geo_eps)
            sh_tmax = jnp.where(ok, dist - 2.0 * geo_eps, 0.0)
            occ = _occluded(scene, sh_o, dir_zy, sh_tmax, config)
            ok = ok & ~occ
            n_conn_rays = n_conn_rays + jnp.sum(ok.astype(jnp.int32))

            # ---- MIS ----
            rev_z_top = _to_area(pdf_y_toward_z_sa, cos_z, dist2)
            if j >= 1:
                zp = everts[j - 1]
                _, pdf_z_back_sa = _f_pdf(bsdf_mod, config, zsd, dir_zy,
                                          -z["d_in"])
                rev_z_top1 = _to_area(
                    pdf_z_back_sa, jnp.abs(dot(z["d_in"], zp["sd"].n_shading)),
                    z["dist_in2"])
            else:
                rev_z_top1 = jnp.zeros((n,))
            sum_eye = _eye_ratio_chain(everts, j, rev_z_top, rev_z_top1,
                                       max_light=s_l, s_base=s)

            rev_y_top = _to_area(pdf_z_toward_y_sa, cos_y, dist2)
            if s == 1:
                rev_y_top1 = jnp.zeros((n,))
                lchain = [y0]
            else:
                _, pdf_y_back_sa = _f_pdf(bsdf_mod, config, yv["sd"],
                                          -dir_zy, -yv["d_in"])
                prev_ns = (y0["ns"] if s == 2
                           else lverts[s - 3]["sd"].n_shading)
                rev_y_top1 = _to_area(pdf_y_back_sa,
                                      jnp.abs(dot(yv["d_in"], prev_ns)),
                                      yv["dist_in2"])
                lchain = [y0] + lverts[:s - 1]
            sum_light = _light_ratio_chain(lchain, s, rev_y_top, rev_y_top1,
                                           t_strat, max_eye=s_e,
                                           delta_light=y0["delta_pos"])
            w_mis = 1.0 / (1.0 + sum_eye + sum_light)
            acc = acc.at[:, :3].add(
                jnp.where(ok[:, None], clamp(contrib * w_mis[:, None]), 0.0))

    # ---- t=1 strategies: light tracing with lens splats ---------------------
    # (the reference BDPT's camera-connection machinery,
    # core_settings.h:105-128; the last documented strategy-family cut,
    # VERDICT r4 #8). Each light vertex y_{s-1} connects to ONE lens point
    # per lane (the eye sampler's aperture convention: the lens sample is
    # not divided out — the measurement importance absorbs it exactly as
    # for t>=2), projects through the lens onto the focal plane, and
    # SPLATS into the landing pixel.
    wh = config.width * config.height
    splat = jnp.zeros((wh, 3), jnp.float32)
    lseed, ra = rng_mod.random_float(lseed)
    lseed, rb = rng_mod.random_float(lseed)
    # 9-bladed lens sample (generate_eye_rays parity, .optix.cu:52-64)
    blade = jnp.floor(ra * 9.0)
    r2b = (ra - blade * (1.0 / 9.0)) * 9.0
    a1 = blade * (jnp.pi / 4.5)
    a2 = (blade + 1.0) * (jnp.pi / 4.5)
    bx1, by1 = jnp.sin(a1), jnp.cos(a1)
    bx2, by2 = jnp.sin(a2), jnp.cos(a2)
    bflip = (rb + r2b) > 1.0
    br3 = jnp.where(bflip, 1.0 - rb, rb)
    br2 = jnp.where(bflip, 1.0 - r2b, r2b)
    lens_x = bx1 * br3 + bx2 * br2
    lens_y = by1 * br3 + by2 * br2
    o_l = view.pos[None] + view.aperture * (right[None] * lens_x[:, None]
                                            + up[None] * lens_y[:, None])
    rr2 = jnp.maximum(dot(right, right), 1e-12)
    uu2 = jnp.maximum(dot(up, up), 1e-12)
    pn = jnp.broadcast_to(plane_n, o_l.shape)
    for s in range(1, s_l + 1):
        yv = y0 if s == 1 else lverts[s - 2]
        ypos = yv["pos"]
        w_vec = o_l - ypos
        dist2 = jnp.maximum(dot(w_vec, w_vec), 1e-12)
        dist = jnp.sqrt(dist2)
        dir_yl = w_vec / dist[:, None]             # y -> lens
        dir_ly = -dir_yl                           # lens -> y (the eye ray)
        # project: intersect (o_l, dir_ly) with the focal plane -> pixel
        denom = dot(dir_ly, pn)                    # cos theta at the lens
        f_ax_l = dot(view.p1[None] - o_l, pn)
        t_pl = f_ax_l / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        q = o_l + t_pl[:, None] * dir_ly - view.p1[None]
        su = dot(q, jnp.broadcast_to(right, q.shape)) / rr2
        sv = dot(q, jnp.broadcast_to(up, q.shape)) / uu2
        inside = ((denom > 1e-6) & (t_pl > 0)
                  & (su >= 0) & (su < 1) & (sv >= 0) & (sv < 1))
        px = jnp.clip((su * config.width).astype(jnp.int32), 0,
                      config.width - 1)
        py = jnp.clip((sv * config.height).astype(jnp.int32), 0,
                      config.height - 1)
        pix = py * config.width + px
        cos_l = jnp.maximum(denom, 1e-6)
        p_omega = (f_ax_l * f_ax_l) / (a_film * cos_l ** 3)

        if s == 1:
            cos_y_g = jnp.where(yv["delta_pos"], 1.0, dot(dir_yl, yv["ns"]))
            cos_y = jnp.abs(cos_y_g)
            f_y = jnp.ones((n, 3))
            # a delta-POSITION light seen directly by the lens is a point
            # image no other strategy samples; cameras do not image delta
            # lights (PT parity) — skip, no MIS interaction exists
            y_valid = yv["valid"] & ~yv["delta_pos"]
            y_delta = yv["delta"]
            y_beta = yv["beta"]
            y_out_n = jnp.where(yv["delta_pos"][:, None], dir_yl, yv["ns"])
        else:
            ysd = yv["sd"]
            y_out_n = ysd.n_geom * ysd.face_dir[:, None]
            cos_y_g = dot(dir_yl, y_out_n)
            cos_y = jnp.abs(dot(dir_yl, ysd.n_shading))
            f_y, _ = _f_pdf(bsdf_mod, config, ysd, -yv["d_in"], dir_yl)
            y_valid = yv["valid"] & ~yv["emissive"]
            y_delta = yv["delta"]
            y_beta = yv["beta"]

        ok = y_valid & ~y_delta & (cos_y_g > 0) & inside
        contrib = y_beta * f_y * (p_omega * cos_y / dist2)[:, None]

        # visibility y <-> lens
        sh_o = safe_origin(ypos, dir_yl, y_out_n, geo_eps)
        sh_tmax = jnp.where(ok, dist - 2.0 * geo_eps, 0.0)
        occ = _occluded(scene, sh_o, dir_yl, sh_tmax, config)
        ok = ok & ~occ
        n_conn_rays = n_conn_rays + jnp.sum(ok.astype(jnp.int32))

        # ---- MIS vs (s-k, 1+k): camera->y area pdf seeds the chain ----
        rev_top = p_omega * cos_y / dist2
        if s == 1:
            rev_top1 = jnp.zeros((n,))
            lchain = [y0]
        else:
            _, pdf_y_back_sa = _f_pdf(bsdf_mod, config, yv["sd"],
                                      dir_yl, -yv["d_in"])
            prev_ns = (y0["ns"] if s == 2
                       else lverts[s - 3]["sd"].n_shading)
            rev_top1 = _to_area(pdf_y_back_sa,
                                jnp.abs(dot(yv["d_in"], prev_ns)),
                                yv["dist_in2"])
            lchain = [y0] + lverts[:s - 1]
        sum_light = _light_ratio_chain(lchain, s, rev_top, rev_top1,
                                       1, max_eye=s_e,
                                       delta_light=y0["delta_pos"])
        w_mis = 1.0 / (1.0 + sum_light)
        val = jnp.where(ok[:, None], clamp(contrib * w_mis[:, None]), 0.0)
        splat = splat.at[jnp.where(ok, pix, 0)].add(
            jnp.where(ok[:, None], val * _T1_SCALE, 0.0))

    # per-path -> per-pixel
    spp = config.spp_per_pass
    acc = untile_image(acc.reshape(spp, wh, 4), config).sum(0)
    acc = acc.at[:, :3].add(splat)
    cam_seed, _ = rng_mod.frame_r0(cam_seed, 1)
    stats = dict(
        primary_rays=jnp.int32(n),
        extension_rays=jnp.zeros((config.max_path_length,), jnp.int32
                                 ).at[0].set(n_ext_rays),
        shadow_rays=jnp.zeros((config.max_path_length,), jnp.int32
                              ).at[0].set(n_conn_rays),
        total_extension=n_ext_rays,
        total_shadow=n_conn_rays,
    )
    return acc, cam_seed, stats


def render_pass_bdpt(scene, view, state: AccumState, config: RenderConfig):
    acc_delta, cam_seed, stats = trace_paths_bdpt(
        scene, view, config, state.sample_count, state.cam_seed)
    return AccumState(
        accumulator=state.accumulator + acc_delta,
        sample_count=state.sample_count + config.spp_per_pass,
        cam_seed=cam_seed,
    ), stats


@functools.partial(jax.jit, static_argnames=("config",))
def render_pass_bdpt_jit(scene, view, state, config):
    return render_pass_bdpt(scene, view, state, config)
