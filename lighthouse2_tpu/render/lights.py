"""Light importance sampling — vectorized over ALL lights per ray.

Reference (lights_shared.h:36-261) computes per-light "potential
contributions" in a sequential MAXISLIGHTS=8 loop per path. On TPU we compute
the full [rays, lights] potential matrix with broadcast math (the padded light
arrays are tiny compared to the ray count), importance-pick by inverse-CDF,
and reuse the same potentials for the MIS pick probability of implicit hits —
identical math, no 8-light cap.

Unified light index space: [0, LT) area, [LT, LT+LP) point, then spot, dir.
"""
from __future__ import annotations

import jax.numpy as jnp

from lighthouse2_tpu.core.geometry import dot, normalize
from lighthouse2_tpu.core.sampling import random_barycentrics
from lighthouse2_tpu.scene.device_scene import DeviceLights

DIR_LIGHT_DISTANCE = 1000.0  # lights_shared.h:257 (I - 1000*L)


def _att(l_vec):
    return 1.0 / jnp.maximum(dot(l_vec, l_vec), 1e-12)


def potential_contributions(lights: DeviceLights, i_pos, n, area_point=None):
    """[N, L_total] potential light contributions from surface point i_pos with
    normal n. If `area_point` [N, LT, 3] is given, area-light potentials are
    evaluated toward those (bary-sampled) points, else toward the light centre
    slot used by the reference when bary.x<0 (lights_shared.h:46).

    Returns (potential [N, LTot], layout tuple (lt, lp, ls, ld)).
    """
    lt = lights.tri_v0.shape[0]
    lp = lights.point_pos.shape[0]
    ls = lights.spot_pos.shape[0]
    ld = lights.dir_dir.shape[0]

    i_e = i_pos[:, None, :]
    n_e = n[:, None, :]

    # area lights (PotentialAreaLightContribution, lights_shared.h:36-58)
    target = area_point if area_point is not None else \
        jnp.broadcast_to(lights.tri_centre[None], (i_pos.shape[0], lt, 3))
    l_vec = target - i_e
    att = _att(l_vec)
    l_dir = normalize(l_vec)
    ln_dot_l = jnp.maximum(0.0, -dot(jnp.broadcast_to(lights.tri_n[None], l_dir.shape), l_dir))
    n_dot_l = jnp.maximum(0.0, dot(n_e, l_dir))
    pot_area = lights.tri_energy[None] * ln_dot_l * n_dot_l * att
    pot_area = jnp.where(jnp.arange(lt)[None] < lights.n_tri, pot_area, 0.0)

    # point lights (lights_shared.h:64-73)
    l_vec = lights.point_pos[None] - i_e
    pot_point = lights.point_energy[None] * jnp.maximum(0.0, dot(n_e, normalize(l_vec))) * _att(l_vec)
    pot_point = jnp.where(jnp.arange(lp)[None] < lights.n_point, pot_point, 0.0)

    # spot lights (lights_shared.h:79-92)
    l_vec = lights.spot_pos[None] - i_e
    att = _att(l_vec)
    l_dir = normalize(l_vec)
    d = (jnp.maximum(0.0, -dot(l_dir, lights.spot_dir[None]))
         - lights.spot_cos_outer[None]) / jnp.maximum(
             lights.spot_cos_inner[None] - lights.spot_cos_outer[None], 1e-6)
    pot_spot = (lights.spot_energy[None]
                * jnp.clip(d, 0.0, 1.0)
                * jnp.maximum(0.0, dot(n_e, l_dir)) * att)
    pot_spot = jnp.where(jnp.arange(ls)[None] < lights.n_spot, pot_spot, 0.0)

    # directional lights (lights_shared.h:100-107)
    pot_dir = lights.dir_energy[None] * jnp.maximum(
        0.0, -dot(n_e, jnp.broadcast_to(lights.dir_dir[None], (i_pos.shape[0], ld, 3))))
    pot_dir = jnp.where(jnp.arange(ld)[None] < lights.n_dir, pot_dir, 0.0)

    return jnp.concatenate([pot_area, pot_point, pot_spot, pot_dir], axis=1), (lt, lp, ls, ld)


def calculate_light_pdf(d, t, light_area, light_normal):
    """Solid-angle pdf of hitting a light (lights_shared.h:113-116)."""
    return (t * t) / (-dot(d, light_normal) * light_area)


def light_pick_prob(lights: DeviceLights, ltri_idx, o, last_n, i_pos):
    """MIS pick probability for an implicit area-light hit
    (lights_shared.h:123-138): potentials from the PREVIOUS vertex o/last_n,
    area lights evaluated toward the actual hit point i_pos (bary.x<0 path
    uses L=I)."""
    lt = lights.tri_v0.shape[0]
    target = jnp.broadcast_to(i_pos[:, None, :], (i_pos.shape[0], lt, 3))
    pot, _ = potential_contributions(lights, o, last_n, area_point=target)
    s = jnp.sum(pot, axis=1)
    idx = jnp.clip(ltri_idx, 0, pot.shape[1] - 1)
    p = jnp.take_along_axis(pot, idx[:, None], axis=1)[:, 0]
    return jnp.where(s > 0, p / jnp.where(s > 0, s, 1.0), 0.0)


def random_point_on_light(lights: DeviceLights, r0, r1, i_pos, n):
    """RandomPointOnLight (lights_shared.h:172-261), vectorized.

    Returns dict(point [N,3], light_pdf [N], pick_prob [N], color [N,3],
    ltri [N] — the picked area-light slot, or -1 for delta lights).
    """
    n_rays = i_pos.shape[0]
    bu, bv = random_barycentrics(r0)
    bw = 1.0 - bu - bv
    # bary-sampled point on EVERY area light (used for potentials and sample)
    pts = (bu[:, None, None] * lights.tri_v0[None]
           + bv[:, None, None] * lights.tri_v1[None]
           + bw[:, None, None] * lights.tri_v2[None])
    pot, (lt, lp, ls, ld) = potential_contributions(lights, i_pos, n, area_point=pts)
    s = jnp.sum(pot, axis=1)
    cdf = jnp.cumsum(pot, axis=1)
    rs = (r1 * s)[:, None]
    pick = jnp.sum((cdf < rs).astype(jnp.int32), axis=1)
    pick = jnp.clip(pick, 0, pot.shape[1] - 1)
    pick_prob = (jnp.take_along_axis(pot, pick[:, None], 1)[:, 0]
                 / jnp.where(s > 0, s, 1.0))
    pick_prob = jnp.where(s > 0, pick_prob, 0.0)

    is_area = pick < lt
    is_point = (pick >= lt) & (pick < lt + lp)
    is_spot = (pick >= lt + lp) & (pick < lt + lp + ls)
    is_dir = pick >= lt + lp + ls

    a_i = jnp.clip(pick, 0, lt - 1)
    p_i = jnp.clip(pick - lt, 0, lp - 1)
    s_i = jnp.clip(pick - lt - lp, 0, ls - 1)
    d_i = jnp.clip(pick - lt - lp - ls, 0, ld - 1)

    # area light sample (lights_shared.h:205-221)
    p_area = pts[jnp.arange(n_rays), a_i]
    l_rev = i_pos - p_area
    sq = dot(l_rev, l_rev)
    l_rev_n = normalize(l_rev)
    ln_dot_l = dot(l_rev_n, lights.tri_n[a_i])
    area_ok = (ln_dot_l > 0) & (dot(l_rev_n, n) < 0)
    den = lights.tri_area[a_i] * ln_dot_l
    reci_sa = sq / jnp.where(area_ok, jnp.maximum(den, 1e-30), 1.0)
    pdf_area = jnp.where(area_ok, reci_sa, 0.0)

    # point light (lights_shared.h:224-233). NOTE: the reference shadows its
    # lightColor output here (uninitialized for point lights) — we return the
    # radiance, the obviously-intended behavior.
    p_point = lights.point_pos[p_i]
    l_rev = i_pos - p_point
    pdf_point = jnp.where(dot(normalize(l_rev), n) < 0, dot(l_rev, l_rev), 0.0)

    # spot light (lights_shared.h:236-250)
    p_spot = lights.spot_pos[s_i]
    l_rev = i_pos - p_spot
    sq = dot(l_rev, l_rev)
    l_rev_n = normalize(l_rev)
    dfall = (jnp.maximum(0.0, dot(l_rev_n, lights.spot_dir[s_i]))
             - lights.spot_cos_outer[s_i]) / jnp.maximum(
                 lights.spot_cos_inner[s_i] - lights.spot_cos_outer[s_i], 1e-6)
    ln_dot_l = jnp.minimum(1.0, dfall)
    spot_ok = (ln_dot_l > 0) & (dot(l_rev_n, n) < 0)
    pdf_spot = jnp.where(
        spot_ok, sq / jnp.where(spot_ok, jnp.maximum(ln_dot_l, 1e-30), 1.0), 0.0)

    # directional light (lights_shared.h:253-259)
    p_dir = i_pos - DIR_LIGHT_DISTANCE * lights.dir_dir[d_i]
    pdf_dir = jnp.where(dot(lights.dir_dir[d_i], n) < 0, 1.0, 0.0)

    sel3 = lambda m, a, b: jnp.where(m[:, None], a, b)
    point = sel3(is_area, p_area,
                 sel3(is_point, p_point, sel3(is_spot, p_spot, p_dir)))
    light_pdf = jnp.where(is_area, pdf_area,
                          jnp.where(is_point, pdf_point,
                                    jnp.where(is_spot, pdf_spot, pdf_dir)))
    color = sel3(is_area, lights.tri_radiance[a_i],
                 sel3(is_point, lights.point_radiance[p_i],
                      sel3(is_spot, lights.spot_radiance[s_i],
                           lights.dir_radiance[d_i])))
    light_pdf = jnp.where(s > 0, light_pdf, 0.0)
    ltri = jnp.where(is_area, a_i, -1)
    return dict(point=point, light_pdf=light_pdf, pick_prob=pick_prob,
                color=color, ltri=ltri)
