"""Lambert + pure-specular + dielectric BSDF (sharedBSDFs/lambert.h).

Semantics preserved exactly, but branchless/masked for TPU:
  - EvaluateBSDF: zero (pdf 0) for specular vertices (transmission>0.999 or
    roughness<=0.001), else color/pi with pdf |wi·iN|/pi.
  - SampleBSDF: r4 < TRANSMISSION → dielectric (Schlick-free exact Fresnel
    Fr_L, Beer absorption exp(-transmittance·dist·2) — reference's doubled
    distance preserved deliberately, SURVEY.md Appendix A); else mirror with
    probability 1-ROUGHNESS, else cosine diffuse.
  - BSDF_HAS_PURE_SPECULARS contract: NEE evaluation is scaled by ROUGHNESS
    in the shade stage (lambert.h:19-30).
"""
from __future__ import annotations

import jax.numpy as jnp

from lighthouse2_tpu.core.geometry import (
    dot, normalize, reflect, tangent_to_world,
)
from lighthouse2_tpu.core.sampling import cosine_hemisphere

INV_PI = 1.0 / jnp.pi
SPECULAR_TRANSMISSION = 0.999   # lambert.h:64
SPECULAR_ROUGHNESS = 0.001


def is_specular_material(sd):
    """lambert.h:64 / pathtracer.h:154 pure-specular detection."""
    return (sd.transmission > SPECULAR_TRANSMISSION) | (sd.roughness <= SPECULAR_ROUGHNESS)


def _fr_l(v_dot_n, eio):
    """Exact dielectric Fresnel Fr_L (lambert.h:33-46)."""
    flip = v_dot_n < 0.0
    eio = jnp.where(flip, 1.0 / eio, eio)
    v_dot_n = jnp.abs(v_dot_n)
    sin_t2 = eio * eio * (1.0 - v_dot_n * v_dot_n)
    tir = sin_t2 > 1.0
    l_dot_n = jnp.sqrt(jnp.maximum(1.0 - sin_t2, 0.0))
    r1 = (v_dot_n - eio * l_dot_n) / jnp.maximum(v_dot_n + eio * l_dot_n, 1e-20)
    r2 = (l_dot_n - eio * v_dot_n) / jnp.maximum(l_dot_n + eio * v_dot_n, 1e-20)
    return jnp.where(tir, 1.0, 0.5 * (r1 * r1 + r2 * r2))


def _refract_l(wi, n, eta):
    """Refract_L (lambert.h:49-57). Returns (wt, ok)."""
    cos_i = jnp.abs(dot(n, wi))
    sin2_i = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    sin2_t = eta * eta * sin2_i
    ok = sin2_t < 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    wt = eta[..., None] * (-wi) + (eta * cos_i - cos_t)[..., None] * n
    return wt, ok


def evaluate(sd, i_n, wo, wi):
    """EvaluateBSDF (lambert.h:60-70). Returns (bsdf [N,3], pdf [N])."""
    spec = is_specular_material(sd)
    pdf = jnp.where(spec, 0.0, jnp.abs(dot(wi, i_n)) * INV_PI)
    bsdf = jnp.where(spec[:, None], 0.0, sd.color * INV_PI)
    return bsdf, pdf


def sample(sd, i_n, n_geom, wo, distance, r3, r4):
    """SampleBSDF (lambert.h:72-125), masked. wo points AWAY from surface.

    Returns dict(wi [N,3], pdf [N], bsdf [N,3], specular [N] bool).
    The reference's backface handling: flip = sign(dot(wo, N)); iN *= flip.
    """
    flip = jnp.where(dot(wo, n_geom) < 0, -1.0, 1.0)
    i_n = i_n * flip[:, None]

    # --- dielectric branch (r4 < TRANSMISSION) -----------------------------
    eio = jnp.where(flip < 0, 1.0 / jnp.maximum(sd.eta, 1e-6), sd.eta)
    f = _fr_l(dot(i_n, wo), eio)
    # Beer: transmittance stored as material absorption; reference applies
    # exp(-transmittance * dist * 2) (lambert.h:87-89) and zeroes it for
    # front-side hits in the shade stage — handled by caller via sd.absorption
    beer = jnp.exp(-sd.absorption * (distance * 2.0)[:, None])
    wi_refl = reflect(-wo, i_n)
    bsdf_refl = sd.color * beer / jnp.maximum(jnp.abs(dot(i_n, wi_refl))[:, None], 1e-9)
    wt, refr_ok = _refract_l(wo, i_n, eio)
    bsdf_refr = sd.color * beer / jnp.maximum(jnp.abs(dot(i_n, wt))[:, None], 1e-9)
    t_reflects = r3 < f
    wi_t = jnp.where(t_reflects[:, None], wi_refl, wt)
    bsdf_t = jnp.where(t_reflects[:, None], bsdf_refl,
                       jnp.where(refr_ok[:, None], bsdf_refr, 0.0))

    # --- reflective branch (r4 >= TRANSMISSION) ----------------------------
    p_reflect = 1.0 - sd.roughness
    pure_spec = r3 < p_reflect
    bsdf_mirror = sd.color / jnp.maximum(jnp.abs(dot(i_n, wi_refl))[:, None], 1e-9)
    r5 = (r3 - p_reflect) / jnp.maximum(1.0 - p_reflect, 1e-9)
    r6 = (r4 - sd.transmission) / jnp.maximum(1.0 - sd.transmission, 1e-9)
    wi_diff = normalize(tangent_to_world(cosine_hemisphere(r5, r6), i_n))
    pdf_diff = jnp.maximum(0.0, dot(wi_diff, i_n)) * INV_PI
    bsdf_diff = sd.color * INV_PI

    wi_r = jnp.where(pure_spec[:, None], wi_refl, wi_diff)
    bsdf_r = jnp.where(pure_spec[:, None], bsdf_mirror, bsdf_diff)
    pdf_r = jnp.where(pure_spec, 1.0, pdf_diff)
    spec_r = pure_spec

    # --- combine -----------------------------------------------------------
    transmit = r4 < sd.transmission
    wi = jnp.where(transmit[:, None], wi_t, wi_r)
    bsdf = jnp.where(transmit[:, None], bsdf_t, bsdf_r)
    pdf = jnp.where(transmit, 1.0, pdf_r)
    specular = jnp.where(transmit, True, spec_r)

    # APPLYSAFENORMALS (lambert.h:122): kill samples below the geometric plane
    below = dot(n_geom * flip[:, None], wi) <= 0.0
    pdf = jnp.where(below, 0.0, pdf)
    return dict(wi=wi, pdf=pdf, bsdf=bsdf, specular=specular)
