"""Disney principled BRDF (reference: lib/sharedBSDFs/disney.h, adapted by
the reference from AppleSeed; microfacet functions lib/sharedBSDFs/ggxmdf.h).

Vectorized + masked for TPU: the reference's per-lobe if/else CDF pick
becomes renormalized-random masked branches; every lobe is evaluated for the
MIS-combined pdf exactly like disney.h:279-294. The dielectric transmission
path is shared with the Lambert shader (disney.h:211-234).

Tangent frames use the mesh uv tangent/bitangent when present (they ride in
the shading data — shading.py:48-49 — interpolated from the payload's
PAY_TAN/PAY_BIT rows, like the reference's CoreTri.T frame); triangles
without a uv frame fall back to the branchless ONB.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lighthouse2_tpu.core.geometry import dot, normalize, reflect, onb
from lighthouse2_tpu.core.sampling import cosine_hemisphere
from lighthouse2_tpu.render.bsdf_lambert import _fr_l, _refract_l

INV_PI = 1.0 / jnp.pi
PI = jnp.pi


# ---------------------------------------------------------------------------
# color helpers (tint, material_shared.h:70-71)
# ---------------------------------------------------------------------------

def _luminance_y(rgb):
    return 0.212671 * rgb[..., 0] + 0.715160 * rgb[..., 1] + 0.072169 * rgb[..., 2]


def tint_and_luminance(color):
    y = _luminance_y(color)
    tint = jnp.where((y > 0)[..., None], color / jnp.maximum(y, 1e-9)[..., None], 1.0)
    return tint, y


def _schlick(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


# ---------------------------------------------------------------------------
# GGX / GTR1 microfacet functions (ggxmdf.h), tangent-space z-up vectors
# given as components (vx,vy,vz) arrays
# ---------------------------------------------------------------------------

def _ggx_d(mx, my, mz, ax, ay):
    c2 = mz * mz
    s = jnp.sqrt(jnp.maximum(1.0 - c2, 0.0))
    c4 = c2 * c2
    tan2 = (1.0 - c2) / jnp.maximum(c2, 1e-12)
    iso = (jnp.abs(ax - ay) < 1e-7) | (s == 0.0)
    cos_phi2 = (mx / jnp.maximum(s * ax, 1e-12)) ** 2
    sin_phi2 = (my / jnp.maximum(s * ay, 1e-12)) ** 2
    a_aniso = cos_phi2 + sin_phi2
    a = jnp.where(iso, 1.0 / (ax * ax), a_aniso)
    tmp = 1.0 + tan2 * a
    d = 1.0 / (PI * ax * ay * c4 * tmp * tmp)
    return jnp.where(c2 > 1e-12, d, ax * ax * INV_PI)


def _ggx_lambda(vx, vy, vz, ax, ay):
    c2 = vz * vz
    s = jnp.sqrt(jnp.maximum(1.0 - c2, 0.0))
    iso = (jnp.abs(ax - ay) < 1e-7) | (s == 0.0)
    cos_phi2 = (vx / jnp.maximum(s, 1e-12)) ** 2
    sin_phi2 = (vy / jnp.maximum(s, 1e-12)) ** 2
    alpha_aniso = jnp.sqrt(cos_phi2 * ax * ax + sin_phi2 * ay * ay)
    alpha = jnp.where(iso, ax, alpha_aniso)
    tan2 = (s * s) / jnp.maximum(c2, 1e-12)
    lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + alpha * alpha * tan2))
    return jnp.where(jnp.abs(vz) > 1e-12, lam, 0.0)


def _ggx_g(wix, wiy, wiz, wox, woy, woz, ax, ay):
    return 1.0 / (1.0 + _ggx_lambda(wox, woy, woz, ax, ay)
                  + _ggx_lambda(wix, wiy, wiz, ax, ay))


def _ggx_sample(vx, vy, vz, r0, r1, ax, ay):
    """Sample the GGX visible-normal distribution (ggxmdf.h:102-121)."""
    sign = jnp.where(vz < 0, -1.0, 1.0)
    sx, sy, sz = sign * vx * ax, sign * vy * ay, sign * vz
    inv = jax.lax.rsqrt(jnp.maximum(sx * sx + sy * sy + sz * sz, 1e-20))
    sx, sy, sz = sx * inv, sy * inv, sz * inv
    # ONB around stretched vector: t1 = normalize(cross(s, z)) or (1,0,0)
    denom = jnp.sqrt(jnp.maximum(sx * sx + sy * sy, 1e-20))
    straight = vz >= 0.9999
    t1x = jnp.where(straight, 1.0, sy / denom)
    t1y = jnp.where(straight, 0.0, -sx / denom)
    t1z = 0.0 * t1x
    # t2 = cross(t1, s)
    t2x = t1y * sz - t1z * sy
    t2y = t1z * sx - t1x * sz
    t2z = t1x * sy - t1y * sx
    a = 1.0 / (1.0 + sz)
    r = jnp.sqrt(jnp.maximum(r0, 0.0))
    low = r1 < a
    phi = jnp.where(low, r1 / jnp.maximum(a, 1e-9) * PI,
                    PI + (r1 - a) / jnp.maximum(1.0 - a, 1e-9) * PI)
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi) * jnp.where(low, 1.0, sz)
    p3 = jnp.sqrt(jnp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    hx = p1 * t1x + p2 * t2x + p3 * sx
    hy = p1 * t1y + p2 * t2y + p3 * sy
    hz = p1 * t1z + p2 * t2z + p3 * sz
    mx, my, mz = hx * ax, hy * ay, jnp.maximum(hz, 0.0)
    inv = jax.lax.rsqrt(jnp.maximum(mx * mx + my * my + mz * mz, 1e-20))
    return mx * inv, my * inv, mz * inv


def _ggx_pdf(vx, vy, vz, mx, my, mz, ax, ay):
    g1 = 1.0 / (1.0 + _ggx_lambda(vx, vy, vz, ax, ay))
    vm = jnp.abs(vx * mx + vy * my + vz * mz)
    return jnp.where(jnp.abs(vz) > 1e-12,
                     g1 * vm * _ggx_d(mx, my, mz, ax, ay) / jnp.abs(vz), 0.0)


def _gtr1_d(mz, alpha):
    alpha = jnp.clip(alpha, 0.001, 0.999)
    a2 = alpha * alpha
    a = (a2 - 1.0) / (PI * jnp.log(a2))
    b = 1.0 / (1.0 + (a2 - 1.0) * mz * mz)
    return a * b


def _gtr1_lambda(vz, alpha):
    c2 = vz * vz
    s = jnp.sqrt(jnp.maximum(1.0 - c2, 0.0))
    cot2 = c2 / jnp.maximum(s * s, 1e-12)
    cot = jnp.sqrt(jnp.maximum(cot2, 0.0))
    alpha = jnp.clip(alpha, 0.001, 0.999)
    a2 = alpha * alpha
    a = jnp.sqrt(cot2 + a2)
    b = jnp.sqrt(cot2 + 1.0)
    c = jnp.log(jnp.maximum(cot + b, 1e-20))
    d_ = jnp.log(jnp.maximum(cot + a, 1e-20))
    lam = (a - b + cot * (c - d_)) / (cot * jnp.log(a2))
    return jnp.where((jnp.abs(vz) > 1e-9) & (s > 1e-9), lam, 0.0)


def _gtr1_g(wiz, woz, alpha):
    return 1.0 / (1.0 + _gtr1_lambda(woz, alpha) + _gtr1_lambda(wiz, alpha))


def _gtr1_sample(r0, r1, alpha):
    alpha = jnp.clip(alpha, 0.001, 0.999)
    a2 = alpha * alpha
    a = 1.0 - jnp.power(a2, 1.0 - r0)
    c2 = a / (1.0 - a2)
    cz = jnp.sqrt(jnp.maximum(c2, 0.0))
    s = jnp.sqrt(jnp.maximum(1.0 - c2, 0.0))
    phi = 2.0 * PI * r1
    return s * jnp.cos(phi), s * jnp.sin(phi), cz


def _gtr1_pdf(mz, alpha):
    return _gtr1_d(mz, alpha) * jnp.abs(mz)


# ---------------------------------------------------------------------------
# frame helpers
# ---------------------------------------------------------------------------

def _frame(i_n, sd=None):
    """Shading frame: uv-tangent-aligned when the mesh carries one (so
    anisotropy has a stable, author-controlled direction), ONB otherwise."""
    if sd is not None:
        from lighthouse2_tpu.core.geometry import oriented_frame
        return oriented_frame(i_n, sd.tangent, sd.bitangent)
    t, b = onb(i_n)
    return t, b


def _to_local(v, i_n, t, b):
    return dot(v, t), dot(v, b), dot(v, i_n)


def _to_world(x, y, z, i_n, t, b):
    return x[..., None] * t + y[..., None] * b + z[..., None] * i_n


# ---------------------------------------------------------------------------
# lobes (disney.h)
# ---------------------------------------------------------------------------

def _lobe_weights(sd):
    """disney.h:239-246: (diffuse, sheen, specular, clearcoat) normalized."""
    _, lum = tint_and_luminance(sd.color)
    w0 = lum * (1.0 - sd.metallic)
    w1 = sd.sheen * (1.0 - sd.metallic)
    w2 = sd.specular + sd.metallic * (1.0 - sd.specular)
    w3 = sd.clearcoat * 0.25
    total = jnp.maximum(w0 + w1 + w2 + w3, 1e-9)
    return w0 / total, w1 / total, w2 / total, w3 / total


def _spec_alphas(sd):
    sq = sd.roughness * sd.roughness
    aspect = jnp.sqrt(1.0 + sd.anisotropic
                      * jnp.where(sd.anisotropic < 0, 0.9, -0.9))
    ax = jnp.maximum(0.001, sq / aspect)
    ay = jnp.maximum(0.001, sq * aspect)
    return ax, ay


def _clearcoat_alpha(sd):
    return 0.1 + (0.001 - 0.1) * sd.clearcoat_gloss


def _spec_fresnel(sd, cos_oh):
    tint, _ = tint_and_luminance(sd.color)
    val = (1.0 - sd.spec_tint[..., None]) + sd.spec_tint[..., None] * tint
    val = val * (sd.specular * 0.08)[..., None]
    val = (1.0 - sd.metallic[..., None]) * val + sd.metallic[..., None] * sd.color
    f = _schlick(jnp.abs(cos_oh))
    return (1.0 - f[..., None]) * val + f[..., None]


def _coat_fresnel(sd, cos_oh):
    f = 0.04 + (1.0 - 0.04) * _schlick(jnp.abs(cos_oh))
    return (f * 0.25 * sd.clearcoat)[..., None] * jnp.ones((1, 3))


def _evaluate_diffuse(sd, i_n, wo, wi):
    """disney.h:137-165. Returns (value [N,3], pdf [N])."""
    h = normalize(wi + wo)
    cos_on = dot(i_n, wo)
    cos_in = dot(i_n, wi)
    cos_ih = dot(wi, h)
    fl = _schlick(cos_in)
    fv = _schlick(cos_on)
    fd90 = 0.5 + 2.0 * cos_ih * cos_ih * sd.roughness
    fd = (1.0 + (fd90 - 1.0) * fl) * (1.0 + (fd90 - 1.0) * fv)
    fd = jnp.where(sd.subsurface != 1.0, fd, 0.0)
    fss90 = cos_ih * cos_ih * sd.roughness
    fss = (1.0 + (fss90 - 1.0) * fl) * (1.0 + (fss90 - 1.0) * fv)
    ss = 1.25 * (fss * (1.0 / jnp.maximum(jnp.abs(cos_on) + jnp.abs(cos_in),
                                          1e-9) - 0.5) + 0.5)
    fd = fd + sd.subsurface * (ss - fd)
    value = sd.color * (fd * INV_PI * (1.0 - sd.metallic))[..., None]
    pdf = jnp.abs(cos_in) * INV_PI
    return value, pdf


def _evaluate_sheen(sd, wo, wi):
    """disney.h:180-190 (reference quirk preserved: h built from wow+wow)."""
    h = normalize(wo + wo)
    cos_ih = dot(wi, h)
    fh = _schlick(cos_ih)
    tint, _ = tint_and_luminance(sd.color)
    val = (1.0 - sd.sheen_tint[..., None]) + sd.sheen_tint[..., None] * tint
    value = val * (fh * sd.sheen * (1.0 - sd.metallic))[..., None]
    return value, jnp.full(wo.shape[:-1], 1.0 / (2.0 * PI))


def _evaluate_mf(sd, i_n, t, b, wo, wi, ggx: bool):
    """evaluate_mf (disney.h:118-135). Returns (value, pdf)."""
    wox, woy, woz = _to_local(wo, i_n, t, b)
    wix, wiy, wiz = _to_local(wi, i_n, t, b)
    msx = wix + wox
    msy = wiy + woy
    msz = wiz + woz
    inv = jax.lax.rsqrt(jnp.maximum(msx * msx + msy * msy + msz * msz, 1e-20))
    mx, my, mz = msx * inv, msy * inv, msz * inv
    cos_oh = wox * mx + woy * my + woz * mz
    if ggx:
        ax, ay = _spec_alphas(sd)
        d = _ggx_d(mx, my, mz, ax, ay)
        g = _ggx_g(wix, wiy, wiz, wox, woy, woz, ax, ay)
        fres = _spec_fresnel(sd, cos_oh)
        pdf = _ggx_pdf(wox, woy, woz, mx, my, mz, ax, ay) \
            / jnp.maximum(jnp.abs(4.0 * cos_oh), 1e-9)
    else:
        alpha = _clearcoat_alpha(sd)
        d = _gtr1_d(mz, alpha)
        g = _gtr1_g(wiz, woz, alpha)
        fres = _coat_fresnel(sd, cos_oh)
        pdf = _gtr1_pdf(mz, alpha) / jnp.maximum(jnp.abs(4.0 * cos_oh), 1e-9)
    denom = jnp.maximum(jnp.abs(4.0 * woz * wiz), 1e-9)
    value = fres * (d * g / denom)[..., None]
    ok = (jnp.abs(woz) > 1e-9) & (jnp.abs(wiz) > 1e-9) & (jnp.abs(cos_oh) > 1e-9)
    return jnp.where(ok[..., None], value, 0.0), jnp.where(ok, pdf, 0.0)


def _sample_mf(sd, i_n, t, b, n_geom_flip, wo, r0, r1, ggx: bool):
    """sample_mf (disney.h:96-116). Returns (wi [N,3], ok mask)."""
    wox, woy, woz = _to_local(wo, i_n, t, b)
    if ggx:
        ax, ay = _spec_alphas(sd)
        mx, my, mz = _ggx_sample(wox, woy, woz, r0, r1, ax, ay)
    else:
        alpha = _clearcoat_alpha(sd)
        mx, my, mz = _gtr1_sample(r0, r1, alpha)
    # wi = reflect(-wo, m)
    k = 2.0 * (wox * mx + woy * my + woz * mz)
    wix, wiy, wiz = k * mx - wox, k * my - woy, k * mz - woz
    wi = _to_world(wix, wiy, wiz, i_n, t, b)
    # force above the geometric surface (disney.h:64-71)
    cos_g = dot(wi, n_geom_flip)
    corr = 1e-4 - cos_g
    wi_fixed = normalize(wi + corr[..., None] * n_geom_flip)
    wi = jnp.where((corr > 0)[..., None], wi_fixed, wi)
    ok = jnp.abs(woz) > 1e-9
    return wi, ok


# ---------------------------------------------------------------------------
# public API (matches bsdf_lambert signature)
# ---------------------------------------------------------------------------

def is_specular_material(sd):
    return (sd.transmission > 0.999) | (sd.roughness <= 0.001)


def evaluate(sd, i_n, wo, wi):
    """EvaluateBSDF (disney.h:298-335). Returns (bsdf [N,3], pdf [N])."""
    spec = is_specular_material(sd)
    t, b = _frame(i_n, sd)
    w_d, w_sh, w_sp, w_c = _lobe_weights(sd)
    v_d, p_d = _evaluate_diffuse(sd, i_n, wo, wi)
    v_sh, p_sh = _evaluate_sheen(sd, wo, wi)
    v_sp, p_sp = _evaluate_mf(sd, i_n, t, b, wo, wi, ggx=True)
    v_c, p_c = _evaluate_mf(sd, i_n, t, b, wo, wi, ggx=False)
    m = lambda w: (w > 0)
    value = (jnp.where(m(w_d)[..., None], v_d, 0.0)
             + jnp.where(m(w_sh)[..., None], v_sh, 0.0)
             + jnp.where(m(w_sp) [..., None] & (p_sp > 0)[..., None], v_sp, 0.0)
             + jnp.where(m(w_c)[..., None] & (p_c > 0)[..., None], v_c, 0.0))
    pdf = (jnp.where(m(w_d), w_d * p_d, 0.0)
           + jnp.where(m(w_sh), w_sh * p_sh, 0.0)
           + jnp.where(m(w_sp), w_sp * p_sp, 0.0)
           + jnp.where(m(w_c), w_c * p_c, 0.0))
    return (jnp.where(spec[..., None], 0.0, value),
            jnp.where(spec, 0.0, pdf))


def sample(sd, i_n, n_geom, wo, distance, r3, r4):
    """SampleBSDF (disney.h:203-297), masked. Returns dict like lambert.

    NOTE argument convention matches bsdf_lambert.sample: (r3, r4) where the
    reference uses (r0=lobe/dielectric select, r1=second dim); we map
    r4→lobe select (as lambert uses r4 for transmission) and r3→second dim.
    """
    flip = jnp.where(dot(wo, n_geom) < 0, -1.0, 1.0)
    i_n = i_n * flip[:, None]
    n_flip = n_geom * flip[:, None]
    t, b = _frame(i_n, sd)

    # ---- dielectric path (shared with lambert; disney.h:211-234) ----------
    eio = jnp.where(flip < 0, 1.0 / jnp.maximum(sd.eta, 1e-6), sd.eta)
    fr = _fr_l(dot(i_n, wo), eio)
    beer = jnp.exp(-sd.absorption * (distance * 2.0)[:, None])
    wi_refl = reflect(-wo, i_n)
    refl_ok = dot(n_flip, wi_refl) > 0
    bsdf_refl = sd.color * beer / jnp.maximum(jnp.abs(dot(i_n, wi_refl))[:, None], 1e-9)
    wt, refr_ok = _refract_l(wo, i_n, eio)
    bsdf_refr = sd.color * beer / jnp.maximum(jnp.abs(dot(i_n, wt))[:, None], 1e-9)
    t_reflects = r3 < fr
    wi_t = jnp.where(t_reflects[:, None], wi_refl, wt)
    bsdf_t = jnp.where(t_reflects[:, None], bsdf_refl,
                       jnp.where(refr_ok[:, None], bsdf_refr, 0.0))
    pdf_t = jnp.where(t_reflects & ~refl_ok, 0.0, 1.0)

    # ---- lobe CDF (disney.h:239-247) --------------------------------------
    # the lobe pick + renormalized randoms are SAMPLING-DISTRIBUTION
    # quantities: detached like every other sampling warp (the postponed-pdf
    # convention). Differentiating the renormalization w.r.t. the lobe
    # weights produced NaN parameter gradients (e.g. d/d(sheen) through
    # (r - c0)/(c1 - c0) at near-empty lobes) for a quantity whose true
    # derivative contribution is the discrete-choice term we deliberately
    # drop (SURVEY §7.3.3)
    transmit = r4 < jax.lax.stop_gradient(sd.transmission)
    r3n = jax.lax.stop_gradient(
        (r4 - sd.transmission) / jnp.maximum(1.0 - sd.transmission, 1e-9))
    w_d, w_sh, w_sp, w_c = _lobe_weights(sd)
    c0, c1, c2 = jax.lax.stop_gradient((w_d, w_d + w_sh, w_d + w_sh + w_sp))
    pick_d = r3n < c0
    pick_sh = (r3n >= c0) & (r3n < c1)
    pick_sp = (r3n >= c1) & (r3n < c2)
    pick_c = r3n >= c2

    # renormalized first random per lobe
    r2 = jnp.where(pick_d, r3n / jnp.maximum(c0, 1e-9),
         jnp.where(pick_sh, (r3n - c0) / jnp.maximum(c1 - c0, 1e-9),
         jnp.where(pick_sp, (r3n - c1) / jnp.maximum(c2 - c1, 1e-9),
                   (r3n - c2) / jnp.maximum(1.0 - c2, 1e-9))))
    r1 = r3  # second dimension

    # candidate directions per lobe
    wi_cos = normalize(_to_world(*_split3(cosine_hemisphere(r2, r1)), i_n, t, b))
    wi_sp, ok_sp = _sample_mf(sd, i_n, t, b, n_flip, wo, r2, r1, ggx=True)
    wi_co, ok_co = _sample_mf(sd, i_n, t, b, n_flip, wo, r2, r1, ggx=False)
    wi = jnp.where(pick_sp[:, None], wi_sp,
                   jnp.where(pick_c[:, None], wi_co, wi_cos))

    # combined value + pdf over all lobes (MIS inside the BSDF)
    v_d, p_d = _evaluate_diffuse(sd, i_n, wo, wi)
    v_sh, p_sh = _evaluate_sheen(sd, wo, wi)
    v_sp, p_sp = _evaluate_mf(sd, i_n, t, b, wo, wi, ggx=True)
    v_c, p_c = _evaluate_mf(sd, i_n, t, b, wo, wi, ggx=False)
    value = (jnp.where((w_d > 0)[:, None], v_d, 0.0)
             + jnp.where((w_sh > 0)[:, None], v_sh, 0.0)
             + jnp.where((w_sp > 0)[:, None], v_sp, 0.0)
             + jnp.where((w_c > 0)[:, None], v_c, 0.0))
    pdf_lobes = w_d * p_d + w_sh * p_sh + w_sp * p_sp + w_c * p_c
    # sampled direction below the surface → dead sample
    below = dot(wi, i_n) <= 0
    pdf_lobes = jnp.where(below & ~(pick_sp | pick_c), 0.0, pdf_lobes)

    wi_out = jnp.where(transmit[:, None], wi_t, wi)
    bsdf_out = jnp.where(transmit[:, None], bsdf_t, value)
    pdf_out = jnp.where(transmit, pdf_t, pdf_lobes)
    specular = transmit
    return dict(wi=wi_out, pdf=pdf_out, bsdf=bsdf_out, specular=specular)


def _split3(v):
    return v[..., 0], v[..., 1], v[..., 2]
