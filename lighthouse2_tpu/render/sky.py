"""Skydome sampling (tools_shared.h:185-192, Debevec equirect mapping) +
IBL importance sampling (host_skydome.cpp:20-47 builds pdf/cdf tables under
the IBL define; here the tables are device arrays built at sync).

The IBL design is inverse-CDF over the equirect pixel grid:
  - pixel pdf ∝ luminance(y,x) · sin(θ_y)  (solid-angle weighting);
  - marginal CDF over rows + conditional CDF per row, both device arrays;
  - sampling rescales the uniform randoms inside the chosen CDF segment, so
    directions are continuous (piecewise-constant pdf per texel);
  - solid-angle pdf of a texel = p(pixel) / Δω,  Δω = (2π/W)(π/H)·sinθ.

The sky enters NEE as one extra slot of the unified light index space
(render/lights.py) gated by `config.sky_ibl`; the implicit-miss MIS uses
`sky_pdf` + the carried pick probability, mirroring the area-light
postponed-pdf scheme (kernels/pathtracer.h:124-149).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lighthouse2_tpu.scene.device_scene import DeviceSky


def sample_skydome(sky: DeviceSky, d, bilinear: bool = False):
    """Equirect lookup for directions d [N,3] → radiance [N,3].

    u = w/2 (1 + atan2(D.x, -D.z)/pi), v = h acos(D.y)/pi. Nearest texel by
    default (reference parity, tools_shared.h:185-192); `bilinear=True`
    blends the 4 neighbours (wrap in u, clamp in v)."""
    h, w = sky.pixels.shape[0], sky.pixels.shape[1]
    inv_pi = 1.0 / jnp.pi
    uf = w * 0.5 * (1.0 + jnp.arctan2(d[..., 0], -d[..., 2]) * inv_pi)
    vf = h * jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) * inv_pi
    if not bilinear:
        u = jnp.clip(uf.astype(jnp.int32), 0, w - 1)
        v = jnp.clip(vf.astype(jnp.int32), 0, h - 1)
        return sky.pixels[v, u]
    uf = uf - 0.5
    vf = vf - 0.5
    u0 = jnp.floor(uf).astype(jnp.int32)
    v0 = jnp.floor(vf).astype(jnp.int32)
    fu = (uf - u0)[..., None]
    fv = (vf - v0)[..., None]
    u0w = jnp.mod(u0, w)
    u1w = jnp.mod(u0 + 1, w)
    v0c = jnp.clip(v0, 0, h - 1)
    v1c = jnp.clip(v0 + 1, 0, h - 1)
    p = sky.pixels
    return ((p[v0c, u0w] * (1 - fu) + p[v0c, u1w] * fu) * (1 - fv)
            + (p[v1c, u0w] * (1 - fu) + p[v1c, u1w] * fu) * fv)


# ---------------------------------------------------------------------------
# IBL tables (host_skydome.cpp:20-47 analog)
# ---------------------------------------------------------------------------

def build_sky_cdf(pixels: np.ndarray):
    """Host-side pdf/cdf table build from [H,W,3] linear radiance.

    Returns (pdf [H,W] pixel-measure probabilities, cdf_rows [H],
    cdf_cond [H,W], nee_energy scalar float). nee_energy is the NEE
    potential heuristic: mean cosine-hemisphere-integrated luminance (π ×
    mean luminance) — any positive constant keeps MIS correct; this one
    ranks the sky against the analytic lights' energy heuristic
    (host_light.cpp:41)."""
    p = np.asarray(pixels, np.float32)
    h, w = p.shape[0], p.shape[1]
    lum = p[..., 0] * 0.299 + p[..., 1] * 0.587 + p[..., 2] * 0.114
    sin_t = np.sin(np.pi * (np.arange(h, dtype=np.float32) + 0.5) / h)
    weight = lum * sin_t[:, None]
    total = weight.sum()
    if total <= 0 or h * w <= 1:
        pdf = np.full((h, w), 1.0 / (h * w), np.float32)
    else:
        pdf = (weight / total).astype(np.float32)
    row = pdf.sum(axis=1)                       # [H]
    cdf_rows = np.cumsum(row).astype(np.float32)
    row_safe = np.where(row > 0, row, 1.0)
    cdf_cond = np.cumsum(pdf / row_safe[:, None], axis=1).astype(np.float32)
    nee_energy = float(np.pi * lum.mean())
    return pdf, cdf_rows, cdf_cond, nee_energy


def sample_sky(sky: DeviceSky, r0, r1):
    """Importance-sample the skydome: uniforms r0/r1 [N] → dict(dir [N,3],
    radiance [N,3], pdf [N] solid-angle). Requires IBL tables on `sky`."""
    h, w = sky.pixels.shape[0], sky.pixels.shape[1]
    # row via the marginal CDF
    yi = jnp.clip(jnp.searchsorted(sky.cdf_rows, r0, side="right"), 0, h - 1)
    lo = jnp.where(yi > 0, sky.cdf_rows[jnp.maximum(yi - 1, 0)], 0.0)
    seg = jnp.maximum(sky.cdf_rows[yi] - lo, 1e-12)
    fy = jnp.clip((r0 - lo) / seg, 0.0, 1.0)
    # column via the conditional CDF of that row
    crow = sky.cdf_cond[yi]                         # [N,W] gather
    xi = jnp.clip(jax.vmap(
        lambda c, r: jnp.searchsorted(c, r, side="right"))(crow, r1), 0, w - 1)
    lo_x = jnp.where(xi > 0,
                     jnp.take_along_axis(crow, jnp.maximum(xi - 1, 0)[:, None],
                                         axis=1)[:, 0], 0.0)
    seg_x = jnp.maximum(
        jnp.take_along_axis(crow, xi[:, None], axis=1)[:, 0] - lo_x, 1e-12)
    fx = jnp.clip((r1 - lo_x) / seg_x, 0.0, 1.0)

    theta = jnp.pi * (yi.astype(jnp.float32) + fy) / h
    phi = jnp.pi * (2.0 * (xi.astype(jnp.float32) + fx) / w - 1.0)
    sin_t = jnp.sin(theta)
    d = jnp.stack([sin_t * jnp.sin(phi), jnp.cos(theta),
                   -sin_t * jnp.cos(phi)], axis=-1)
    radiance = sky.pixels[yi, xi]
    pdf = sky_pixel_pdf_to_solid(sky, sky.pdf[yi, xi], sin_t)
    return dict(dir=d, radiance=radiance, pdf=pdf)


def sky_pixel_pdf_to_solid(sky: DeviceSky, p_pixel, sin_theta):
    """pixel-measure pdf → solid-angle pdf: /Δω with Δω=(2π/W)(π/H)sinθ."""
    h, w = sky.pixels.shape[0], sky.pixels.shape[1]
    dw = (2.0 * jnp.pi / w) * (jnp.pi / h) * jnp.maximum(sin_theta, 1e-4)
    return p_pixel / dw


def sky_pdf(sky: DeviceSky, d):
    """Solid-angle pdf that `sample_sky` generates direction d [N,3] — the
    MIS counterpart for implicit sky hits (misses)."""
    h, w = sky.pixels.shape[0], sky.pixels.shape[1]
    inv_pi = 1.0 / jnp.pi
    u = jnp.clip((w * 0.5 * (1.0 + jnp.arctan2(d[..., 0], -d[..., 2])
                             * inv_pi)).astype(jnp.int32), 0, w - 1)
    cy = jnp.clip(d[..., 1], -1.0, 1.0)
    v = jnp.clip((h * jnp.arccos(cy) * inv_pi).astype(jnp.int32), 0, h - 1)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cy * cy, 1e-8))
    return sky_pixel_pdf_to_solid(sky, sky.pdf[v, u], sin_t)
