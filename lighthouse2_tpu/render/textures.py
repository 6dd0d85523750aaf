"""Device texture fetch: bilinear + trilinear MIP sampling.

Reference: sampling_shared.h FetchTexel (:35-71, bilinear with wrap-repeat
via the +1000 offset trick) and FetchTexelTrilinear (:73-89).
All gathers are differentiable w.r.t. the texel pool.

TPU layout (measured): the pool is component-major [4, P] so every tap is a
single gather along the minor axis ([4, N] result) — a row gather of an
[P, 4] pool would put 4 in the lane dim and get padded to 128 lanes.
All arithmetic stays in [rows, N] space; only the final result is stacked
to the [N, 4] the shading code expects.
"""
from __future__ import annotations

import jax.numpy as jnp

from lighthouse2_tpu.scene.device_scene import DeviceTextures
from lighthouse2_tpu.scene.host_texture import MIP_LEVELS


def _fetch_bilinear_rows(tex: DeviceTextures, tex_id, uv, level):
    """Bilinear wrap-repeat fetch; returns [4, N] component rows."""
    tid = jnp.maximum(tex_id, 0)
    lvl = jnp.clip(level, 0, MIP_LEVELS - 1)
    nt, nm, _ = tex.desc.shape
    dflat = tex.desc.reshape(nt * nm, 3).T        # [3, NTEX*MIPS]
    di = dflat[:, tid * nm + lvl]                 # [3, N]
    off, w, h = di[0], di[1], di[2]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    # wrap-repeat (+1000 whole-texture offset trick, sampling_shared.h:38-40)
    x = (uv[:, 0] + 1000.0) * wf - 0.5
    y = (uv[:, 1] + 1000.0) * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def texel(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), jnp.maximum(w, 1))
        yi = jnp.mod(yi.astype(jnp.int32), jnp.maximum(h, 1))
        return tex.pool[:, off + xi + yi * w]     # [4, N]

    t00 = texel(x0, y0)
    t10 = texel(x0 + 1, y0)
    t01 = texel(x0, y0 + 1)
    t11 = texel(x0 + 1, y0 + 1)
    top = t00 * (1 - fx)[None] + t10 * fx[None]
    bot = t01 * (1 - fx)[None] + t11 * fx[None]
    return top * (1 - fy)[None] + bot * fy[None]


def fetch_bilinear(tex: DeviceTextures, tex_id, uv, level):
    """Bilinear wrap-repeat fetch. tex_id [N] int32 (clamped >=0), uv [N,2],
    level [N] int32 mip. Returns [N,4]."""
    return _fetch_bilinear_rows(tex, tex_id, uv, level).T


def fetch_trilinear(tex: DeviceTextures, tex_id, uv, lam):
    """Trilinear MIP fetch (sampling_shared.h:73-89). lam = float LOD."""
    lam = jnp.clip(lam, 0.0, MIP_LEVELS - 1.0)
    l0 = jnp.floor(lam).astype(jnp.int32)
    frac = lam - l0.astype(jnp.float32)
    a = _fetch_bilinear_rows(tex, tex_id, uv, l0)
    b = _fetch_bilinear_rows(tex, tex_id, uv,
                             jnp.minimum(l0 + 1, MIP_LEVELS - 1))
    return (a * (1 - frac)[None] + b * frac[None]).T
