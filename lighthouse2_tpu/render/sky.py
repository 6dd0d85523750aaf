"""Skydome sampling (tools_shared.h:185-192, Debevec equirect mapping)."""
from __future__ import annotations

import jax.numpy as jnp

from lighthouse2_tpu.scene.device_scene import DeviceSky


def sample_skydome(sky: DeviceSky, d):
    """Nearest-texel equirect lookup for directions d [N,3] → radiance [N,3].

    u = w/2 (1 + atan2(D.x, -D.z)/pi), v = h acos(D.y)/pi.
    """
    h, w = sky.pixels.shape[0], sky.pixels.shape[1]
    inv_pi = 1.0 / jnp.pi
    u = (w * 0.5 * (1.0 + jnp.arctan2(d[..., 0], -d[..., 2]) * inv_pi)).astype(jnp.int32)
    v = (h * jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) * inv_pi).astype(jnp.int32)
    u = jnp.clip(u, 0, w - 1)
    v = jnp.clip(v, 0, h - 1)
    return sky.pixels[v, u]
