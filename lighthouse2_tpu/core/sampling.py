"""Sampling warps (tools_shared.h:242-275, lights_shared.h:145-164).

All warps take uniform floats in [0,1) and broadcast over leading dims.
"""
from __future__ import annotations

import jax.numpy as jnp
import jax


def cosine_hemisphere(r0, r1):
    """Cosine-weighted hemisphere about +z (tools_shared.h:242-249). pdf = z/pi."""
    term1 = 2.0 * jnp.pi * r0
    term2 = jnp.sqrt(jnp.maximum(1.0 - r1, 0.0))
    s = jnp.sqrt(jnp.maximum(r1, 0.0))
    return jnp.stack(
        [jnp.cos(term1) * s, jnp.sin(term1) * s, term2], axis=-1
    )


def uniform_sphere(r0, r1):
    z = 1.0 - 2.0 * r0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * r1
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_hemisphere(r0, r1):
    z = r0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * r1
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_cone(r0, r1, cos_theta_max):
    cos_theta = (1.0 - r0) + r0 * cos_theta_max
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * jnp.pi * r1
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )


def random_barycentrics(r):
    """Uniform triangle warp via 16-digit base-4 subdivision
    (lights_shared.h:145-164). r is a uniform float in [0,1).

    Returns barycentrics (u, v) with u+v<=1, uniformly over the triangle.
    """
    uf = (r * jnp.float32(4294967296.0)).astype(jnp.uint32)
    zero = jnp.zeros_like(r)
    a0, b0, c0 = zero + 1.0, zero, zero
    d0, e0, f0 = zero, zero + 1.0, zero
    g0, h0, i0 = zero, zero, zero + 1.0

    def body(k, carry):
        a, b, c, d, e, f, g, h, i, uf = carry
        uf = uf * jnp.uint32(4)
        dd = (uf >> 30).astype(jnp.int32)
        an, bn, cn = 0.5 * (b + c), 0.5 * (c + a), 0.5 * (a + b)
        dn, en, fn = 0.5 * (e + f), 0.5 * (f + d), 0.5 * (d + e)
        gn, hn, in_ = 0.5 * (h + i), 0.5 * (i + g), 0.5 * (g + h)
        # digit selects which sub-triangle to recurse into
        w = lambda x0, x1, x2, x3: jnp.where(
            dd == 0, x0, jnp.where(dd == 1, x1, jnp.where(dd == 2, x2, x3))
        )
        a2 = w(an, a, an, bn)
        b2 = w(bn, bn, b, an)
        c2 = w(cn, cn, cn, c)
        d2 = w(dn, d, dn, en)
        e2 = w(en, en, e, dn)
        f2 = w(fn, fn, fn, f)
        g2 = w(gn, g, gn, hn)
        h2 = w(hn, hn, h, gn)
        i2 = w(in_, in_, in_, i)
        return (a2, b2, c2, d2, e2, f2, g2, h2, i2, uf)

    a, b, c, d, e, f, g, h, i, _ = jax.lax.fori_loop(
        0, 16, body, (a0, b0, c0, d0, e0, f0, g0, h0, i0, uf)
    )
    u = (a + b + c) / 3.0
    v = (d + e + f) / 3.0
    return u, v


def sample_triangle_simple(r0, r1):
    """The a+b>1 reflection trick used by the Bart core (raytracer.cpp:9-13)."""
    flip = r0 + r1 > 1.0
    u = jnp.where(flip, 1.0 - r0, r0)
    v = jnp.where(flip, 1.0 - r1, r1)
    return u, v
