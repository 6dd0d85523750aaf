"""Pixel probe — click-to-inspect (reference: core probe counters
core_settings.h:114-116, consumed at apps/imguiapp/main.cpp:123-134).

Casts a single center-pixel primary ray and reports hit identity.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lighthouse2_tpu.core.geometry import normalize, intersect_bruteforce
from lighthouse2_tpu.bvh.traverse import bvh_intersect


def probe_pixel(scene, view, config, x: int, y: int) -> dict:
    right = view.p2 - view.p1
    up = view.p3 - view.p1
    u = (x + 0.5) / config.width
    v = (y + 0.5) / config.height
    p = view.p1 + u * right + v * up
    o = view.pos[None]
    d = normalize(p - view.pos)[None]
    tris = scene.tris
    if config.use_bvh and scene.bvh is not None:
        t, prim, bu, bv = bvh_intersect(o, d, scene.bvh, tris.v0, tris.e1, tris.e2)
    else:
        t, prim, bu, bv = intersect_bruteforce(o, d, tris.v0, tris.e1, tris.e2)
    prim_i = int(prim[0])
    mat = int(tris.mat[prim_i]) if prim_i >= 0 else -1
    return dict(prim=prim_i, material=mat,
                distance=float(t[0]) if prim_i >= 0 else float("inf"),
                u=float(bu[0]), v=float(bv[0]))
