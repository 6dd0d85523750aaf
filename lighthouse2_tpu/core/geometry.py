"""Vector math + intersection primitives (pure jnp, vmappable, differentiable).

Reference semantics:
  - Möller–Trumbore ray/triangle: lib/RenderCore_Bart/common.h:19-51
  - slab AABB test: lib/RenderCore_Bart/bvh.cpp:7-42
  - SafeOrigin offset heuristic: tools_shared.h:279-293
  - ConsistentNormal (Reshetov 2010): tools_shared.h:297-311
  - Tangent2World / World2Tangent ONB (Duff et al.): tools_shared.h:211-240

All arrays are float32 SoA with a trailing dim of 3 for vectors; every function
broadcasts over leading dims so it can run on [N]-ray wavefronts directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPSILON = jnp.float32(1e-6)
BIG_T = jnp.float32(1e30)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a):
    return a * jax.lax.rsqrt(jnp.maximum(dot(a, a), 1e-20))[..., None]


def reflect(d, n):
    """Mirror reflection of direction d about normal n."""
    return d - 2.0 * dot(d, n)[..., None] * n


def refract(d, n, eta):
    """Refraction of d through normal n with relative IOR eta = n1/n2.

    Returns (refracted_dir, tir_mask). On total internal reflection the
    direction is the reflection instead and tir_mask is True.
    """
    cos_i = -dot(d, n)
    k = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
    tir = k < 0.0
    t = eta[..., None] * d + (eta * cos_i - jnp.sqrt(jnp.maximum(k, 0.0)))[..., None] * n
    r = reflect(d, n)
    return jnp.where(tir[..., None], r, normalize(t)), tir


def fresnel_dielectric_exact(cos_theta_i, eta):
    """Exact dielectric Fresnel (tools_shared.h:199-209). eta = n_i / n_t."""
    cos_theta_i = jnp.clip(cos_theta_i, 0.0, 1.0)
    sin_theta_t2 = eta * eta * (1.0 - cos_theta_i * cos_theta_i)
    tir = sin_theta_t2 > 1.0
    cos_theta_t = jnp.sqrt(jnp.maximum(1.0 - sin_theta_t2, 0.0))
    rs = (eta * cos_theta_i - cos_theta_t) / jnp.maximum(eta * cos_theta_i + cos_theta_t, 1e-20)
    rp = (eta * cos_theta_t - cos_theta_i) / jnp.maximum(eta * cos_theta_t + cos_theta_i, 1e-20)
    f = 0.5 * (rs * rs + rp * rp)
    return jnp.where(tir, 1.0, f)


def schlick_fresnel(cos_theta, n1, n2):
    """Schlick approximation used by the Lambert BSDF (sharedBSDFs/lambert.h:79-84)."""
    r0 = ((n1 - n2) / (n1 + n2)) ** 2
    c = 1.0 - cos_theta
    return r0 + (1.0 - r0) * c * c * c * c * c


# ---------------------------------------------------------------------------
# Orthonormal basis (Duff et al. branchless; tools_shared.h:211-240)
# ---------------------------------------------------------------------------

def onb(n):
    """Build (tangent, bitangent) for unit normal n. Branchless Pixar ONB."""
    sign = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def oriented_frame(n, tangent, bitangent):
    """Shading frame aligned to the uv tangent when one exists: T is
    Gram-Schmidt-orthogonalized against n, B re-derived with the input
    bitangent's handedness; zero tangents fall back to the branchless ONB
    (the reference builds exactly this frame from CoreTri.T/B)."""
    t_proj = tangent - n * jnp.sum(n * tangent, -1, keepdims=True)
    tl = jnp.sqrt(jnp.maximum(jnp.sum(t_proj * t_proj, -1, keepdims=True),
                              1e-20))
    has = (jnp.sum(tangent * tangent, -1, keepdims=True) > 0.25) & (tl > 1e-6)
    t_uv = t_proj / tl
    b_uv = jnp.cross(n, t_uv)
    # preserve the uv handedness (mirrored uvs flip B)
    sign = jnp.where(jnp.sum(b_uv * bitangent, -1, keepdims=True) < 0.0,
                     -1.0, 1.0)
    b_uv = b_uv * sign
    t_onb, b_onb = onb(n)
    return jnp.where(has, t_uv, t_onb), jnp.where(has, b_uv, b_onb)


def tangent_to_world(v, n):
    t, b = onb(n)
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def world_to_tangent(v, n):
    t, b = onb(n)
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


# ---------------------------------------------------------------------------
# Robust shadow/extension ray origins (tools_shared.h:279-293)
# ---------------------------------------------------------------------------

def safe_origin(o, r, n, geo_epsilon):
    """Offset origin o along ray r / normal n blended by parallel-ness^2."""
    parallel = 1.0 - jnp.abs(dot(r, n))
    v = parallel * parallel
    return o + (1.0 - v)[..., None] * (geo_epsilon * n) + v[..., None] * (geo_epsilon * r)


# ---------------------------------------------------------------------------
# Consistent normal interpolation (Reshetov 2010; tools_shared.h:297-311)
# ---------------------------------------------------------------------------

def consistent_normal(d, n, alpha):
    """Bend the interpolated shading normal n so reflections of d stay above
    the surface; alpha is the per-vertex-interpolated cone angle."""
    q = (1.0 - (2.0 / jnp.pi) * alpha)
    q = (q * q) / (1.0 + 2.0 * (1.0 - (2.0 / jnp.pi) * alpha))
    b = dot(-d, n)
    g = 1.0 + q * (b - 1.0)
    rho = jnp.sqrt(jnp.maximum(q * (1.0 + g) / jnp.maximum(1.0 + b, 1e-6), 1e-12))
    r = (g + rho * b)[..., None] * n - rho[..., None] * (-d)
    return normalize(-d + r)


# ---------------------------------------------------------------------------
# Möller–Trumbore ray/triangle (common.h:19-51)
# ---------------------------------------------------------------------------

def intersect_tri(o, d, v0, e1, e2, t_min=EPSILON, t_max=BIG_T):
    """Single/broadcast Möller–Trumbore.

    Args: o,d [...,3] ray; v0,e1,e2 [...,3] triangle (v0 + edges).
    Returns (t, u, v, hit) with t=BIG_T where no hit.
    """
    h = cross(d, e2)
    a = dot(e1, h)
    # two-sided test, reject near-parallel
    valid = jnp.abs(a) > 1e-9
    f = 1.0 / jnp.where(valid, a, 1.0)
    s = o - v0
    u = f * dot(s, h)
    q = cross(s, e1)
    v = f * dot(d, q)
    t = f * dot(e2, q)
    hit = valid & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    hit = hit & (t > t_min) & (t < t_max)
    return jnp.where(hit, t, BIG_T), u, v, hit


def mt_comp(ox, oy, oz, dx, dy, dz,
            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
            t_min, t_max, det_eps=1e-9):
    """Component-major Möller–Trumbore (common.h:19-51). Broadcasts.

    TPU-critical: [N,3] jnp.cross formulations inside loops are ~2000x
    slower on v5e (layout churn); all hot intersection paths use this form.

    `det_eps`: near-parallel cutoff. The differentiable refine path raises
    it (1/det and 1/det^2 appear in the backward; 1e-9 admits 1e18-scale
    cotangents that overflow to inf -> NaN through downstream sums).
    """
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    valid = jnp.abs(a) > det_eps
    f = 1.0 / jnp.where(valid, a, 1.0)
    sx = ox - v0x
    sy = oy - v0y
    sz = oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    hit = (valid & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
           & (t > t_min) & (t < t_max))
    return jnp.where(hit, t, BIG_T), u, v, hit


def intersect_aabb(o, inv_d, bmin, bmax, t_max):
    """Slab test (bvh.cpp:7-42). Returns (t_near, hit). inv_d = 1/d."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    t_near = jnp.max(tsm, axis=-1)
    t_far = jnp.min(tbg, axis=-1)
    hit = (t_far >= jnp.maximum(t_near, 0.0)) & (t_near < t_max)
    return t_near, hit


# ---------------------------------------------------------------------------
# Brute-force wavefront intersector (the no-BVH path for small scenes;
# reference analog: linear loop in RenderCore_Minimal / tiny scenes)
# ---------------------------------------------------------------------------

def intersect_bruteforce(o, d, v0, e1, e2, t_max=BIG_T, chunk=1024):
    """Closest-hit of [N] rays against [T] triangles without a BVH.

    Scans triangle chunks to bound the [N, chunk] working set. Fully
    differentiable w.r.t. ray and triangle data through the winning hit.

    Returns (t [N], prim [N] int32 (-1 = miss), u [N], v [N]).
    """
    n_tris = v0.shape[0]
    pad = (-n_tris) % chunk
    if pad:
        padv = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, padv], 0)
        e1 = jnp.concatenate([e1, padv], 0)
        e2 = jnp.concatenate([e2, padv], 0)
    n_chunks = v0.shape[0] // chunk
    v0c = v0.reshape(n_chunks, chunk, 3)
    e1c = e1.reshape(n_chunks, chunk, 3)
    e2c = e2.reshape(n_chunks, chunk, 3)

    n = o.shape[0]
    # init carries derive from the ray AND triangle inputs so their varying
    # manual axes match the body outputs under shard_map (triangles may be
    # sharded over a 'scene' axis — parallel/scene_shard.py)
    zf = o[:, 0] * 0.0 + v0.reshape(-1)[0] * 0.0
    init = (
        zf + BIG_T,
        zf.astype(jnp.int32) - 1,
        zf,
        zf,
    )

    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

    def body(carry, tris):
        bt, bp, bu, bv, base = carry[0], carry[1], carry[2], carry[3], carry[4]
        cv0, ce1, ce2 = tris
        # [N, chunk] pairwise test, component-major (TPU layout)
        t, u, v, hit = mt_comp(
            ox, oy, oz, dx, dy, dz,
            cv0[None, :, 0], cv0[None, :, 1], cv0[None, :, 2],
            ce1[None, :, 0], ce1[None, :, 1], ce1[None, :, 2],
            ce2[None, :, 0], ce2[None, :, 1], ce2[None, :, 2],
            EPSILON, jnp.minimum(bt, t_max)[:, None],
        )
        t = jnp.where(hit, t, BIG_T)
        j = jnp.argmin(t, axis=1)
        tj = jnp.take_along_axis(t, j[:, None], axis=1)[:, 0]
        better = tj < bt
        sel = lambda new, old: jnp.where(better, new, old)
        bt = sel(tj, bt)
        bp = sel(base + j.astype(jnp.int32), bp)
        bu = sel(jnp.take_along_axis(u, j[:, None], 1)[:, 0], bu)
        bv = sel(jnp.take_along_axis(v, j[:, None], 1)[:, 0], bv)
        return (bt, bp, bu, bv, base + chunk), None

    (bt, bp, bu, bv, _), _ = jax.lax.scan(
        body, init + (jnp.int32(0),), (v0c, e1c, e2c)
    )
    bp = jnp.where(bp < n_tris, bp, -1)
    return bt, bp, bu, bv


def occluded_bruteforce(o, d, t_max, v0, e1, e2, chunk=1024):
    """Any-hit occlusion test of [N] rays against [T] triangles.

    Returns bool [N]: True if something blocks before t_max.
    """
    n_tris = v0.shape[0]
    pad = (-n_tris) % chunk
    if pad:
        padv = jnp.zeros((pad, 3), v0.dtype)
        v0 = jnp.concatenate([v0, padv], 0)
        e1 = jnp.concatenate([e1, padv], 0)
        e2 = jnp.concatenate([e2, padv], 0)
    n_chunks = v0.shape[0] // chunk
    v0c = v0.reshape(n_chunks, chunk, 3)
    e1c = e1.reshape(n_chunks, chunk, 3)
    e2c = e2.reshape(n_chunks, chunk, 3)

    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

    def body(occ, tris):
        cv0, ce1, ce2 = tris
        _, _, _, hit = mt_comp(
            ox, oy, oz, dx, dy, dz,
            cv0[None, :, 0], cv0[None, :, 1], cv0[None, :, 2],
            ce1[None, :, 0], ce1[None, :, 1], ce1[None, :, 2],
            ce2[None, :, 0], ce2[None, :, 1], ce2[None, :, 2],
            EPSILON, t_max[:, None],
        )
        return occ | jnp.any(hit, axis=1), None

    # init derives from both inputs for shard_map vma matching (see
    # intersect_bruteforce)
    init = (o[:, 0] * 0.0 + v0.reshape(-1)[0] * 0.0) > 1.0
    occ, _ = jax.lax.scan(body, init, (v0c, e1c, e2c))
    return occ


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------

def transform_point(m, p):
    """Apply 4x4 matrix [...,4,4] to points [...,3]."""
    return (
        m[..., :3, :3] @ p[..., None]
    )[..., 0] + m[..., :3, 3]


def transform_vector(m, v):
    return (m[..., :3, :3] @ v[..., None])[..., 0]
