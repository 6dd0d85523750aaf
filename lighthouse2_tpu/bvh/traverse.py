"""BVH traversal as a lockstep vectorized JAX kernel — component-major.

The reference traverses recursively with near-child-first ordering
(RenderCore_Bart/bvh.cpp:258-302). Pointer-chasing recursion does not map to
TPU, so this kernel runs ALL rays in lockstep through one `lax.while_loop`:
each ray carries an explicit short stack; every iteration pops/descends one
node per ray with pure gathers + masked math.

TPU-critical layout decisions (measured on v5e):
  - ALL vector math is component-major ([N] per x/y/z) — [N,3] arrays with
    jnp.cross inside loops compile for minutes and run ~2000x slower;
  - triangle data is packed [9, T] (v0,e1,e2 per component) so a leaf fetch
    is one gather per component row;
  - node boxes are packed [M, 8] so each child costs one row gather;
  - stack updates are one-hot selects, not scatters;
  - several traversal steps run between while-loop convergence checks.

Traversal is intentionally non-differentiable (discrete hit selection); the
renderer re-evaluates (t,u,v) differentiably from the winning primitive via
`refine_hit` — that is how pixel gradients reach vertex positions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from lighthouse2_tpu.core.geometry import BIG_T, mt_comp

STACK_DEPTH = 48
DEFAULT_CHUNK = 1 << 30   # effectively unchunked: wide calls win on TPU
STEPS_PER_CHECK = 4       # traversal steps between convergence checks


def _stack_set(stack, sptr, val):
    """stack[i, sptr[i]] = val[i] without scatter (one-hot select)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 1)
    return jnp.where(cols == sptr[:, None], val[:, None].astype(stack.dtype), stack)


def _stack_get(stack, idx):
    """stack[i, idx[i]] without per-row gather."""
    cols = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 1)
    sel = jnp.where(cols == idx[:, None], stack, jnp.zeros((), stack.dtype))
    return jnp.sum(sel, axis=1)


@struct.dataclass
class DeviceBVH:
    nbox: jnp.ndarray    # [6,M] f32 component-major: min.x/y/z, max.x/y/z
    left: jnp.ndarray    # [M] int32: interior→left child; leaf→first prim slot
    right: jnp.ndarray   # [M] int32: interior→right child; leaf→-1
    count: jnp.ndarray   # [M] int32: 0 interior, >0 leaf prim count
    prim: jnp.ndarray    # [T] int32 triangle ids, contiguous per leaf
    tri9: jnp.ndarray    # [9,T] f32: v0.xyz, e1.xyz, e2.xyz (component-major)
    max_leaf: int = struct.field(pytree_node=False, default=4)


def build_device_bvh(v0, v1, v2, max_leaf: int = 4) -> DeviceBVH:
    from lighthouse2_tpu.bvh.builder import build_sah_bvh
    flat = build_sah_bvh(v0, v1, v2, max_leaf=max_leaf)
    return device_bvh_from_flat(flat, v0, v1, v2, max_leaf=max_leaf)


def device_bvh_from_flat(flat: dict, v0, v1, v2, max_leaf: int = 4) -> DeviceBVH:
    """Flatten a builder.py SAH dict into the lockstep-traversal layout
    (shares the SAH build with bvh/clusters.py cut_clusters)."""
    import numpy as np
    nbox = np.concatenate([flat["nmin"].T, flat["nmax"].T], 0).astype(np.float32)
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(v1, np.float32) - v0
    e2 = np.asarray(v2, np.float32) - v0
    tri9 = np.concatenate([v0.T, e1.T, e2.T], 0).astype(np.float32)
    return DeviceBVH(
        nbox=jnp.asarray(nbox),
        left=jnp.asarray(flat["left"]), right=jnp.asarray(flat["right"]),
        count=jnp.asarray(flat["count"]), prim=jnp.asarray(flat["prim"]),
        tri9=jnp.asarray(tri9), max_leaf=max_leaf,
    )


def _slab_c(ox, oy, oz, ix, iy, iz, nbox, nid, t_best):
    """Component-major slab test; per-component [N] gathers from [6,M]
    (a [N,8] row gather + column slicing triggers a pathological XLA path
    on this TPU backend — measured 2000x slower)."""
    t0x = (nbox[0, nid] - ox) * ix
    t1x = (nbox[3, nid] - ox) * ix
    t0y = (nbox[1, nid] - oy) * iy
    t1y = (nbox[4, nid] - oy) * iy
    t0z = (nbox[2, nid] - oz) * iz
    t1z = (nbox[5, nid] - oz) * iz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                     jnp.minimum(t0z, t1z))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                     jnp.maximum(t0z, t1z))
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best)
    return tn, hit


def _traverse_chunk(o, d, t_max, bvh: DeviceBVH, anyhit: bool):
    """Lockstep traversal of one chunk of rays (component-major inside)."""
    r = o.shape[0]
    max_leaf = bvh.max_leaf
    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    ds = jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    ix, iy, iz = 1.0 / ds[:, 0], 1.0 / ds[:, 1], 1.0 / ds[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    # all carries derive from the (possibly shard-varying) ray arrays AND
    # the BVH arrays so the while-loop carry keeps consistent
    # varying-manual-axes under shard_map (check_vma=True): in the
    # scene-sharded mode rays vary over "rays" while the BVH varies over
    # "scene", and the loop body mixes both into every carry
    zf = ox * 0.0 + bvh.nbox[0, 0] * 0.0
    zi = zf.astype(jnp.int32)
    state = dict(
        node=zi,
        cur_t=zf,
        sptr=zi,
        stack=jnp.zeros((r, STACK_DEPTH), jnp.int32) + zi[:, None],
        tstack=jnp.zeros((r, STACK_DEPTH), jnp.float32) + zf[:, None],
        best_t=jnp.minimum(jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
                           + zf, BIG_T),
        best_p=zi - 1,
        best_u=zf,
        best_v=zf,
        occ=zi != 0,
        done=zi != 0,
        visits=zi,   # per-ray node visits (ColorDebugBVH, raytracer.cpp:102)
    )

    def cond(s):
        return jnp.any(~s["done"])

    def step(s):
        node = s["node"]
        alive = ~s["done"]
        prune = s["cur_t"] >= s["best_t"]
        cnt = bvh.count[node]
        is_leaf = alive & ~prune & (cnt > 0)
        is_int = alive & ~prune & (cnt == 0)

        # ---- leaf: unrolled incremental triangle tests ([N]-only math;
        # batched [N,L] + argmin/take_along_axis hits a pathological XLA
        # path on this backend) -------------------------------------------
        first = bvh.left[node]
        best_t, best_p = s["best_t"], s["best_p"]
        best_u, best_v = s["best_u"], s["best_v"]
        occ = s["occ"]
        for k in range(max_leaf):
            slot = jnp.clip(first + k, 0, bvh.prim.shape[0] - 1)
            pid = bvh.prim[slot]
            g = bvh.tri9[:, pid]                    # [9,N]
            t, u, v, h = mt_comp(
                ox, oy, oz, dx, dy, dz,
                g[0], g[1], g[2], g[3], g[4], g[5], g[6], g[7], g[8],
                jnp.float32(1e-6), best_t)
            h = h & is_leaf & (k < cnt)
            best_p = jnp.where(h, pid, best_p)
            best_u = jnp.where(h, u, best_u)
            best_v = jnp.where(h, v, best_v)
            best_t = jnp.where(h, t, best_t)
            occ = occ | h

        # ---- interior: test both children ---------------------------------
        l = bvh.left[node]
        rt = bvh.right[node]
        tl, hl = _slab_c(ox, oy, oz, ix, iy, iz, bvh.nbox, l, best_t)
        tr, hr = _slab_c(ox, oy, oz, ix, iy, iz, bvh.nbox, rt, best_t)
        hl = hl & is_int
        hr = hr & is_int
        both = hl & hr
        any_h = hl | hr
        near_is_l = tl <= tr
        nnode = jnp.where(both, jnp.where(near_is_l, l, rt), jnp.where(hl, l, rt))
        nt = jnp.where(both, jnp.minimum(tl, tr), jnp.where(hl, tl, tr))
        fnode = jnp.where(near_is_l, rt, l)
        ft = jnp.maximum(tl, tr)

        sptr = s["sptr"]
        stack, tstack = s["stack"], s["tstack"]
        push_slot = jnp.clip(sptr, 0, STACK_DEPTH - 1)
        stack = _stack_set(stack, push_slot,
                           jnp.where(both, fnode, _stack_get(stack, push_slot)))
        tstack = _stack_set(tstack, push_slot,
                            jnp.where(both, ft, _stack_get(tstack, push_slot)))
        sptr = sptr + both.astype(jnp.int32)

        if anyhit:
            # fire-and-forget shadow rays: stop at first hit
            # (OPTIX_RAY_FLAG_TERMINATE_ON_FIRST_HIT analog, .optix.cu:137-149)
            newly_occluded = occ & alive
        else:
            newly_occluded = jnp.zeros_like(occ)

        goto = any_h & ~newly_occluded
        need_pop = alive & ~goto & ~newly_occluded
        can_pop = need_pop & (sptr > 0)
        done = s["done"] | (need_pop & (sptr == 0)) | newly_occluded

        pidx = jnp.clip(sptr - 1, 0, STACK_DEPTH - 1)
        pnode = _stack_get(stack, pidx)
        pt = _stack_get(tstack, pidx)
        node = jnp.where(goto, nnode, jnp.where(can_pop, pnode, node))
        cur_t = jnp.where(goto, nt, jnp.where(can_pop, pt, s["cur_t"]))
        sptr = sptr - can_pop.astype(jnp.int32)

        return dict(node=node, cur_t=cur_t, sptr=sptr, stack=stack,
                    tstack=tstack, best_t=best_t, best_p=best_p,
                    best_u=best_u, best_v=best_v, occ=occ, done=done,
                    visits=s["visits"] + alive.astype(jnp.int32))

    def body(s):
        for _ in range(STEPS_PER_CHECK):
            s = step(s)
        return s

    out = jax.lax.while_loop(cond, body, state)
    if anyhit:
        return out["occ"]
    return (out["best_t"], out["best_p"], out["best_u"], out["best_v"],
            out["visits"])


def _chunked(o, d, t_max, fn, chunk):
    n = o.shape[0]
    if n <= chunk:
        return fn(o, d, jnp.broadcast_to(t_max, (n,)))
    pad = (-n) % chunk
    t_max = jnp.broadcast_to(t_max, (n,))
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), t_max.dtype)])
    nc = o.shape[0] // chunk
    res = jax.lax.map(
        lambda args: fn(*args),
        (o.reshape(nc, chunk, 3), d.reshape(nc, chunk, 3), t_max.reshape(nc, chunk)),
    )
    return jax.tree_util.tree_map(lambda x: x.reshape(-1, *x.shape[2:])[:n], res)


def bvh_intersect(o, d, bvh: DeviceBVH, v0=None, e1=None, e2=None,
                  t_max=BIG_T, chunk: int = DEFAULT_CHUNK):
    """Closest hit of [N] rays. Returns (t, prim, u, v); prim=-1 on miss.

    Non-differentiable (stop_gradient inside); pair with `refine_hit`.
    v0/e1/e2 args are accepted for API compatibility; triangle data comes
    from bvh.tri9.
    """
    return bvh_intersect_counts(o, d, bvh, t_max=t_max, chunk=chunk)[:4]


def bvh_intersect_counts(o, d, bvh: DeviceBVH, t_max=BIG_T,
                         chunk: int = DEFAULT_CHUNK):
    """bvh_intersect + per-ray traversal-step counts (the ColorDebugBVH
    instrument, RenderCore_Bart/raytracer.cpp:102-120)."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    bvh = jax.lax.stop_gradient(bvh)
    fn = functools.partial(_run_closest, bvh=bvh)
    return _chunked(o, d, t_max, fn, chunk)


def _run_closest(o, d, t_max, bvh):
    return _traverse_chunk(o, d, t_max, bvh, anyhit=False)


def bvh_occluded(o, d, t_max, bvh: DeviceBVH, v0=None, e1=None, e2=None,
                 chunk: int = DEFAULT_CHUNK):
    """Any-hit occlusion of [N] rays before t_max. Returns bool [N]."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    bvh = jax.lax.stop_gradient(bvh)
    fn = functools.partial(_run_anyhit, bvh=bvh)
    return _chunked(o, d, t_max, fn, chunk)


def _run_anyhit(o, d, t_max, bvh):
    return _traverse_chunk(o, d, t_max, bvh, anyhit=True)


def refine_hit(o, d, prim, tri9):
    """Differentiably recompute (t,u,v) for a known hit primitive.

    Gradients flow from the hit point to ray origin/direction AND to the
    triangle data — the reparameterized-hit trick that replaces
    differentiating through discrete BVH traversal (SURVEY.md §7.3.3).
    tri9 is the [9,T] component-major triangle array (row-gather+slice of
    [T,3] arrays hits the pathological XLA path on this backend).
    """
    p = jnp.maximum(prim, 0)
    return refine_hit_rows(o, d, prim, tri9[:, p])


# bound on refine cotangents: the reparameterized-hit derivative carries
# 1/det and 1/det^2 factors that are REAL but unbounded at grazing
# incidence; left unclamped they compound across bounces and overflow f32
# (measured NaN vertex gradients on multi-bounce interiors). Clipping the
# backward at the refine boundary is the standard differentiable-rendering
# mitigation — bias confined to near-grazing configurations.
_REFINE_GRAD_LIMIT = 1e4


def _refine_tuv_impl(o, d, g9):
    t, u, v, h = mt_comp(
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        g9[0], g9[1], g9[2], g9[3], g9[4], g9[5], g9[6], g9[7], g9[8],
        jnp.float32(-BIG_T), BIG_T, det_eps=1e-6)
    return t, u, v


@jax.custom_vjp
def _refine_tuv(o, d, g9):
    return _refine_tuv_impl(o, d, g9)


def _refine_tuv_fwd(o, d, g9):
    return _refine_tuv_impl(o, d, g9), (o, d, g9)


def _refine_tuv_bwd(res, cots):
    _, pullback = jax.vjp(_refine_tuv_impl, *res)
    clip = lambda x: jnp.clip(jnp.nan_to_num(x, nan=0.0, posinf=0.0,
                                             neginf=0.0),
                              -_REFINE_GRAD_LIMIT, _REFINE_GRAD_LIMIT)
    return tuple(clip(g) for g in pullback(cots))


_refine_tuv.defvjp(_refine_tuv_fwd, _refine_tuv_bwd)


def refine_hit_rows(o, d, prim, g9):
    """refine_hit from pre-fetched per-ray triangle rows g9 [9,N] (v0/e1/e2
    component-major) — the gather-free path fed by the trace kernel's
    payload (render/fetch.reattach_rows keeps it differentiable).

    Uses a RAISED determinant cutoff (1e-6) and a CLIPPED backward (see
    _REFINE_GRAD_LIMIT); callers fall back to the traversal (t,u,v) when
    the returned ok mask is False (edge/grazing re-tests)."""
    t, u, v = _refine_tuv(o, d, g9)
    _, _, _, h = mt_comp(
        *(jax.lax.stop_gradient(x) for x in (
            o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
            g9[0], g9[1], g9[2], g9[3], g9[4], g9[5], g9[6], g9[7], g9[8])),
        jnp.float32(-BIG_T), BIG_T, det_eps=1e-6)
    valid = prim >= 0
    return (jnp.where(valid, t, BIG_T), jnp.where(valid, u, 0.0),
            jnp.where(valid, v, 0.0), valid & h)
