"""BVH traversal as a lockstep vectorized JAX kernel.

The reference traverses recursively with near-child-first ordering
(RenderCore_Bart/bvh.cpp:258-302). Pointer-chasing recursion does not map to
TPU, so this kernel runs ALL rays in lockstep through one `lax.while_loop`:
each ray carries an explicit short stack ([STACK] node ids + entry-t for
t-pruning) in registers/VMEM; every iteration pops/descends one node per ray
with pure gathers + masked math. Rays are processed in fixed-size chunks via
`lax.map` to bound the stack working set.

Traversal is intentionally non-differentiable (discrete hit selection); the
renderer re-evaluates (t,u,v) differentiably from the winning primitive via
`refine_hit` — that is how pixel gradients reach vertex positions.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from lighthouse2_tpu.core.geometry import intersect_tri, BIG_T

STACK_DEPTH = 48
DEFAULT_CHUNK = 1 << 30   # effectively unchunked: wide calls win on TPU
STEPS_PER_CHECK = 4       # traversal steps between while-loop convergence checks


def _stack_set(stack, sptr, val):
    """stack[i, sptr[i]] = val[i] without scatter (one-hot select — scatters
    serialize on TPU, dense selects run at VPU speed)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 1)
    return jnp.where(cols == sptr[:, None], val[:, None].astype(stack.dtype), stack)


def _stack_get(stack, idx):
    """stack[i, idx[i]] without per-row gather."""
    cols = jax.lax.broadcasted_iota(jnp.int32, stack.shape, 1)
    sel = jnp.where(cols == idx[:, None], stack,
                    jnp.zeros((), stack.dtype))
    return jnp.sum(sel, axis=1)


@struct.dataclass
class DeviceBVH:
    nmin: jnp.ndarray    # [N,3]
    nmax: jnp.ndarray    # [N,3]
    left: jnp.ndarray    # [N] int32: interior→left child; leaf→first prim slot
    right: jnp.ndarray   # [N] int32: interior→right child; leaf→-1
    count: jnp.ndarray   # [N] int32: 0 interior, >0 leaf prim count
    prim: jnp.ndarray    # [T] int32 triangle ids, contiguous per leaf
    max_leaf: int = struct.field(pytree_node=False, default=4)


def build_device_bvh(v0, v1, v2, max_leaf: int = 4) -> DeviceBVH:
    from lighthouse2_tpu.bvh.builder import build_sah_bvh
    flat = build_sah_bvh(v0, v1, v2, max_leaf=max_leaf)
    return DeviceBVH(
        nmin=jnp.asarray(flat["nmin"]), nmax=jnp.asarray(flat["nmax"]),
        left=jnp.asarray(flat["left"]), right=jnp.asarray(flat["right"]),
        count=jnp.asarray(flat["count"]), prim=jnp.asarray(flat["prim"]),
        max_leaf=max_leaf,
    )


def _slab(o, inv_d, bmin, bmax, t_best):
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_best)
    return tn, hit


def _traverse_chunk(o, d, t_max, bvh: DeviceBVH, v0, e1, e2, anyhit: bool):
    """Lockstep traversal of one chunk of rays. Returns closest-hit tuple or
    occlusion mask (anyhit=True)."""
    r = o.shape[0]
    max_leaf = bvh.max_leaf
    d_safe = jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)
    inv_d = 1.0 / d_safe
    ar = jnp.arange(r)

    state = dict(
        node=jnp.zeros(r, jnp.int32),
        cur_t=jnp.zeros(r, jnp.float32),
        sptr=jnp.zeros(r, jnp.int32),
        stack=jnp.zeros((r, STACK_DEPTH), jnp.int32),
        tstack=jnp.zeros((r, STACK_DEPTH), jnp.float32),
        best_t=jnp.minimum(jnp.broadcast_to(t_max, (r,)).astype(jnp.float32), BIG_T),
        best_p=jnp.full(r, -1, jnp.int32),
        best_u=jnp.zeros(r, jnp.float32),
        best_v=jnp.zeros(r, jnp.float32),
        occ=jnp.zeros(r, bool),
        done=jnp.zeros(r, bool),
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

        first = bvh.left[node]
        best_t, best_p = s["best_t"], s["best_p"]
        best_u, best_v = s["best_u"], s["best_v"]
        occ = s["occ"]
        for k in range(max_leaf):
            slot = jnp.clip(first + k, 0, bvh.prim.shape[0] - 1)
            pid = bvh.prim[slot]
            mask = is_leaf & (k < cnt)
            t, u, v, h = intersect_tri(o, d, v0[pid], e1[pid], e2[pid],
                                       t_max=best_t)
            upd = mask & h & (t < best_t)
            best_t = jnp.where(upd, t, best_t)
            best_p = jnp.where(upd, pid, best_p)
            best_u = jnp.where(upd, u, best_u)
            best_v = jnp.where(upd, v, best_v)
            occ = occ | upd

        l = bvh.left[node]
        rt = bvh.right[node]
        tl, hl = _slab(o, inv_d, bvh.nmin[l], bvh.nmax[l], best_t)
        tr, hr = _slab(o, inv_d, bvh.nmin[rt], bvh.nmax[rt], best_t)
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
        # push far child (exclusive with pop this iteration); one-hot select,
        # no scatter
        push_slot = jnp.clip(sptr, 0, STACK_DEPTH - 1)
        stack = _stack_set(stack, push_slot,
                           jnp.where(both, fnode, _stack_get(stack, push_slot)))
        tstack = _stack_set(tstack, push_slot,
                            jnp.where(both, ft, _stack_get(tstack, push_slot)))
        sptr = sptr + both.astype(jnp.int32)

        if anyhit:
            # terminate occluded rays immediately (fire-and-forget shadow rays,
            # OPTIX_RAY_FLAG_TERMINATE_ON_FIRST_HIT analog, .optix.cu:137-149)
            newly_occluded = occ & alive
        else:
            newly_occluded = jnp.zeros_like(occ) & False

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
                    best_u=best_u, best_v=best_v, occ=occ, done=done)

    def body(s):
        # several steps per convergence check: the while cond is a global
        # reduction (device sync) — amortize it
        for _ in range(STEPS_PER_CHECK):
            s = step(s)
        return s

    out = jax.lax.while_loop(cond, body, state)
    if anyhit:
        return out["occ"]
    return out["best_t"], out["best_p"], out["best_u"], out["best_v"]


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
    unpack = jax.tree_util.tree_map(lambda x: x.reshape(-1, *x.shape[2:])[:n], res)
    return unpack


def bvh_intersect(o, d, bvh: DeviceBVH, v0, e1, e2,
                  t_max=BIG_T, chunk: int = DEFAULT_CHUNK):
    """Closest hit of [N] rays. Returns (t, prim, u, v); prim=-1 on miss.

    Non-differentiable (stop_gradient inside); pair with `refine_hit`.
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    v0 = jax.lax.stop_gradient(v0)
    e1 = jax.lax.stop_gradient(e1)
    e2 = jax.lax.stop_gradient(e2)
    fn = functools.partial(_run_closest, bvh=bvh, v0=v0, e1=e1, e2=e2)
    return _chunked(o, d, t_max, fn, chunk)


def _run_closest(o, d, t_max, bvh, v0, e1, e2):
    return _traverse_chunk(o, d, t_max, bvh, v0, e1, e2, anyhit=False)


def bvh_occluded(o, d, t_max, bvh: DeviceBVH, v0, e1, e2,
                 chunk: int = DEFAULT_CHUNK):
    """Any-hit occlusion of [N] rays before t_max. Returns bool [N]."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    fn = functools.partial(
        _run_anyhit, bvh=bvh,
        v0=jax.lax.stop_gradient(v0),
        e1=jax.lax.stop_gradient(e1),
        e2=jax.lax.stop_gradient(e2),
    )
    return _chunked(o, d, t_max, fn, chunk)


def _run_anyhit(o, d, t_max, bvh, v0, e1, e2):
    return _traverse_chunk(o, d, t_max, bvh, v0, e1, e2, anyhit=True)


def refine_hit(o, d, prim, v0, e1, e2):
    """Differentiably recompute (t,u,v) for a known hit primitive.

    Gradients flow from the hit point to ray origin/direction AND to the
    triangle vertices — the reparameterized-hit trick that replaces
    differentiating through discrete BVH traversal (SURVEY.md §7.3.3).
    """
    p = jnp.maximum(prim, 0)
    t, u, v, h = intersect_tri(o, d, v0[p], e1[p], e2[p],
                               t_min=jnp.float32(-BIG_T), t_max=BIG_T)
    valid = prim >= 0
    return (jnp.where(valid, t, BIG_T), jnp.where(valid, u, 0.0),
            jnp.where(valid, v, 0.0), valid & h)
