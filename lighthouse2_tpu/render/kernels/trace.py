"""Frustum-culled packet BVH traversal — the TPU intersection kernel (r5).

The reference's hot trace stage is an OptiX RTX launch (rendercore_optix7/
optix/.optix.cu:151-170); the CPU core traverses a BVH2 recursively per ray
with near-child-first ordering (RenderCore_Bart/bvh.cpp:258-302). Neither
maps to a TPU. The design evolved by measurement:

  round 3 — speculative packet traversal: one scalar node pointer per
  1024-ray block walking a skip-link DFS; every ray paid for the UNION of
  clusters any ray needed. Collapsed on 1000-cluster scenes.

  round 4 — scalar-core stack walk with a per-BLOCK conservative frustum
  (origin box x inverse-direction interval) + per-sub-packet masked MXU
  intersection. Redeemed the walk, but the block frustum mixes the bounds
  of 1024 lanes: measured 387 leaf visits/block at bounce 1 where the true
  per-128-lane-sub-packet union is 32.6 (STAGE_TIMES_r04.json), and the
  per-leaf lane-mask vector->scalar sync still sat on the critical path.

  round 5 (this file) — PER-SUB-PACKET WALKS: each 128-lane sub-packet
  traverses the top tree with its OWN frustum and explicit SMEM stack,
  near-child-first, sequentially s=0..7 per block:

  - the sub frustum is pre-flipped into sign-uniform coordinates outside
    the kernel (_sub_frustums): per axis, if every live lane's direction
    shares a sign, the axis is mirrored so directions are positive and the
    slab test needs only ~12 scalar ops/axis (2 flip-muls, min/max, 2 subs,
    2 muls, 2 selects) — versus the 8-product interval test a mixed-sign
    interval requires. A mixed-sign axis (rare after the octant/dir-morton
    sorts; a few tile subs for primaries) degrades to "no pruning on that
    axis" (f=0 rows make tn=-inf, tf=+inf), never to incorrectness;
  - at each visited leaf the owning sub-packet's MXU intersection runs
    UNCONDITIONALLY — no per-leaf lane-slab mask, no vector->scalar bits
    transfer in the loop body at all (the round-4 measured latency bound).
    The only vector->scalar traffic is the per-sub best-t bound refreshed
    through an SMEM cell every BM_PERIOD leaves, off the critical path;
  - leaves stream through the same RING-deep bmat DMA pipeline, shared
    across the 8 walks (the ring never drains at a sub boundary: the fill
    loop of sub s+1 starts while sub s's tail is still intersecting);
  - per-sub best-t bounds are tighter than the block bound ever was: a
    sub-packet that found close hits stops descending far subtrees even
    while its siblings keep walking.

  - leaves are 128-triangle CLUSTER tiles in plane+barycentric form
    (clusters.py `bmat`): one MXU dot_general([8,768],[8,128]) per
    (leaf, sub-packet) yields all six linear forms for every (ray,
    triangle) pair; a short dense VPU epilogue selects hits;
  - the winning triangle's 72-row shading PAYLOAD (geometry host-baked,
    material rows device-baked per pass) is extracted AFTER traversal by a
    one-hot matmul per distinct winning tile, so the shade stage needs
    ZERO per-primitive gathers;
  - per-block visit counters are written to payload rows PAY_STAT_* — the
    ColorDebugBVH analog (raytracer.cpp:102-120).

Ray-order contract (render/wavefront.py): primary rays arrive in 32x32
pixel-tile order; bounce rays are sorted by coarse-origin-cell +
direction-morton (ray_sort_perm key="dir"); shadow batches are
octant-sorted. The sorts matter twice now: they shrink the per-sub union
AND they make direction signs uniform so the cheap flipped slab test
prunes (a sign-mixed axis is a no-op axis).

Differentiability: traversal is discrete and every kernel output is
gradient-stopped; gradients re-enter through `reattach_rows`
(render/fetch.py) whose forward returns the kernel payload for free and
whose backward scatter-adds into the live scene arrays.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lighthouse2_tpu.bvh.clusters import (
    ClusterBVH, CLUSTER_LANES, BMAT_COLS,
    PAY_PRIM, PAY_MAT, PAY_VALID, PAY_GEO_ROWS, PAY_MAT_ROWS, PAY_ROWS,
)

BLOCK = 1024           # rays per packet
SUB = 128              # sub-packet lanes (vreg lane width; one walk each)
NSUB = BLOCK // SUB
CHUNK_BLOCKS = 32      # ray blocks per pallas launch (VMEM budget)
MT_EPS = 1e-6          # t epsilon (bvh/traverse.py parity)
BIG = 1e30
_PREC = jax.lax.Precision.HIGHEST   # f32-accurate MXU (bf16x3 passes)

# per-block debug counters, written into the payload's pad rows after the
# walk (consumed by render/probe.py bvh_heatmap and tools/trace_stats.py)
PAY_STAT_VISITS = PAY_GEO_ROWS - 2   # 38: leaf-tile visits (sum over subs)
PAY_STAT_SUBS = PAY_GEO_ROWS - 1     # 39: sub-packet MXU intersections

# per-sub-packet frustum row layout ([FS_ROWS, n_blocks*NSUB] f32
# scalar-prefetch, built by _sub_frustums; index = block*NSUB + sub)
FS_F, FS_OMIN, FS_OMAX, FS_IMIN, FS_IMAX = 0, 3, 6, 9, 12
FS_TLIM, FS_LIVE = 15, 16
FS_ROWS = 17


def _sub_forms(bscratch_buf, xs):
    """MXU intersection of one 128-triangle tile against sub-packet s:
    six linear forms for every (triangle, ray) pair, [6][SUB, SUB].

    `xs` must be a VALUE slice of the block tile (X[:, s*128:(s+1)*128]) —
    feeding a dynamically-sliced x_ref here on top of the dynamic scratch
    buffer index forced a per-call operand copy (~560 cycles measured, vs
    ~50 with one dynamic operand)."""
    out = jax.lax.dot_general(bscratch_buf[:], xs, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=_PREC)               # [768, 128]
    L = CLUSTER_LANES
    return [out[k * L:(k + 1) * L] for k in range(6)]


def _sub_hits(forms, limit_row):
    """VPU epilogue: candidate t per (tri, ray) in [SUB,SUB] and the best
    candidate per ray [1,SUB], pruned against limit_row [1,SUB]."""
    tn_, dn, ou, du, ov, dv = forms
    t = tn_ / dn                      # padding: -1/0 = -inf, never passes
    u = ou + t * du
    v = ov + t * dv
    ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > MT_EPS) & (t < limit_row))
    tm = jnp.where(ok, t, BIG)
    tb = jnp.min(tm, axis=0, keepdims=True)
    return tm, tb


RING = 4               # bmat-tile DMA pipeline depth
BM_PERIOD = 8          # leaves between scalar best-bound refreshes


def _hoist_sub_frustum(fs_ref, base):
    """Read sub-packet `base`'s 16 frustum scalars ONCE per walk (a per-node
    SMEM re-read measured ~40% of the round-4 walk)."""
    f = tuple(fs_ref[FS_F + a, base] for a in range(3))
    om = tuple(fs_ref[FS_OMIN + a, base] for a in range(3))
    ox = tuple(fs_ref[FS_OMAX + a, base] for a in range(3))
    im = tuple(fs_ref[FS_IMIN + a, base] for a in range(3))
    ix = tuple(fs_ref[FS_IMAX + a, base] for a in range(3))
    tl0 = fs_ref[FS_TLIM, base]
    # near-child-by-direction-sign bits (the reference's ordered traversal,
    # bvh.cpp:258-302): flipped axes are positive by construction, so the
    # sign of f IS the direction sign
    nl_bits = ((f[0] >= 0.0).astype(jnp.int32)
               | ((f[1] >= 0.0).astype(jnp.int32) << 1)
               | ((f[2] >= 0.0).astype(jnp.int32) << 2))
    return f, om, ox, im, ix, tl0, nl_bits


def _make_sub_walk(boxes_ref, meta_ref, frs, stack):
    """Per-sub-packet scalar walk: sign-uniform conservative slab test +
    near-child-first explicit stack. Returns next_leaf(sp, tlim) ->
    (sp', leaf id or -1)."""
    f, om, ox, im, ix, _, nl_bits = frs

    def sub_hit(nd, tlim):
        # flipped-coordinate slab: all live directions are positive along
        # every f=+-1 axis, so the conservative entry/exit bounds need one
        # data-dependent select each. f=0 axes (mixed signs / axis-parallel)
        # auto-degrade to tn=-inf / tf=+inf via the +-BIG frustum rows.
        tn = jnp.float32(0.0)
        tf = jnp.float32(BIG)
        for a in range(3):
            fb1 = f[a] * boxes_ref[a, nd]
            fb2 = f[a] * boxes_ref[3 + a, nd]
            bmn = jnp.minimum(fb1, fb2)
            bmx = jnp.maximum(fb1, fb2)
            u = bmn - ox[a]                    # nearest entry distance
            v = bmx - om[a]                    # farthest exit distance
            tn = jnp.maximum(tn, jnp.where(u >= 0.0, u * im[a], u * ix[a]))
            tf = jnp.minimum(tf, jnp.where(v >= 0.0, v * ix[a], v * im[a]))
        return (tf >= tn) & (tn < tlim)

    def next_leaf(sp, tlim):
        def cond(c):
            sp_, leaf = c
            return (leaf < 0) & (sp_ > 0)

        def body(c):
            sp_, _ = c
            nd = stack[sp_ - 1]
            sp_ = sp_ - 1
            hit = sub_hit(nd, tlim)
            is_leaf = meta_ref[1, nd] >= 0
            leaf = jnp.where(hit & is_leaf, nd, -1)
            push = hit & ~is_leaf

            @pl.when(push)
            def _():
                right = meta_ref[2, nd]
                axis = meta_ref[3, nd]
                near_left = ((nl_bits >> axis) & 1) != 0
                stack[sp_] = jnp.where(near_left, right, nd + 1)      # far
                stack[sp_ + 1] = jnp.where(near_left, nd + 1, right)  # near

            return jnp.where(push, sp_ + 2, sp_), leaf

        return jax.lax.while_loop(cond, body, (sp, jnp.int32(-1)))

    return next_leaf


def _make_closest_kernel(n_nodes: int, tiles_per_cluster: int, n_blocks: int,
                         ablate: str = ""):
    """Closest-hit kernel, two phases per block:

    1. TRAVERSAL — 8 sequential per-sub-packet walks sharing one RING-deep
       bmat DMA pipeline. Each visited leaf runs ONE unconditional MXU
       intersection for its owning sub-packet and records (best t, winner
       code = tile*128 + lane) per ray — a pure vector stream with zero
       vector->scalar syncs in the loop body.
    2. EXTRACTION — loop over the DISTINCT winning tiles (found by repeated
       max over the code map): stream each tile's 72-row payload once
       (double-buffered) and scatter it to that tile's winner lanes with a
       one-hot matmul per participating sub-packet.
    """
    tpc = tiles_per_cluster

    def kernel(boxes_ref, meta_ref, fs_ref,   # scalar-prefetch (SMEM)
               bmat_ref, pay_ref,             # ANY (HBM) tile stores
               x_ref,                         # [8, Nc] rays
               pay_out,                       # [PAY_ROWS, Nc]
               bscratch, pscratch, best_ref, code_ref, ring, stack,
               cnt_ref, mf_ref, bsem, psem):

        def bdma(t_idx, buf):
            return pltpu.make_async_copy(bmat_ref.at[t_idx],
                                         bscratch.at[buf], bsem.at[buf])

        def pdma(t_idx, buf):
            return pltpu.make_async_copy(pay_ref.at[t_idx],
                                         pscratch.at[buf], psem.at[buf])

        def trace_block(b, _):
            c0 = pl.multiple_of(b * BLOCK, BLOCK)
            sl = (slice(None), pl.ds(c0, BLOCK))
            rows = jax.lax.broadcasted_iota(jnp.int32, (PAY_ROWS, BLOCK), 0)
            pay_out[sl] = jnp.where(rows == PAY_PRIM, -1.0, 0.0)
            base0 = b * NSUB
            nlive = jnp.float32(0.0)
            for s in range(NSUB):
                nlive = nlive + fs_ref[FS_LIVE, base0 + s]

            @pl.when(nlive > 0.0)
            def _():
                X = x_ref[sl]                                # [8, 1024]
                best_ref[:, :] = X[7:8].reshape(NSUB, SUB)   # per-lane tmax
                code_ref[:, :] = jnp.full((NSUB, SUB), -1.0, jnp.float32)
                cnt_ref[0] = 0                               # sub-intersects
                cnt_ref[1] = 0                               # leaf visits

                xsub = [X[:, s * SUB:(s + 1) * SUB] for s in range(NSUB)]
                pow2 = jnp.left_shift(
                    jnp.int32(1),
                    jax.lax.broadcasted_iota(jnp.int32, (NSUB, 1), 0))

                def sub_body(s, t_idx, buf):
                    """One sub-packet intersection + UNCONDITIONAL winner
                    recording — pure vector stream, zero vector->scalar
                    syncs, so the scalar core runs ahead and the VPU/MXU
                    pipeline across leaves."""
                    forms = _sub_forms(bscratch.at[buf], xsub[s])
                    bs = best_ref[s:s + 1, :]
                    tm, tb = _sub_hits(forms, bs)
                    upd = tb < bs
                    ri = jax.lax.broadcasted_iota(
                        jnp.int32, (CLUSTER_LANES, SUB), 0)
                    win = jnp.min(jnp.where(tm <= tb, ri, CLUSTER_LANES),
                                  axis=0, keepdims=True)
                    code = (t_idx * SUB + win).astype(jnp.float32)
                    code_ref[s:s + 1, :] = jnp.where(
                        upd, code, code_ref[s:s + 1, :])
                    best_ref[s:s + 1, :] = jnp.where(upd, tb, bs)
                    cnt_ref[0] = cnt_ref[0] + 1

                # ---- phase 1: 8 per-sub walks, one shared DMA ring ------
                for s in range(NSUB):
                    @pl.when(fs_ref[FS_LIVE, base0 + s] > 0.0)
                    def _(s=s):
                        frs = _hoist_sub_frustum(fs_ref, base0 + s)
                        next_leaf = _make_sub_walk(boxes_ref, meta_ref,
                                                   frs, stack)
                        stack[0] = jnp.int32(0)
                        mf_ref[0] = frs[5]                   # sub tlim

                        def fill_cond(c):
                            sp, head, tail, wd = c
                            return (wd == 0) & (head - tail < RING)

                        def fill_body(c):
                            sp, head, tail, wd = c
                            sp, l = next_leaf(sp, mf_ref[0])

                            @pl.when(l >= 0)
                            def _():
                                ring[head % RING] = l
                                bdma(jnp.maximum(meta_ref[1, l], 0) * tpc,
                                     head % RING).start()

                            return (sp, jnp.where(l >= 0, head + 1, head),
                                    tail, jnp.where(l < 0, 1, wd))

                        def outer_cond(c):
                            sp, head, tail, wd = c
                            return (head > tail) | (wd == 0)

                        def outer_body(c):
                            c = jax.lax.while_loop(fill_cond, fill_body, c)
                            sp, head, tail, wd = c
                            nd = jnp.clip(ring[tail % RING], 0, n_nodes - 1)
                            t0i = jnp.maximum(meta_ref[1, nd], 0) * tpc
                            buf = tail % RING
                            bdma(t0i, buf).wait()
                            if ablate != "walk":   # dev attribution only
                                sub_body(s, t0i, buf)
                                if tpc > 1:        # fat clusters: extra tiles
                                    def tile_body(j, _):
                                        bdma(t0i + j, buf).start()
                                        bdma(t0i + j, buf).wait()
                                        sub_body(s, t0i + j, buf)
                                        return 0
                                    jax.lax.fori_loop(1, tpc, tile_body, 0)
                            tail = tail + 1
                            # refresh the walk's best-t bound periodically
                            # through an SMEM cell — an unconditional
                            # jnp.max would put a vector->scalar stall at
                            # the end of EVERY leaf's dependency chain
                            @pl.when(tail % BM_PERIOD == 0)
                            def _():
                                mf_ref[0] = jnp.max(best_ref[s:s + 1, :])

                            return (sp, head, tail, wd)

                        _, _, tail, _ = jax.lax.while_loop(
                            outer_cond, outer_body,
                            (jnp.int32(1), jnp.int32(0), jnp.int32(0),
                             jnp.int32(0)))
                        cnt_ref[1] = cnt_ref[1] + tail

                # ---- phase 2: payload extraction per winning tile ------
                # static double-buffer phases (2 tiles per loop iteration;
                # a dynamic pscratch.at[phase] on top of the dynamic output
                # slice costs a per-call operand copy — same measurement as
                # _sub_forms); the next-max code threads through SMEM so
                # the second half-step can be branch-guarded
                code_snap = code_ref[:, :]                    # [NSUB, SUB]
                m0 = jnp.max(code_snap)
                if ablate in ("walk", "noextract"):
                    m0 = jnp.float32(-1.0)        # dev attribution only

                def tile_of(m):
                    return jnp.floor_divide(m, float(SUB)).astype(jnp.int32)

                @pl.when(m0 >= 0.0)
                def _():
                    pdma(tile_of(m0), 0).start()

                def extract_step(m, phase):
                    """Extract tile(m) from pscratch[phase] (static phase);
                    prefetches the next winning tile into the other buffer.
                    Returns the next code max. Sub-packet participation is
                    one packed bitmask transfer (not 8 any() syncs)."""
                    tile = tile_of(m)
                    lo = (tile * SUB).astype(jnp.float32)
                    cur8 = ((code_ref[:, :] >= lo)
                            & (code_ref[:, :] < lo + float(SUB)))
                    code_ref[:, :] = jnp.where(cur8, -1.0, code_ref[:, :])
                    m2 = jnp.max(code_ref[:, :])
                    bits = jnp.sum(jnp.where(
                        jnp.any(cur8, axis=1, keepdims=True), pow2, 0))

                    @pl.when(m2 >= 0.0)
                    def _():
                        pdma(tile_of(m2), 1 - phase).start()

                    pdma(tile, phase).wait()
                    for s in range(NSUB):
                        @pl.when(((bits >> s) & 1) != 0)
                        def _(s=s):
                            srow = cur8[s:s + 1, :]
                            lane = (code_snap[s:s + 1, :] - lo).astype(
                                jnp.int32)                      # [1, SUB]
                            ri = jax.lax.broadcasted_iota(
                                jnp.int32, (CLUSTER_LANES, SUB), 0)
                            S = ((ri == lane) & srow).astype(jnp.float32)
                            p_new = jax.lax.dot_general(
                                pscratch.at[phase][:], S,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=_PREC)       # [PAY_ROWS, SUB]
                            psl = (slice(None), pl.ds(c0 + s * SUB, SUB))
                            pay_out[psl] = jnp.where(srow, p_new,
                                                     pay_out[psl])
                    return m2

                def x_cond(c):
                    return c[0] >= 0.0

                def x_body(c):
                    m, nt = c
                    m2 = extract_step(m, 0)
                    mf_ref[0] = m2

                    @pl.when(m2 >= 0.0)
                    def _():
                        mf_ref[0] = extract_step(m2, 1)

                    return (mf_ref[0], nt + 2)

                _, n_tiles = jax.lax.while_loop(
                    x_cond, x_body, (m0, jnp.int32(0)))

                # per-lane best t -> PAY_VALID row; per-block debug counters
                pay_out[(pl.ds(PAY_VALID, 1), pl.ds(c0, BLOCK))] = \
                    best_ref[:, :].reshape(1, BLOCK)
                pay_out[(pl.ds(PAY_STAT_VISITS, 1), pl.ds(c0, BLOCK))] = \
                    jnp.full((1, BLOCK),
                             (cnt_ref[1] * tpc).astype(jnp.float32))
                pay_out[(pl.ds(PAY_STAT_SUBS, 1), pl.ds(c0, BLOCK))] = \
                    jnp.full((1, BLOCK), cnt_ref[0].astype(jnp.float32))
            return 0

        jax.lax.fori_loop(0, n_blocks, trace_block, 0)
    return kernel


def _make_anyhit_kernel(n_nodes: int, tiles_per_cluster: int, n_blocks: int):
    """Any-hit (occlusion) kernel: same 8 per-sub-packet walks; each leaf
    runs the owning sub's MXU test and ORs into the occlusion row. The
    walk's bound shrinks to the farthest still-unoccluded lane of the SUB
    (TERMINATE_ON_FIRST_HIT analog, refreshed through SMEM every BM_PERIOD
    leaves) — a fully occluded sub-packet prunes every remaining node and
    drains its stack in a few scalar pops."""
    tpc = tiles_per_cluster

    def kernel(boxes_ref, meta_ref, fs_ref, bmat_ref, x_ref, occ_out,
               bscratch, occ_ref, ring, stack, om_ref, bsem):

        def bdma(t_idx, buf):
            return pltpu.make_async_copy(bmat_ref.at[t_idx],
                                         bscratch.at[buf], bsem.at[buf])

        def trace_block(b, _):
            c0 = pl.multiple_of(b * BLOCK, BLOCK)
            sl = (slice(None), pl.ds(c0, BLOCK))
            occ_out[(pl.ds(0, 1), pl.ds(c0, BLOCK))] = jnp.zeros(
                (1, BLOCK), jnp.float32)
            base0 = b * NSUB
            nlive = jnp.float32(0.0)
            for s in range(NSUB):
                nlive = nlive + fs_ref[FS_LIVE, base0 + s]

            @pl.when(nlive > 0.0)
            def _():
                X = x_ref[sl]
                tmax8 = X[7:8].reshape(NSUB, SUB)
                # occluded-or-dead as f32 0/1 (i1 vectors fail Mosaic
                # legalization in loop-carried positions)
                occ_ref[:, :] = (tmax8 <= 0.0).astype(jnp.float32)
                xsub = [X[:, s * SUB:(s + 1) * SUB] for s in range(NSUB)]

                for s in range(NSUB):
                    @pl.when(fs_ref[FS_LIVE, base0 + s] > 0.0)
                    def _(s=s):
                        frs = _hoist_sub_frustum(fs_ref, base0 + s)
                        next_leaf = _make_sub_walk(boxes_ref, meta_ref,
                                                   frs, stack)
                        stack[0] = jnp.int32(0)
                        om_ref[0] = frs[5]                   # sub tlim
                        ts = tmax8[s:s + 1, :]

                        def fill_cond(c):
                            sp, head, tail, wd = c
                            return (wd == 0) & (head - tail < RING)

                        def fill_body(c):
                            sp, head, tail, wd = c
                            sp, l = next_leaf(sp, om_ref[0])

                            @pl.when(l >= 0)
                            def _():
                                ring[head % RING] = l
                                bdma(jnp.maximum(meta_ref[1, l], 0) * tpc,
                                     head % RING).start()

                            return (sp, jnp.where(l >= 0, head + 1, head),
                                    tail, jnp.where(l < 0, 1, wd))

                        def outer_cond(c):
                            sp, head, tail, wd = c
                            return (head > tail) | (wd == 0)

                        def intersect(t_idx, buf):
                            forms = _sub_forms(bscratch.at[buf], xsub[s])
                            live_row = occ_ref[s:s + 1, :] < 0.5
                            _, tb = _sub_hits(
                                forms, jnp.where(live_row, ts, 0.0))
                            occ_ref[s:s + 1, :] = jnp.maximum(
                                occ_ref[s:s + 1, :],
                                (tb < ts).astype(jnp.float32))

                        def outer_body(c):
                            c = jax.lax.while_loop(fill_cond, fill_body, c)
                            sp, head, tail, wd = c
                            nd = jnp.clip(ring[tail % RING], 0, n_nodes - 1)
                            t0i = jnp.maximum(meta_ref[1, nd], 0) * tpc
                            buf = tail % RING
                            bdma(t0i, buf).wait()
                            intersect(t0i, buf)
                            if tpc > 1:
                                def tile_body(j, _):
                                    bdma(t0i + j, buf).start()
                                    bdma(t0i + j, buf).wait()
                                    intersect(t0i + j, buf)
                                    return 0
                                jax.lax.fori_loop(1, tpc, tile_body, 0)
                            tail = tail + 1

                            @pl.when(tail % BM_PERIOD == 0)
                            def _():
                                om_ref[0] = jnp.max(jnp.where(
                                    occ_ref[s:s + 1, :] < 0.5, ts, 0.0))

                            return (sp, head, tail, wd)

                        jax.lax.while_loop(
                            outer_cond, outer_body,
                            (jnp.int32(1), jnp.int32(0), jnp.int32(0),
                             jnp.int32(0)))

                occ_out[(pl.ds(0, 1), pl.ds(c0, BLOCK))] = jnp.where(
                    tmax8 > 0.0, occ_ref[:, :], 0.0).reshape(1, BLOCK)
            return 0

        jax.lax.fori_loop(0, n_blocks, trace_block, 0)
    return kernel


def _sub_frustums(x, n_blocks):
    """Per-SUB-PACKET conservative frustum rows [FS_ROWS, n_blocks*NSUB] in
    sign-uniform FLIPPED coordinates for the kernel's scalar walks.

    Per axis a and 128-lane sub-packet:
      f    = +1 if every live lane's direction is positive, -1 if every one
             is negative, 0 if mixed (or the sub is dead) — the kernel
             mirrors the node box by f so directions are always positive;
      omin/omax = bounds of the FLIPPED origins (f*o) over live lanes;
      imin/imax = bounds of |1/d| over live lanes;
      f=0 axes carry (omin,omax,imin,imax)=(-BIG,+BIG,0,BIG) which make the
      slab test tn=-inf, tf=+inf — conservatively no pruning on that axis.
    Row FS_TLIM = max live tmax (walk bound seed), FS_LIVE = any live lane.
    Dead lanes (tmax<=0) are excluded from every bound."""
    xs = x.reshape(8, n_blocks, NSUB, SUB)
    o = xs[0:3]
    d = xs[3:6]
    tmax = xs[7]
    live = tmax > 0.0                                  # [nb, NSUB, SUB]
    lv3 = live[None]
    mag = jnp.maximum(jnp.abs(d), 1e-18)
    inv = jnp.where(d < 0, -1.0 / mag, 1.0 / mag)
    has_pos = jnp.any(lv3 & (inv > 0), -1)             # [3, nb, NSUB]
    has_neg = jnp.any(lv3 & (inv < 0), -1)
    f = jnp.where(has_pos & ~has_neg, 1.0,
                  jnp.where(has_neg & ~has_pos, -1.0, 0.0))
    mixed = f == 0.0
    fo = f[..., None] * o                              # flipped origins
    omin = jnp.min(jnp.where(lv3, fo, BIG), -1)
    omax = jnp.max(jnp.where(lv3, fo, -BIG), -1)
    omin = jnp.where(mixed, -BIG, omin)
    omax = jnp.where(mixed, BIG, omax)
    ainv = jnp.abs(inv)
    imin = jnp.min(jnp.where(lv3, ainv, BIG), -1)
    imax = jnp.max(jnp.where(lv3, ainv, -BIG), -1)
    imin = jnp.where(mixed, 0.0, imin)
    imax = jnp.where(mixed, BIG, imax)
    tlim = jnp.max(jnp.where(live, tmax, 0.0), -1)     # [nb, NSUB]
    lvf = jnp.any(live, -1).astype(jnp.float32)
    rows = jnp.concatenate(
        [f, omin, omax, imin, imax, tlim[None], lvf[None]], axis=0)
    return rows.reshape(FS_ROWS, n_blocks * NSUB)


@functools.partial(jax.jit,
                   static_argnames=("n_nodes", "tiles_per_cluster", "anyhit",
                                    "stack_cap", "interpret", "ablate"))
def _trace_chunk(boxes, meta, bmat, pay, x,
                 n_nodes: int, tiles_per_cluster: int, anyhit: bool,
                 stack_cap: int = 128, interpret: bool = False,
                 ablate: str = ""):
    """One pallas launch over an [8, Nc] ray tile. Returns the [PAY_ROWS, Nc]
    payload (closest; row PAY_VALID = best t) or [1, Nc] occlusion (anyhit)."""
    nc = x.shape[1]
    n_blocks = nc // BLOCK
    fs = _sub_frustums(x, n_blocks)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    if anyhit:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), vm()],
            out_specs=[vm()],
            scratch_shapes=[
                pltpu.VMEM((RING, 8, BMAT_COLS), jnp.float32),
                pltpu.VMEM((NSUB, SUB), jnp.float32),
                pltpu.SMEM((RING,), jnp.int32),              # leaf ring
                pltpu.SMEM((stack_cap,), jnp.int32),
                pltpu.SMEM((1,), jnp.float32),               # occ bound
                pltpu.SemaphoreType.DMA((RING,)),
            ],
        )
        kernel = _make_anyhit_kernel(n_nodes, tiles_per_cluster, n_blocks)
        out_shape = [jax.ShapeDtypeStruct((1, nc), jnp.float32)]
        return pl.pallas_call(kernel, grid_spec=grid_spec,
                              out_shape=out_shape,
                              interpret=interpret)(boxes, meta, fs, bmat,
                                                   x)[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY), vm()],
        out_specs=[vm()],
        scratch_shapes=[
            pltpu.VMEM((RING, 8, BMAT_COLS), jnp.float32),   # bmat ring
            pltpu.VMEM((2, PAY_ROWS, CLUSTER_LANES), jnp.float32),
            pltpu.VMEM((NSUB, SUB), jnp.float32),            # best t
            pltpu.VMEM((NSUB, SUB), jnp.float32),            # winner code
            pltpu.SMEM((RING,), jnp.int32),                  # leaf ring
            pltpu.SMEM((stack_cap,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),                     # sub/visit ctrs
            pltpu.SMEM((1,), jnp.float32),                   # walk/x bound
            pltpu.SemaphoreType.DMA((RING,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = _make_closest_kernel(n_nodes, tiles_per_cluster, n_blocks,
                                  ablate=ablate)
    out_shape = [jax.ShapeDtypeStruct((PAY_ROWS, nc), jnp.float32)]
    return pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape,
                          interpret=interpret)(boxes, meta, fs, bmat, pay,
                                               x)[0]


def bake_material_rows(cbvh: ClusterBVH, mpack22):
    """Device-side bake of the material payload rows from the LIVE material
    pack ([23, M], render/shading.py material_pack) — one triangle-count-
    sized gather per pass, so material edits / optimizer steps never stale
    the tiles (the analog of the per-frame SetMaterials upload,
    rendersystem.cpp:83). Returns [C*TPC, PAY_MAT_ROWS, 128] f32."""
    ct = cbvh.pgeo.shape[0]
    valid = cbvh.pgeo[:, PAY_VALID, :] > 0.0
    ids = jnp.where(valid, cbvh.pgeo[:, PAY_MAT, :], 0.0).astype(jnp.int32)
    rows = mpack22[:, ids.reshape(-1)]                    # [K, CT*128]
    rows = rows.reshape(mpack22.shape[0], ct, CLUSTER_LANES)
    rows = jnp.swapaxes(rows, 0, 1)                       # [CT, 22, 128]
    pad = PAY_MAT_ROWS - mpack22.shape[0]
    return jnp.pad(rows, ((0, 0), (0, pad), (0, 0)))


def _stretch3(b, nbits):
    out = jnp.zeros_like(b)
    for i in range(nbits):
        out = out | (((b >> jnp.uint32(i)) & jnp.uint32(1))
                     << jnp.uint32(3 * i))
    return out


def _morton3(q, nbits):
    return (_stretch3(q[:, 0], nbits) | (_stretch3(q[:, 1], nbits) << 1)
            | (_stretch3(q[:, 2], nbits) << 2))


def ray_sort_perm(o, d, t_max, bvh: ClusterBVH, key: str = "dir"):
    """Coherence permutation for one wavefront; DEAD lanes (t_max<=0) sort
    to the END (all-dead tail blocks are skipped by the kernels' live
    early-out — the stream-compaction analog, pathtracer.h:233).

    key="dir":  coarse origin cell (2 bits/axis) then direction morton
                (5 bits/axis) — for BOUNCE rays, whose origins are already
                tile-coherent but whose directions are not (measured on
                bathroom bounce1: block union 132 vs 227 unsorted,
                tools/visit_histogram.py).
    key="origin_octant": fine origin morton (4 bits/axis) then direction
                octant — for rays whose origins spread (shadow batches
                toward many lights).
    Both keys also make per-sub-packet direction SIGNS uniform, which the
    r5 walk's flipped slab test requires for pruning (a mixed-sign axis
    prunes nothing).
    Returns (perm, inv_perm) int32 [N]."""
    bmin = bvh.boxes[0:3, 0]                     # root node box
    bmax = bvh.boxes[3:6, 0]
    extent = jnp.maximum(bmax - bmin, 1e-6)
    if key == "dir":
        q = jnp.clip(((o - bmin) / extent) * 3.999, 0.0, 3.0
                     ).astype(jnp.uint32)
        ocell = _morton3(q, 2)                   # 6 bits
        dq = jnp.clip((d * 0.5 + 0.5) * 31.999, 0.0, 31.0
                      ).astype(jnp.uint32)
        dmort = _morton3(dq, 5)                  # 15 bits
        k = (ocell << jnp.uint32(15)) | dmort
    else:
        q = jnp.clip(((o - bmin) / extent) * 15.999, 0.0, 15.0
                     ).astype(jnp.uint32)
        morton = _morton3(q, 4)                  # 12 bits
        octant = ((d[:, 0] < 0).astype(jnp.uint32)
                  | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
                  | ((d[:, 2] < 0).astype(jnp.uint32) << 2))
        k = (morton << jnp.uint32(3)) | octant
    k = jnp.where(t_max > 0.0, k, jnp.uint32(0x7FFFFFFF))
    perm = jnp.argsort(k).astype(jnp.int32)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=jnp.int32))
    return perm, inv


def prepare_pay_tiles(bvh: ClusterBVH, paym):
    """Concatenate the host-baked geometry payload with the device-baked
    material rows ONCE per pass — the bounce loop then reuses the buffer
    (bake + concat were measured at ~12 ms/pass when re-emitted per bounce,
    STAGE_TIMES_r03.json)."""
    if paym is None:
        paym = jnp.zeros((bvh.pgeo.shape[0], PAY_MAT_ROWS, CLUSTER_LANES),
                         jnp.float32)
    return jnp.concatenate(
        [jax.lax.stop_gradient(bvh.pgeo), jax.lax.stop_gradient(paym)],
        axis=1)                                            # [CT, 72, 128]


def trace_cluster_bvh(o, d, bvh: ClusterBVH, t_max, anyhit: bool = False,
                      paym=None, pay_tiles=None, interpret: bool = False,
                      perm=None, inv=None, ablate: str = ""):
    """Closest-hit (or any-hit) of [N,3] rays against a ClusterBVH.

    Closest: returns (t [N], payload [PAY_ROWS, N]) — prim = payload[PAY_PRIM]
    (-1 on miss), shading attributes in the remaining rows (clusters.py PAY_*;
    material rows filled iff `paym` from bake_material_rows / `pay_tiles`
    from prepare_pay_tiles is given).
    Anyhit: returns occluded bool [N].
    Non-differentiable — reattach gradients via render/fetch.reattach_rows."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    t_max = jax.lax.stop_gradient(t_max)
    bvh = jax.tree_util.tree_map(jax.lax.stop_gradient, bvh)
    n = o.shape[0]
    chunk = min(CHUNK_BLOCKS, -(-n // BLOCK)) * BLOCK
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    stack_cap = max(64, 2 * (bvh.max_depth + 2))

    x = jnp.stack([o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                   jnp.ones_like(tmax), tmax], 0)          # [8, N]
    if perm is not None:
        # coherence permutation applied component-major (minor-axis gather —
        # the fast TPU pattern; a row-major o[perm] gather measured ~30x
        # slower); outputs are un-permuted the same way below
        x = x[:, perm]
    # padded lanes carry tmax=0 -> never hit, terminate instantly
    x = jnp.pad(x, ((0, 0), (0, pad)))
    x = x.reshape(8, n_chunks, chunk).swapaxes(0, 1)       # [nc, 8, chunk]

    if anyhit:
        fn = functools.partial(
            _trace_chunk, bvh.boxes, bvh.meta, bvh.bmat, None,
            n_nodes=bvh.n_nodes, tiles_per_cluster=bvh.tiles_per_cluster,
            anyhit=True, stack_cap=stack_cap, interpret=interpret)
        if n_chunks == 1:
            occ = fn(x[0])
        else:
            occ = jax.lax.map(fn, x)
        occ = occ.reshape(-1)[:n]
        if inv is not None:
            occ = occ[inv]
        return occ > 0.5

    if pay_tiles is None:
        pay_tiles = prepare_pay_tiles(bvh, paym)
    fn = functools.partial(
        _trace_chunk, bvh.boxes, bvh.meta, bvh.bmat, pay_tiles,
        n_nodes=bvh.n_nodes, tiles_per_cluster=bvh.tiles_per_cluster,
        anyhit=False, stack_cap=stack_cap, interpret=interpret,
        ablate=ablate)
    if n_chunks == 1:
        payload = fn(x[0])
    else:
        payload = jax.lax.map(fn, x)
        payload = jnp.swapaxes(payload, 0, 1).reshape(PAY_ROWS, -1)
    payload = payload[:, :n]
    if inv is not None:
        payload = payload[:, inv]
    t = payload[PAY_VALID]               # best t rides in the VALID row slot
    prim = payload[PAY_PRIM]
    hit = prim >= 0.0
    t = jnp.where(hit, t, jnp.broadcast_to(tmax, t.shape))
    return t, payload
