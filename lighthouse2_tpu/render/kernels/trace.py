"""Frustum-culled packet BVH traversal — the TPU intersection kernel (round 4).

The reference's hot trace stage is an OptiX RTX launch (rendercore_optix7/
optix/.optix.cu:151-170); the CPU core traverses a BVH2 recursively per ray
with near-child-first ordering (RenderCore_Bart/bvh.cpp:258-302). Neither
maps to a TPU. Round 3 used speculative packet traversal: one scalar node
pointer per 1024-ray block walking a skip-link DFS, every ray paying for the
UNION of clusters any ray needed. That collapsed on 1000-cluster scenes
(bathroom: blocks visited ~250 of 1083 clusters; 26x slower than cornell).
Round-4 redesign — work now scales with per-SUB-PACKET needs, not the
block union, and the walk itself is off the vector units:

  - the top tree is walked per block by the SCALAR core with an explicit
    SMEM stack, near-child-first (split axis x direction sign, like the
    reference's ordered Traverse) so closest hits are found early and a
    scalar best_max prunes far subtrees;
  - node culling is a CONSERVATIVE INTERVAL slab test of the block's ray
    frustum (origin box x inverse-direction interval, computed outside the
    kernel per block) — a ~60-scalar-op test the scalar core runs while the
    VPU/MXU process the previous leaf, replacing the round-3 per-node
    [1,1024] vector slab (8 vregs/op at 1/8 sublane utilization);
  - at each visited leaf, ONE cheap [8,128]-layout per-lane slab test (the
    1024 lanes re-shaped so all 8 sub-packets occupy sublanes — full VPU
    utilization) yields per-lane hit masks with per-lane best-t pruning;
    only SUB-PACKETS (128 rays) with candidate lanes run the MXU
    intersection, so a leaf needed by 1 of 8 sub-packets costs 1/8 of the
    round-3 visit;
  - leaves are 128-triangle CLUSTER tiles in plane+barycentric form
    (clusters.py `bmat`): one MXU dot_general([8,768],[8,128]) per
    participating sub-packet yields all six linear forms for every
    (ray, triangle) pair; a short dense VPU epilogue selects hits;
  - the winning triangle's 64-row shading PAYLOAD (geometry host-baked,
    material rows device-baked per pass) is extracted in-kernel by a
    one-hot matmul, so the shade stage needs ZERO per-primitive gathers
    (the round-3 fix that removed the gather-bound profile);
  - bmat + payload tiles stream HBM->VMEM double-buffered: the next leaf is
    prefetched while the current one is intersected;
  - per-block visit counters are written to payload rows PAY_STAT_* — the
    ColorDebugBVH analog (raytracer.cpp:102-120) and the artifact for
    STAGE_TIMES_r04.

Ray-order contract (render/wavefront.py): primary rays arrive in 32x32
pixel-tile order (block union on the bathroom interior: ~15 clusters —
measured, tools/visit_histogram.py; sorting primaries makes them WORSE);
bounce rays are sorted by coarse-origin-cell + direction-morton
(ray_sort_perm key="dir": union 132 vs 227 unsorted at bounce 1); shadow
batches are octant-sorted (their per-lane unions are small, but random
light picks mix direction SIGNS, and a sign-mixed block degenerates the
scalar frustum walk to visiting the whole top tree — measured at half the
bathroom frame).

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

BLOCK = 1024           # rays per packet (one scalar walk per block)
SUB = 128              # sub-packet lanes (vreg lane width)
NSUB = BLOCK // SUB
CHUNK_BLOCKS = 32      # ray blocks per pallas launch (VMEM budget)
MT_EPS = 1e-6          # t epsilon (bvh/traverse.py parity)
BIG = 1e30
_PREC = jax.lax.Precision.HIGHEST   # f32-accurate MXU (bf16x3 passes)

# per-block debug counters, written into the payload's pad rows after the
# walk (consumed by render/probe.py bvh_heatmap and tools/trace_stats.py)
PAY_STAT_VISITS = PAY_GEO_ROWS - 2   # 38: cluster-tile visits of the block
PAY_STAT_SUBS = PAY_GEO_ROWS - 1     # 39: sub-packet MXU intersections

# frustum-row layout ([16, n_blocks] f32 scalar-prefetch, _block_frustum)
FR_OMIN, FR_OMAX, FR_IMIN, FR_IMAX = 0, 3, 6, 9
FR_TLIM, FR_LIVE = 12, 13
FR_ROWS = 16


def _frustum_hit(boxes_ref, frs, nd, tlim):
    """Conservative scalar slab test: can ANY ray in the block's frustum
    (origin box x inverse-direction interval) hit node `nd` before tlim?
    ~70 scalar ops, fully overlapped with vector work by the scalar core.
    `frs` carries the block's 12 frustum scalars as hoisted VALUES — a
    per-node SMEM re-read of them measured ~40% of the walk.

    r5 tightening: on top of the interval products, every axis contributes
    the ANY-SIGN distance lower bound t >= max(bmin - omax, omin - bmax, 0)
    (directions are unit length so |d_a| <= 1). For a sign-MIXED axis the
    interval test's lower bound collapses to ~0 (products span -inf..inf)
    while the distance bound still prunes — measured 387 -> ~2xx visits per
    bounce-1 block (tools/subfrustum_sim.py block_main)."""
    tn = jnp.float32(0.0)
    tf = jnp.float32(BIG)
    for a in range(3):
        om_lo, om_hi, i_lo, i_hi = frs[a]
        u1 = boxes_ref[a, nd] - om_hi        # (bmin - o) interval
        v1 = boxes_ref[a, nd] - om_lo
        u2 = boxes_ref[3 + a, nd] - om_hi    # (bmax - o) interval
        v2 = boxes_ref[3 + a, nd] - om_lo
        p = (u1 * i_lo, u1 * i_hi, v1 * i_lo, v1 * i_hi,
             u2 * i_lo, u2 * i_hi, v2 * i_lo, v2 * i_hi)
        lo = jnp.minimum(jnp.minimum(jnp.minimum(p[0], p[1]),
                                     jnp.minimum(p[2], p[3])),
                         jnp.minimum(jnp.minimum(p[4], p[5]),
                                     jnp.minimum(p[6], p[7])))
        hi = jnp.maximum(jnp.maximum(jnp.maximum(p[0], p[1]),
                                     jnp.maximum(p[2], p[3])),
                         jnp.maximum(jnp.maximum(p[4], p[5]),
                                     jnp.maximum(p[6], p[7])))
        # any-direction-sign axis distance: u1 = bmin - omax (node above
        # the origin box), -v2 = omin - bmax (node below)
        tn = jnp.maximum(tn, jnp.maximum(lo, jnp.maximum(u1, -v2)))
        tf = jnp.minimum(tf, hi)
    return (tf >= tn) & (tn < tlim)


def _make_next_leaf(boxes_ref, meta_ref, fr_ref, b, stack, n_nodes):
    """Scalar stack walk: pop until a frustum-hit leaf is found (returns its
    node id) or the stack empties (returns -1). Children are pushed far-
    first so the near child (by direction sign on the node's split axis)
    pops first — the reference's ordered traversal (bvh.cpp:258-302)."""
    # hoist the block's frustum scalars + per-axis near-child signs once
    frs = tuple((fr_ref[FR_OMIN + a, b], fr_ref[FR_OMAX + a, b],
                 fr_ref[FR_IMIN + a, b], fr_ref[FR_IMAX + a, b])
                for a in range(3))
    near_left_ax = [(frs[a][2] + frs[a][3] >= 0.0).astype(jnp.int32)
                    for a in range(3)]
    # near_left by split axis as a 3-bit scalar (axis lookup = 2 shifts)
    nl_bits = (near_left_ax[0] | (near_left_ax[1] << 1)
               | (near_left_ax[2] << 2))

    def next_leaf(sp, tlim):
        def cond(c):
            sp_, leaf = c
            return (leaf < 0) & (sp_ > 0)

        def body(c):
            sp_, _ = c
            nd = stack[sp_ - 1]
            sp_ = sp_ - 1
            hit = _frustum_hit(boxes_ref, frs, nd, tlim)
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


def _lane_slab(boxes_ref, nd, o8, i8, best8):
    """Per-lane leaf AABB test in the [NSUB, SUB] sub-packet layout (full
    VPU utilization: sublane = sub-packet). Returns candidate mask."""
    (ox, oy, oz), (ix, iy, iz) = o8, i8
    t0x = (boxes_ref[0, nd] - ox) * ix
    t1x = (boxes_ref[3, nd] - ox) * ix
    t0y = (boxes_ref[1, nd] - oy) * iy
    t1y = (boxes_ref[4, nd] - oy) * iy
    t0z = (boxes_ref[2, nd] - oz) * iz
    t1z = (boxes_ref[5, nd] - oz) * iz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                 jnp.minimum(t0y, t1y)),
                     jnp.maximum(jnp.minimum(t0z, t1z), 0.0))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                 jnp.maximum(t0y, t1y)),
                     jnp.maximum(t0z, t1z))
    return (tf >= tn) & (tn < best8)


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


import os

RING = int(os.environ.get("LH2_RING", "4"))  # bmat-tile DMA pipeline depth
BM_PERIOD = 8          # leaves between scalar best_max refreshes


OUT_CODE, OUT_T, OUT_VISITS, OUT_SUBS = 0, 1, 2, 3
OUT_ROWS = 8        # sublane-aligned compact kernel output


def _make_closest_kernel(n_nodes: int, tiles_per_cluster: int, n_blocks: int,
                         ablate: str = ""):
    """Closest-hit kernel — traversal only (r5): scalar stack walk feeding a
    RING-deep bmat DMA pipeline; per leaf one [NSUB,SUB] lane mask, then
    masked per-sub-packet MXU intersection that records only (best t,
    winner code = tile*128 + lane) per ray.

    The kernel output is the COMPACT [OUT_ROWS, Nc] (code, t, stats) map.
    The round-4 kernel extracted the winner's 72-row payload in-kernel
    (per-distinct-tile DMA + one-hot matmuls); that phase measured ~44 ms
    of bounce-1's 128.9 ms, while one XLA minor-axis gather
    pack[:, code] materializing the same [72, N] payload measures 0.09 ms
    (bandwidth-bound) — the round-3 'gather-bound shade' profile was the
    per-field row-major pattern, not this one. Extraction now lives in
    trace_cluster_bvh as that single gather."""
    tpc = tiles_per_cluster

    def kernel(boxes_ref, meta_ref, fr_ref,   # scalar-prefetch (SMEM)
               bmat_ref,                      # ANY (HBM) tile store
               x_ref,                         # [8, Nc] rays
               out,                           # [OUT_ROWS, Nc]
               bscratch, best_ref, code_ref, ring, stack,
               cnt_ref, mf_ref, bsem):

        def bdma(t_idx, buf):
            return pltpu.make_async_copy(bmat_ref.at[t_idx],
                                         bscratch.at[buf], bsem.at[buf])

        def trace_block(b, _):
            c0 = pl.multiple_of(b * BLOCK, BLOCK)
            sl = (slice(None), pl.ds(c0, BLOCK))
            rows = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS, BLOCK), 0)
            out[sl] = jnp.where(rows == OUT_CODE, -1.0, 0.0)

            @pl.when(fr_ref[FR_LIVE, b] > 0.0)
            def _():
                X = x_ref[sl]                                # [8, 1024]
                o8 = tuple(X[c:c + 1].reshape(NSUB, SUB) for c in range(3))

                def inv(dd):
                    mag = jnp.maximum(jnp.abs(dd), 1e-18)
                    return jnp.where(dd < 0, -1.0 / mag, 1.0 / mag)
                i8 = tuple(inv(X[c:c + 1].reshape(NSUB, SUB))
                           for c in range(3, 6))
                best_ref[:, :] = X[7:8].reshape(NSUB, SUB)   # per-lane tmax
                code_ref[:, :] = jnp.full((NSUB, SUB), -1.0, jnp.float32)
                cnt_ref[0] = 0                               # sub-intersects

                next_leaf = _make_next_leaf(boxes_ref, meta_ref, fr_ref, b,
                                            stack, n_nodes)

                xsub = [X[:, s * SUB:(s + 1) * SUB] for s in range(NSUB)]
                pow2 = jnp.left_shift(
                    jnp.int32(1),
                    jax.lax.broadcasted_iota(jnp.int32, (NSUB, 1), 0))

                def sub_mask_bits(nd):
                    """Per-lane leaf test packed into ONE scalar bitmask
                    (bit s = sub-packet s has a candidate lane). A single
                    vector->scalar transfer replaces the eight any() syncs
                    that serialized the round-4a loop (measured ~3us/sub in
                    context vs ~0.1us in isolation — the kernel was
                    latency-bound on these syncs, not on work)."""
                    lhit = _lane_slab(boxes_ref, nd, o8, i8, best_ref[:, :])
                    row = jnp.any(lhit, axis=1, keepdims=True)   # [NSUB,1]
                    return jnp.sum(jnp.where(row, pow2, 0))

                def sub_body(s, t_idx, buf):
                    """One sub-packet intersection + UNCONDITIONAL winner
                    recording — pure vector stream, zero vector->scalar
                    syncs, so the scalar core runs ahead and the VPU
                    pipelines across sub-packets and leaves."""
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

                def intersect_tile(t_idx, buf, bits):
                    for s in range(NSUB):
                        @pl.when(((bits >> s) & 1) != 0)
                        def _(s=s):
                            sub_body(s, t_idx, buf)

                # ---- phase 1: ring-pipelined traversal -----------------
                stack[0] = jnp.int32(0)
                tlim0 = fr_ref[FR_TLIM, b]

                def fill_cond(c):
                    sp, head, tail, wd, bm = c
                    return (wd == 0) & (head - tail < RING)

                def fill_body(c):
                    sp, head, tail, wd, bm = c
                    sp, l = next_leaf(sp, bm)

                    @pl.when(l >= 0)
                    def _():
                        ring[head % RING] = l
                        bdma(jnp.maximum(meta_ref[1, l], 0) * tpc,
                             head % RING).start()

                    return (sp, jnp.where(l >= 0, head + 1, head), tail,
                            jnp.where(l < 0, 1, wd), bm)

                def outer_cond(c):
                    sp, head, tail, wd, bm = c
                    return (head > tail) | (wd == 0)

                def process_one(nd, buf, bits):
                    t0i = jnp.maximum(meta_ref[1, nd], 0) * tpc
                    bdma(t0i, buf).wait()
                    if ablate != "walk":           # dev attribution only
                        intersect_tile(t0i, buf, bits)
                    if tpc > 1:          # fat clusters: extra tiles, sync
                        def tile_body(j, _):
                            bdma(t0i + j, buf).start()
                            bdma(t0i + j, buf).wait()
                            intersect_tile(t0i + j, buf, bits)
                            return 0
                        jax.lax.fori_loop(1, tpc, tile_body, 0)

                def outer_body(c):
                    c = jax.lax.while_loop(fill_cond, fill_body, c)
                    sp, head, tail, wd, bm = c
                    n_avail = head - tail
                    # TWO leaves per iteration: their mask chains are
                    # independent and their bit transfers batch, so the
                    # vector pipeline stays fed across the branch points.
                    # The second leaf's mask uses the pre-first-leaf best
                    # (conservative superset; the sub intersects re-check
                    # against the fresh best rows)
                    ndA = jnp.clip(ring[tail % RING], 0, n_nodes - 1)
                    ndB = jnp.clip(ring[(tail + 1) % RING], 0, n_nodes - 1)
                    bitsA = sub_mask_bits(ndA)
                    bitsB = sub_mask_bits(ndB)

                    @pl.when(n_avail >= 1)
                    def _():
                        process_one(ndA, tail % RING, bitsA)

                    @pl.when(n_avail >= 2)
                    def _():
                        process_one(ndB, (tail + 1) % RING, bitsB)

                    tail = tail + jnp.minimum(n_avail, 2)
                    # refresh the scalar walk bound periodically through an
                    # SMEM cell — an unconditional jnp.max would put a
                    # vector->scalar stall at the end of EVERY iteration's
                    # dependency chain (the measured round-4a bottleneck)
                    @pl.when(tail % BM_PERIOD < 2)
                    def _():
                        mf_ref[0] = jnp.max(best_ref[:, :])

                    return (sp, head, tail, wd, mf_ref[0])

                mf_ref[0] = tlim0
                _, _, tail, _, _ = jax.lax.while_loop(
                    outer_cond, outer_body,
                    (jnp.int32(1), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                     tlim0))

                # compact result rows: winner codes, best t, debug counters
                out[(pl.ds(OUT_CODE, 1), pl.ds(c0, BLOCK))] = \
                    code_ref[:, :].reshape(1, BLOCK)
                out[(pl.ds(OUT_T, 1), pl.ds(c0, BLOCK))] = \
                    best_ref[:, :].reshape(1, BLOCK)
                out[(pl.ds(OUT_VISITS, 1), pl.ds(c0, BLOCK))] = \
                    jnp.full((1, BLOCK), (tail * tpc).astype(jnp.float32))
                out[(pl.ds(OUT_SUBS, 1), pl.ds(c0, BLOCK))] = \
                    jnp.full((1, BLOCK), cnt_ref[0].astype(jnp.float32))
            return 0

        jax.lax.fori_loop(0, n_blocks, trace_block, 0)
    return kernel


def _make_anyhit_kernel(n_nodes: int, tiles_per_cluster: int, n_blocks: int):
    tpc = tiles_per_cluster

    def kernel(boxes_ref, meta_ref, fr_ref, bmat_ref, x_ref, occ_out,
               bscratch, occ_ref, stack, om_ref, bsem):

        def start_dma(nd, t_off, buf):
            cid = jnp.maximum(meta_ref[1, nd], 0)
            pltpu.make_async_copy(bmat_ref.at[cid * tpc + t_off],
                                  bscratch.at[buf], bsem.at[buf]).start()

        def wait_dma(nd, t_off, buf):
            cid = jnp.maximum(meta_ref[1, nd], 0)
            pltpu.make_async_copy(bmat_ref.at[cid * tpc + t_off],
                                  bscratch.at[buf], bsem.at[buf]).wait()

        def trace_block(b, _):
            c0 = pl.multiple_of(b * BLOCK, BLOCK)
            sl = (slice(None), pl.ds(c0, BLOCK))
            occ_out[(pl.ds(0, 1), pl.ds(c0, BLOCK))] = jnp.zeros(
                (1, BLOCK), jnp.float32)

            @pl.when(fr_ref[FR_LIVE, b] > 0.0)
            def _():
                X = x_ref[sl]
                o8 = tuple(X[c:c + 1].reshape(NSUB, SUB) for c in range(3))

                def inv(dd):
                    mag = jnp.maximum(jnp.abs(dd), 1e-18)
                    return jnp.where(dd < 0, -1.0 / mag, 1.0 / mag)
                i8 = tuple(inv(X[c:c + 1].reshape(NSUB, SUB))
                           for c in range(3, 6))
                tmax8 = X[7:8].reshape(NSUB, SUB)
                # occluded-or-dead as f32 0/1 (i1 vectors fail Mosaic
                # legalization in loop-carried positions)
                occ_ref[:, :] = (tmax8 <= 0.0).astype(jnp.float32)

                next_leaf = _make_next_leaf(boxes_ref, meta_ref, fr_ref, b,
                                            stack, n_nodes)
                xsub = [X[:, s * SUB:(s + 1) * SUB] for s in range(NSUB)]
                pow2 = jnp.left_shift(
                    jnp.int32(1),
                    jax.lax.broadcasted_iota(jnp.int32, (NSUB, 1), 0))

                def process_tile(nd, buf, k, bm):
                    live8 = occ_ref[:, :] < 0.5
                    lhit = _lane_slab(boxes_ref, nd, o8, i8,
                                      jnp.where(live8, tmax8, 0.0))
                    # one packed bitmask transfer instead of 8 any() syncs
                    # (same latency fix as the closest kernel)
                    bits = jnp.sum(jnp.where(
                        jnp.any(lhit, axis=1, keepdims=True), pow2, 0))
                    for s in range(NSUB):
                        @pl.when(((bits >> s) & 1) != 0)
                        def _(s=s):
                            forms = _sub_forms(bscratch.at[buf], xsub[s])
                            ts = tmax8[s:s + 1, :]
                            _, tb = _sub_hits(forms, ts)
                            occ_ref[s:s + 1, :] = jnp.maximum(
                                occ_ref[s:s + 1, :],
                                (tb < ts).astype(jnp.float32))
                    # fire-and-forget: the traversal bound shrinks to the
                    # farthest still-unoccluded lane (TERMINATE_ON_FIRST_HIT
                    # analog) — refreshed every BM_PERIOD leaves through an
                    # SMEM cell (a per-leaf vector->scalar stall at the end
                    # of the chain was the measured bottleneck)
                    @pl.when(k % BM_PERIOD == 0)
                    def _():
                        om_ref[0] = jnp.max(jnp.where(occ_ref[:, :] < 0.5,
                                                      tmax8, 0.0))

                    return om_ref[0]

                stack[0] = jnp.int32(0)
                tlim0 = fr_ref[FR_TLIM, b]
                om_ref[0] = tlim0
                sp, l0 = next_leaf(jnp.int32(1), tlim0)

                @pl.when(l0 >= 0)
                def _():
                    start_dma(l0, 0, 0)

                def cond(c):
                    return (c[0] >= 0) & (c[3] > 0.0)

                def body(c):
                    l0, sp, phase, bm, k = c
                    sp, l1 = next_leaf(sp, bm)

                    @pl.when(l1 >= 0)
                    def _():
                        start_dma(l1, 0, 1 - phase)

                    wait_dma(l0, 0, phase)
                    bm = process_tile(l0, phase, k, bm)
                    if tpc > 1:
                        def tile_body(j, bm):
                            start_dma(l0, j, phase)
                            wait_dma(l0, j, phase)
                            return process_tile(l0, phase, j, bm)
                        bm = jax.lax.fori_loop(1, tpc, tile_body, bm)
                    return (l1, sp, 1 - phase, bm, k + 1)

                lx, _, px, _, _ = jax.lax.while_loop(
                    cond, body, (l0, sp, jnp.int32(0), tlim0, jnp.int32(0)))

                # the all-occluded early exit can leave l0's prefetch in
                # flight — drain it or the semaphore pairs with the wrong
                # copy in the next block
                @pl.when(lx >= 0)
                def _():
                    wait_dma(lx, 0, px)

                occ_out[(pl.ds(0, 1), pl.ds(c0, BLOCK))] = jnp.where(
                    tmax8 > 0.0, occ_ref[:, :], 0.0).reshape(1, BLOCK)
            return 0

        jax.lax.fori_loop(0, n_blocks, trace_block, 0)
    return kernel


def _block_frustum(x, n_blocks):
    """Per-block conservative frustum rows [FR_ROWS, n_blocks] for the
    kernel's scalar walk: origin box, inverse-direction interval (clamped to
    +-1e18 so interval products never hit inf*0=NaN), max live tmax, live
    flag. Dead lanes (tmax<=0) are excluded from every bound."""
    xb = x.reshape(8, n_blocks, BLOCK)
    o = xb[0:3]
    d = xb[3:6]
    tmax = xb[7]
    live = tmax > 0.0
    mag = jnp.maximum(jnp.abs(d), 1e-18)
    inv = jnp.where(d < 0, -1.0 / mag, 1.0 / mag)
    omin = jnp.min(jnp.where(live[None], o, BIG), axis=-1)
    omax = jnp.max(jnp.where(live[None], o, -BIG), axis=-1)
    imin = jnp.min(jnp.where(live[None], inv, BIG), axis=-1)
    imax = jnp.max(jnp.where(live[None], inv, -BIG), axis=-1)
    tlim = jnp.max(jnp.where(live, tmax, 0.0), axis=-1)
    lv = jnp.any(live, axis=-1).astype(jnp.float32)
    pad = jnp.zeros_like(tlim)
    return jnp.concatenate([omin, omax, imin, imax, tlim[None], lv[None],
                            pad[None], pad[None]], axis=0)


@functools.partial(jax.jit,
                   static_argnames=("n_nodes", "tiles_per_cluster", "anyhit",
                                    "stack_cap", "interpret", "ablate"))
def _trace_chunk(boxes, meta, bmat, x,
                 n_nodes: int, tiles_per_cluster: int, anyhit: bool,
                 stack_cap: int = 128, interpret: bool = False,
                 ablate: str = ""):
    """One pallas launch over an [8, Nc] ray tile. Returns the compact
    [OUT_ROWS, Nc] (code, t, stats) map (closest) or [1, Nc] occlusion
    (anyhit)."""
    nc = x.shape[1]
    n_blocks = nc // BLOCK
    fr = _block_frustum(x, n_blocks)
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    if anyhit:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), vm()],
            out_specs=[vm()],
            scratch_shapes=[
                pltpu.VMEM((2, 8, BMAT_COLS), jnp.float32),
                pltpu.VMEM((NSUB, SUB), jnp.float32),
                pltpu.SMEM((stack_cap,), jnp.int32),
                pltpu.SMEM((1,), jnp.float32),               # occ bound
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = _make_anyhit_kernel(n_nodes, tiles_per_cluster, n_blocks)
        out_shape = [jax.ShapeDtypeStruct((1, nc), jnp.float32)]
        return pl.pallas_call(kernel, grid_spec=grid_spec,
                              out_shape=out_shape,
                              interpret=interpret)(boxes, meta, fr, bmat,
                                                   x)[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), vm()],
        out_specs=[vm()],
        scratch_shapes=[
            pltpu.VMEM((RING, 8, BMAT_COLS), jnp.float32),   # bmat ring
            pltpu.VMEM((NSUB, SUB), jnp.float32),            # best t
            pltpu.VMEM((NSUB, SUB), jnp.float32),            # winner code
            pltpu.SMEM((RING,), jnp.int32),                  # leaf ring
            pltpu.SMEM((stack_cap,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),                     # sub counter
            pltpu.SMEM((1,), jnp.float32),                   # walk bound
            pltpu.SemaphoreType.DMA((RING,)),
        ],
    )
    kernel = _make_closest_kernel(n_nodes, tiles_per_cluster, n_blocks,
                                  ablate=ablate)
    out_shape = [jax.ShapeDtypeStruct((OUT_ROWS, nc), jnp.float32)]
    return pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape,
                          interpret=interpret)(boxes, meta, fr, bmat, x)[0]


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
    """Build the FLAT payload pack [PAY_ROWS, CT*128] — host-baked geometry
    rows + device-baked material rows — ONCE per pass; the bounce loop
    reuses the buffer. The kernel's winner code (tile*128 + lane) indexes
    its columns directly: payload = pack[:, code], one minor-axis XLA
    gather per bounce (measured 0.09 ms for [72, 262k] — see
    _make_closest_kernel docstring)."""
    if paym is None:
        paym = jnp.zeros((bvh.pgeo.shape[0], PAY_MAT_ROWS, CLUSTER_LANES),
                         jnp.float32)
    tiles = jnp.concatenate(
        [jax.lax.stop_gradient(bvh.pgeo), jax.lax.stop_gradient(paym)],
        axis=1)                                            # [CT, 72, 128]
    pack = jnp.swapaxes(tiles, 0, 1).reshape(PAY_ROWS, -1)  # [72, CT*128]
    # one trailing MISS column (zeros, PRIM = -1): miss lanes gather it by
    # index instead of a [72, N] where-mask after the fetch — the post-ops
    # measured ~3 ms/bounce on the 262k wavefront (r5 cornell regression)
    miss = jnp.zeros((PAY_ROWS, 1), jnp.float32).at[PAY_PRIM, 0].set(-1.0)
    return jnp.concatenate([pack, miss], axis=1)           # [72, CT*128+1]


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
            _trace_chunk, bvh.boxes, bvh.meta, bvh.bmat,
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
        _trace_chunk, bvh.boxes, bvh.meta, bvh.bmat,
        n_nodes=bvh.n_nodes, tiles_per_cluster=bvh.tiles_per_cluster,
        anyhit=False, stack_cap=stack_cap, interpret=interpret,
        ablate=ablate)
    if n_chunks == 1:
        out = fn(x[0])
    else:
        out = jax.lax.map(fn, x)
        out = jnp.swapaxes(out, 0, 1).reshape(OUT_ROWS, -1)
    out = out[:, :n]
    if inv is not None:
        out = out[:, inv]
    code = out[OUT_CODE]
    hit = code >= 0.0
    # miss lanes index the pack's trailing miss column (zeros, PRIM=-1) so
    # no [72, N] where-mask runs after the fetch
    ci = jnp.where(hit, code, jnp.float32(pay_tiles.shape[1] - 1)
                   ).astype(jnp.int32)
    g = pay_tiles[:, ci]            # the single payload fetch
    # contract parity with the in-kernel-extraction era: best t rides in
    # the VALID row slot; stats rows broadcast the per-block counters.
    # ONE concat instead of chained row updates (each .at[row].set
    # materialized another [72, N] buffer — measured ~3 ms/bounce)
    payload = jnp.concatenate([
        g[:PAY_VALID],
        out[OUT_T][None],
        g[PAY_VALID + 1:PAY_STAT_VISITS],
        out[OUT_VISITS][None],
        out[OUT_SUBS][None],
        g[PAY_STAT_SUBS + 1:],
    ], axis=0)
    t = jnp.where(hit, out[OUT_T], jnp.broadcast_to(tmax, hit.shape))
    return t, payload
