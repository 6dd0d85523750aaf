"""Speculative packet BVH traversal — the TPU intersection kernel (round 3).

The reference's hot trace stage is an OptiX RTX launch (rendercore_optix7/
optix/.optix.cu:151-170); the CPU core traverses a BVH2 recursively per ray
(RenderCore_Bart/bvh.cpp:258-302). Neither maps to a TPU. This kernel is the
TPU-native redesign:

  - rays are processed in BLOCKS of 1024, stored COMPONENT-MAJOR as one
    [8, 1024] tile: rows o.xyz, d.xyz, 1, tmax. The whole block walks the
    tree in lockstep with ONE scalar node pointer (no per-ray stack);
  - the top tree is DFS-ordered with SKIP LINKS (bvh/clusters.py): if any
    ray in the block enters a node's AABB the block descends (node+1),
    otherwise it jumps the whole subtree (skip). Node boxes are scalar-
    prefetched into SMEM;
  - leaves are 128-triangle CLUSTER tiles in plane+barycentric form
    (clusters.py `bmat`): one MXU dot_general([8,768],[8,1024]) yields all
    six linear forms for every (ray, triangle) pair; a short dense VPU
    epilogue selects hits. No per-triangle scalar loop (the round-2 kernel
    broadcast 128 triangles sequentially from SMEM — ~10x more VPU work);
  - the winning triangle's 64-row shading PAYLOAD (geometry host-baked,
    material rows device-baked per pass) is extracted in-kernel by a
    one-hot matmul, so the shade stage needs ZERO per-primitive gathers —
    XLA per-ray gathers measured ~85% of the round-2 frame
    (STAGE_TIMES_r03.json).

Speculation cost: every ray in a block pays for the union of clusters any
ray in the block needs — the classic packet-traversal trade. Rays are
therefore ordered tile-coherently by the caller (render/wavefront.py).

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

BLOCK = 1024           # rays per packet (lanes of the [8,1024] ray tile)
CHUNK_BLOCKS = 16      # ray blocks per pallas launch (VMEM budget)
MT_EPS = 1e-6          # t epsilon (bvh/traverse.py parity)
BIG = 1e30
_PREC = jax.lax.Precision.HIGHEST   # f32-accurate MXU (bf16x3 passes)


def _walk_to_leaf(node, best, boxes_ref, meta_ref, n_nodes,
                  ox, oy, oz, ix, iy, iz):
    """Advance the node pointer to the next cluster leaf whose AABB any ray
    enters, or to n_nodes. One slab test per node; the stop flag is carried
    so cond() does no vector work."""
    def slab(nd):
        t0x = (boxes_ref[0, nd] - ox) * ix
        t1x = (boxes_ref[3, nd] - ox) * ix
        t0y = (boxes_ref[1, nd] - oy) * iy
        t1y = (boxes_ref[4, nd] - oy) * iy
        t0z = (boxes_ref[2, nd] - oz) * iz
        t1z = (boxes_ref[5, nd] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        tn = jnp.maximum(tn, 0.0)
        return (tf >= tn) & (tn < best)

    def w_cond(c):
        return ~c[1]

    def w_body(c):
        nd, _ = c
        hit = slab(nd)
        anyh = jnp.any(hit)
        is_leaf = meta_ref[1, nd] >= 0
        hit_leaf = anyh & is_leaf
        nxt = jnp.where(anyh & ~is_leaf, nd + 1, meta_ref[0, nd])
        nxt = jnp.where(hit_leaf, nd, nxt)
        return nxt, hit_leaf | (nxt >= n_nodes)

    nd, _ = jax.lax.while_loop(w_cond, w_body, (node, node >= n_nodes))
    return nd


def _intersect_tile(bscratch, X, best):
    """All-pairs plane/barycentric test of one 128-triangle tile against a
    1024-ray block. Returns (tm [128,1024] candidate t or BIG, tb [1,1024])."""
    L = CLUSTER_LANES
    out = jax.lax.dot_general(bscratch[:], X, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=_PREC)          # [768, 1024]
    tn_ = out[0 * L:1 * L]
    dn = out[1 * L:2 * L]
    ou = out[2 * L:3 * L]
    du = out[3 * L:4 * L]
    ov = out[4 * L:5 * L]
    dv = out[5 * L:6 * L]
    t = tn_ / dn                      # padding: -1/0 = -inf, never passes

    u = ou + t * du
    v = ov + t * dv
    ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > MT_EPS) & (t < best))
    tm = jnp.where(ok, t, BIG)
    tb = jnp.min(tm, axis=0, keepdims=True)
    return tm, tb


def _make_closest_kernel(n_nodes: int, tiles_per_cluster: int, n_blocks: int):
    def kernel(boxes_ref, meta_ref,          # scalar-prefetch (SMEM)
               bmat_ref, pay_ref,            # ANY (HBM) tile stores
               x_ref,                        # [8, Nc] rays
               pay_out,                      # [PAY_ROWS, Nc]
               bscratch, pscratch, bsem, psem):

        def trace_block(b, _):
            c0 = pl.multiple_of(b * BLOCK, BLOCK)
            sl = (slice(None), pl.ds(c0, BLOCK))
            X = x_ref[sl]                             # [8, 1024]
            ox, oy, oz = X[0:1], X[1:2], X[2:3]
            dx, dy, dz = X[3:4], X[4:5], X[5:6]
            tmax = X[7:8]

            def inv(d):
                mag = jnp.maximum(jnp.abs(d), 1e-20)
                return jnp.where(d < 0, -1.0 / mag, 1.0 / mag)
            ix, iy, iz = inv(dx), inv(dy), inv(dz)

            rows = jax.lax.broadcasted_iota(jnp.int32, (PAY_ROWS, BLOCK), 0)
            # payload accumulates in the OUTPUT ref (RMW per visit) — large
            # arrays in while-loop carries fail Mosaic layout legalization
            pay_out[sl] = jnp.where((rows == PAY_PRIM), -1.0, 0.0)
            any_live = jnp.any(tmax > 0.0)

            def intersect_and_extract(t_idx, buf, best):
                """Intersect the tile in bscratch[buf]; on improvement, DMA
                the payload tile (32KB, ONLY then — most visits don't
                improve) and extract the winners by one-hot matmul."""
                tm, tb = _intersect_tile(bscratch.at[buf], X, best)
                upd = tb < best

                @pl.when(jnp.any(upd))
                def _():
                    pdma = pltpu.make_async_copy(pay_ref.at[t_idx],
                                                 pscratch, psem)
                    pdma.start()
                    # exclusive winner lane (smallest t, lowest lane)
                    ri = jax.lax.broadcasted_iota(
                        jnp.int32, (CLUSTER_LANES, BLOCK), 0)
                    cand = tm <= tb
                    win = jnp.min(jnp.where(cand, ri, CLUSTER_LANES),
                                  axis=0, keepdims=True)
                    S = ((ri == win) & cand).astype(jnp.float32)
                    pdma.wait()
                    p_new = jax.lax.dot_general(
                        pscratch[:], S, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_PREC)              # [PAY_ROWS, 1024]
                    pay_out[sl] = jnp.where(upd, p_new, pay_out[sl])

                return jnp.where(upd, tb, best)

            def bdma(t_idx, buf):
                return pltpu.make_async_copy(bmat_ref.at[t_idx],
                                             bscratch.at[buf], bsem.at[buf])

            if tiles_per_cluster == 1:
                # SOFTWARE-PIPELINED leaf loop: the next leaf's bmat tile
                # streams into the other buffer while the current tile is
                # intersected — the DMA start→wait latency was the dominant
                # serial cost on 1000-cluster scenes (VERDICT r2 next #1)
                def cond(c):
                    return c[0] < n_nodes

                def body(c):
                    node, phase, best = c
                    nd_c = jnp.minimum(node, n_nodes - 1)
                    cid = jnp.maximum(meta_ref[1, nd_c], 0)
                    # walk ahead (stale best -> superset of visits, safe)
                    nxt = _walk_to_leaf(meta_ref[0, nd_c], best, boxes_ref,
                                        meta_ref, n_nodes, ox, oy, oz,
                                        ix, iy, iz)

                    @pl.when(nxt < n_nodes)
                    def _():
                        nx_c = jnp.minimum(nxt, n_nodes - 1)
                        bdma(jnp.maximum(meta_ref[1, nx_c], 0),
                             1 - phase).start()

                    bdma(cid, phase).wait()
                    best = intersect_and_extract(cid, phase, best)
                    return nxt, 1 - phase, best

                node0 = _walk_to_leaf(jnp.int32(0), tmax, boxes_ref,
                                      meta_ref, n_nodes, ox, oy, oz,
                                      ix, iy, iz)

                @pl.when(node0 < n_nodes)
                def _():
                    nd0 = jnp.minimum(node0, n_nodes - 1)
                    bdma(jnp.maximum(meta_ref[1, nd0], 0), 0).start()

                _, _, best = jax.lax.while_loop(
                    cond, body, (node0, jnp.int32(0), tmax))
            else:
                def visit_cluster(cid, best):
                    def tile_body(j, best):
                        t_idx = cid * tiles_per_cluster + j
                        dma = bdma(t_idx, 0)
                        dma.start()
                        dma.wait()
                        return intersect_and_extract(t_idx, 0, best)
                    return jax.lax.fori_loop(0, tiles_per_cluster,
                                             tile_body, best)

                def cond(c):
                    return (c[0] < n_nodes) & any_live

                def body(c):
                    node, best = c
                    node = _walk_to_leaf(node, best, boxes_ref, meta_ref,
                                         n_nodes, ox, oy, oz, ix, iy, iz)
                    nd_c = jnp.minimum(node, n_nodes - 1)
                    cid = jnp.maximum(meta_ref[1, nd_c], 0)
                    best = visit_cluster(cid, best)
                    return meta_ref[0, nd_c], best

                _, best = jax.lax.while_loop(cond, body,
                                             (jnp.int32(0), tmax))
            # miss lanes keep t = tmax; row PAY_VALID of the OUTPUT carries t
            pay_out[(pl.ds(PAY_VALID, 1), pl.ds(c0, BLOCK))] = best
            return 0

        jax.lax.fori_loop(0, n_blocks, trace_block, 0)
    return kernel


def _make_anyhit_kernel(n_nodes: int, tiles_per_cluster: int, n_blocks: int):
    def kernel(boxes_ref, meta_ref, bmat_ref, x_ref, occ_out,
               bscratch, bsem):

        def trace_block(b, _):
            c0 = pl.multiple_of(b * BLOCK, BLOCK)
            sl = (slice(None), pl.ds(c0, BLOCK))
            X = x_ref[sl]
            ox, oy, oz = X[0:1], X[1:2], X[2:3]
            dx, dy, dz = X[3:4], X[4:5], X[5:6]
            tmax = X[7:8]

            def inv(d):
                mag = jnp.maximum(jnp.abs(d), 1e-20)
                return jnp.where(d < 0, -1.0 / mag, 1.0 / mag)
            ix, iy, iz = inv(dx), inv(dy), inv(dz)

            def bdma(t_idx, buf):
                return pltpu.make_async_copy(bmat_ref.at[t_idx],
                                             bscratch.at[buf], bsem.at[buf])

            # occlusion carried as f32 0/1 — i1 vectors in while carries
            # fail Mosaic's scf.yield legalization
            if tiles_per_cluster == 1:
                # software-pipelined leaf loop (see closest kernel)
                def cond(c):
                    node, phase, occ = c
                    # fire-and-forget: stop once every live ray is occluded
                    # (OPTIX_RAY_FLAG_TERMINATE_ON_FIRST_HIT analog)
                    return (node < n_nodes) & jnp.any((occ < 0.5)
                                                      & (tmax > 0.0))

                def body(c):
                    node, phase, occ = c
                    nd_c = jnp.minimum(node, n_nodes - 1)
                    cid = jnp.maximum(meta_ref[1, nd_c], 0)
                    nxt = _walk_to_leaf(meta_ref[0, nd_c], tmax, boxes_ref,
                                        meta_ref, n_nodes, ox, oy, oz,
                                        ix, iy, iz)

                    @pl.when(nxt < n_nodes)
                    def _():
                        nx_c = jnp.minimum(nxt, n_nodes - 1)
                        bdma(jnp.maximum(meta_ref[1, nx_c], 0),
                             1 - phase).start()

                    bdma(cid, phase).wait()
                    _, tb = _intersect_tile(bscratch.at[phase], X, tmax)
                    occ = jnp.maximum(occ, (tb < tmax).astype(jnp.float32))
                    return nxt, 1 - phase, occ

                node0 = _walk_to_leaf(jnp.int32(0), tmax, boxes_ref,
                                      meta_ref, n_nodes, ox, oy, oz,
                                      ix, iy, iz)

                @pl.when(node0 < n_nodes)
                def _():
                    nd0 = jnp.minimum(node0, n_nodes - 1)
                    bdma(jnp.maximum(meta_ref[1, nd0], 0), 0).start()

                node_x, phase_x, occ = jax.lax.while_loop(
                    cond, body, (node0, jnp.int32(0),
                                 (tmax <= 0.0).astype(jnp.float32)))

                # the all-occluded early exit can leave the prefetch for
                # `node_x` in flight (started into buffer phase_x by the
                # last iteration) — drain it or the semaphore carries into
                # the next block and pairs with the wrong copy
                @pl.when(node_x < n_nodes)
                def _():
                    nd_x = jnp.minimum(node_x, n_nodes - 1)
                    bdma(jnp.maximum(meta_ref[1, nd_x], 0), phase_x).wait()
            else:
                def visit_cluster(cid, occ):
                    def tile_body(j, occ):
                        t_idx = cid * tiles_per_cluster + j
                        dma = bdma(t_idx, 0)
                        dma.start()
                        dma.wait()
                        _, tb = _intersect_tile(bscratch.at[0], X, tmax)
                        return jnp.maximum(occ,
                                           (tb < tmax).astype(jnp.float32))
                    return jax.lax.fori_loop(0, tiles_per_cluster,
                                             tile_body, occ)

                def cond(c):
                    node, occ = c
                    return (node < n_nodes) & jnp.any((occ < 0.5)
                                                      & (tmax > 0.0))

                def body(c):
                    node, occ = c
                    # prune against tmax only: occluded lanes keep best=tmax
                    # but the loop exits once all live lanes are occluded
                    node = _walk_to_leaf(node, tmax, boxes_ref, meta_ref,
                                         n_nodes, ox, oy, oz, ix, iy, iz)
                    nd_c = jnp.minimum(node, n_nodes - 1)
                    cid = jnp.maximum(meta_ref[1, nd_c], 0)
                    occ = visit_cluster(cid, occ)
                    return meta_ref[0, nd_c], occ

                _, occ = jax.lax.while_loop(
                    cond, body,
                    (jnp.int32(0), (tmax <= 0.0).astype(jnp.float32)))
            occ_out[(pl.ds(0, 1), pl.ds(c0, BLOCK))] = jnp.where(
                tmax > 0.0, occ, 0.0)
            return 0

        jax.lax.fori_loop(0, n_blocks, trace_block, 0)
    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_nodes", "tiles_per_cluster", "anyhit",
                                    "interpret"))
def _trace_chunk(boxes, meta, bmat, pay, x,
                 n_nodes: int, tiles_per_cluster: int, anyhit: bool,
                 interpret: bool = False):
    """One pallas launch over an [8, Nc] ray tile. Returns the [PAY_ROWS, Nc]
    payload (closest; row PAY_VALID = best t) or [1, Nc] occlusion (anyhit)."""
    nc = x.shape[1]
    n_blocks = nc // BLOCK
    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    if anyhit:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY), vm()],
            out_specs=[vm()],
            scratch_shapes=[
                pltpu.VMEM((2, 8, BMAT_COLS), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = _make_anyhit_kernel(n_nodes, tiles_per_cluster, n_blocks)
        out_shape = [jax.ShapeDtypeStruct((1, nc), jnp.float32)]
        return pl.pallas_call(kernel, grid_spec=grid_spec,
                              out_shape=out_shape,
                              interpret=interpret)(boxes, meta, bmat, x)[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY), vm()],
        out_specs=[vm()],
        scratch_shapes=[
            pltpu.VMEM((2, 8, BMAT_COLS), jnp.float32),
            pltpu.VMEM((PAY_ROWS, CLUSTER_LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = _make_closest_kernel(n_nodes, tiles_per_cluster, n_blocks)
    out_shape = [jax.ShapeDtypeStruct((PAY_ROWS, nc), jnp.float32)]
    return pl.pallas_call(kernel, grid_spec=grid_spec, out_shape=out_shape,
                          interpret=interpret)(boxes, meta, bmat, pay, x)[0]


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


def ray_sort_perm(o, d, t_max, bvh: ClusterBVH):
    """Coherence permutation for one wavefront: sort rays by (morton cell of
    origin in the scene box, direction octant); DEAD lanes (t_max<=0) sort to
    the END. Packet blocks then see a small cluster union again at bounce>=2
    (unsorted bathroom blocks visited ~half the 1083 clusters each — the
    4.9 s/pass profile), and all-dead tail blocks are skipped by the
    kernel's any_live early-out (the compaction analog: occupancy collapses
    to ~16% at bounce 2 under RR). Returns (perm, inv_perm) int32 [N]."""
    bmin = bvh.boxes[0:3, 0]                     # root node box
    bmax = bvh.boxes[3:6, 0]
    extent = jnp.maximum(bmax - bmin, 1e-6)
    q = jnp.clip(((o - bmin) / extent) * 15.999, 0.0, 15.0).astype(jnp.uint32)

    def stretch3(b):                             # 4 bits -> every 3rd bit
        out = jnp.zeros_like(b)
        for i in range(4):
            out = out | (((b >> jnp.uint32(i)) & jnp.uint32(1))
                         << jnp.uint32(3 * i))
        return out
    morton = (stretch3(q[:, 0]) | (stretch3(q[:, 1]) << 1)
              | (stretch3(q[:, 2]) << 2))        # 12 bits
    octant = ((d[:, 0] < 0).astype(jnp.uint32)
              | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
              | ((d[:, 2] < 0).astype(jnp.uint32) << 2))
    key = (morton << jnp.uint32(3)) | octant
    key = jnp.where(t_max > 0.0, key, jnp.uint32(0x7FFFFFFF))
    perm = jnp.argsort(key).astype(jnp.int32)
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
        axis=1)                                            # [CT, 64, 128]


def trace_cluster_bvh(o, d, bvh: ClusterBVH, t_max, anyhit: bool = False,
                      paym=None, pay_tiles=None, interpret: bool = False,
                      perm=None, inv=None):
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
            anyhit=True, interpret=interpret)
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
        anyhit=False, interpret=interpret)
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
