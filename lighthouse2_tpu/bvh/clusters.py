"""Cluster BVH — the TPU-shaped acceleration structure.

The reference traverses a per-ray recursive BVH2 with a stack
(RenderCore_Bart/bvh.cpp:258-302). Per-ray pointer chasing does not map to
TPU vector units, so the structure is reorganized for *speculative packet
traversal* (see render/kernels/trace.py):

  - triangles are grouped into CLUSTERS cut from maximal SAH-subtree roots,
    so a cluster is spatially tight. A cluster spans `tiles_per_cluster`
    dense [16,128] f32 tiles (128 triangles per tile, one vector lane each);
  - the tree ABOVE the cluster roots (the "top tree") is flattened in DFS
    order with SKIP LINKS: a ray block either descends (node+1) or jumps the
    whole subtree (skip) — no stack, one scalar node pointer per block;
  - top-tree nodes are scalar-prefetched into SMEM (hard capacity limit —
    measured <64KB on v5e — caps the top tree at MAX_TOP_NODES; the cut
    threshold doubles until the pruned tree fits), cluster tiles live in
    VMEM and are DMA'd to SMEM scratch per visit.

The SAH topology itself comes from bvh/builder.py (same binned-SAH build the
reference uses, bvh.cpp:57-178); this module only re-cuts and re-flattens it.

Layout:
  boxes  [M, 8] f32        node bmin.xyz, bmax.xyz, pad, pad
  meta   [M, 2] i32        (skip target, leaf cluster id or -1)
  tiles  [C*TPC, 16, 128]  rows: v0.xyz, e1.xyz, e2.xyz, prim-id (as float;
                           -1 = padding lane), row 10 valid flag, rest pad
"""
from __future__ import annotations

import numpy as np
from flax import struct
import jax.numpy as jnp

CLUSTER_LANES = 128
TILE_ROWS = 16
MAX_TOP_NODES = 512     # SMEM budget: 512*(32+8)B boxes+meta + 8KB scratch

ROW_V0 = 0
ROW_E1 = 3
ROW_E2 = 6
ROW_PRIM = 9
ROW_VALID = 10


@struct.dataclass
class ClusterBVH:
    boxes: jnp.ndarray     # [M,8] f32
    meta: jnp.ndarray      # [M,2] i32
    tiles: jnp.ndarray     # [C*TPC,16,128] f32
    n_nodes: int = struct.field(pytree_node=False, default=0)
    n_clusters: int = struct.field(pytree_node=False, default=0)
    tiles_per_cluster: int = struct.field(pytree_node=False, default=1)
    n_prims: int = struct.field(pytree_node=False, default=0)


def build_cluster_bvh(v0, v1, v2, max_leaf: int = 4,
                      max_top_nodes: int = MAX_TOP_NODES) -> ClusterBVH:
    """Build the two-level cluster structure over triangles [T,3]."""
    from lighthouse2_tpu.bvh.builder import build_sah_bvh
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    flat = build_sah_bvh(v0, v1, v2, max_leaf=max_leaf)
    return cut_clusters(flat, v0, v1, v2, max_top_nodes=max_top_nodes)


def cut_clusters(flat: dict, v0, v1, v2,
                 max_top_nodes: int = MAX_TOP_NODES) -> ClusterBVH:
    """Re-cut a flattened SAH BVH2 (builder.py layout) into the cluster
    structure. Subtree prims are contiguous in `flat['prim']` (DFS leaf
    order), so a cluster is just a (first, count) range of that array."""
    nmin, nmax = flat["nmin"], flat["nmax"]
    left = flat["left"].astype(np.int64)
    right = flat["right"].astype(np.int64)
    count = flat["count"].astype(np.int64)
    prim = flat["prim"].astype(np.int64)
    n = nmin.shape[0]
    is_leaf = count > 0

    # subtree prim counts + first prim slot (children have larger DFS ids)
    sub_cnt = count.copy()
    sub_first = np.where(is_leaf, left, 0)
    for i in range(n - 1, -1, -1):
        if not is_leaf[i]:
            sub_cnt[i] = sub_cnt[left[i]] + sub_cnt[right[i]]
            sub_first[i] = sub_first[left[i]]

    # smallest tiles_per_cluster whose pruned top tree fits the SMEM budget
    tpc = 1
    while True:
        k = CLUSTER_LANES * tpc
        # pruned tree keeps the root + every node whose parent has > k prims
        kept = 1
        stack = [0]
        while stack:
            node = stack.pop()
            if sub_cnt[node] > k and not is_leaf[node]:
                kept += 2
                stack.append(int(left[node]))
                stack.append(int(right[node]))
        if kept <= max_top_nodes or tpc >= 64:
            break
        tpc *= 2
    if kept > max_top_nodes:
        raise ValueError(
            f"scene too large for the SMEM top tree: {kept} nodes at "
            f"tiles_per_cluster={tpc}")

    # iterative DFS emit with skip links
    boxes = np.zeros((kept, 8), np.float32)
    meta = np.zeros((kept, 2), np.int32)
    clusters = []
    idx = 0
    # stack of (node, ) plus a parallel fix-up list of subtree roots whose
    # skip must be patched once their subtree is fully emitted
    stack = [(0,)]
    patch = []  # (emit_idx, node) pairs awaiting subtree completion
    # simpler: explicit DFS with sentinel frames
    stack = [("visit", 0)]
    open_frames = []
    while stack:
        kind, node = stack.pop()
        if kind == "close":
            meta[node, 0] = idx          # here node is the emit idx
            continue
        my_idx = idx
        idx += 1
        boxes[my_idx, 0:3] = nmin[node]
        boxes[my_idx, 3:6] = nmax[node]
        if sub_cnt[node] <= CLUSTER_LANES * tpc or is_leaf[node]:
            cid = len(clusters)
            clusters.append((int(sub_first[node]), int(sub_cnt[node])))
            meta[my_idx, 1] = cid
            meta[my_idx, 0] = my_idx + 1
        else:
            meta[my_idx, 1] = -1
            stack.append(("close", my_idx))
            stack.append(("visit", int(right[node])))
            stack.append(("visit", int(left[node])))
    assert idx == kept, (idx, kept)

    c = len(clusters)
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(v1, np.float32) - v0
    e2 = np.asarray(v2, np.float32) - v0
    tiles = np.zeros((c * tpc, TILE_ROWS, CLUSTER_LANES), np.float32)
    tiles[:, ROW_PRIM, :] = -1.0
    for cid, (first, cnt) in enumerate(clusters):
        ids = prim[first:first + cnt]
        for j in range(tpc):
            seg = ids[j * CLUSTER_LANES:(j + 1) * CLUSTER_LANES]
            m = len(seg)
            if m == 0:
                break
            t = tiles[cid * tpc + j]
            t[ROW_V0:ROW_V0 + 3, :m] = v0[seg].T
            t[ROW_E1:ROW_E1 + 3, :m] = e1[seg].T
            t[ROW_E2:ROW_E2 + 3, :m] = e2[seg].T
            t[ROW_PRIM, :m] = seg.astype(np.float32)
            t[ROW_VALID, :m] = 1.0

    return ClusterBVH(
        boxes=jnp.asarray(boxes),
        meta=jnp.asarray(meta),
        tiles=jnp.asarray(tiles),
        n_nodes=kept,
        n_clusters=c,
        tiles_per_cluster=tpc,
        n_prims=int(v0.shape[0]),
    )
