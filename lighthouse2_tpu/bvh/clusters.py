"""Cluster BVH — the TPU-shaped acceleration structure (MXU tile layout).

The reference traverses a per-ray recursive BVH2 with a stack
(RenderCore_Bart/bvh.cpp:258-302). Per-ray pointer chasing does not map to
TPU vector units, so the structure is reorganized for *packet traversal*
(design notes + measured rationale: render/kernels/trace.py header and
STAGE_TIMES_r04.json):

  - the tree ABOVE the cluster roots (the "top tree") is kept small enough
    to live in SMEM, where the SCALAR core walks it per ray block with an
    explicit stack, near-child-first (meta rows 2-3 carry the right-child id
    and split axis for the ordering; row 0 keeps a DFS skip link for the
    lockstep/interpret paths). Frustum culling happens in that scalar walk
    while the vector units intersect the previous leaf;
  - triangles are grouped into CLUSTERS cut from maximal SAH-subtree roots
    (spatially tight). Each 128-triangle tile is stored TWICE:

    1. an MXU intersection matrix `bmat` [8, 6*128]: each triangle is a
       PLANE + BARYCENTRIC linear form (t = (d0 - O·N)/(D·N), u = Gu·P + cu,
       v = Gv·P + cv with N = e1×e2, Gu = (e2×N)/|N|², Gv = (N×e1)/|N|²).
       Intersecting 1024 rays against 128 triangles is then ONE
       dot_general([8,768], [8,1024]) on the MXU plus a dense VPU epilogue
       — no per-triangle scalar broadcasting at all;
    2. a shading PAYLOAD `pgeo` [32, 128] carrying everything downstream
       shading needs (v0/e1/e2, vertex normals, uvs, consistent-normal
       alphas, prim/material/ltri ids, LOD). The kernel extracts the
       winning triangle's payload with a second one-hot matmul, which
       removes every per-primitive XLA gather from the shade stage — the
       round-3 fix for the gather-bound profile (STAGE_TIMES_r03.json).
       Material parameter rows are baked ON DEVICE per pass from the live
       DeviceMaterials (render/kernels/trace.py:bake_material_rows) so
       material edits/differentiation never stale the tiles.

The SAH topology itself comes from bvh/builder.py (same binned-SAH build the
reference uses, bvh.cpp:57-178); this module only re-cuts and re-flattens it.
"""
from __future__ import annotations

import numpy as np
from flax import struct
import jax.numpy as jnp

CLUSTER_LANES = 128
# SMEM budget: boxes+meta cost 40B/node -> 160KB at 4096. The cap bounds the
# top tree; when it is too small, clusters grow to multiple 128-tri tiles and
# every block pays the UNION of fat clusters (round-3 measurement: the
# 100k-tri bathroom at the old 512 cap ran 11.4 s/pass; 128-tri clusters cut
# the speculative work ~tpc-fold).
MAX_TOP_NODES = 4096

# bmat column blocks (each CLUSTER_LANES wide): the six linear forms
BLK_TN, BLK_DN, BLK_OU, BLK_DU, BLK_OV, BLK_DV = range(6)
BMAT_COLS = 6 * CLUSTER_LANES

# geometry payload rows (host-baked)
PAY_V0 = 0          # 0:9  v0, e1, e2
PAY_E1 = 3
PAY_E2 = 6
PAY_N0 = 9          # 9:18 vertex normals
PAY_N1 = 12
PAY_N2 = 15
PAY_UV0 = 18        # 18:24 uv0, uv1, uv2
PAY_UV1 = 20
PAY_UV2 = 22
PAY_ALPHA = 24      # 24:27 consistent-normal alphas
PAY_PRIM = 27       # triangle id as f32 (-1 = padding)
PAY_MAT = 28        # material id as f32
PAY_LTRI = 29       # area-light slot as f32 (-1 = none)
PAY_LOD = 30        # texture LOD base
PAY_VALID = 31      # 1.0 real, 0.0 padding
PAY_TAN = 32        # 32:35 uv tangent (CoreTri.T, host_mesh.cpp:545-565)
PAY_BIT = 35        # 35:38 uv bitangent (zero = no uv frame -> ONB)
PAY_GEO_ROWS = 40   # 38:40 pad (sublane multiple)

# material payload rows (device-baked each pass; layout must mirror
# render/shading.py material_pack exactly)
PAY_MAT_ROWS = 32   # 28 used (incl. per-param texture slots) + sublane pad
PAY_ROWS = PAY_GEO_ROWS + PAY_MAT_ROWS   # 72 — full payload height


@struct.dataclass
class ClusterBVH:
    # COMPONENT-MAJOR top-tree arrays: SMEM pads the minor dimension to 128
    # lanes, so [M,8] would cost 512 B/node (1 MB SMEM blown at ~2k nodes);
    # [8,M] pads M once and costs 48 B/node.
    boxes: jnp.ndarray     # [8,M] f32 rows bmin.xyz, bmax.xyz, pad, pad
    meta: jnp.ndarray      # [4,M] i32 rows: 0 skip target (DFS skip link),
                           #   1 leaf cluster id or -1, 2 right-child id or -1
                           #   (left child is always id+1 in DFS order),
                           #   3 split axis 0/2/1 (near-child ordering)
    bmat: jnp.ndarray      # [C*TPC, 8, 768] f32 MXU intersection tiles
    pgeo: jnp.ndarray      # [C*TPC, 32, 128] f32 geometry payload tiles
    n_nodes: int = struct.field(pytree_node=False, default=0)
    n_clusters: int = struct.field(pytree_node=False, default=0)
    tiles_per_cluster: int = struct.field(pytree_node=False, default=1)
    n_prims: int = struct.field(pytree_node=False, default=0)
    max_depth: int = struct.field(pytree_node=False, default=64)


def _default_tri_aux(v0):
    """Fill optional attribute arrays with neutral values."""
    t = v0.shape[0]
    z3 = np.zeros((t, 3), np.float32)
    z2 = np.zeros((t, 2), np.float32)
    return dict(n0=z3, n1=z3, n2=z3, uv0=z2, uv1=z2, uv2=z2,
                alpha=np.ones((t, 3), np.float32),
                mat=np.zeros((t,), np.int32),
                ltri=np.full((t,), -1, np.int32),
                lod=np.zeros((t,), np.float32),
                tangent=z3, bitangent=z3)


def build_cluster_bvh(v0, v1, v2, tri: dict | None = None, max_leaf: int = 4,
                      max_top_nodes: int = MAX_TOP_NODES) -> ClusterBVH:
    """Build the two-level cluster structure over triangles [T,3].
    `tri` optionally carries the shading attributes (n0/n1/n2, uv0/uv1/uv2,
    alpha, mat, ltri, lod); missing keys get neutral defaults."""
    from lighthouse2_tpu.bvh.builder import build_sah_bvh
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    flat = build_sah_bvh(v0, v1, v2, max_leaf=max_leaf)
    tri = dict(tri or {})
    tri.setdefault("v0", v0)
    tri.setdefault("v1", v1)
    tri.setdefault("v2", v2)
    return cut_clusters(flat, tri, max_top_nodes=max_top_nodes)


def _plane_forms(v0, v1, v2):
    """Per-triangle plane + barycentric linear forms, computed in f64.
    Returns (N, d0, Gu, cu, Gv, cv); degenerate triangles get N=0, d0=-1
    so the kernel's t = (d0 - O·N)/(D·N) = -1/0 = -inf never hits."""
    v0 = v0.astype(np.float64)
    e1 = v1.astype(np.float64) - v0
    e2 = v2.astype(np.float64) - v0
    n = np.cross(e1, e2)
    nn = (n * n).sum(-1)
    bad = nn < 1e-24
    nn_safe = np.where(bad, 1.0, nn)
    gu = np.cross(e2, n) / nn_safe[:, None]
    gv = np.cross(n, e1) / nn_safe[:, None]
    d0 = (n * v0).sum(-1)
    cu = -(gu * v0).sum(-1)
    cv = -(gv * v0).sum(-1)
    n = np.where(bad[:, None], 0.0, n)
    d0 = np.where(bad, -1.0, d0)
    gu = np.where(bad[:, None], 0.0, gu)
    gv = np.where(bad[:, None], 0.0, gv)
    cu = np.where(bad, -1.0, cu)
    cv = np.where(bad, -1.0, cv)
    return (x.astype(np.float32) for x in (n, d0, gu, cu, gv, cv))


def rebake_geometry(cb: ClusterBVH, tri9) -> ClusterBVH:
    """Device-side (jnp) refresh of the tiles' triangle geometry from a live
    [9,T] tri9 array: payload rows 0..8 AND the bmat plane forms, so the
    kernel's hit tests track displaced vertices exactly like the lockstep
    path's leaf tests do (bvh/traverse.py uses bvh.tri9 live). Traversal
    BOXES stay stale — the reparameterization detachment (SURVEY §7.3.3).
    Caller should stop_gradient the result (gradients reattach per ray)."""
    L = CLUSTER_LANES
    ct = cb.pgeo.shape[0]
    valid = cb.pgeo[:, PAY_VALID, :] > 0.0
    ids = jnp.where(valid, cb.pgeo[:, PAY_PRIM, :], 0.0).astype(jnp.int32)
    rows9 = tri9[:, ids.reshape(-1)].reshape(9, ct, L)
    rows9 = jnp.swapaxes(rows9, 0, 1)                       # [CT, 9, 128]
    rows9 = jnp.where(valid[:, None, :], rows9, 0.0)
    pgeo = cb.pgeo.at[:, 0:9, :].set(
        jnp.where(valid[:, None, :], rows9, cb.pgeo[:, 0:9, :]))

    v0, e1, e2 = rows9[:, 0:3], rows9[:, 3:6], rows9[:, 6:9]
    n = jnp.cross(e1, e2, axis=1)
    nn = jnp.sum(n * n, axis=1, keepdims=True)
    bad = (nn < 1e-24) | ~valid[:, None, :]
    nn_safe = jnp.where(bad, 1.0, nn)
    gu = jnp.cross(e2, n, axis=1) / nn_safe
    gv = jnp.cross(n, e1, axis=1) / nn_safe
    d0 = jnp.sum(n * v0, axis=1, keepdims=True)
    cu = -jnp.sum(gu * v0, axis=1, keepdims=True)
    cv = -jnp.sum(gv * v0, axis=1, keepdims=True)
    n = jnp.where(bad, 0.0, n)
    d0 = jnp.where(bad, -1.0, d0)
    gu = jnp.where(bad, 0.0, gu)
    gv = jnp.where(bad, 0.0, gv)
    cu = jnp.where(bad, -1.0, cu)
    cv = jnp.where(bad, -1.0, cv)

    bmat = cb.bmat
    blk = lambda b: slice(b * L, (b + 1) * L)
    bmat = bmat.at[:, 0:3, blk(BLK_TN)].set(-n)
    bmat = bmat.at[:, 6:7, blk(BLK_TN)].set(d0)
    bmat = bmat.at[:, 3:6, blk(BLK_DN)].set(n)
    bmat = bmat.at[:, 0:3, blk(BLK_OU)].set(gu)
    bmat = bmat.at[:, 6:7, blk(BLK_OU)].set(cu)
    bmat = bmat.at[:, 3:6, blk(BLK_DU)].set(gu)
    bmat = bmat.at[:, 0:3, blk(BLK_OV)].set(gv)
    bmat = bmat.at[:, 6:7, blk(BLK_OV)].set(cv)
    bmat = bmat.at[:, 3:6, blk(BLK_DV)].set(gv)
    return cb.replace(pgeo=pgeo, bmat=bmat)


def cut_clusters(flat: dict, tri: dict,
                 max_top_nodes: int = MAX_TOP_NODES,
                 min_tpc: int = 1) -> ClusterBVH:
    """Re-cut a flattened SAH BVH2 (builder.py layout) into the cluster
    structure. Subtree prims are contiguous in `flat['prim']` (DFS leaf
    order), so a cluster is just a (first, count) range of that array.
    `min_tpc` forces a larger tiles_per_cluster (scene sharding stacks
    per-shard structures and needs a COMMON tpc across shards)."""
    v0 = np.asarray(tri["v0"], np.float32)
    v1 = np.asarray(tri["v1"], np.float32)
    v2 = np.asarray(tri["v2"], np.float32)
    aux = _default_tri_aux(v0)
    for k in aux:
        if tri.get(k) is not None:
            aux[k] = np.asarray(tri[k])

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
    tpc = max(1, int(min_tpc))
    while True:
        k = CLUSTER_LANES * tpc
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

    # iterative DFS emit: skip links (row 0) for the stackless walk, explicit
    # right-child + split-axis (rows 2-3) for the near-child-first stack walk
    # (the r4 kernel orders children by ray-direction sign per node, like the
    # reference's ordered Traverse, bvh.cpp:258-302)
    boxes = np.zeros((kept, 8), np.float32)
    meta = np.zeros((kept, 4), np.int32)
    meta[:, 2] = -1
    clusters = []
    idx = 0
    max_depth = 1
    stack = [("visit", 0, -1, 0)]
    while stack:
        kind, node, parent_idx, depth = stack.pop()
        if kind == "close":
            meta[node, 0] = idx          # here node is the emit idx
            continue
        my_idx = idx
        idx += 1
        max_depth = max(max_depth, depth + 1)
        if parent_idx >= 0:              # I am the right child of parent_idx
            meta[parent_idx, 2] = my_idx
        boxes[my_idx, 0:3] = nmin[node]
        boxes[my_idx, 3:6] = nmax[node]
        if sub_cnt[node] <= CLUSTER_LANES * tpc or is_leaf[node]:
            cid = len(clusters)
            clusters.append((int(sub_first[node]), int(sub_cnt[node])))
            meta[my_idx, 1] = cid
            meta[my_idx, 0] = my_idx + 1
        else:
            meta[my_idx, 1] = -1
            l, r = int(left[node]), int(right[node])
            # split axis = largest |child-centre delta|: the direction sign
            # along it decides which child is nearer for a ray packet
            cl = 0.5 * (nmin[l] + nmax[l])
            cr2 = 0.5 * (nmin[r] + nmax[r])
            meta[my_idx, 3] = int(np.argmax(np.abs(cr2 - cl)))
            stack.append(("close", my_idx, -1, 0))
            stack.append(("visit", r, my_idx, depth + 1))
            stack.append(("visit", l, -1, depth + 1))
    assert idx == kept, (idx, kept)

    c = len(clusters)
    N, d0, Gu, cu, Gv, cv = _plane_forms(v0, v1, v2)
    e1 = v1 - v0
    e2 = v2 - v0

    bmat = np.zeros((c * tpc, 8, BMAT_COLS), np.float32)
    # padding lanes: all-zero coefficients except TN const = -1 → t = -inf
    bmat[:, 6, BLK_TN * CLUSTER_LANES:(BLK_TN + 1) * CLUSTER_LANES] = -1.0
    pgeo = np.zeros((c * tpc, PAY_GEO_ROWS, CLUSTER_LANES), np.float32)
    pgeo[:, PAY_PRIM, :] = -1.0
    pgeo[:, PAY_LTRI, :] = -1.0

    def put_blk(t, blk, rows, data, m):
        bmat[t, rows, blk * CLUSTER_LANES:blk * CLUSTER_LANES + m] = data

    for cid, (first, cnt) in enumerate(clusters):
        ids = prim[first:first + cnt]
        for j in range(tpc):
            seg = ids[j * CLUSTER_LANES:(j + 1) * CLUSTER_LANES]
            m = len(seg)
            if m == 0:
                break
            t = cid * tpc + j
            # intersection matrix: out = bmat^T · [o; d; 1; 0]
            put_blk(t, BLK_TN, slice(0, 3), -N[seg].T, m)
            put_blk(t, BLK_TN, 6, d0[seg], m)
            put_blk(t, BLK_DN, slice(3, 6), N[seg].T, m)
            put_blk(t, BLK_OU, slice(0, 3), Gu[seg].T, m)
            put_blk(t, BLK_OU, 6, cu[seg], m)
            put_blk(t, BLK_DU, slice(3, 6), Gu[seg].T, m)
            put_blk(t, BLK_OV, slice(0, 3), Gv[seg].T, m)
            put_blk(t, BLK_OV, 6, cv[seg], m)
            put_blk(t, BLK_DV, slice(3, 6), Gv[seg].T, m)
            # geometry payload
            g = pgeo[t]
            g[PAY_V0:PAY_V0 + 3, :m] = v0[seg].T
            g[PAY_E1:PAY_E1 + 3, :m] = e1[seg].T
            g[PAY_E2:PAY_E2 + 3, :m] = e2[seg].T
            g[PAY_N0:PAY_N0 + 3, :m] = aux["n0"][seg].T
            g[PAY_N1:PAY_N1 + 3, :m] = aux["n1"][seg].T
            g[PAY_N2:PAY_N2 + 3, :m] = aux["n2"][seg].T
            g[PAY_UV0:PAY_UV0 + 2, :m] = aux["uv0"][seg].T
            g[PAY_UV1:PAY_UV1 + 2, :m] = aux["uv1"][seg].T
            g[PAY_UV2:PAY_UV2 + 2, :m] = aux["uv2"][seg].T
            g[PAY_ALPHA:PAY_ALPHA + 3, :m] = aux["alpha"][seg].T
            g[PAY_PRIM, :m] = seg.astype(np.float32)
            g[PAY_MAT, :m] = aux["mat"][seg].astype(np.float32)
            g[PAY_LTRI, :m] = aux["ltri"][seg].astype(np.float32)
            g[PAY_LOD, :m] = aux["lod"][seg].astype(np.float32)
            g[PAY_VALID, :m] = 1.0
            g[PAY_TAN:PAY_TAN + 3, :m] = aux["tangent"][seg].T
            g[PAY_BIT:PAY_BIT + 3, :m] = aux["bitangent"][seg].T

    return ClusterBVH(
        boxes=jnp.asarray(np.ascontiguousarray(boxes.T)),
        meta=jnp.asarray(np.ascontiguousarray(meta.T)),
        bmat=jnp.asarray(bmat),
        pgeo=jnp.asarray(pgeo),
        n_nodes=kept,
        n_clusters=c,
        tiles_per_cluster=tpc,
        n_prims=int(v0.shape[0]),
        max_depth=int(max_depth),
    )
