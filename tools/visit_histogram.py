"""Per-block cluster-visit histogram (the ColorDebugBVH-style instrument,
VERDICT r3 task 1c). Simulates the packet walk's leaf-visit UNION per
1024-ray block WITHOUT best-t pruning (upper bound; the kernel's t-pruned
counts are <= these). Pure numpy over (ray, node) slab tests.

Usage: BENCH_SCENE=bathroom python tools/visit_histogram.py
Emits a JSON summary of visits-per-block for primary and bounce-1 rays,
under several block orderings (natural/tiled, origin-morton+octant sort,
octant+direction-morton sort)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

SIZE = int(os.environ.get("BENCH_SIZE", "512"))
SCENE = os.environ.get("BENCH_SCENE", "bathroom")
BLOCK = int(os.environ.get("BLOCK", "1024"))


def block_unions(o, d, tmax, boxes, meta, order=None):
    """For each block of 1024 rays (after `order` permutation), count leaf
    visits: leaf L visited iff L and all ancestors have >=1 ray hitting
    their AABB (slab test, tn<tmax). Returns [n_blocks] visit counts and
    the per-leaf visit totals (for a heatmap)."""
    n = o.shape[0]
    if order is not None:
        o, d, tmax = o[order], d[order], tmax[order]
    nb = n // BLOCK
    o = o[:nb * BLOCK].reshape(nb, BLOCK, 3)
    d = d[:nb * BLOCK].reshape(nb, BLOCK, 3)
    tmax = tmax[:nb * BLOCK].reshape(nb, BLOCK)

    m = boxes.shape[1]
    bmin = boxes[0:3].T          # [M,3]
    bmax = boxes[3:6].T
    inv = np.where(np.abs(d) < 1e-20, 1e20 * np.sign(d) + 1e20 * (d == 0), 1.0 / d)

    anyhit = np.zeros((nb, m), bool)
    # chunk over nodes to bound memory: [BLOCK, chunk] per block
    for b in range(nb):
        ob, db, ib, tb = o[b], d[b], inv[b * 0:], tmax[b]
        ib = np.where(np.abs(db) < 1e-20, np.where(db < 0, -1e30, 1e30),
                      1.0 / db)
        live = tb > 0
        if not live.any():
            continue
        ol, il, tl = ob[live], ib[live], tb[live]
        t0 = (bmin[None] - ol[:, None]) * il[:, None]     # [L,M,3]
        t1 = (bmax[None] - ol[:, None]) * il[:, None]
        tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
        tf = np.maximum(t0, t1).min(-1)
        hit = (tf >= tn) & (tn < tl[:, None])
        anyhit[b] = hit.any(0)

    # ancestors: parent pointers from the skip-link DFS layout
    parent = np.full(m, -1, np.int64)
    skip = meta[0]
    cid = meta[1]
    for i in range(m):
        if cid[i] < 0:                        # interior: children i+1, skip(i+1)
            l = i + 1
            parent[l] = i
            r = skip[l]
            if 0 <= r < m:
                parent[r] = i
    visited = anyhit.copy()
    # propagate: visited[n] &= visited[parent[n]] in topological (DFS) order
    for i in range(m):
        p = parent[i]
        if p >= 0:
            visited[:, i] &= visited[:, p]
    leaf = cid >= 0
    per_block = visited[:, leaf].sum(1)
    per_leaf = visited[:, leaf].sum(0)
    return per_block, per_leaf


def morton(q):
    out = np.zeros(q.shape[0], np.uint32)
    for i in range(q.shape[1] and 10):
        for a in range(3):
            out |= ((q[:, a] >> i) & 1).astype(np.uint32) << (3 * i + a)
    return out


def main():
    import jax.numpy as jnp
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render import wavefront as wf
    from lighthouse2_tpu.core.geometry import BIG_T

    if SCENE == "bathroom":
        from lighthouse2_tpu.scene.bench_scene import bathroom
        scene, cam = bathroom(SIZE, SIZE)
    else:
        from lighthouse2_tpu.scene.presets import cornell_box
        scene, cam = cornell_box(SIZE, SIZE)
    ds = scene.sync(rebuild_bvh=True)
    view = cam.get_view()
    cfg = RenderConfig(width=SIZE, height=SIZE, spp_per_pass=1,
                       max_path_length=4, use_bvh=True, intersector="lockstep")

    boxes = np.asarray(ds.cbvh.boxes)
    meta = np.asarray(ds.cbvh.meta)
    n_leaves = int((meta[1] >= 0).sum())
    print(f"{SCENE}: {ds.cbvh.n_prims} tris, {n_leaves} clusters, "
          f"{meta.shape[1]} top nodes", flush=True)

    paths = wf._stage_generate(view, jnp.int32(0), cfg)
    rays = {"primary": (np.asarray(paths["origin"]), np.asarray(paths["dir"]),
                        np.where(np.asarray(paths["alive"]), BIG_T, 0.0))}
    acc = jnp.zeros((cfg.n_paths, 4), jnp.float32)
    cam_seed = jnp.uint32(0x12345678)
    for li in range(2):
        t, prim, u, v, payload = wf._stage_trace(
            ds, paths["origin"], paths["dir"], paths["alive"], cfg)
        paths, acc, cam_seed, shadow, _, _ = wf._stage_shade(
            ds, view, paths, acc, cam_seed, jnp.int32(li), t, prim, u, v, cfg,
            payload=payload)
        rays[f"bounce{li+1}"] = (
            np.asarray(paths["origin"]), np.asarray(paths["dir"]),
            np.where(np.asarray(paths["alive"]), BIG_T, 0.0))
    rays["shadow1"] = (np.asarray(shadow["o"]), np.asarray(shadow["d"]),
                      np.asarray(shadow["tmax"]))

    smin = boxes[0:3, 0]
    smax = boxes[3:6, 0]
    ext = np.maximum(smax - smin, 1e-6)
    out = {}
    for name, (o, d, tm) in rays.items():
        row = {"live": int((tm > 0).sum())}
        # natural (tiled) order
        pb, _ = block_unions(o, d, tm, boxes, meta)
        row["natural"] = dict(mean=float(pb.mean()), p90=float(np.percentile(pb, 90)))
        # origin-morton + octant (current ray_sort_perm key)
        q = np.clip((o - smin) / ext * 15.999, 0, 15).astype(np.uint32)
        mo = morton(q)
        octant = ((d[:, 0] < 0) | ((d[:, 1] < 0) << 1).astype(np.uint32)
                  | ((d[:, 2] < 0) << 2).astype(np.uint32)).astype(np.uint32)
        key = (mo.astype(np.uint64) << np.uint64(3)) | octant.astype(np.uint64)
        key = np.where(tm > 0, key, np.uint64(1 << 62))
        pb, _ = block_unions(o, d, tm, boxes, meta, np.argsort(key, kind="stable"))
        row["sort_origin_octant"] = dict(mean=float(pb.mean()), p90=float(np.percentile(pb, 90)))
        # coarse-origin + direction-morton (proposed r4 key for bounce rays)
        q2 = np.clip((o - smin) / ext * 3.999, 0, 3).astype(np.uint32)  # 2 bits/axis
        mo2 = morton(q2) & np.uint32(0x3F)
        dq = np.clip((d * 0.5 + 0.5) * 15.999, 0, 15).astype(np.uint32)
        dmo = morton(dq)
        key2 = ((mo2.astype(np.uint64) << np.uint64(15))
                | dmo.astype(np.uint64))
        key2 = np.where(tm > 0, key2, np.uint64(1 << 62))
        pb, _ = block_unions(o, d, tm, boxes, meta, np.argsort(key2, kind="stable"))
        row["sort_ocell_dirmorton"] = dict(mean=float(pb.mean()), p90=float(np.percentile(pb, 90)))
        out[name] = row
        print(name, json.dumps(row), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
