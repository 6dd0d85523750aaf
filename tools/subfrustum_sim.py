"""Decompose the r5 per-sub-packet walk's conservatism (numpy, CPU).

For bathroom bounce-1 rays, per 128-lane sub-packet, count leaf visits
under: (a) EXACT per-lane slab union (the lower bound the r4 histogram
reported as 32.6/sub), (b) the kernel's FLIPPED-INTERVAL frustum test
(sign-uniform axes; mixed axes prune nothing) — under several sort keys.
The gap (a)->(b) is interval-arithmetic looseness; the per-key differences
show whether a tighter origin cell buys the frustum more than it costs the
direction cell. Usage: BENCH_SIZE=256 python tools/subfrustum_sim.py"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import numpy as np

SIZE = int(os.environ.get("BENCH_SIZE", "256"))
SUB = 128


def capture_bounce1():
    import jax.numpy as jnp
    from lighthouse2_tpu.core.types import RenderConfig
    from lighthouse2_tpu.render import wavefront as wf
    from lighthouse2_tpu.scene.bench_scene import bathroom
    scene, cam = bathroom(SIZE, SIZE)
    ds = scene.sync(rebuild_bvh=True)
    view = cam.get_view()
    cfg = RenderConfig(width=SIZE, height=SIZE, spp_per_pass=1,
                       max_path_length=4, use_bvh=True,
                       intersector="lockstep")
    paths = wf._stage_generate(view, jnp.int32(0), cfg)
    acc = jnp.zeros((cfg.n_paths, 4), jnp.float32)
    t, prim, u, v, payload = wf._stage_trace(
        ds, paths["origin"], paths["dir"], paths["alive"], cfg)
    paths, acc, cs, shadow, _, _ = wf._stage_shade(
        ds, view, paths, acc, jnp.uint32(0x12345678), jnp.int32(0),
        t, prim, u, v, cfg, payload=payload)
    return (np.asarray(paths["origin"]), np.asarray(paths["dir"]),
            np.where(np.asarray(paths["alive"]), 1e30, 0.0), ds)


def morton3(q, nbits):
    out = np.zeros(q.shape[0], np.uint64)
    for i in range(nbits):
        for a in range(3):
            out |= ((q[:, a].astype(np.uint64) >> i) & 1) << (3 * i + a)
    return out


def sort_key(o, d, tmax, bmin, bmax, obits, dbits):
    ext = np.maximum(bmax - bmin, 1e-6)
    qo = np.clip(((o - bmin) / ext) * (2 ** obits - 1e-3), 0,
                 2 ** obits - 1).astype(np.uint64)
    qd = np.clip((d * 0.5 + 0.5) * (2 ** dbits - 1e-3), 0,
                 2 ** dbits - 1).astype(np.uint64)
    k = (morton3(qo, obits) << np.uint64(3 * dbits)) | morton3(qd, dbits)
    k = np.where(tmax > 0, k, np.uint64(1 << 62))
    return np.argsort(k, kind="stable")


def count_visits(o, d, tmax, boxes, meta, mode):
    """Per-sub visit counts. mode='exact' (per-lane slab union) or
    'frustum' (flipped interval)."""
    n = o.shape[0]
    ns = n // SUB
    o = o[:ns * SUB].reshape(ns, SUB, 3)
    d = d[:ns * SUB].reshape(ns, SUB, 3)
    tmax = tmax[:ns * SUB].reshape(ns, SUB)
    m = boxes.shape[1]
    bmin = boxes[0:3].T
    bmax = boxes[3:6].T
    hit = np.zeros((ns, m), bool)
    for s in range(ns):
        live = tmax[s] > 0
        if not live.any():
            continue
        ol, dl = o[s][live], d[s][live]
        tl = tmax[s][live]
        il = np.where(np.abs(dl) < 1e-18, np.where(dl < 0, -1e18, 1e18),
                      1.0 / dl)
        if mode == "exact":
            t0 = (bmin[None] - ol[:, None]) * il[:, None]
            t1 = (bmax[None] - ol[:, None]) * il[:, None]
            tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
            tf = np.maximum(t0, t1).min(-1)
            hit[s] = ((tf >= tn) & (tn < tl[:, None])).any(0)
        else:
            tn = np.zeros(m)
            tf = np.full(m, np.inf)
            tlim = tl.max()
            for a in range(3):
                pos = (il[:, a] > 0).all()
                neg = (il[:, a] < 0).all()
                if not (pos or neg):
                    continue                       # mixed: no pruning
                f = 1.0 if pos else -1.0
                fo = f * ol[:, a]
                omin, omax = fo.min(), fo.max()
                ai = np.abs(il[:, a])
                imin, imax = ai.min(), ai.max()
                fb1, fb2 = f * bmin[:, a], f * bmax[:, a]
                bmn, bmx = np.minimum(fb1, fb2), np.maximum(fb1, fb2)
                u_ = bmn - omax
                v_ = bmx - omin
                tn = np.maximum(tn, np.where(u_ >= 0, u_ * imin, u_ * imax))
                tf = np.minimum(tf, np.where(v_ >= 0, v_ * imax, v_ * imin))
            hit[s] = (tf >= tn) & (tn < tlim)

    parent = np.full(m, -1, np.int64)
    cid = meta[1]
    right = meta[2]
    for i in range(m):
        if cid[i] < 0:
            parent[i + 1] = i
            if 0 <= right[i] < m:
                parent[right[i]] = i
    vis = hit.copy()
    for i in range(m):
        p = parent[i]
        if p >= 0:
            vis[:, i] &= vis[:, p]
    leaf = cid >= 0
    alive_sub = (tmax > 0).any(1)
    return vis[:, leaf].sum(1), alive_sub


def main():
    o, d, tmax, ds = capture_bounce1()
    cbvh = ds.cbvh
    boxes = np.asarray(cbvh.boxes)
    meta = np.asarray(cbvh.meta)
    bmin, bmax = boxes[0:3, 0], boxes[3:6, 0]
    out = {}
    keys = {"ocell2_dmort5": (2, 5), "ocell3_dmort4": (3, 4),
            "ocell4_dmort4": (4, 4), "ocell4_dmort3": (4, 3),
            "ocell5_dmort3": (5, 3)}
    for name, (ob, db) in keys.items():
        perm = sort_key(o, d, tmax, bmin, bmax, ob, db)
        op, dp, tp = o[perm], d[perm], tmax[perm]
        row = {}
        for mode in ("exact", "frustum"):
            v, alive = count_visits(op, dp, tp, boxes, meta, mode)
            row[mode] = round(float(v[alive].mean()), 1)
        # mixed-sign axis fraction over alive subs
        ns = len(alive)
        dsub = dp[:ns * SUB].reshape(ns, SUB, 3)
        pos = (dsub > 0).all(1)
        neg = (dsub < 0).all(1)
        mixed = ~(pos | neg)
        row["mixed_axes_per_sub"] = round(float(mixed[alive].sum(1).mean()), 2)
        row["loose_factor"] = round(row["frustum"] / max(row["exact"], 1e-9),
                                    2)
        out[name] = row
        print(name, json.dumps(row), flush=True)
    print(json.dumps(out))


if __name__ == "__main__" and not os.environ.get("BLOCK_MODE"):
    main()


def count_block_visits(o, d, tmax, boxes, meta, mode, block=1024):
    """Block-level (1024-lane) visit counts: mode='exact' | 'interval'
    (the r4 8-product origin-box x inv-interval test) | 'interval_dist'
    (interval + the any-sign axis-distance lower bound)."""
    n = o.shape[0]
    nb = n // block
    o = o[:nb * block].reshape(nb, block, 3)
    d = d[:nb * block].reshape(nb, block, 3)
    tmax = tmax[:nb * block].reshape(nb, block)
    m = boxes.shape[1]
    bmin = boxes[0:3].T
    bmax = boxes[3:6].T
    hit = np.zeros((nb, m), bool)
    for s in range(nb):
        live = tmax[s] > 0
        if not live.any():
            continue
        ol, dl = o[s][live], d[s][live]
        tl = tmax[s][live]
        il = np.where(np.abs(dl) < 1e-18, np.where(dl < 0, -1e18, 1e18),
                      1.0 / dl)
        if mode == "exact":
            t0 = (bmin[None] - ol[:, None]) * il[:, None]
            t1 = (bmax[None] - ol[:, None]) * il[:, None]
            tn = np.maximum(np.minimum(t0, t1).max(-1), 0.0)
            tf = np.maximum(t0, t1).min(-1)
            hit[s] = ((tf >= tn) & (tn < tl[:, None])).any(0)
            continue
        tlim = tl.max()
        tn = np.zeros(m)
        tf = np.full(m, np.inf)
        for a in range(3):
            om_, ox_ = ol[:, a].min(), ol[:, a].max()
            i_lo, i_hi = il[:, a].min(), il[:, a].max()
            u1 = bmin[:, a] - ox_
            v1 = bmin[:, a] - om_
            u2 = bmax[:, a] - ox_
            v2 = bmax[:, a] - om_
            prods = np.stack([u1 * i_lo, u1 * i_hi, v1 * i_lo, v1 * i_hi,
                              u2 * i_lo, u2 * i_hi, v2 * i_lo, v2 * i_hi])
            tn = np.maximum(tn, prods.min(0))
            tf = np.minimum(tf, prods.max(0))
            if mode == "interval_dist":
                # any-direction-sign axis distance bound: |d_a|<=1 so
                # t >= distance from the origin box to the node along a
                dist = np.maximum(np.maximum(bmin[:, a] - ox_,
                                             om_ - bmax[:, a]), 0.0)
                tn = np.maximum(tn, dist)
        hit[s] = (tf >= tn) & (tn < tlim)

    parent = np.full(m, -1, np.int64)
    cid = meta[1]
    right = meta[2]
    for i in range(m):
        if cid[i] < 0:
            parent[i + 1] = i
            if 0 <= right[i] < m:
                parent[right[i]] = i
    vis = hit.copy()
    for i in range(m):
        p = parent[i]
        if p >= 0:
            vis[:, i] &= vis[:, p]
    leaf = cid >= 0
    alive_b = (tmax > 0).any(1)
    return vis[:, leaf].sum(1), alive_b


def block_main():
    o, d, tmax, ds = capture_bounce1()
    cbvh = ds.cbvh
    boxes = np.asarray(cbvh.boxes)
    meta = np.asarray(cbvh.meta)
    # realistic walk bound: the kernel's best-t refresh converges on each
    # lane's actual hit t, so simulate with tmax = the true hit distance
    # (misses keep the scene diagonal)
    import jax.numpy as jnp
    from lighthouse2_tpu.bvh.traverse import bvh_intersect
    t2, prim2, _, _ = bvh_intersect(
        jnp.asarray(o), jnp.asarray(d), ds.bvh, ds.tris.v0, ds.tris.e1,
        ds.tris.e2, t_max=jnp.asarray(tmax, jnp.float32))
    diag = float(np.linalg.norm(boxes[3:6, 0] - boxes[0:3, 0]))
    hitp = np.asarray(prim2) >= 0
    t_real = np.where(hitp, np.asarray(t2), diag)
    tmax = np.where(tmax > 0, t_real * 1.0001, 0.0)
    bmin, bmax = boxes[0:3, 0], boxes[3:6, 0]
    perm = sort_key(o, d, tmax, bmin, bmax, 2, 5)
    op, dp, tp = o[perm], d[perm], tmax[perm]
    out = {}
    for mode in ("exact", "interval", "interval_dist"):
        v, alive = count_block_visits(op, dp, tp, boxes, meta, mode)
        out[mode] = round(float(v[alive].mean()), 1)
        print("block", mode, out[mode], flush=True)
    # per-sub with the same realistic bound (r5 kernel shape)
    for mode in ("exact", "frustum"):
        v, alive = count_visits(op, dp, tp, boxes, meta, mode)
        print("sub", mode, round(float(v[alive].mean()), 1), flush=True)
    print(json.dumps(out))


if __name__ == "__main__" and os.environ.get("BLOCK_MODE"):
    block_main()
