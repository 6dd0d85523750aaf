"""Independent NumPy oracle of the wavefront path tracer.

A from-scratch, readable re-implementation of the same estimator
(rendercore_optix7 semantics: NEE + MIS, postponed pdf, xorshift RNG,
lambert BSDF) written against the NUMPY api with per-bounce masked arrays.
Used by parity tests: identical RNG schedule + identical math → the jitted
JAX renderer must match to float32 tolerance. This formalizes the
reference's "PrimeRef validation core" methodology (SURVEY.md §4.1).

Scope: brute-force intersection, Lambert BSDF, tri/point/spot/dir lights,
constant or equirect sky, no textures. float32 throughout.
"""
from __future__ import annotations

import numpy as np

F = np.float32
U = np.uint32
INV_2_32 = F(2.3283064365387e-10)
BIG = F(1e30)


# ---------------------------------------------------------------------------
# RNG (tools_shared.h:60-62)
# ---------------------------------------------------------------------------

def wang_hash(s):
    s = s.astype(U)
    s = (s ^ U(61)) ^ (s >> U(16))
    s = (s * U(9)) & U(0xFFFFFFFF)
    s = s ^ (s >> U(4))
    s = (s * U(0x27D4EB2D)) & U(0xFFFFFFFF)
    return s ^ (s >> U(15))


def xorshift(s):
    s = s.astype(U)
    s = s ^ (s << U(13))
    s = s ^ (s >> U(17))
    s = s ^ (s << U(5))
    return s


def rand_float(s):
    s = xorshift(s)
    return s, s.astype(np.float64).astype(F) * INV_2_32


def norm(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def dot(a, b):
    return np.sum(a * b, axis=-1)


# ---------------------------------------------------------------------------
# scene mirror (built from the host scene, independent of jax arrays)
# ---------------------------------------------------------------------------

class OracleScene:
    def __init__(self, host_scene):
        insts = host_scene.flatten_instances()
        parts = [host_scene.meshes[m]._posed if False else
                 host_scene.meshes[m].transformed(w) for m, w, _ in insts]
        cat = lambda f: np.concatenate([getattr(p, f) for p in parts], 0).astype(F)
        self.v0 = cat("v0")
        self.v1 = cat("v1")
        self.v2 = cat("v2")
        self.n0 = cat("n0")
        self.n1 = cat("n1")
        self.n2 = cat("n2")
        self.face_n = cat("face_n")
        self.alpha = cat("alpha")
        self.mat = np.concatenate([p.mat for p in parts]).astype(np.int32)
        self.e1 = self.v1 - self.v0
        self.e2 = self.v2 - self.v0
        cr = np.cross(self.e1, self.e2)
        self.area = (0.5 * np.linalg.norm(cr, axis=-1)).astype(F)

        mats = host_scene.materials
        self.m_color = np.array([m.color for m in mats], F)
        self.m_rough = np.array([m.roughness for m in mats], F)
        self.m_trans = np.array([m.transmission for m in mats], F)
        self.m_eta = np.array([m.eta for m in mats], F)
        self.m_absorption = np.array([m.absorption for m in mats], F)

        emissive = self.m_color[self.mat].max(-1) > 1.0
        self.ltri = np.full(self.v0.shape[0], -1, np.int32)
        idx = np.nonzero(emissive)[0]
        self.ltri[idx] = np.arange(idx.shape[0])
        self.l_v0 = self.v0[idx]
        self.l_v1 = self.v1[idx]
        self.l_v2 = self.v2[idx]
        lcr = np.cross(self.l_v1 - self.l_v0, self.l_v2 - self.l_v0)
        self.l_area = (0.5 * np.linalg.norm(lcr, axis=-1)).astype(F)
        self.l_n = norm(lcr).astype(F)
        self.l_centre = ((self.l_v0 + self.l_v1 + self.l_v2) / 3).astype(F)
        self.l_rad = self.m_color[self.mat[idx]]
        self.l_energy = self.l_rad.sum(-1)

        self.p_pos = np.array([l.position for l in host_scene.point_lights], F) \
            if host_scene.point_lights else np.zeros((0, 3), F)
        self.p_rad = np.array([l.radiance for l in host_scene.point_lights], F) \
            if host_scene.point_lights else np.zeros((0, 3), F)

        self.sky = host_scene.sky_pixels if host_scene.sky_pixels is not None \
            else np.zeros((1, 1, 3), F)

    # brute-force closest hit
    def intersect(self, o, d, t_max=None):
        n = o.shape[0]
        t, u, v, hit = mt(o[:, None], d[:, None],
                          self.v0[None], self.e1[None], self.e2[None])
        t = np.where(hit, t, BIG)
        j = np.argmin(t, axis=1)
        tj = t[np.arange(n), j]
        prim = np.where(np.isfinite(tj) & (tj < BIG), j, -1).astype(np.int32)
        return tj.astype(F), prim, u[np.arange(n), j].astype(F), \
            v[np.arange(n), j].astype(F)

    def occluded(self, o, d, t_max):
        _, _, _, hit = mt(o[:, None], d[:, None],
                          self.v0[None], self.e1[None], self.e2[None],
                          t_max=t_max[:, None])
        return hit.any(axis=1)

    def sample_sky(self, d):
        h, w = self.sky.shape[:2]
        u = (w * 0.5 * (1.0 + np.arctan2(d[..., 0], -d[..., 2]) / np.pi)).astype(np.int32)
        v = (h * np.arccos(np.clip(d[..., 1], -1, 1)) / np.pi).astype(np.int32)
        return self.sky[np.clip(v, 0, h - 1), np.clip(u, 0, w - 1)]


def mt(o, d, v0, e1, e2, t_min=F(1e-6), t_max=BIG):
    h = np.cross(d, e2)
    a = np.sum(e1 * h, -1)
    valid = np.abs(a) > 1e-9
    f = 1.0 / np.where(valid, a, 1.0)
    s = o - v0
    u = f * np.sum(s * h, -1)
    q = np.cross(s, e1)
    v = f * np.sum(d * q, -1)
    t = f * np.sum(e2 * q, -1)
    hit = valid & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) \
        & (t > t_min) & (t < t_max)
    return t.astype(F), u.astype(F), v.astype(F), hit


def random_barycentrics(r):
    """Base-4 subdivision warp, mirrors core/sampling.py exactly."""
    uf = (r * F(4294967296.0)).astype(np.uint64).astype(U)
    z = np.zeros_like(r)
    a, b, c = z + 1, z.copy(), z.copy()
    d_, e, f_ = z.copy(), z + 1, z.copy()
    g, h, i = z.copy(), z.copy(), z + 1
    for _ in range(16):
        uf = uf * U(4)
        dd = (uf >> U(30)).astype(np.int32)
        an, bn, cn = 0.5 * (b + c), 0.5 * (c + a), 0.5 * (a + b)
        dn, en, fn = 0.5 * (e + f_), 0.5 * (f_ + d_), 0.5 * (d_ + e)
        gn, hn, i_n = 0.5 * (h + i), 0.5 * (i + g), 0.5 * (g + h)
        w = lambda x0, x1, x2, x3: np.choose(dd, [x0, x1, x2, x3])
        a, b, c = w(an, a, an, bn), w(bn, bn, b, an), w(cn, cn, cn, c)
        d_, e, f_ = w(dn, d_, dn, en), w(en, en, e, dn), w(fn, fn, fn, f_)
        g, h, i = w(gn, g, gn, hn), w(hn, hn, h, gn), w(i_n, i_n, i_n, i)
    return ((a + b + c) / 3).astype(F), ((d_ + e + f_) / 3).astype(F)


def onb(n):
    sign = np.where(n[..., 2] >= 0, F(1), F(-1))
    a = -1.0 / (sign + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = np.stack([1.0 + sign * n[..., 0] ** 2 * a, sign * b,
                  -sign * n[..., 0]], -1)
    bt = np.stack([b, sign + n[..., 1] ** 2 * a, -n[..., 1]], -1)
    return t.astype(F), bt.astype(F)


def render_oracle(host_scene, view, width, height, spp, max_path,
                  sample_base=0, cam_seed=0x12345678,
                  max_diffuse=1000, rr=True, clamp=10.0,
                  geometry_epsilon=1e-4):
    """One progressive pass; returns (acc [W*H,4], cam_seed')."""
    sc = OracleScene(host_scene)
    n = width * height * spp
    wh = width * height
    acc = np.zeros((wh, 4), F)
    path_idx = np.arange(n, dtype=U)
    pixel = (path_idx % U(wh)).astype(np.int32)
    geps = F(geometry_epsilon)

    # --- eye rays (mirrors generate_eye_rays) ------------------------------
    seed = wang_hash(path_idx * U(16789) + U(sample_base) * U(1791))
    seed, r0 = rand_float(seed)
    seed, r1 = rand_float(seed)
    seed, r2 = rand_float(seed)
    seed, r3 = rand_float(seed)
    p1 = np.asarray(view.p1, F)
    right = np.asarray(view.p2, F) - p1
    up = np.asarray(view.p3, F) - p1
    pos = np.asarray(view.pos, F)
    aperture = F(view.aperture)
    blade = np.floor(r2 * 9)
    r2b = (r2 - blade / 9) * 9
    a1 = blade * (np.pi / 4.5)
    a2 = (blade + 1) * (np.pi / 4.5)
    x1, y1 = np.sin(a1), np.cos(a1)
    x2, y2 = np.sin(a2), np.cos(a2)
    flipm = (r3 + r2b) > 1
    r3f = np.where(flipm, 1 - r3, r3)
    r2f = np.where(flipm, 1 - r2b, r2b)
    xr = x1 * r3f + x2 * r2f
    yr = y1 * r3f + y2 * r2f
    o = pos[None] + aperture * (right[None] * xr[:, None] + up[None] * yr[:, None])
    sx = (pixel % width).astype(F)
    sy = (pixel // width).astype(F)
    u = (sx + r0) / width
    v = (sy + r1) / height
    d = norm(p1[None] + u[:, None] * right[None] + v[:, None] * up[None] - o)
    o = o.astype(F)
    d = d.astype(F)

    throughput = np.ones((n, 3), F)
    bsdf_pdf = np.ones(n, F)
    last_n = d.copy()
    prev_spec = np.ones(n, bool)
    n_diffuse = np.zeros(n, np.int32)
    alive = np.ones(n, bool)
    cam_seed = U(cam_seed)

    def clampi(c):
        mx = c.max(-1, keepdims=True)
        scale = np.where(mx > clamp, clamp / np.maximum(mx, clamp), 1.0)
        return (c * scale).astype(F)

    for li in range(max_path):
        path_length = li + 1
        t, prim, bu, bv = sc.intersect(o, d)
        prim = np.where(alive, prim, -1)
        if li == 0:
            depth = np.where(prim >= 0, t, F(10000.0))
            np.add.at(acc[:, 3], pixel[alive], depth[alive])

        miss = alive & (prim < 0)
        sky_c = throughput * sc.sample_sky(d) / np.maximum(bsdf_pdf, 1e-30)[:, None]
        sky_c = clampi(np.nan_to_num(sky_c, nan=0, posinf=0, neginf=0))
        np.add.at(acc[:, :3], pixel[miss], sky_c[miss])

        hit = alive & (prim >= 0)
        p = np.maximum(prim, 0)
        i_pos = o + t[:, None] * d
        w = 1 - bu - bv
        n_geom = sc.face_n[p]
        n_int = norm(w[:, None] * sc.n0[p] + bu[:, None] * sc.n1[p]
                     + bv[:, None] * sc.n2[p])
        mid = sc.mat[p]
        color = sc.m_color[mid]
        rough = sc.m_rough[mid]
        trans = sc.m_trans[mid]
        eta = sc.m_eta[mid]
        absorb = sc.m_absorption[mid]
        # consistent normals: oracle scenes use alpha==0 surfaces → n_int
        n_sh = n_int
        emissive = color.max(-1) > 1

        # implicit light (MIS)
        ddotnl = -dot(d, n_geom)
        lit = hit & emissive & (ddotnl > 0)
        l_pdf = (t * t) / (-dot(d, n_geom) * sc.area[p])
        pick_p = light_pick_prob(sc, prim, o, last_n, i_pos)
        den = bsdf_pdf + l_pdf * pick_p
        c_mis = np.where((den > 0)[:, None],
                         throughput * color / np.maximum(den, 1e-30)[:, None], 0)
        c_spec = throughput * color / np.maximum(bsdf_pdf, 1e-30)[:, None]
        c_light = np.where(prev_spec[:, None], c_spec, c_mis)
        c_light = clampi(np.nan_to_num(c_light, nan=0, posinf=0, neginf=0))
        np.add.at(acc[:, :3], pixel[lit], c_light[lit])

        active = hit & ~emissive
        is_spec_mat = (trans > 0.999) | (rough <= 0.001)
        cam_seed, rv = (lambda s: (xorshift(s), xorshift(s)))(cam_seed)
        r0f = rv + U(91771) * U(path_length)
        seed = wang_hash(path_idx * U(17) + r0f)
        face_dir = np.where(dot(d, n_geom) > 0, F(-1), F(1))
        absorb = np.where((face_dir == 1)[:, None], 0, absorb)
        throughput = np.where(active[:, None],
                              throughput / np.maximum(bsdf_pdf, 1e-30)[:, None],
                              throughput)
        fn_flip = n_sh * face_dir[:, None]

        # NEE
        seed, r0 = rand_float(seed)
        seed, r1 = rand_float(seed)
        ls = random_point_on_light(sc, r0, r1, i_pos, fn_flip)
        l_vec = ls["point"] - i_pos
        dist = np.sqrt(np.maximum(dot(l_vec, l_vec), 1e-20))
        l_dir = l_vec / dist[:, None]
        n_dot_l = dot(l_dir, fn_flip)
        e_pdf = np.where(is_spec_mat, 0, np.abs(dot(l_dir, n_sh)) / np.pi)
        e_bsdf = np.where(is_spec_mat[:, None], 0, color / np.pi) \
            * rough[:, None]
        conn = active & ~is_spec_mat & (n_dot_l > 0) & (ls["pdf"] > 0) & (e_pdf > 0)
        den = ls["pick"] * ls["pdf"] + e_pdf
        pot = throughput * e_bsdf * ls["color"] \
            * np.where(conn, n_dot_l / np.where(conn, den, 1), 0)[:, None]
        pot = clampi(np.nan_to_num(pot, nan=0, posinf=0, neginf=0))
        so = safe_origin(i_pos, l_dir, n_geom * face_dir[:, None], geps)
        tmax = np.where(conn, dist - 2 * geps, 0)
        occ = sc.occluded(so, l_dir, tmax.astype(F))
        good = conn & ~occ
        np.add.at(acc[:, :3], pixel[good], pot[good])

        # bounce (lambert only)
        may = active & (n_diffuse < max_diffuse) & (path_length < max_path)
        seed, r3b = rand_float(seed)
        seed, r4b = rand_float(seed)
        smp = lambert_sample(color, rough, trans, eta, absorb, n_sh, n_geom,
                             -d, t, r3b, r4b)
        okpdf = (smp["pdf"] >= 1e-4) & np.isfinite(smp["pdf"])
        seed, r5 = rand_float(seed)
        bounced = n_diffuse > 0
        surv = np.minimum(1, smp["bsdf"].max(-1))
        p_surv = np.where(smp["spec"] | ~bounced, 1, surv).astype(F)
        if not rr:
            p_surv = np.ones_like(p_surv)
        rr_ok = r5 <= p_surv
        extend = may & okpdf & rr_ok
        nthr = np.where(extend[:, None],
                        throughput / np.where(extend, p_surv, 1)[:, None]
                        * smp["bsdf"] * np.abs(dot(n_sh, smp["wi"]))[:, None], throughput)
        nthr = np.nan_to_num(nthr, nan=0, posinf=0, neginf=0)
        no = safe_origin(i_pos, smp["wi"], n_geom * face_dir[:, None], geps)
        o = np.where(extend[:, None], no, o).astype(F)
        d = np.where(extend[:, None], smp["wi"], d).astype(F)
        throughput = nthr.astype(F)
        bsdf_pdf = np.where(extend, smp["pdf"], 1).astype(F)
        last_n = np.where(extend[:, None], fn_flip, last_n).astype(F)
        prev_spec = np.where(extend, smp["spec"], prev_spec)
        n_diffuse = n_diffuse + (extend & ~smp["spec"])
        alive = extend

    return acc, cam_seed


def safe_origin(o, r, n, eps):
    par = 1 - np.abs(dot(r, n))
    v = par * par
    return (o + (1 - v)[:, None] * (eps * n) + v[:, None] * (eps * r)).astype(F)


def potentials(sc, i_pos, nrm, area_point=None):
    lt = sc.l_v0.shape[0]
    pots = []
    if lt:
        tgt = area_point if area_point is not None \
            else np.broadcast_to(sc.l_centre[None], (i_pos.shape[0], lt, 3))
        l_vec = tgt - i_pos[:, None]
        att = 1.0 / np.maximum(np.sum(l_vec * l_vec, -1), 1e-12)
        l_dir = norm(l_vec)
        lnd = np.maximum(0, -np.sum(sc.l_n[None] * l_dir, -1))
        ndl = np.maximum(0, np.sum(nrm[:, None] * l_dir, -1))
        pots.append(sc.l_energy[None] * lnd * ndl * att)
    if sc.p_pos.shape[0]:
        l_vec = sc.p_pos[None] - i_pos[:, None]
        att = 1.0 / np.maximum(np.sum(l_vec * l_vec, -1), 1e-12)
        ndl = np.maximum(0, np.sum(nrm[:, None] * norm(l_vec), -1))
        pots.append(sc.p_rad.sum(-1)[None] * ndl * att)
    if not pots:
        return np.zeros((i_pos.shape[0], 0), F)
    return np.concatenate(pots, 1).astype(F)


def light_pick_prob(sc, prim, o, last_n, i_pos):
    lt = sc.l_v0.shape[0]
    nrays = o.shape[0]
    if lt == 0:
        return np.zeros(nrays, F)
    tgt = np.broadcast_to(i_pos[:, None], (nrays, lt, 3))
    pot = potentials(sc, o, last_n, area_point=tgt)
    s = pot.sum(1)
    lidx = sc.ltri[np.maximum(prim, 0)]
    p = pot[np.arange(nrays), np.clip(lidx, 0, pot.shape[1] - 1)]
    return np.where((s > 0) & (lidx >= 0), p / np.where(s > 0, s, 1), 0).astype(F)


def random_point_on_light(sc, r0, r1, i_pos, nrm):
    n = i_pos.shape[0]
    lt = sc.l_v0.shape[0]
    bu, bv = random_barycentrics(r0)
    bw = 1 - bu - bv
    if lt:
        pts = (bu[:, None, None] * sc.l_v0[None] + bv[:, None, None] * sc.l_v1[None]
               + bw[:, None, None] * sc.l_v2[None]).astype(F)
    else:
        pts = np.zeros((n, 0, 3), F)
    pot = potentials(sc, i_pos, nrm, area_point=pts if lt else None)
    s = pot.sum(1)
    cdf = np.cumsum(pot, 1)
    pick = np.sum(cdf < (r1 * s)[:, None], 1)
    pick = np.clip(pick, 0, max(pot.shape[1] - 1, 0))
    pickprob = np.where(s > 0, pot[np.arange(n), pick] / np.where(s > 0, s, 1), 0)

    lp = sc.p_pos.shape[0]
    is_area = pick < lt
    a_i = np.clip(pick, 0, max(lt - 1, 0))
    p_i = np.clip(pick - lt, 0, max(lp - 1, 0))
    out_p = np.zeros((n, 3), F)
    out_pdf = np.zeros(n, F)
    out_col = np.zeros((n, 3), F)
    if lt:
        pa = pts[np.arange(n), a_i]
        lrev = i_pos - pa
        sq = dot(lrev, lrev)
        lrevn = norm(lrev)
        lndl = np.sum(lrevn * sc.l_n[a_i], -1)
        ok = (lndl > 0) & (dot(lrevn, nrm) < 0)
        pdf_a = np.where(ok, sq / np.where(ok, np.maximum(sc.l_area[a_i] * lndl, 1e-30), 1), 0)
        out_p = np.where(is_area[:, None], pa, out_p)
        out_pdf = np.where(is_area, pdf_a, out_pdf)
        out_col = np.where(is_area[:, None], sc.l_rad[a_i], out_col)
    if lp:
        pp = sc.p_pos[p_i]
        lrev = i_pos - pp
        pdf_p = np.where(dot(norm(lrev), nrm) < 0, dot(lrev, lrev), 0)
        out_p = np.where(~is_area[:, None], pp, out_p)
        out_pdf = np.where(~is_area, pdf_p, out_pdf)
        out_col = np.where(~is_area[:, None], sc.p_rad[p_i], out_col)
    out_pdf = np.where(s > 0, out_pdf, 0)
    return dict(point=out_p.astype(F), pdf=out_pdf.astype(F),
                pick=pickprob.astype(F), color=out_col.astype(F))


def lambert_sample(color, rough, trans, eta, absorb, i_n, n_geom, wo, dist,
                   r3, r4):
    flip = np.where(dot(wo, n_geom) < 0, F(-1), F(1))
    i_n = i_n * flip[:, None]
    eio = np.where(flip < 0, 1.0 / np.maximum(eta, 1e-6), eta)
    vdn = dot(i_n, wo)
    fl = np.where(vdn < 0, 1.0 / eio, eio)
    av = np.abs(vdn)
    st2 = fl * fl * (1 - av * av)
    tir = st2 > 1
    ldn = np.sqrt(np.maximum(1 - st2, 0))
    rs = (av - fl * ldn) / np.maximum(av + fl * ldn, 1e-20)
    rp = (ldn - fl * av) / np.maximum(ldn + fl * av, 1e-20)
    fr = np.where(tir, 1, 0.5 * (rs * rs + rp * rp))
    beer = np.exp(-absorb * (dist * 2)[:, None])
    # reflect(-wo, n) = -wo + 2*dot(wo,n)*n
    wi_refl = -wo + 2 * dot(wo, i_n)[:, None] * i_n
    bsdf_refl = color * beer / np.maximum(np.abs(dot(i_n, wi_refl))[:, None], 1e-9)
    cos_i = np.abs(dot(i_n, wo))
    s2i = np.maximum(0, 1 - cos_i * cos_i)
    s2t = eio * eio * s2i
    refr_ok = s2t < 1
    cos_t = np.sqrt(np.maximum(1 - s2t, 0))
    wt = eio[:, None] * (-wo) + (eio * cos_i - cos_t)[:, None] * i_n
    bsdf_refr = color * beer / np.maximum(np.abs(dot(i_n, wt))[:, None], 1e-9)
    t_reflects = r3 < fr
    wi_t = np.where(t_reflects[:, None], wi_refl, wt)
    bsdf_t = np.where(t_reflects[:, None], bsdf_refl,
                      np.where(refr_ok[:, None], bsdf_refr, 0))

    p_reflect = 1 - rough
    pure = r3 < p_reflect
    bsdf_m = color / np.maximum(np.abs(dot(i_n, wi_refl))[:, None], 1e-9)
    r5 = (r3 - p_reflect) / np.maximum(1 - p_reflect, 1e-9)
    r6 = (r4 - trans) / np.maximum(1 - trans, 1e-9)
    term1 = 2 * np.pi * r5
    term2 = np.sqrt(np.maximum(1 - r6, 0))
    sq = np.sqrt(np.maximum(r6, 0))
    local = np.stack([np.cos(term1) * sq, np.sin(term1) * sq, term2], -1).astype(F)
    tt, bb = onb(i_n)
    wi_d = norm(local[:, 0:1] * tt + local[:, 1:2] * bb + local[:, 2:3] * i_n)
    pdf_d = np.maximum(0, dot(wi_d, i_n)) / np.pi
    bsdf_d = color / np.pi
    wi_r = np.where(pure[:, None], wi_refl, wi_d)
    bsdf_r = np.where(pure[:, None], bsdf_m, bsdf_d)
    pdf_r = np.where(pure, 1, pdf_d)

    transmit = r4 < trans
    wi = np.where(transmit[:, None], wi_t, wi_r)
    bsdf = np.where(transmit[:, None], bsdf_t, bsdf_r)
    pdf = np.where(transmit, 1, pdf_r)
    spec = transmit | (~transmit & pure)
    below = dot(n_geom * flip[:, None], wi) <= 0
    refracted = transmit & ~t_reflects
    pdf = np.where(below & ~refracted, 0, pdf)
    return dict(wi=wi.astype(F), bsdf=bsdf.astype(F), pdf=pdf.astype(F),
                spec=spec)
