"""SVGF-style spatiotemporal filter + TAA (reference:
lib/CUDA/shared_kernel_code/finalize_shared.h, RenderCore_Optix7Filter).

Reference pipeline per frame (rendercore.cpp:828-862):
  prepareFilter (albedo demodulation + clamp + temporal moments 0.2/0.8)
  → applyFilter phase 1..3 (à-trous wavelet, edge-stopping weights on
    normal^128 / depth-plane / luminance-variance; phase 1 adds temporal
    blending with YCoCg neighborhood clamping)
  → TAA (Marco Salvi variance clipping) → unsharpen.

TPU-native re-design: every kernel becomes shifted-array stencil math over
[H,W] images (jnp.pad + static slices → XLA fuses the 21-tap à-trous into
one pass). History reprojection supports a MOVING camera: primary-hit world
positions are projected into the previous frame's ViewPyramid
(`project_to_view`) and history buffers are fetched with consistency-gated
bilinear taps (`reproject_history` — finalize_shared.h:102-199 prevPixelPos +
per-tap world-pos gating); pass `prev_view=None` for the cheaper static path.
Camera jitter for TAA uses the reference's 4-phase Halton offsets
(`jittered_view`, Optix7Filter/rendercore.cpp:734-743).

All state lives in `FilterState` (the prev* ping-pong buffers of
rendercore.cpp:845-859).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class FilterState:
    """Temporal history (prev moments / shading / world pos)."""
    moments: jnp.ndarray      # [H,W,4] lumDir, lumDir2, lumInd, lumInd2
    shading: jnp.ndarray      # [H,W,6] filtered direct+indirect of prev frame
    world_pos: jnp.ndarray    # [H,W,3]
    history: jnp.ndarray      # [H,W] int32 history length (0..15)

    @staticmethod
    def make(h, w):
        return FilterState(
            moments=jnp.zeros((h, w, 4), jnp.float32),
            shading=jnp.zeros((h, w, 6), jnp.float32),
            world_pos=jnp.full((h, w, 3), 1e30, jnp.float32),
            history=jnp.zeros((h, w), jnp.int32),
        )


# 4-phase Halton(2,3) subpixel offsets (Optix7Filter/rendercore.cpp:734-743)
_HALTON4 = ((0.5, 1.0 / 3.0), (0.25, 2.0 / 3.0),
            (0.75, 1.0 / 9.0), (0.125, 4.0 / 9.0))


def jittered_view(view, frame_idx: int, w: int, h: int):
    """Shift the image plane by a subpixel Halton offset for TAA.

    Returns (view', (jx, jy)) with jx/jy in [-0.5, 0.5) pixels."""
    jx, jy = _HALTON4[frame_idx % 4]
    jx, jy = jx - 0.5, jy - 0.5
    right = (view.p2 - view.p1) * (1.0 / w)
    down = (view.p3 - view.p1) * (1.0 / h)
    off = jx * right + jy * down
    return view.replace(p1=view.p1 + off, p2=view.p2 + off,
                        p3=view.p3 + off), (jx, jy)


def project_to_view(world_pos, view, w: int, h: int):
    """Screen coordinates of world points in a (previous) ViewPyramid —
    the motion-vector source. Inverse of the eye-ray mapping in
    wavefront.generate_eye_rays (pinhole; DOF/jitter ignored on purpose —
    the consistency gate absorbs the residual).

    world_pos [...,3] → (px, py, valid) with px/py in pixel units."""
    right = view.p2 - view.p1
    down = view.p3 - view.p1
    n = jnp.cross(right, down)
    d = world_pos - view.pos
    denom = jnp.einsum("...i,i->...", d, n)
    num = jnp.dot(view.p1 - view.pos, n)
    t = num / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    q = view.pos + t[..., None] * d - view.p1
    u = jnp.einsum("...i,i->...", q, right) / jnp.dot(right, right)
    v = jnp.einsum("...i,i->...", q, down) / jnp.dot(down, down)
    px = u * w - 0.5
    py = v * h - 0.5
    valid = (t > 0) & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
    return px, py, valid


def _bilinear_taps(px, py, w, h):
    """4 integer taps + bilinear weights for fractional pixel coords."""
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    out = []
    for dy, wy in ((0, 1.0 - fy), (1, fy)):
        for dx, wx in ((0, 1.0 - fx), (1, fx)):
            xx = x0 + dx
            yy = y0 + dy
            inb = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
            idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
            out.append((idx, wx * wy * inb))
    return out


def reproject_history(state: "FilterState", world_pos, normal, allowed,
                      prev_view):
    """Fetch history at the previous frame's pixel positions with
    consistency-gated bilinear taps (finalize_shared.h:102-199): a tap only
    contributes if its stored world position lies on the current surface's
    tangent plane (bilinear taps are NEIGHBORING pixels of the same surface,
    so a 3D point-distance test would reject them; the plane test is the
    reference's depth-consistency check expressed in world space).

    Returns (moments, shading, history, consistent) — consistent=False marks
    disocclusions (no valid tap survived)."""
    h, w = world_pos.shape[:2]
    px, py, valid = project_to_view(world_pos, prev_view, w, h)
    mom = state.moments.reshape(h * w, -1)
    sha = state.shading.reshape(h * w, -1)
    wp = state.world_pos.reshape(h * w, 3)
    his = state.history.reshape(h * w).astype(jnp.float32)

    mom_acc = jnp.zeros_like(state.moments)
    sha_acc = jnp.zeros_like(state.shading)
    his_acc = jnp.zeros(world_pos.shape[:2], jnp.float32)
    w_acc = jnp.zeros(world_pos.shape[:2], jnp.float32)
    for idx, wgt in _bilinear_taps(px, py, w, h):
        twp = jnp.take(wp, idx, axis=0)
        dvec = twp - world_pos
        plane_d = jnp.abs(jnp.sum(dvec * normal, -1))
        # also bound the in-plane distance: taps must be nearby surface
        # points (a few pixel footprints), not a far-away coplanar wall
        ok = (plane_d < allowed) & (
            jnp.linalg.norm(dvec, axis=-1) < 64.0 * allowed)
        tw = wgt * ok * valid
        mom_acc = mom_acc + jnp.take(mom, idx, axis=0) * tw[..., None]
        sha_acc = sha_acc + jnp.take(sha, idx, axis=0) * tw[..., None]
        his_acc = his_acc + jnp.take(his, idx, axis=0) * tw
        w_acc = w_acc + tw
    consistent = w_acc > 0.05
    inv = 1.0 / jnp.maximum(w_acc, 1e-6)
    return (mom_acc * inv[..., None], sha_acc * inv[..., None],
            (his_acc * inv).astype(jnp.int32), consistent)


def _luminance(v):
    return 0.2126 * v[..., 0] + 0.7152 * v[..., 1] + 0.0722 * v[..., 2]


def _rgb_to_ycocg(c):
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack([0.25 * r + 0.5 * g + 0.25 * b,
                      0.5 * r - 0.5 * b,
                      -0.25 * r + 0.5 * g - 0.25 * b], -1)


def _ycocg_to_rgb(c):
    y, co, cg = c[..., 0], c[..., 1], c[..., 2]
    return jnp.stack([y + co - cg, y + cg, y - co - cg], -1)


def _shift(img, dy, dx):
    """Shift with edge clamp: out[y,x] = img[y+dy, x+dx]."""
    h, w = img.shape[:2]
    py0, py1 = max(dy, 0), max(-dy, 0)
    px0, px1 = max(dx, 0), max(-dx, 0)
    pad = [(py1, py0), (px1, px0)] + [(0, 0)] * (img.ndim - 2)
    out = jnp.pad(img, pad, mode="edge")
    return out[py0:py0 + h, px0:px0 + w]


# à-trous tap pattern (finalize_shared.h:244-249): vv in -2..2,
# uu range narrows to ±1 on the outer rows
_TAPS = [(vv, uu) for vv in range(-2, 3)
         for uu in range(-(1 if abs(vv) == 2 else 2), (1 if abs(vv) == 2 else 2) + 1)
         if not (uu == 0 and vv == 0)]


def atrous_pass(direct, indirect, albedo, normal, depth, ddxy, moments,
                history, phase):
    """One à-trous wavelet pass (applyFilterKernel, finalize_shared.h:205-369).

    All inputs are [H,W,...] images. Returns filtered (direct, indirect).
    """
    step = 1 << (phase - 1)
    sigma = 10.0 * (0.5 ** (phase - 1))
    factor = jnp.where(history == 0, 400.0, 1.0)
    var_dir = jnp.maximum(moments[..., 1] - moments[..., 0] ** 2, 0.0)
    var_ind = jnp.maximum(moments[..., 3] - moments[..., 2] ** 2, 0.0)
    reci_dir = -1.0 / (sigma * factor * jnp.sqrt(var_dir + 1e-5) + 1e-5)
    reci_ind = -1.0 / (sigma * factor * jnp.sqrt(var_ind + 1e-5) + 1e-5)

    lum_dir = _luminance(direct)
    lum_ind = _luminance(indirect)
    ddx = ddxy[..., 0]
    ddy = ddxy[..., 1]

    dir_sum = direct
    ind_sum = indirect
    w_dir_sum = jnp.ones_like(lum_dir)
    w_ind_sum = jnp.ones_like(lum_ind)

    for (vv, uu) in _TAPS:
        n_dir = _shift(direct, vv * step, uu * step)
        n_ind = _shift(indirect, vv * step, uu * step)
        n_nrm = _shift(normal, vv * step, uu * step)
        n_dep = _shift(depth, vv * step, uu * step)
        n_alb = _shift(albedo, vv * step, uu * step)
        w_dist = (uu * uu + vv * vv) * (-1.0 / 7.5)
        w_normal = jnp.maximum(0.0, jnp.sum(n_nrm * normal, -1)) ** 128
        expected = depth + ddx * (uu * step) + ddy * (vv * step)
        depth_err = jnp.abs(expected - n_dep)
        expected_diff = jnp.abs(expected - depth)
        w_depth = depth_err / jnp.maximum(1e-5, (0.5 + phase * 0.5) * expected_diff)
        w_normal = w_normal * jnp.sum(albedo * n_alb, -1)
        w_d = w_normal * jnp.exp(
            jnp.abs(lum_dir - _luminance(n_dir)) * reci_dir + w_dist - w_depth)
        w_i = w_normal * jnp.exp(
            jnp.abs(lum_ind - _luminance(n_ind)) * reci_ind + w_dist - w_depth)
        w_d = jnp.where(jnp.isfinite(w_d), w_d, 0.0)
        w_i = jnp.where(jnp.isfinite(w_i), w_i, 0.0)
        dir_sum = dir_sum + n_dir * w_d[..., None]
        ind_sum = ind_sum + n_ind * w_i[..., None]
        w_dir_sum = w_dir_sum + w_d
        w_ind_sum = w_ind_sum + w_i

    return (dir_sum / jnp.maximum(w_dir_sum, 1e-4)[..., None],
            ind_sum / jnp.maximum(w_ind_sum, 1e-4)[..., None])


def _neighborhood_clamp(img_ycocg_center, a_direct, a_indirect, prev_d, prev_i):
    """YCoCg 3x3 neighborhood clamping (finalize_shared.h:305-345)."""
    def stats(img):
        acc = _rgb_to_ycocg(img)
        s = acc
        s2 = acc * acc
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                n = _rgb_to_ycocg(_shift(img, dy, dx))
                s = s + n
                s2 = s2 + n * n
        avg = s / 9.0
        var = jnp.maximum(s2 / 9.0 - avg * avg, 0.0)
        sig = jnp.sqrt(var)
        return avg - 0.75 * sig, avg + 0.75 * sig

    lo_d, hi_d = stats(a_direct)
    lo_i, hi_i = stats(a_indirect)
    pd = jnp.clip(_rgb_to_ycocg(prev_d), lo_d, hi_d)
    pi = jnp.clip(_rgb_to_ycocg(prev_i), lo_i, hi_i)
    return _ycocg_to_rgb(pd), _ycocg_to_rgb(pi)


def svgf_filter(direct, indirect, albedo, normal, depth, world_pos,
                state: FilterState, direct_clamp=15.0, indirect_clamp=2.5,
                n_phases=3, prev_view=None):
    """Full SVGF frame.

    Inputs are per-pixel [H,W,3|1] images: raw direct/indirect radiance
    (NOT albedo-demodulated), primary-hit features. `prev_view` is the
    PREVIOUS frame's ViewPyramid: when given, history is motion-vector
    reprojected (moving camera); when None the camera is assumed static.
    Returns (filtered_color [H,W,3], new FilterState).
    """
    # --- prepare (finalize_shared.h:102-199) -------------------------------
    reci_albedo = 1.0 / jnp.maximum(albedo, 1e-4)
    d_l = jnp.minimum(direct * reci_albedo, direct_clamp)
    i_l = jnp.minimum(indirect * reci_albedo, indirect_clamp)
    lum = jnp.stack([_luminance(d_l), _luminance(d_l) ** 2,
                     _luminance(i_l), _luminance(i_l) ** 2], -1)
    # history consistency: same surface within allowed distance
    ddx = jnp.abs(depth - _shift(depth, 0, 1))
    ddy = jnp.abs(depth - _shift(depth, 1, 0))
    ddxy = jnp.stack([ddx, ddy], -1)
    allowed = jnp.maximum(0.05, ddx + ddy)
    if prev_view is not None:
        prev_moments, prev_shading, prev_hist, consistent = reproject_history(
            state, world_pos, normal, allowed, prev_view)
    else:
        prev_moments, prev_shading = state.moments, state.shading
        prev_hist = state.history
        wp_dist = jnp.linalg.norm(world_pos - state.world_pos, axis=-1)
        consistent = wp_dist < allowed
    moments = jnp.where(consistent[..., None],
                        0.2 * lum + 0.8 * prev_moments, lum)
    history = jnp.where(consistent, jnp.minimum(prev_hist + 1, 15), 0)

    # --- à-trous phases (rendercore.cpp:838-842) ---------------------------
    d_f, i_f = d_l, i_l
    for phase in range(1, n_phases + 1):
        d_new, i_new = atrous_pass(d_f, i_f, albedo, normal, depth, ddxy,
                                   moments, history, phase)
        if phase == 1:
            # temporal blend with neighborhood clamp (finalize_shared.h:298-346)
            prev_d = prev_shading[..., :3]
            prev_i = prev_shading[..., 3:]
            cd, ci = _neighborhood_clamp(None, d_f, i_f, prev_d, prev_i)
            d_new = jnp.where(consistent[..., None],
                              0.1 * d_new + 0.9 * cd, d_new)
            i_new = jnp.where(consistent[..., None],
                              0.1 * i_new + 0.9 * ci, i_new)
        d_f, i_f = d_new, i_new

    color = (d_f + i_f) * albedo
    new_state = FilterState(
        moments=moments,
        shading=jnp.concatenate([d_f, i_f], -1),
        world_pos=world_pos,
        history=history,
    )
    return color, new_state


# ---------------------------------------------------------------------------
# TAA (finalize_shared.h:383-432, Marco Salvi variance clipping) + unsharpen
# ---------------------------------------------------------------------------

@struct.dataclass
class TAAState:
    prev: jnp.ndarray   # [H,W,3] previous output (post-TAA)

    @staticmethod
    def make(h, w):
        return TAAState(prev=jnp.zeros((h, w, 3), jnp.float32))


def _mitchell_weight(v):
    """Mitchell-Netravali B=C=1/3 kernel (sampling_shared.h:22-28)."""
    x = jnp.abs(v)
    x2 = x * x
    x3 = x2 * x
    b = c = 1.0 / 3.0
    inner = (1.0 / 6.0) * ((12 - 9 * b - 6 * c) * x3
                           + (-18 + 12 * b + 6 * c) * x2 + (6 - 2 * b))
    outer = (1.0 / 6.0) * ((-b - 6 * c) * x3 + (6 * b + 30 * c) * x2
                           + (-12 * b - 48 * c) * x + (8 * b + 24 * c))
    return jnp.where(x < 1.0, inner, jnp.where(x < 2.0, outer, 0.0))


def _mitchell_taps(px, py, w, h):
    """16 (flat index, weight) taps of the 4x4 Mitchell-Netravali window
    around (px, py) — ReadTexelBmitchellNetravali (sampling_shared.h:102-119;
    out-of-bounds taps get zero weight, total renormalized by the caller)."""
    x1 = jnp.floor(px - 2.0)
    y1 = jnp.floor(py - 2.0)
    for oy in range(4):
        for ox in range(4):
            x = x1 + 1.0 + ox
            y = y1 + 1.0 + oy
            inside = (x >= 0) & (y > 0) & (x < w) & (y < h)
            wgt = jnp.where(inside,
                            _mitchell_weight(x - px) * _mitchell_weight(
                                y - py), 0.0)
            xi = jnp.clip(x.astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
            yield yi * w + xi, wgt


def taa(color, state: TAAState, blend=0.9, world_pos=None, prev_view=None,
        mitchell=True):
    """Variance-clipped temporal AA. With `world_pos` + `prev_view`, the
    history sample is motion-vector reprojected through a 4x4
    Mitchell-Netravali resample (the reference's TAA history read,
    finalize_shared.h:399; mitchell=False falls back to bilinear); the
    YCoCg variance clip absorbs residual mismatch, as in the reference."""
    s = _rgb_to_ycocg(color)
    s2 = s * s
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = _rgb_to_ycocg(_shift(color, dy, dx))
            s = s + n
            s2 = s2 + n * n
    mu = s / 9.0
    sig = jnp.sqrt(jnp.maximum(s2 / 9.0 - mu * mu, 0.0))
    lo = mu - 1.0 * sig
    hi = mu + 1.0 * sig
    hist = state.prev
    if prev_view is not None and world_pos is not None:
        h, w = color.shape[:2]
        px, py, valid = project_to_view(world_pos, prev_view, w, h)
        pf = state.prev.reshape(h * w, 3)
        acc = jnp.zeros_like(color)
        wa = jnp.zeros(color.shape[:2], jnp.float32)
        taps = (_mitchell_taps(px, py, w, h) if mitchell
                else _bilinear_taps(px, py, w, h))
        for idx, wgt in taps:
            tw = wgt * valid
            acc = acc + jnp.take(pf, idx, axis=0) * tw[..., None]
            wa = wa + tw
        hist = jnp.where((wa > 1e-4)[..., None],
                         acc / jnp.maximum(wa, 1e-6)[..., None], color)
    prev = jnp.clip(_rgb_to_ycocg(hist), lo, hi)
    out = _ycocg_to_rgb((1.0 - blend) * _rgb_to_ycocg(color) + blend * prev)
    return out, TAAState(prev=out)


def unsharpen(color, amount=0.3):
    """unsharpenTAA (finalize_shared.h:438-466): 3x3 unsharp mask."""
    blur = color * 0.25
    for dy, dx, w in ((0, 1, 0.125), (0, -1, 0.125), (1, 0, 0.125),
                      (-1, 0, 0.125), (1, 1, 0.0625), (1, -1, 0.0625),
                      (-1, 1, 0.0625), (-1, -1, 0.0625)):
        blur = blur + _shift(color, dy, dx) * w
    return jnp.maximum(color + (color - blur) * amount, 0.0)
