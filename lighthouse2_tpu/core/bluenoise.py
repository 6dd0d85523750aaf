"""Blue-noise low-discrepancy sampler (the BLUENOISE feature of the optix7
core — optix/.optix.cu:72-79, tools_shared.h:335-350, tables loaded at
rendercore.cpp:258-268).

The reference ships Heitz's precomputed Sobol+scrambling+ranking tiles as
binary data. We cannot (and per the no-copy rule should not) ship those
tables; instead this module *generates* an equivalent-role sampler:

  - a 128x128 toroidal blue-noise mask built with Ulichney's void-and-cluster
    algorithm (deterministic, cached to disk on first use);
  - per-dimension low-discrepancy sequences (R2 additive recurrence —
    equidistributed like Sobol for the 1-2D projections used here);
  - Cranley-Patterson rotation of the sequence by the mask value at a
    per-dimension toroidal shift of the pixel, which is what distributes the
    per-pixel error as blue noise — the visible property the Heitz tables
    provide at low spp.

Same call contract as blueNoiseSampler(x,y,sampleIdx,dim): deterministic,
returns [0,1).
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

MASK_N = 128
_SIGMA = 1.9          # Ulichney's recommended gaussian sigma
# R2 additive-recurrence alphas (generalized golden ratio, d=2):
# z = plastic number 1.3247179572...; alpha = (1/z, 1/z^2)
_PLASTIC = 1.32471795724474602596
_ALPHA = (1.0 / _PLASTIC, 1.0 / (_PLASTIC * _PLASTIC))
# per-dimension toroidal shifts of the mask (decorrelate dimensions)
_SHIFT_X = 59
_SHIFT_Y = 83


def _wrapped_gaussian_kernel(n: int, sigma: float) -> np.ndarray:
    ax = np.arange(n)
    d = np.minimum(ax, n - ax).astype(np.float64)
    g1 = np.exp(-(d * d) / (2 * sigma * sigma))
    return np.outer(g1, g1)


def generate_mask(n: int = MASK_N, seed: int = 0x1337,
                  initial_fraction: float = 0.1) -> np.ndarray:
    """Void-and-cluster (Ulichney 1993) toroidal blue-noise rank mask.

    Returns [n,n] float32 in [0,1) (rank / n^2). Deterministic. Incremental
    energy updates (one wrapped-gaussian splat per change) keep it O(n^4)
    adds — a few seconds for n=128 — with no FFTs.
    """
    rng = np.random.RandomState(seed)
    total = n * n
    kern = _wrapped_gaussian_kernel(n, _SIGMA)

    def splat(energy, x, y, sign):
        energy += sign * np.roll(np.roll(kern, x, axis=0), y, axis=1)

    # --- phase 0: random initial pattern + relaxation --------------------
    ones = int(total * initial_fraction)
    pattern = np.zeros((n, n), bool)
    idx = rng.choice(total, ones, replace=False)
    pattern.flat[idx] = True
    energy = np.zeros((n, n))
    for x, y in zip(*np.nonzero(pattern)):
        splat(energy, x, y, +1.0)
    big = 1e18
    for _ in range(total):  # relaxation always terminates long before this
        # tightest cluster = max energy among ones
        e1 = np.where(pattern, energy, -big)
        cx, cy = np.unravel_index(np.argmax(e1), (n, n))
        pattern[cx, cy] = False
        splat(energy, cx, cy, -1.0)
        # largest void = min energy among zeros
        e0 = np.where(pattern, big, energy)
        vx, vy = np.unravel_index(np.argmin(e0), (n, n))
        if (vx, vy) == (cx, cy):          # stable: removing the tightest
            pattern[cx, cy] = True        # cluster creates the largest void
            splat(energy, cx, cy, +1.0)
            break
        pattern[vx, vy] = True
        splat(energy, vx, vy, +1.0)

    rank = np.zeros((n, n), np.int32)
    # --- phase 1: rank the initial ones by removing tightest clusters ----
    pat = pattern.copy()
    e = energy.copy()
    for r in range(ones - 1, -1, -1):
        e1 = np.where(pat, e, -big)
        cx, cy = np.unravel_index(np.argmax(e1), (n, n))
        pat[cx, cy] = False
        splat(e, cx, cy, -1.0)
        rank[cx, cy] = r
    # --- phase 2/3: fill largest voids upward -----------------------------
    pat = pattern.copy()
    e = energy.copy()
    for r in range(ones, total):
        e0 = np.where(pat, big, e)
        vx, vy = np.unravel_index(np.argmin(e0), (n, n))
        pat[vx, vy] = True
        splat(e, vx, vy, +1.0)
        rank[vx, vy] = r
    return (rank.astype(np.float32) + 0.5) / np.float32(total)


_cached_mask = None


def get_mask() -> np.ndarray:
    """The process-wide mask, generated once and cached on disk."""
    global _cached_mask
    if _cached_mask is not None:
        return _cached_mask
    cache_dir = os.environ.get(
        "LH2_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", "..",
                                      ".asset_cache"))
    path = os.path.join(cache_dir, f"bluenoise_{MASK_N}.npy")
    if os.path.exists(path):
        _cached_mask = np.load(path)
    else:
        _cached_mask = generate_mask()
        try:
            os.makedirs(cache_dir, exist_ok=True)
            np.save(path, _cached_mask)
        except OSError:
            pass
    return _cached_mask


def device_mask():
    return jnp.asarray(get_mask())


def sample(mask, x, y, sample_idx, dim):
    """blueNoiseSampler analog: [0,1) for pixel (x,y), sample, dimension.

    R2 sequence value for (sample_idx, dim) + Cranley-Patterson rotation by
    the blue-noise mask at a per-dimension shift of (x,y). All uint32/f32
    vector math, jit-safe.
    """
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    s = jnp.asarray(sample_idx, jnp.uint32).astype(jnp.float32)
    d = jnp.asarray(dim, jnp.int32)
    alpha = jnp.where(d % 2 == 0, _ALPHA[0], _ALPHA[1])
    # decorrelate consecutive dimension PAIRS by skipping along the sequence
    pair = (d // 2).astype(jnp.float32)
    seq = jnp.mod(alpha * (s + 1.0) + 0.41421356 * pair, 1.0)
    mx = (x + _SHIFT_X * d) & (MASK_N - 1)
    my = (y + _SHIFT_Y * d) & (MASK_N - 1)
    rot = mask[mx, my]
    return jnp.mod(seq + rot, 1.0)
