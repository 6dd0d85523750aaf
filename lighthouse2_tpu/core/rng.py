"""Deterministic counter-style RNG matching the reference sampling schedule.

The reference uses WangHash-seeded xorshift32 streams per path
(reference: lib/CUDA/shared_kernel_code/tools_shared.h:60-62, seeds at
lib/rendercore_optix7/kernels/pathtracer.h:155 and optix/.optix.cu:111).
We reproduce those exact uint32 semantics so converged images are
deterministic per camera pose and comparable against the NumPy oracle.

All functions are pure, vectorized over uint32 arrays, and safe under jit.
"""
from __future__ import annotations

import jax.numpy as jnp

# float scale = 1/2^32 as used by the reference (tools_shared.h:62)
_INV_2_32 = 2.3283064365387e-10


def wang_hash(s):
    """WangHash over uint32 (tools_shared.h:60)."""
    s = jnp.asarray(s, jnp.uint32)
    s = (s ^ jnp.uint32(61)) ^ (s >> 16)
    s = s * jnp.uint32(9)
    s = s ^ (s >> 4)
    s = s * jnp.uint32(0x27D4EB2D)
    s = s ^ (s >> 15)
    return s


def xorshift32(seed):
    """One xorshift32 step; returns the new seed (== the random uint)."""
    seed = jnp.asarray(seed, jnp.uint32)
    seed = seed ^ (seed << 13)
    seed = seed ^ (seed >> 17)
    seed = seed ^ (seed << 5)
    return seed


def random_uint(seed):
    """(new_seed, value) — reference RandomUInt updates the seed in place."""
    seed = xorshift32(seed)
    return seed, seed


def random_float(seed):
    """(new_seed, float in [0,1)) — reference RandomFloat (tools_shared.h:62)."""
    seed, v = random_uint(seed)
    return seed, v.astype(jnp.float32) * jnp.float32(_INV_2_32)


def path_seed(path_idx, r0):
    """Per-path shade-stage seed: WangHash(pathIdx*17 + R0) (pathtracer.h:155)."""
    path_idx = jnp.asarray(path_idx, jnp.uint32)
    return wang_hash(path_idx * jnp.uint32(17) + jnp.asarray(r0, jnp.uint32))


def raygen_seed(path_idx, sample_idx):
    """Per-path raygen seed: WangHash(pathIdx*16789 + pass*1791) (.optix.cu:111)."""
    path_idx = jnp.asarray(path_idx, jnp.uint32)
    s = jnp.asarray(sample_idx, jnp.uint32)
    return wang_hash(path_idx * jnp.uint32(16789) + s * jnp.uint32(1791))


def frame_r0(cam_seed, path_length):
    """(new_cam_seed, R0) — per-frame/per-bounce base offset.

    Reference: R0 = RandomUInt(camRNGseed) + pathLength * 91771
    (rendercore_optix7/rendercore.cpp:719).
    """
    cam_seed, v = random_uint(cam_seed)
    return cam_seed, v + jnp.uint32(91771) * jnp.asarray(path_length, jnp.uint32)


CAM_RNG_SEED = 0x12345678  # restart value (rendercore_optix7/rendercore.cpp:633)
