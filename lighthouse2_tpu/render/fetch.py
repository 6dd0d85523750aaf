"""Gradient reattachment for kernel-extracted payloads.

The trace kernel (render/kernels/trace.py) returns each ray's shading
attributes directly — extracted on-device from the cluster tiles — so the
forward pass does zero per-primitive gathers. But the kernel is opaque to
autodiff. `reattach_rows` closes the loop: its FORWARD returns the kernel
payload unchanged (free); its BACKWARD scatter-adds the cotangents into the
live pack array at the per-ray indices, which is exactly the vjp of the
gather `pack[:, idx]` the payload replaces. This is valid because the tiles
are baked from the same f32 values the pack holds (clusters.py /
bake_material_rows), so payload == pack[:, idx] bit-for-bit on hit lanes.

This generalizes the reparameterized-hit trick (bvh/traverse.py refine_hit,
SURVEY.md §7.3.3) from re-intersection to arbitrary attribute fetch."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes


@jax.custom_vjp
def reattach_rows(pack, idx, rows):
    """rows ≡ pack[:, idx] (precomputed by the kernel). Returns rows with
    gradients flowing to `pack` as if it had been gathered.

    pack: [K, T]; idx: [N] int32 (negative = miss, no gradient);
    rows: [K, N] kernel payload."""
    return rows


def _reattach_fwd(pack, idx, rows):
    # pack rides the residuals only for its shape/dtype (zeros_like in bwd)
    return rows, (idx, pack)


def _reattach_bwd(res, g):
    idx, pack = res
    ok = idx >= 0
    safe = jnp.where(ok, idx, 0)
    g = jnp.where(ok[None, :], g, 0.0).astype(pack.dtype)
    d_pack = jnp.zeros_like(pack).at[:, safe].add(g)
    d_idx = np.zeros(idx.shape, dtypes.float0)  # int input: zero cotangent
    return d_pack, d_idx, jnp.zeros_like(g)


reattach_rows.defvjp(_reattach_fwd, _reattach_bwd)
