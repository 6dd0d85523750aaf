"""Finite-difference gradient validation harness.

The reference validates images against a dedicated reference core
(RenderCore_PrimeRef, apps/imguiapp/main.cpp:170); the differentiable
framework additionally validates GRADIENTS against central finite
differences. Because the renderer is a deterministic function of (scene,
view, seeds), f(p±εu) uses the exact same sample paths, so FD and autodiff
agree up to f32 rounding and true discontinuity crossings (which the
reparameterized estimator deliberately smooths).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def directional_fd(f, p, u, eps: float):
    """Central difference of scalar f along direction u at p (pytrees)."""
    add = lambda a, b, s: jax.tree_util.tree_map(lambda x, y: x + s * y, a, b)
    fp = f(add(p, u, eps))
    fm = f(add(p, u, -eps))
    return (float(fp) - float(fm)) / (2.0 * eps)


def check_grad(f, p, eps: float = 1e-3, n_dirs: int = 4, seed: int = 0,
               rtol: float = 0.05, atol: float = 1e-4, verbose: bool = False):
    """Compare <grad f, u> with central differences along n_dirs random
    unit directions. Returns (max relative error, list of (ad, fd) pairs)."""
    g = jax.grad(f)(p)
    leaves, treedef = jax.tree_util.tree_flatten(p)
    rng = np.random.RandomState(seed)
    results = []
    worst = 0.0
    for k in range(n_dirs):
        u_leaves = []
        norm2 = 0.0
        for leaf in leaves:
            v = rng.randn(*np.shape(leaf)).astype(np.float32)
            norm2 += float((v * v).sum())
            u_leaves.append(v)
        scale = 1.0 / max(np.sqrt(norm2), 1e-12)
        u = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(v * scale) for v in u_leaves])
        ad = float(sum(jnp.vdot(gl, ul) for gl, ul
                       in zip(jax.tree_util.tree_leaves(g),
                              jax.tree_util.tree_leaves(u))))
        fd = directional_fd(f, p, u, eps)
        err = abs(ad - fd) / max(abs(fd), abs(ad), atol / rtol)
        worst = max(worst, err)
        results.append((ad, fd))
        if verbose:
            print(f"dir {k}: ad={ad:+.6e} fd={fd:+.6e} rel={err:.3e}")
    return worst, results
