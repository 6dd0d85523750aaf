"""Differentiable rendering entry points + inverse-rendering optimizer.

`render_image` is the whole wavefront pass (generate → bounce scan with
BVH traversal → NEE/MIS shading → accumulate) as one differentiable function
of the DeviceScene — the capability BASELINE.json adds on top of the
reference: pixel gradients flow to vertices (reparameterized hits), material
parameters, light radiance and the skydome.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lighthouse2_tpu.core.types import RenderConfig, ViewPyramid
from lighthouse2_tpu.render.wavefront import AccumState, trace_paths
from lighthouse2_tpu.scene.device_scene import DeviceScene


def render_image(scene: DeviceScene, view: ViewPyramid, config: RenderConfig,
                 sample_base: int = 0):
    """One pass of spp_per_pass samples → linear HDR image [W*H, 3].
    Differentiable wrt scene (and view). Deterministic in sample_base."""
    from lighthouse2_tpu.core import rng as rng_mod
    acc, _seed, _stats = trace_paths(
        scene, view, config, None, jnp.int32(sample_base),
        jnp.uint32(rng_mod.CAM_RNG_SEED))
    return acc[:, :3] / jnp.float32(config.spp_per_pass)


@functools.partial(jax.jit, static_argnames=("config",))
def render_image_jit(scene, view, config, sample_base=0):
    return render_image(scene, view, config, sample_base)


def make_loss(target, view, config: RenderConfig, insert, scene: DeviceScene,
              sample_base: int = 0):
    """L2 image loss as a function of a parameter pytree.
    `insert(scene, params) -> scene` (see diff.params)."""
    target = jnp.asarray(target).reshape(-1, 3)

    def loss(params):
        s = insert(scene, params)
        img = render_image(s, view, config, sample_base)
        return jnp.mean((img - target) ** 2)

    return loss


def optimize(loss_fn, params, steps: int = 32, lr: float = 5e-2,
             optimizer=None, sample_stride: int = 0, verbose: bool = False):
    """Adam loop for inverse rendering. If `loss_fn` accepts (params, step)
    pass sample_stride>0 to decorrelate MC noise across steps."""
    import optax
    opt = optimizer or optax.adam(lr)
    state = opt.init(params)

    if sample_stride:
        vg = jax.jit(jax.value_and_grad(lambda p, s: loss_fn(p, s)))
    else:
        vg = jax.jit(jax.value_and_grad(loss_fn))

    history = []
    for i in range(steps):
        if sample_stride:
            val, g = vg(params, i * sample_stride)
        else:
            val, g = vg(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        history.append(float(val))
        if verbose:
            print(f"step {i}: loss {float(val):.6e}")
    return params, history
