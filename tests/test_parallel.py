"""Multi-device sharding tests on the 8 virtual CPU devices forced by
conftest.py (SURVEY.md §4.7 — the reference is single-GPU, so multi-chip
correctness is a new obligation of the TPU framework; VERDICT r1 #3/#4).

The contract under test: `render_pass_sharded` / `train_step_sharded`
(parallel/mesh.py) must produce the SAME image/gradients as the single-chip
path — the per-path RNG is keyed on the *global* path index, so sharding the
index range over chips cannot change the estimate.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lighthouse2_tpu.core.types import RenderConfig
from lighthouse2_tpu.render.wavefront import AccumState, render_pass_jit
from lighthouse2_tpu.parallel.mesh import (
    make_mesh, replicate_scene, render_pass_sharded, train_step_sharded)
from lighthouse2_tpu.scene.presets import cornell_box

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")

CFG = RenderConfig(width=16, height=16, spp_per_pass=4, max_path_length=3,
                   use_bvh=True)


def _setup():
    scene, cam = cornell_box(CFG.width, CFG.height)
    ds = scene.sync(rebuild_bvh=True)
    return ds, cam.get_view()


def test_sharded_matches_single_chip():
    ds, view = _setup()
    st = AccumState.make(CFG)
    st1, stats1 = render_pass_jit(ds, view, st, CFG)

    mesh = make_mesh(8)
    dsr = replicate_scene(ds, mesh)
    st8, stats8 = render_pass_sharded(dsr, view, AccumState.make(CFG), CFG,
                                      mesh)
    np.testing.assert_allclose(np.asarray(st8.accumulator),
                               np.asarray(st1.accumulator),
                               rtol=1e-4, atol=1e-5)
    assert int(stats8["total_extension"]) == int(stats1["total_extension"])
    assert int(stats8["total_shadow"]) == int(stats1["total_shadow"])


def test_sharded_gradients_match_single_chip():
    """Parameter gradients all-reduced over the mesh == single-chip grads."""
    ds, view = _setup()
    target = jnp.zeros((CFG.width * CFG.height, 3), jnp.float32)

    extract = lambda s: s.materials.color
    insert = lambda s, p: s.replace(materials=s.materials.replace(color=p))

    def single_loss(p):
        st, _ = render_pass_jit(insert(ds, p), view, AccumState.make(CFG), CFG)
        img = st.accumulator[:, :3] / jnp.float32(CFG.spp_per_pass)
        return jnp.mean((img - target) ** 2)

    l1, g1 = jax.value_and_grad(single_loss)(ds.materials.color)

    mesh = make_mesh(8)
    dsr = replicate_scene(ds, mesh)
    l8, g8 = train_step_sharded(dsr, view, target, CFG, mesh,
                                extract, insert, dsr.materials.color)
    assert np.isfinite(float(l8))
    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g1),
                               rtol=1e-4, atol=1e-6)


def test_sharded_uneven_device_counts():
    """Mesh sizes that don't equal the full device pool still work (2, 4)."""
    ds, view = _setup()
    st = AccumState.make(CFG)
    st1, _ = render_pass_jit(ds, view, st, CFG)
    for n in (2, 4):
        mesh = make_mesh(n)
        dsr = replicate_scene(ds, mesh)
        stn, _ = render_pass_sharded(dsr, view, AccumState.make(CFG), CFG,
                                     mesh)
        np.testing.assert_allclose(np.asarray(stn.accumulator),
                                   np.asarray(st1.accumulator),
                                   rtol=1e-4, atol=1e-5)


def test_sharded_cluster_kernel_path_compiles_and_matches():
    """Ray-DP through the PALLAS CLUSTER KERNEL under shard_map (interpret
    mode on the CPU mesh) — the real multi-chip TPU configuration. Guards
    the r5 vma fix: with check_vma forced on, pallas_call outputs cannot
    annotate varying manual axes and the TPU multi-chip path CRASHES."""
    import dataclasses
    ds, view = _setup()
    kcfg = dataclasses.replace(CFG, intersector="cluster",
                               kernel_interpret=True)
    st1, _ = render_pass_jit(ds, view, AccumState.make(kcfg), kcfg)
    mesh = make_mesh(4)
    dsr = replicate_scene(ds, mesh)
    st4, _ = render_pass_sharded(dsr, view, AccumState.make(kcfg), kcfg,
                                 mesh)
    np.testing.assert_allclose(np.asarray(st4.accumulator),
                               np.asarray(st1.accumulator),
                               rtol=1e-4, atol=1e-5)
