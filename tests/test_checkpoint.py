"""Checkpoint/resume for differentiable-optimization runs (SURVEY §5.4 TPU
equivalent; VERDICT r3 #10): an interrupted optimize() resumes exactly."""
import numpy as np
import jax.numpy as jnp

from lighthouse2_tpu.diff.render import (
    optimize, save_checkpoint, load_checkpoint)


def _quad_loss(target):
    def loss(p):
        return jnp.sum((p - target) ** 2)
    return loss


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "run.ckpt")
    p0 = jnp.array([0.0, 0.0, 0.0])
    tgt = jnp.array([1.0, -2.0, 0.5])
    # full uninterrupted run
    p_full, h_full = optimize(_quad_loss(tgt), p0, steps=12, lr=0.2)
    # interrupted at 6 (checkpoint_every=3 -> saved at step 6)
    p_half, h_half = optimize(_quad_loss(tgt), p0, steps=6, lr=0.2,
                              checkpoint_path=path, checkpoint_every=3)
    ck = load_checkpoint(path)
    assert ck is not None and ck["step"] == 6
    # resume to 12 — must match the uninterrupted run exactly
    p_res, h_res = optimize(_quad_loss(tgt), p0, steps=12, lr=0.2,
                            checkpoint_path=path, checkpoint_every=3)
    np.testing.assert_allclose(np.asarray(p_res), np.asarray(p_full),
                               rtol=1e-6)
    np.testing.assert_allclose(h_res, h_full, rtol=1e-6)


def test_checkpoint_atomic_overwrite(tmp_path):
    path = str(tmp_path / "c.ckpt")
    save_checkpoint(path, {"a": jnp.ones(3)}, {"m": jnp.zeros(3)}, 4, [1.0])
    save_checkpoint(path, {"a": jnp.ones(3) * 2}, {"m": jnp.zeros(3)}, 8,
                    [1.0, 0.5])
    ck = load_checkpoint(path)
    assert ck["step"] == 8
    np.testing.assert_array_equal(np.asarray(ck["params"]["a"]),
                                  np.full(3, 2.0))
