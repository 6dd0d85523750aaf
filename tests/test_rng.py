"""RNG parity with the reference xorshift32/WangHash semantics
(tools_shared.h:60-62) — validated against an independent pure-python
uint32 implementation."""
import numpy as np
import jax.numpy as jnp

from lighthouse2_tpu.core import rng


def py_wang_hash(s):
    s = (s ^ 61) ^ (s >> 16)
    s = (s * 9) & 0xFFFFFFFF
    s = s ^ (s >> 4)
    s = (s * 0x27D4EB2D) & 0xFFFFFFFF
    s = s ^ (s >> 15)
    return s & 0xFFFFFFFF


def py_xorshift(s):
    s ^= (s << 13) & 0xFFFFFFFF
    s &= 0xFFFFFFFF
    s ^= s >> 17
    s ^= (s << 5) & 0xFFFFFFFF
    return s & 0xFFFFFFFF


def test_wang_hash_matches_python():
    vals = np.array([1, 17, 12345, 0xDEADBEEF, 0xFFFFFFFF], np.uint32)
    got = np.asarray(rng.wang_hash(jnp.asarray(vals)))
    want = np.array([py_wang_hash(int(v)) for v in vals], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_xorshift_matches_python():
    vals = np.array([1, 2, 99991, 0x12345678], np.uint32)
    got = np.asarray(rng.xorshift32(jnp.asarray(vals)))
    want = np.array([py_xorshift(int(v)) for v in vals], np.uint32)
    np.testing.assert_array_equal(got, want)


def test_random_float_range_and_determinism():
    # hash sequential ids first, as every reference seed schedule does
    seed = rng.wang_hash(jnp.asarray(np.arange(1, 10001, dtype=np.uint32)))
    s1, f1 = rng.random_float(seed)
    s2, f2 = rng.random_float(s1)
    f1 = np.asarray(f1)
    f2 = np.asarray(f2)
    assert f1.min() >= 0.0 and f1.max() < 1.0
    assert not np.array_equal(f1, f2)
    # deterministic
    _, f1b = rng.random_float(seed)
    np.testing.assert_array_equal(f1, np.asarray(f1b))
    # roughly uniform
    assert abs(f1.mean() - 0.5) < 0.02


def test_seed_schedules():
    # per-path seeds differ and match the reference formulas
    idx = jnp.asarray(np.arange(4, dtype=np.uint32))
    s = np.asarray(rng.path_seed(idx, 7))
    want = [py_wang_hash((i * 17 + 7) & 0xFFFFFFFF) for i in range(4)]
    np.testing.assert_array_equal(s, np.array(want, np.uint32))
    r = np.asarray(rng.raygen_seed(idx, 3))
    want = [py_wang_hash((i * 16789 + 3 * 1791) & 0xFFFFFFFF) for i in range(4)]
    np.testing.assert_array_equal(r, np.array(want, np.uint32))
