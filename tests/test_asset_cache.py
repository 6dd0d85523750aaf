"""Binary asset caches (CACHEIMAGES analog, host_texture.cpp +
host_skydome.cpp:82-96): decoded textures/MIP chains and skydome IBL tables
persist next to the source keyed by mtime."""
import os

import numpy as np

from lighthouse2_tpu.scene.host_texture import HostTexture, MIP_LEVELS
from lighthouse2_tpu.utils.image import write_png, write_hdr


def _mk_png(path):
    rng = np.random.default_rng(5)
    img = (rng.uniform(0, 1, (64, 64, 3)) ** 0.5)
    write_png(path, img.astype(np.float32))


def test_texture_cache_roundtrip(tmp_path):
    p = str(tmp_path / "t.png")
    _mk_png(p)
    t1 = HostTexture.load(p)
    assert os.path.exists(p + ".lh2c.npz")
    t2 = HostTexture.load(p)
    assert len(t2.mips) == MIP_LEVELS
    for a, b in zip(t1.mips, t2.mips):
        np.testing.assert_array_equal(a, b)
    # prove the second load came FROM the cache: poison it, reload
    with np.load(p + ".lh2c.npz") as z:
        data = {k: z[k] for k in z.files}
    data["mip0"] = data["mip0"] * 0.0 + 0.123
    np.savez(p + ".lh2c.npz", **data)
    t3 = HostTexture.load(p)
    assert float(t3.mips[0].ravel()[0]) == np.float32(0.123)
    # stale mtime invalidates
    _mk_png(p)
    os.utime(p, (os.path.getmtime(p) + 10, os.path.getmtime(p) + 10))
    t4 = HostTexture.load(p)
    np.testing.assert_array_equal(t4.mips[0], t1.mips[0])


def test_sky_cache_roundtrip(tmp_path):
    from lighthouse2_tpu.scene.host_scene import HostScene
    p = str(tmp_path / "sky.hdr")
    rng = np.random.default_rng(7)
    write_hdr(p, rng.uniform(0.1, 3.0, (16, 32, 3)).astype(np.float32))
    s1 = HostScene()
    s1.load_sky(p)
    assert os.path.exists(p + ".lh2sky.npz")
    assert s1._sky_ibl is not None
    s2 = HostScene()
    s2.load_sky(p)
    np.testing.assert_array_equal(s2.sky_pixels, s1.sky_pixels)
    np.testing.assert_array_equal(s2._sky_ibl[0], s1._sky_ibl[0])
    # the cached IBL tables are what sync() uses
    ds = s2.sync(rebuild_bvh=False)
    assert ds.sky.has_ibl
    np.testing.assert_allclose(np.asarray(ds.sky.pdf), s1._sky_ibl[0],
                               rtol=1e-6)
