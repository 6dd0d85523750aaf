"""Cross-backend golden regression on the REAL workload (VERDICT r3 #6,
r4 #6): the bathroom-class interior with disney BSDF + textures + sky IBL,
rendered by the CPU lockstep traversal AND the cluster kernel (interpret
mode), must agree — the PrimeRef validation methodology
(apps/imguiapp/main.cpp:170) on the scene the bench actually measures.

The lockstep frame is additionally pinned to a COMMITTED anchor
(utils/golden.py): byte-exact sha256 on the CPU backend plus mean/std to
1e-3. `bench.py --golden` runs the same frame through the cluster kernel on
the real TPU once per round."""
import hashlib

import numpy as np
import pytest

from lighthouse2_tpu.utils import golden


@pytest.mark.slow
def test_bathroom_golden_cross_backend():
    a = golden.render_golden("lockstep")
    b = golden.render_golden("cluster", interpret=True)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # identical sampling decisions -> near-identical images; the only
    # differences are f32 op-order effects in the two intersectors
    np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-3)

    # committed anchor: a transport regression (lost NEE, broken MIS, dead
    # texture path, reordered RNG draws) moves these. If a DELIBERATE
    # change moved the image, regenerate via `python -m
    # lighthouse2_tpu.utils.golden` and commit the new anchor with it.
    assert abs(float(a.mean()) - golden.ANCHOR_MEAN) < 1e-3
    assert abs(float(a.std()) - golden.ANCHOR_STD) < 1e-3
    assert hashlib.sha256(a.tobytes()).hexdigest() == golden.ANCHOR_SHA256, \
        "byte-exact golden anchor moved — regenerate utils/golden.py " \
        "deliberately if the sampling change is intended"
