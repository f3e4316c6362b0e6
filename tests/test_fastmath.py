"""fastmath.sincos accuracy over the raygen range."""

import numpy as np

from raytracingdiffusioncurves_tpu.ops import fastmath


def test_sincos_accuracy():
    rng = np.random.default_rng(7)
    th = np.concatenate(
        [
            rng.uniform(0.0, 2.0 * np.pi, 100000),
            np.linspace(0.0, 2.0 * np.pi, 4097)[:-1],
            [0.0, np.pi / 2, np.pi, 3 * np.pi / 2],
        ]
    ).astype(np.float32)
    s, c = fastmath.sincos(th)
    ref_s = np.sin(th.astype(np.float64))
    ref_c = np.cos(th.astype(np.float64))
    assert np.abs(np.asarray(s) - ref_s).max() < 2e-7
    assert np.abs(np.asarray(c) - ref_c).max() < 2e-7
    # unit-length directions (raygen normalizes nothing downstream)
    n = np.asarray(s).astype(np.float64) ** 2 + np.asarray(c).astype(np.float64) ** 2
    assert np.abs(n - 1.0).max() < 5e-7
