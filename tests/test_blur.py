"""Variable-sigma Gaussian blur vs a literal NumPy transcription of the
reference kernels (gaussHorizontal/gaussVertical, helperKernels.cu:48-134)."""

import numpy as np
import pytest

from raytracingdiffusioncurves_tpu.ops.blur import MINUM_SIGMA, variable_gaussian_blur


def reference_blur_pass(source, sigma, horizontal):
    """Direct transcription of the reference loop: per-pixel radius
    ceil(3*sigma), weight exp(-k^2/(sigma+1e-6)^2), clamp-to-edge,
    renormalize (helperKernels.cu:59-94)."""
    h, w, c = source.shape
    dest = np.zeros_like(source)
    for i in range(h):
        for j in range(w):
            sig = sigma[i, j]
            radius = int(np.ceil(3.0 * sig))
            sig_sq = (sig + MINUM_SIGMA) ** 2
            accum = 0.0
            val = np.zeros(c)
            for k in range(-radius, radius + 1):
                if horizontal:
                    sj = min(max(j + k, 0), w - 1)
                    px = source[i, sj]
                else:
                    si = min(max(i + k, 0), h - 1)
                    px = source[si, j]
                g = np.exp(-(k * k) / sig_sq)
                accum += g
                val = val + px * g
            dest[i, j] = val / accum
    return dest


def test_matches_reference_blur():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (12, 14, 4)).astype(np.float32)
    sigma = rng.uniform(0, 2.5, (12, 14)).astype(np.float32)
    expected = reference_blur_pass(img, sigma, horizontal=True)
    expected = reference_blur_pass(expected, sigma, horizontal=False)
    got = np.asarray(variable_gaussian_blur(img, sigma, radius=8))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_sigma_zero_is_identity():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (8, 8, 4)).astype(np.float32)
    out = np.asarray(variable_gaussian_blur(img, np.zeros((8, 8), np.float32), radius=4))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_per_pixel_radius_masking():
    """A sigma=0 pixel is untouched even adjacent to a large-sigma region
    (the reference's per-pixel kernel size, helperKernels.cu:65)."""
    img = np.zeros((8, 8, 4), np.float32)
    img[:, 4:] = 1.0
    sigma = np.zeros((8, 8), np.float32)
    sigma[:, :2] = 3.0
    out = np.asarray(variable_gaussian_blur(img, sigma, radius=9))
    np.testing.assert_allclose(out[:, 3], img[:, 3], atol=1e-6)


def test_blur_preserves_constant_and_energy():
    img = np.full((16, 16, 4), 0.625, np.float32)
    sigma = np.full((16, 16), 2.0, np.float32)
    out = np.asarray(variable_gaussian_blur(img, sigma, radius=6))
    np.testing.assert_allclose(out, img, atol=1e-5)  # renormalization


def test_clamp_to_edge():
    """Edge pixels clamp (replicate) rather than darken (helperKernels.cu:76)."""
    img = np.ones((8, 8, 4), np.float32)
    sigma = np.full((8, 8), 2.0, np.float32)
    out = np.asarray(variable_gaussian_blur(img, sigma, radius=6))
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-5)
