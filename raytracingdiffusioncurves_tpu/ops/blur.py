"""Per-pixel variable-sigma separable Gaussian blur.

Reference semantics (helperKernels.cu:48-148):

* separable horizontal-then-vertical passes;
* per-pixel kernel half-width ceil(3 * sigma) (the "99 percentile": :65);
* tap weight exp(-k^2 / (sigma + 1e-6)^2) — note: no factor 2, and the 1e-6
  floor is added to sigma *before* squaring (:68,79);
* clamp-to-edge borders (:76,117);
* per-pixel weight renormalization (:91-94);
* all four channels blurred.

Data-dependent kernel sizes don't exist on a TPU, so the radius is a static
bound (sized from the scene's maximum blur at trace time) and taps beyond the
per-pixel ceil(3*sigma) are masked out — numerically identical to the
reference's dynamic loop.  Unlike the reference, no temp buffer is allocated
per frame (helperKernels.cu:139-147); XLA fuses the shifted adds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MINUM_SIGMA = 1e-6


def _variable_gauss_1d(image: jax.Array, sigma: jax.Array, radius: int, axis: int) -> jax.Array:
    """One blur pass along ``axis`` (0 = vertical, 1 = horizontal).

    Incremental Gaussian weights: gauss_k = e1^(k^2) with e1 =
    exp(-1/sig^2), advanced by g_{k+1} = g_k * e1^(2k+1) — ONE exp per
    pixel per pass instead of one per tap (2*radius+1 of them; at
    config3's radius-21 blur the exps were the pass's dominant op), and
    the +-k tap pair shares its weight.  Matches the reference formula
    exp(-k^2/(sigma+1e-6)^2) to ~radius*2^-24 relative (sequential mults),
    far inside the 2e-5 parity bar (tests/test_blur.py)."""
    sig = sigma + MINUM_SIGMA
    inv_sig_sq = 1.0 / (sig * sig)
    k_half = jnp.ceil(3.0 * sigma)  # per-pixel half-width, from raw sigma

    pad_widths = [(0, 0), (0, 0), (0, 0)]
    pad_widths[axis] = (radius, radius)
    padded = jnp.pad(image, pad_widths, mode="edge")

    h, w = image.shape[0], image.shape[1]
    n = h if axis == 0 else w

    def shift(k):
        return jax.lax.dynamic_slice_in_dim(padded, k + radius, n, axis=axis)

    e1 = jnp.exp(-inv_sig_sq)
    e2 = e1 * e1
    accum = image.astype(jnp.float32)  # k = 0 tap, weight 1
    wsum = jnp.ones(image.shape[:2], jnp.float32)
    g = e1  # gauss_1
    m = e1 * e2  # e1^(2k+1) at k = 1
    for k in range(1, radius + 1):
        gk = jnp.where(k <= k_half, g, 0.0)
        accum = accum + (shift(k) + shift(-k)) * gk[..., None]
        wsum = wsum + 2.0 * gk
        g = g * m
        m = m * e2
    return accum / wsum[..., None]


@partial(jax.jit, static_argnames=("radius",))
def variable_gaussian_blur(image: jax.Array, sigma_map: jax.Array, radius: int) -> jax.Array:
    """image (H, W, C), sigma_map (H, W) -> blurred (H, W, C).

    ``radius`` is the static tap bound; it must be >= ceil(3 * max(sigma)) for
    exact reference parity (gaussianBlur, helperKernels.cu:137-148).
    """
    out = _variable_gauss_1d(image, sigma_map, radius, axis=1)  # horizontal first
    out = _variable_gauss_1d(out, sigma_map, radius, axis=0)  # then vertical
    return out
