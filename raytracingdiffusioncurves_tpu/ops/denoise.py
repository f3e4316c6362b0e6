"""Temporal denoiser: flow-guided reprojection + edge-preserving spatial pass.

Replaces the OptiX temporal AI denoiser (optixHello.cpp:1033-1134,1186-1235),
which runs with no albedo/normal guides, an optical-flow guide, and
``blendFactor = 1 - corrected_image_mix`` (:1131; blendFactor 0 = fully
denoised output, 1 = passthrough).  Two components:

* **temporal**: the previous denoised frame, warped by the flow guide, is
  accumulated with an exponentially-growing history weight, clamped so stale
  history cannot dominate (standard temporal AA accumulation — the flow
  semantics match the reference's guide layer, :1115-1127);
* **spatial**: a small joint-bilateral filter on the current frame knocks
  down the residual Monte-Carlo noise while keeping curve edges sharp.

The output feeds both the displayed image and the next frame's prev_image,
exactly like the reference copies the denoiser output into both buffers
(:1216-1231).  A learned CNN denoiser (models/denoiser.py) can be swapped in
for closer parity with the trained OptiX model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import flow as flow_ops

# Temporal accumulation factor: new = lerp(history, current, _TEMPORAL_ALPHA)
_TEMPORAL_ALPHA = 0.2
_BILATERAL_RADIUS = 2
_BILATERAL_SIGMA_SPACE = 1.5
_BILATERAL_SIGMA_COLOR = 0.1
# bf16 tap math for the bilateral: the 25-tap dist2+exp+accumulate chain is
# the denoiser block's non-UNet cost (~15 ms of config3's 37.3 ms tail,
# batch40/41); bf16 halves its VPU/HBM traffic.  Weight error is ~1e-2
# relative on a [0,1]-range guide, and the bilateral only enters the output
# through `analytic = prev + (spatial - prev) * 0.2` under a trained UNet
# residual — the r3d held-out val PSNR is IDENTICAL at uint8 with it on
# (31.94/29.71 dB cnn/analytic both ways, benchmarks/eval_denoiser.py
# --bilateral-bf16, batch42) and the config3 denoiser block drops
# 32.6 -> 31.9 ms (batch42 dn_block vs batch44 dn_block_bf16 at this
# weight-chain-only variant; bf16-accumulating values too measured 31.5
# but biased flat regions).
BILATERAL_BF16 = True
# Timing-only ablation: drop the data-dependent exp chain (constant spatial
# weights) to size the exp cost.  NOT output-preserving.  Honored by BOTH
# the bf16 and f32 branches so probe labels measure what they claim.
_ABLATE_BILATERAL_NOEXP = False
# NOTE (both flags above): read at jit TRACE time — temporal_denoise is
# @jax.jit, so flipping either flag after the first call in a process is a
# silent no-op (compilation cache).  Probe scripts must set them before any
# call, or run each variant in a fresh process (perf_probe --isolate does).


def spatial_bilateral(image: jax.Array) -> jax.Array:
    """5x5 joint bilateral filter, self-guided, all channels."""
    r = _BILATERAL_RADIUS
    inv_ss = 1.0 / (2.0 * _BILATERAL_SIGMA_SPACE**2)
    inv_sc = 1.0 / (2.0 * _BILATERAL_SIGMA_COLOR**2)
    padded = jnp.pad(image, ((r, r), (r, r), (0, 0)), mode="edge")
    h, w = image.shape[0], image.shape[1]
    accum = jnp.zeros_like(image)
    wsum = jnp.zeros(image.shape[:2], image.dtype)
    if BILATERAL_BF16:
        # Only the WEIGHT chain (guide diffs, dist2, exp) runs in bf16; the
        # accumulated values and the accumulators stay f32, so on flat
        # regions every tap carries the identical (quantized) weight and the
        # accum/wsum ratio is exact — bf16-accumulating the values instead
        # biased constants by ~1e-3 (tests/test_denoiser.py blend test).
        bf = jnp.bfloat16
        guide = image[..., :3].astype(bf)
        padded_g = padded[..., :3].astype(bf)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if _ABLATE_BILATERAL_NOEXP:
                    wgt = jnp.full(
                        image.shape[:2],
                        jnp.exp(jnp.float32(-(dx * dx + dy * dy) * inv_ss)),
                        image.dtype,
                    )
                else:
                    nbg = jax.lax.dynamic_slice(
                        padded_g, (dy + r, dx + r, 0), (h, w, 3))
                    dist2 = jnp.sum((nbg - guide) ** 2, axis=-1)
                    wgt = jnp.exp(
                        bf(-(dx * dx + dy * dy) * inv_ss)
                        - dist2 * bf(inv_sc)
                    ).astype(image.dtype)
                nb = jax.lax.dynamic_slice(
                    padded, (dy + r, dx + r, 0), (h, w, image.shape[2]))
                accum = accum + nb * wgt[..., None]
                wsum = wsum + wgt
        return accum / wsum[..., None]
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            nb = jax.lax.dynamic_slice(padded, (dy + r, dx + r, 0), (h, w, image.shape[2]))
            if _ABLATE_BILATERAL_NOEXP:
                wgt = jnp.full(
                    image.shape[:2],
                    jnp.exp(jnp.float32(-(dx * dx + dy * dy) * inv_ss)),
                    image.dtype,
                )
            else:
                dist2 = jnp.sum((nb[..., :3] - image[..., :3]) ** 2, axis=-1)
                wgt = jnp.exp(-(dx * dx + dy * dy) * inv_ss - dist2 * inv_sc)
            accum = accum + nb * wgt[..., None]
            wsum = wsum + wgt
    return accum / wsum[..., None]


@jax.jit
def temporal_denoise(
    image: jax.Array,
    prev_image: jax.Array,
    flow: jax.Array,
    frame: jax.Array,
    mix: float = 1.0,
) -> jax.Array:
    """Denoise ``image`` using the previous output and its flow guide.

    ``mix`` is corrected_image_mix: the blend between the denoised result
    (mix = 1) and the raw input (mix = 0), inverted exactly like the
    reference's blendFactor (optixHello.cpp:98,1131).
    """
    spatial = spatial_bilateral(image)
    warped = flow_ops.warp_separable(prev_image, flow)
    # On frame 0 there is no history: fall back to the spatial result.
    alpha = jnp.where(frame > 0, jnp.float32(_TEMPORAL_ALPHA), jnp.float32(1.0))
    denoised = warped + (spatial - warped) * alpha
    blend_factor = 1.0 - mix  # 0 => fully denoised (reference default)
    return denoised + (image - denoised) * blend_factor
