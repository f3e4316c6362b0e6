"""Optical-flow guide images for the temporal denoiser.

The reference accumulates approximate flow on zoom/pan events
(helperKernels.cu:163-199, driven from glfw_events.cpp:105-130) and hands it
to the OptiX temporal denoiser as the motion guide.  Its formulas contain two
known defects we deliberately do not copy (documented in PARITY.md): the
zoom kernel derives x/y from the linear index with wrapping modulo arithmetic
(helperKernels.cu:177-178), and the pan path always passes a zero delta
(glfw_events.cpp:122-128).  Here flow is the standard backward-warp field:
``flow[p]`` is the displacement from pixel p in the *current* frame to the
position of the same world point in the *previous* frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zero_flow(height: int, width: int) -> jax.Array:
    """helperKernels.cu:163-172."""
    return jnp.zeros((height, width, 2), jnp.float32)


def add_zoom_flow(flow: jax.Array, old_zoom, new_zoom) -> jax.Array:
    """Radial flow for a zoom change (helperKernels.cu:175-185, corrected).

    World x of pixel col is (col - w/2) * zoom + off; the same world point was
    at (x - off) / old_zoom + w/2 in the previous frame, so the displacement
    is (col - w/2) * (new_zoom / old_zoom - 1).
    """
    h, w = flow.shape[0], flow.shape[1]
    scale = new_zoom / old_zoom - 1.0
    cols = (jnp.arange(w, dtype=jnp.float32) - w // 2) * scale
    rows = (jnp.arange(h, dtype=jnp.float32) - h // 2) * scale
    return flow + jnp.stack(jnp.meshgrid(cols, rows, indexing="xy"), axis=-1) * jnp.array(
        [1.0, 1.0], jnp.float32
    )


def add_translation_flow(flow: jax.Array, dx, dy) -> jax.Array:
    """Constant flow for a pan of (dx, dy) pixels (helperKernels.cu:188-199;
    the reference's call site passes zero — fixed here)."""
    return flow + jnp.asarray([dx, dy], jnp.float32)[None, None, :]


def warp_by_flow(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp ``image`` (H, W, C) by ``flow`` (H, W, 2) with bilinear
    sampling and clamp-to-edge. Used to reproject the previous denoised frame."""
    h, w = image.shape[0], image.shape[1]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :] + flow[..., 0]
    rows = jnp.arange(h, dtype=jnp.float32)[:, None] + flow[..., 1]
    cols = jnp.clip(cols, 0.0, w - 1.0)
    rows = jnp.clip(rows, 0.0, h - 1.0)
    c0 = jnp.floor(cols).astype(jnp.int32)
    r0 = jnp.floor(rows).astype(jnp.int32)
    c1 = jnp.minimum(c0 + 1, w - 1)
    r1 = jnp.minimum(r0 + 1, h - 1)
    fc = (cols - c0)[..., None]
    fr = (rows - r0)[..., None]
    top = image[r0, c0] * (1 - fc) + image[r0, c1] * fc
    bot = image[r1, c0] * (1 - fc) + image[r1, c1] * fc
    return top * (1 - fr) + bot * fr
