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


def _resample_matrix(pos: jax.Array, n: int) -> jax.Array:
    """(n_in, n_out) bilinear sampling matrix: column j holds the two
    clamp-to-edge bilinear weights for input positions pos[j]."""
    p = jnp.clip(pos, 0.0, n - 1.0)
    i0 = jnp.floor(p).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    f = p - i0
    rows = jnp.arange(n, dtype=jnp.int32)[:, None]  # (n_in, 1)
    return jnp.where(rows == i0[None, :], 1.0 - f[None, :], 0.0) + jnp.where(
        rows == i1[None, :], f[None, :], 0.0
    )


def warp_separable(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp for SEPARABLE flows — axis-aligned fields where
    flow_x depends only on the column and flow_y only on the row.  Every
    flow this renderer produces is one (zoom is radial-separable, pan is
    constant: add_zoom_flow/add_translation_flow, mirroring the reference's
    only flow writers, helperKernels.cu:175-199), and separability turns
    the bilinear warp into two small resampling MATMULS that ride the MXU —
    measured 74.5 ms (4-fold gather) -> ~2 ms at 1080p.  Bitwise-close to
    warp_by_flow (weights are the same bilinear pair; summation order
    differs).  For a general flow field use warp_by_flow.

    Zero-flow skip: an all-zero flow makes both resampling matrices exact
    identities (integer positions -> weights 1.0/0.0), and a matmul with
    an exact identity reproduces the image bit for bit — so the cond is
    output-identical.  Static cameras (the reference zeroes flow after
    every denoise, optixHello.cpp:1234) then skip both HIGHEST-precision
    einsums every frame, same rationale as the renderer's all-zero blur
    skip."""
    h, w = image.shape[0], image.shape[1]

    def _warp(im):
        cols = jnp.arange(w, dtype=jnp.float32) + flow[0, :, 0]
        rows = jnp.arange(h, dtype=jnp.float32) + flow[:, 0, 1]
        mx = _resample_matrix(cols, w)  # (W, W)
        my = _resample_matrix(rows, h)  # (H, H)
        hp = jnp.einsum(
            "hwc,wv->hvc", im, mx, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.einsum(
            "hvc,hu->uvc", hp, my, precision=jax.lax.Precision.HIGHEST
        )

    return jax.lax.cond(jnp.any(flow != 0.0), _warp, lambda im: im, image)


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
