"""The flagship pipeline: scene -> traced image -> denoise -> blur.

Equivalent of the reference render loop (optixHello.cpp:1163-1259):

    optixLaunch (raygen fan per pixel)  ->  trace_image
    optixDenoiserInvoke (temporal)      ->  ops.denoise.temporal_denoise
    gaussianBlur (variable sigma)       ->  ops.blur.variable_gaussian_blur

Everything is functional: the camera is a traced argument (zoom/pan never
recompiles), the scene and config are static jit specializations, and frame
state (previous output + optical flow) is threaded explicitly instead of the
reference's mutable Params buffers (params.h:39-42).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Camera, RenderConfig
from ..ops import blur as blur_ops
from ..ops import denoise as denoise_ops
from ..ops import intersect
from ..scene.device import DeviceScene


class FrameState(NamedTuple):
    """Temporal state carried between frames (params.h:39-42: prev_image +
    image_flow)."""

    prev_image: jax.Array  # (H, W, 4) previous denoised output
    flow: jax.Array  # (H, W, 2) pixel displacement to the previous frame
    frame: jax.Array  # scalar int32 frame counter


def init_frame_state(width: int, height: int) -> FrameState:
    return FrameState(
        prev_image=jnp.zeros((height, width, 4), jnp.float32),
        flow=jnp.zeros((height, width, 2), jnp.float32),
        frame=jnp.int32(0),
    )


def _pixel_block_counts(n_pixels: int, config: RenderConfig) -> tuple[int, int]:
    """(pixels per block, number of blocks) honoring config.rays_per_block."""
    px_per_block = max(1, config.rays_per_block // config.rays_per_pixel)
    px_per_block = min(px_per_block, n_pixels)
    n_blocks = -(-n_pixels // px_per_block)
    return px_per_block, n_blocks


def trace_image(
    scene: DeviceScene,
    camera: Camera,
    config: RenderConfig,
    frame: jax.Array | int = 0,
    backend: str = "auto",
    cand_tables=None,
    gather_len: int | None = None,
):
    """Render the raw (pre-postprocessing) image and blur map.

    Returns (image (H, W, 4) float32, blur_map (H, W) float32).

    The per-pixel result is the weight-normalized average over the ray fan
    (DeviceCode.cu:153-181).  Pixels whose rays all return zero weight are
    NaN in the reference (0/0); here they get config.background (documented
    deviation; alpha is always 1 — the reference never writes it).
    """
    h, w = scene.height, scene.width
    csum, wsum, bsum = trace_sums_flat(
        scene, camera, config, frame, 0, h * w, backend, cand_tables,
        gather_len,
    )
    return normalize_sums(
        csum.reshape(h, w, 3), wsum.reshape(h, w), bsum.reshape(h, w), config
    )


def normalize_sums(color_sum, weight_sum, blur_sum, config: RenderConfig):
    """Weighted-mean normalization (DeviceCode.cu:176-181), with the
    documented background-instead-of-NaN deviation for all-miss pixels."""
    h, w = weight_sum.shape
    bg = jnp.asarray(config.background, jnp.float32)
    safe_w = jnp.where(weight_sum > 0.0, weight_sum, 1.0)[..., None]
    rgb = jnp.where(
        (weight_sum > 0.0)[..., None], color_sum / safe_w, bg[None, None, :]
    )
    alpha = jnp.ones((h, w, 1), jnp.float32)
    image = jnp.concatenate([rgb, alpha], axis=-1)
    blur_map = jnp.where(weight_sum > 0.0, blur_sum / safe_w[..., 0], 0.0)
    return image, blur_map


def trace_sums_flat(
    scene: DeviceScene,
    camera: Camera,
    config: RenderConfig,
    frame,
    px_start,
    n_px: int,
    backend: str = "auto",
    cand_tables=None,
    gather_len: int | None = None,
    cheap_prepass: bool = False,
):
    """Trace pixels [px_start, px_start + n_px) of the scene's pixel grid.
    Returns flat (color_sum (n_px, 3), weight_sum (n_px,), blur_sum (n_px,)).
    This is the sharding primitive: each chip traces its own pixel range.
    ``cand_tables``: precomputed camera-dependent acceleration tables
    (build_cand_tables) — camera-static callers hoist the per-frame prepass
    (Pallas backend only; the JAX path is the brute-force oracle).
    ``cheap_prepass``: moving-camera callers accept a cheaper in-frame accel
    build whose output may differ from the hoisted graph by rounding ulps."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    if backend == "pallas":
        from ..ops import trace_pallas

        return trace_pallas.trace_sums_flat(
            scene, camera, config, frame, px_start, n_px,
            cand_tables=cand_tables, gather_len=gather_len,
            cheap_prepass=cheap_prepass,
        )
    return _trace_sums_jax_flat(scene, camera, config, frame, px_start, n_px)


def _trace_sums_jax_flat(
    scene: DeviceScene, camera: Camera, config: RenderConfig, frame, px_start, n_px: int
):
    """Chunked pure-JAX tracing: lax.map over ray blocks keeps the
    (rays x segments) intermediates at a fixed memory footprint."""
    h, w = scene.height, scene.width
    rpp = config.rays_per_pixel
    px_per_block, n_blocks = _pixel_block_counts(n_px, config)
    n_px_pad = px_per_block * n_blocks

    pixel_ids = px_start + jnp.arange(n_px_pad, dtype=jnp.int32)
    sample_ids = jnp.tile(jnp.arange(rpp, dtype=jnp.int32), px_per_block)

    def do_block(pids):
        pid = jnp.repeat(pids, rpp)
        origins, dirs = intersect.make_rays(pid, sample_ids, w, h, camera, config, frame)
        color, weight, blur = intersect.trace_full(scene, origins, dirs, config)
        color = color.reshape(px_per_block, rpp, 3)
        weight = weight.reshape(px_per_block, rpp)
        blur = blur.reshape(px_per_block, rpp)
        return (
            jnp.sum(color * weight[..., None], axis=1),
            jnp.sum(weight, axis=1),
            jnp.sum(blur * weight, axis=1),
        )

    csum, wsum, bsum = jax.lax.map(do_block, pixel_ids.reshape(n_blocks, px_per_block))
    return (
        csum.reshape(n_px_pad, 3)[:n_px],
        wsum.reshape(n_px_pad)[:n_px],
        bsum.reshape(n_px_pad)[:n_px],
    )


def _postprocess(
    image,
    blur_map,
    state: FrameState,
    config: RenderConfig,
    scene: DeviceScene,
    max_blur_radius: int | None,
    denoiser_params,
):
    """Denoise + blur tail shared by render_frame and the progressive path.
    Returns (display image, next prev_image)."""
    if config.use_denoiser:
        if denoiser_params is not None:
            # Learned CNN denoiser (models/denoiser.py) with the reference's
            # temporal guide layout: current frame + flow-warped previous
            # output (optixHello.cpp:1115-1127).
            from ..models import denoiser as dn
            from ..ops import flow as flow_ops

            warped = flow_ops.warp_separable(state.prev_image, state.flow)
            denoised = dn.apply_denoiser(
                dn.net_for_params(denoiser_params), denoiser_params,
                image, warped, blur_map,
                mix=config.corrected_image_mix,
                noise=dn.noise_level(config.rays_per_pixel),
                frame=state.frame,
            )
        else:
            denoised = denoise_ops.temporal_denoise(
                image, state.prev_image, state.flow, state.frame,
                config.corrected_image_mix,
            )
        next_prev = denoised
        image = denoised
    else:
        next_prev = image

    if config.use_blur:
        radius = max_blur_radius
        if radius is None:
            radius = config.max_blur_radius
        if radius is None:
            radius = int(np.ceil(3.0 * scene.max_blur))
        if radius > 0:
            # Dynamic skip: an all-zero blur map is EXACTLY the identity
            # (sigma -> k_size 1, helperKernels.cu:65), and scenes like arch
            # render one every frame despite a nonzero table max — the cond
            # saves the whole separable pass at interactive rates.
            image = jax.lax.cond(
                jnp.any(blur_map > 0.0),
                lambda im: blur_ops.variable_gaussian_blur(
                    im, blur_map, radius
                ),
                lambda im: im,
                image,
            )

    return image, next_prev


@partial(
    jax.jit,
    static_argnames=("config", "backend", "max_blur_radius", "gather_len"),
)
def render_frame(
    scene: DeviceScene,
    camera: Camera,
    state: FrameState,
    config: RenderConfig,
    backend: str = "auto",
    max_blur_radius: int | None = None,
    denoiser_params=None,
    cand_tables=None,
    gather_len: int | None = None,
) -> tuple[jax.Array, FrameState]:
    """One full frame: trace -> temporal denoise -> variable blur.

    Returns (image (H, W, 4), next FrameState).  Mirrors the per-frame hot
    path optixHello.cpp:1163-1259 including the order of operations: the
    denoiser runs on the raw traced image and its output feeds both the
    display path and prev_image; the blur runs after (:1186-1240); the flow
    is zeroed after each denoise (:1234).
    """
    image, blur_map = trace_image(
        scene, camera, config, state.frame, backend, cand_tables, gather_len
    )
    image, next_prev = _postprocess(
        image, blur_map, state, config, scene, max_blur_radius, denoiser_params
    )
    # Flow is zeroed after each DENOISE, exactly like the reference
    # (optixHello.cpp:1234); with the denoiser off it passes through
    # untouched (materializing fresh zeros cost ~0.8 ms/frame at 1024^2
    # inside the chained-frame loop).
    next_state = FrameState(
        prev_image=next_prev,
        flow=jnp.zeros_like(state.flow) if config.use_denoiser else state.flow,
        frame=state.frame + 1,
    )
    return image, next_state


class ProgressiveState(NamedTuple):
    """Monte-Carlo accumulator for progressive refinement: raw trace sums
    (pre-normalization, the same quantities __raygen__rg accumulates over its
    in-pixel fan, DeviceCode.cu:153-160) summed across *frames*.  While the
    camera rests each extra frame adds rays_per_pixel fresh stratified rays
    to every pixel, so displayed quality converges at interactive rates; any
    camera motion resets the sums (via a traced flag — no recompile)."""

    color_sum: jax.Array  # (H, W, 3)
    weight_sum: jax.Array  # (H, W)
    blur_sum: jax.Array  # (H, W)
    passes: jax.Array  # scalar int32: frames accumulated so far


def init_progressive_state(width: int, height: int) -> ProgressiveState:
    return ProgressiveState(
        color_sum=jnp.zeros((height, width, 3), jnp.float32),
        weight_sum=jnp.zeros((height, width), jnp.float32),
        blur_sum=jnp.zeros((height, width), jnp.float32),
        passes=jnp.int32(0),
    )


@partial(
    jax.jit,
    static_argnames=("config", "backend", "max_blur_radius", "gather_len"),
)
def render_frame_progressive(
    scene: DeviceScene,
    camera: Camera,
    state: FrameState,
    prog: ProgressiveState,
    config: RenderConfig,
    reset,
    backend: str = "auto",
    max_blur_radius: int | None = None,
    denoiser_params=None,
    cand_tables=None,
    gather_len: int | None = None,
) -> tuple[jax.Array, FrameState, ProgressiveState]:
    """One progressive pass: trace config.rays_per_pixel fresh rays per pixel
    (the RNG folds the frame counter in, ops/rng.py, so each pass draws a new
    stratified jitter within the same 2*pi/N sectors), accumulate the raw
    sums, and display the normalized accumulated estimate through the usual
    denoise + blur tail.

    ``reset`` is a traced boolean (camera moved): true drops the history so
    the displayed image is exactly this frame's rays.  Requires
    config.use_aa — without jitter every pass repeats the same rays.
    Returns (image, next FrameState, next ProgressiveState).
    """
    h, w = scene.height, scene.width
    # Progressive callers re-render under a moving camera, so the in-frame
    # accel build runs every frame: take the cheap (global-gather) variant.
    csum, wsum, bsum = trace_sums_flat(
        scene, camera, config, state.frame, 0, h * w, backend, cand_tables,
        gather_len, cheap_prepass=True,
    )
    keep = 1.0 - jnp.asarray(reset, jnp.float32)
    csum = csum.reshape(h, w, 3) + prog.color_sum * keep
    wsum = wsum.reshape(h, w) + prog.weight_sum * keep
    bsum = bsum.reshape(h, w) + prog.blur_sum * keep
    passes = prog.passes * jnp.asarray(~jnp.asarray(reset, bool), jnp.int32) + 1
    next_prog = ProgressiveState(csum, wsum, bsum, passes)

    image, blur_map = normalize_sums(csum, wsum, bsum, config)
    image, next_prev = _postprocess(
        image, blur_map, state, config, scene, max_blur_radius, denoiser_params
    )
    # Flow is zeroed after each DENOISE, exactly like the reference
    # (optixHello.cpp:1234); with the denoiser off it passes through
    # untouched (materializing fresh zeros cost ~0.8 ms/frame at 1024^2
    # inside the chained-frame loop).
    next_state = FrameState(
        prev_image=next_prev,
        flow=jnp.zeros_like(state.flow) if config.use_denoiser else state.flow,
        frame=state.frame + 1,
    )
    return image, next_state, next_prog
