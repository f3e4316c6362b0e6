"""Multi-chip rendering: data-parallel over image tiles.

The reference is strictly single-GPU (SURVEY.md §2.4): its only parallelism
is one CUDA thread per pixel.  Scaling on TPU is a new, first-class design:

* the H x W pixel grid is sharded across the mesh's ``rows`` axis in
  contiguous row bands (BASELINE config #5: per-tile image sharding);
* scene tables are tiny (KB-MB) and replicated on every chip;
* the trace is embarrassingly parallel — each chip runs the Pallas megakernel
  on its own pixel range via ``shard_map`` with zero communication;
* the camera-dependent acceleration tables (the reference's one-time
  optixAccelBuild, optixHello.cpp:764-830) are built per shard and sharded
  over the same axis (``build_cand_tables_sharded``), so static-camera
  multi-chip frames skip the per-frame prepass exactly like the single-chip
  path;
* post-processing (temporal/CNN denoise + variable blur) reuses the
  single-chip ``renderer._postprocess`` on the row-sharded image: XLA's SPMD
  partitioner inserts the halo exchanges for the shifted-window ops over ICI
  automatically — the TPU-native answer to the reference's single-device
  Gaussian kernels (helperKernels.cu:48-148).

The result stays sharded; gather it only for display/IO.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Camera, RenderConfig
from ..models import renderer
from ..scene.device import DeviceScene


def make_mesh(n_devices: int | None = None, axis_name: str = "rows") -> Mesh:
    """1-D device mesh over the tile axis."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))


def _local_rows(mesh: Mesh, scene: DeviceScene) -> int:
    h = scene.height
    n = mesh.devices.size
    if h % n != 0:
        raise ValueError(f"image height {h} not divisible by mesh size {n}")
    return h // n


def build_cand_tables_sharded(
    mesh: Mesh,
    scene: DeviceScene,
    camera: Camera,
    config: RenderConfig,
):
    """Per-shard camera-dependent acceleration tables, stacked on a leading
    mesh axis and placed with that axis sharded over the mesh.

    Each shard's tables cover its own contiguous pixel row band (the same
    ``px_start`` the sharded trace uses), so passing the result to
    ``trace_image_sharded``/``render_frame_sharded`` hoists the per-frame
    prepass exactly like the single-chip ``build_cand_tables`` protocol.
    Returns None for scenes whose acceleration kind has no tables.
    """
    from ..ops import trace_pallas

    (axis_name,) = mesh.axis_names
    n = mesh.devices.size
    n_px_local = _local_rows(mesh, scene) * scene.width
    per_shard = [
        trace_pallas.build_cand_tables(
            scene, camera, config, px_start=i * n_px_local, n_px=n_px_local
        )
        for i in range(n)
    ]
    if per_shard[0] is None:
        return None
    stacked = tuple(
        None
        if per_shard[0][k] is None  # size-demoted tables carry a None slot
        else jnp.stack([t[k] for t in per_shard])
        for k in range(len(per_shard[0]))
    )
    sharding = NamedSharding(mesh, P(axis_name))
    return tuple(
        None if t is None else jax.device_put(t, sharding) for t in stacked
    )


def trace_sums_sharded(
    mesh: Mesh,
    scene: DeviceScene,
    camera: Camera,
    config: RenderConfig,
    frame=0,
    backend: str = "auto",
    cand_tables=None,
    gather_len: int | None = None,
):
    """Raw per-pixel trace sums with the pixel grid row-sharded over the
    mesh.  Returns (color_sum (H, W, 3), weight_sum (H, W), blur_sum (H, W))
    as row-sharded jax.Arrays — the sharding primitive for both the plain
    and the progressive multi-chip pipelines.

    Bitwise identical to the single-chip sums: the RNG is keyed on global
    ray ids and each chip traces a disjoint pixel range.
    ``cand_tables``: ``build_cand_tables_sharded`` output for THIS camera.
    ``gather_len``: static certification that no shard's (tile, wedge) cell
    exceeds it (``trace_pallas.seg_max_count`` accepts the stacked sharded
    counts — its max covers every shard).
    """
    h, w = scene.height, scene.width
    (axis_name,) = mesh.axis_names
    rows_local = _local_rows(mesh, scene)
    n_px_local = rows_local * w

    have_tables = cand_tables is not None
    tables_arg = cand_tables if have_tables else ()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name)),
        out_specs=(
            P(axis_name, None, None),
            P(axis_name, None),
            P(axis_name, None),
        ),
        # pallas_call outputs don't carry varying-mesh-axes metadata yet
        check_vma=False,
    )
    def traced(scene_rep, cam, tables):
        shard = jax.lax.axis_index(axis_name)
        px_start = shard * n_px_local
        # drop the leading (sharded, now size-1) stack axis
        local_tables = (
            tuple(None if t is None else t[0] for t in tables)
            if have_tables
            else None
        )
        csum, wsum, bsum = renderer.trace_sums_flat(
            scene_rep, cam, config, frame, px_start, n_px_local, backend,
            cand_tables=local_tables, gather_len=gather_len,
        )
        return (
            csum.reshape(rows_local, w, 3),
            wsum.reshape(rows_local, w),
            bsum.reshape(rows_local, w),
        )

    return traced(scene, camera, tables_arg)


def trace_image_sharded(
    mesh: Mesh,
    scene: DeviceScene,
    camera: Camera,
    config: RenderConfig,
    frame=0,
    backend: str = "auto",
    cand_tables=None,
    gather_len: int | None = None,
):
    """Trace the frame with the pixel grid row-sharded over the mesh.

    Returns (image (H, W, 4), blur_map (H, W)) as row-sharded jax.Arrays.
    """
    csum, wsum, bsum = trace_sums_sharded(
        mesh, scene, camera, config, frame, backend, cand_tables, gather_len
    )
    return renderer.normalize_sums(csum, wsum, bsum, config)


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "config", "backend", "max_blur_radius", "gather_len"
    ),
)
def render_frame_sharded(
    mesh: Mesh,
    scene: DeviceScene,
    camera: Camera,
    state: renderer.FrameState,
    config: RenderConfig,
    backend: str = "auto",
    max_blur_radius: int | None = None,
    denoiser_params=None,
    cand_tables=None,
    gather_len: int | None = None,
):
    """Full multi-chip frame: sharded trace + sharded post-processing.

    The same pipeline as renderer.render_frame (trace -> denoise -> blur,
    optixHello.cpp:1163-1259), feature-complete with the single-chip path:
    hoisted acceleration tables (``cand_tables`` from
    ``build_cand_tables_sharded``) and the learned CNN denoiser
    (``denoiser_params``) both ride along.  Post-processing is the shared
    ``renderer._postprocess`` running on the row-sharded image — XLA
    partitions the blur/bilateral/warp windows with automatic halo exchange
    over ICI.
    """
    (axis_name,) = mesh.axis_names
    image, blur_map = trace_image_sharded(
        mesh, scene, camera, config, state.frame, backend, cand_tables,
        gather_len,
    )
    row_sharding = NamedSharding(mesh, P(axis_name, None, None))
    image = jax.lax.with_sharding_constraint(image, row_sharding)

    image, next_prev = renderer._postprocess(
        image, blur_map, state, config, scene, max_blur_radius, denoiser_params
    )

    image = jax.lax.with_sharding_constraint(image, row_sharding)
    next_state = renderer.FrameState(
        prev_image=next_prev,
        flow=jnp.zeros_like(state.flow),
        frame=state.frame + 1,
    )
    return image, next_state


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "config", "backend", "max_blur_radius", "gather_len"
    ),
)
def render_frame_progressive_sharded(
    mesh: Mesh,
    scene: DeviceScene,
    camera: Camera,
    state: renderer.FrameState,
    prog: renderer.ProgressiveState,
    config: RenderConfig,
    reset,
    backend: str = "auto",
    max_blur_radius: int | None = None,
    denoiser_params=None,
    cand_tables=None,
    gather_len: int | None = None,
):
    """Multi-chip progressive pass: the sharded analogue of
    renderer.render_frame_progressive — each pass adds rays_per_pixel fresh
    stratified rays per pixel to the row-sharded Monte-Carlo accumulator;
    ``reset`` (traced bool) drops the history on camera motion.

    Returns (image, next FrameState, next ProgressiveState); all image-space
    state stays row-sharded.
    """
    (axis_name,) = mesh.axis_names
    row3 = NamedSharding(mesh, P(axis_name, None, None))
    csum, wsum, bsum = trace_sums_sharded(
        mesh, scene, camera, config, state.frame, backend, cand_tables,
        gather_len,
    )
    keep = 1.0 - jnp.asarray(reset, jnp.float32)
    csum = csum + prog.color_sum * keep
    wsum = wsum + prog.weight_sum * keep
    bsum = bsum + prog.blur_sum * keep
    passes = prog.passes * jnp.asarray(~jnp.asarray(reset, bool), jnp.int32) + 1
    next_prog = renderer.ProgressiveState(csum, wsum, bsum, passes)

    image, blur_map = renderer.normalize_sums(csum, wsum, bsum, config)
    image = jax.lax.with_sharding_constraint(image, row3)
    image, next_prev = renderer._postprocess(
        image, blur_map, state, config, scene, max_blur_radius, denoiser_params
    )
    image = jax.lax.with_sharding_constraint(image, row3)
    next_state = renderer.FrameState(
        prev_image=next_prev,
        flow=jnp.zeros_like(state.flow),
        frame=state.frame + 1,
    )
    return image, next_state, next_prog
