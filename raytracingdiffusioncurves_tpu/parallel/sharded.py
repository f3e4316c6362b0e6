"""Multi-chip rendering: data-parallel over image tiles.

The reference is strictly single-GPU (SURVEY.md §2.4): its only parallelism
is one CUDA thread per pixel.  Scaling on TPU is a new, first-class design:

* the H x W pixel grid is sharded across the mesh's ``rows`` axis in
  contiguous row bands (BASELINE config #5: per-tile image sharding);
* scene tables are tiny (KB-MB) and replicated on every chip;
* the trace is embarrassingly parallel — each chip runs the Pallas megakernel
  on its own pixel range via ``shard_map`` with zero communication;
* post-processing (temporal denoise + variable blur) runs under plain jit on
  the row-sharded image: XLA's SPMD partitioner inserts the halo exchanges
  for the shifted-window ops over ICI automatically — the TPU-native answer
  to the reference's single-device Gaussian kernels (helperKernels.cu:48-148).

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
from ..ops import blur as blur_ops
from ..ops import denoise as denoise_ops
from ..scene.device import DeviceScene


def make_mesh(n_devices: int | None = None, axis_name: str = "rows") -> Mesh:
    """1-D device mesh over the tile axis."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))


def trace_image_sharded(
    mesh: Mesh,
    scene: DeviceScene,
    camera: Camera,
    config: RenderConfig,
    frame=0,
    backend: str = "auto",
):
    """Trace the frame with the pixel grid row-sharded over the mesh.

    Returns (image (H, W, 4), blur_map (H, W)) as row-sharded jax.Arrays.
    Bitwise identical to the single-chip result: the RNG is keyed on global
    ray ids and each chip traces a disjoint pixel range.
    """
    h, w = scene.height, scene.width
    (axis_name,) = mesh.axis_names
    n = mesh.devices.size
    if h % n != 0:
        raise ValueError(f"image height {h} not divisible by mesh size {n}")
    rows_local = h // n
    n_px_local = rows_local * w

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(axis_name, None, None), P(axis_name, None)),
        # pallas_call outputs don't carry varying-mesh-axes metadata yet
        check_vma=False,
    )
    def traced(scene_rep, cam):
        shard = jax.lax.axis_index(axis_name)
        px_start = shard * n_px_local
        csum, wsum, bsum = renderer.trace_sums_flat(
            scene_rep, cam, config, frame, px_start, n_px_local, backend
        )
        image, blur_map = renderer.normalize_sums(
            csum.reshape(rows_local, w, 3),
            wsum.reshape(rows_local, w),
            bsum.reshape(rows_local, w),
            config,
        )
        return image, blur_map

    return traced(scene, camera)


@partial(
    jax.jit,
    static_argnames=("mesh", "config", "backend", "max_blur_radius"),
)
def render_frame_sharded(
    mesh: Mesh,
    scene: DeviceScene,
    camera: Camera,
    state: renderer.FrameState,
    config: RenderConfig,
    backend: str = "auto",
    max_blur_radius: int | None = None,
):
    """Full multi-chip frame: sharded trace + sharded post-processing.

    Same pipeline as renderer.render_frame (trace -> denoise -> blur,
    optixHello.cpp:1163-1259) with every image-space op running on the
    row-sharded arrays — XLA partitions the blur/bilateral windows with
    automatic halo exchange over ICI.
    """
    (axis_name,) = mesh.axis_names
    image, blur_map = trace_image_sharded(mesh, scene, camera, config, state.frame, backend)
    row_sharding = NamedSharding(mesh, P(axis_name, None, None))
    image = jax.lax.with_sharding_constraint(image, row_sharding)

    if config.use_denoiser:
        denoised = denoise_ops.temporal_denoise(
            image, state.prev_image, state.flow, state.frame, config.corrected_image_mix
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
            image = blur_ops.variable_gaussian_blur(image, blur_map, radius)

    image = jax.lax.with_sharding_constraint(image, row_sharding)
    next_state = renderer.FrameState(
        prev_image=next_prev,
        flow=jnp.zeros_like(state.flow),
        frame=state.frame + 1,
    )
    return image, next_state
