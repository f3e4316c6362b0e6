"""raytracingdiffusioncurves_tpu — a TPU-native diffusion-curve renderer.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
MikaZeilstra/RaytracingDiffusionCurves ("A Ray Tracing Approach to Diffusion
Curves", Bowers et al. 2011 + thesis extensions): Orzan-XML scene loading,
per-pixel stratified ray fans against cubic Bezier diffusion curves, endcaps,
portal curves, per-curve weight/weight-degree control, per-pixel variable
Gaussian blur, and flow-guided temporal denoising — redesigned for TPUs
(MXU bilinear intersection, lane-wide reductions, shard_map tile parallelism)
rather than translated from CUDA/OptiX.

Quick start::

    import raytracingdiffusioncurves_tpu as rtdc
    scene = rtdc.load_scene("arch.xml")
    dev = rtdc.build_device_scene(scene)
    cfg = rtdc.RenderConfig(rays_per_pixel=128)
    image, blur_map = rtdc.trace_image(dev, rtdc.Camera(), cfg)
    rtdc.save_image(image)
"""

from .config import Camera, RenderConfig
from .models.renderer import (
    FrameState,
    ProgressiveState,
    init_frame_state,
    init_progressive_state,
    render_frame,
    render_frame_progressive,
    trace_image,
)
from .scene.device import DeviceScene, build_device_scene
from .scene.xml_loader import SceneTables, load_scene, load_scene_from_string
from .utils.image import psnr, save_image, to_uint8

__all__ = [
    "Camera",
    "RenderConfig",
    "SceneTables",
    "DeviceScene",
    "FrameState",
    "load_scene",
    "load_scene_from_string",
    "build_device_scene",
    "trace_image",
    "render_frame",
    "render_frame_progressive",
    "init_frame_state",
    "init_progressive_state",
    "ProgressiveState",
    "save_image",
    "to_uint8",
    "psnr",
]

__version__ = "0.1.0"
