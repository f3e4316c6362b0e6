"""Checkpoint / resume.

The reference has no persistence beyond screenshots (SURVEY.md §5); its only
cross-frame state is prev_image + flow + the curand states (params.h:39-42).
Here the full render session — temporal FrameState, camera, frame counter,
and optionally learned denoiser parameters — round-trips through a single
file, so an interactive or batch session can resume exactly where it left
off (the RNG is stateless, so resuming at frame N reproduces frame N's
jitter bit-for-bit).
"""

from __future__ import annotations

import io
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Camera
from ..models.renderer import FrameState

_FORMAT_VERSION = 1


def save_session(
    path: str,
    state: FrameState,
    camera: Camera,
    denoiser_params=None,
) -> str:
    payload = {
        "version": np.int64(_FORMAT_VERSION),
        "prev_image": np.asarray(state.prev_image),
        "flow": np.asarray(state.flow),
        "frame": np.asarray(state.frame),
        "camera": np.asarray([camera.zoom_factor, camera.offset_x, camera.offset_y], np.float64),
    }
    if denoiser_params is not None:
        from flax import serialization

        payload["denoiser"] = np.frombuffer(
            serialization.to_bytes(denoiser_params), dtype=np.uint8
        )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)  # atomic
    return path


def load_session(path: str, denoiser_params_template=None):
    """Returns (FrameState, Camera, denoiser_params or None)."""
    with np.load(path, allow_pickle=False) as z:
        if int(z["version"]) != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {int(z['version'])}")
        state = FrameState(
            prev_image=jnp.asarray(z["prev_image"]),
            flow=jnp.asarray(z["flow"]),
            frame=jnp.int32(z["frame"]),
        )
        cam = Camera(*[float(v) for v in z["camera"]])
        params = None
        if "denoiser" in z.files:
            if denoiser_params_template is None:
                raise ValueError("checkpoint has denoiser params; pass a template")
            from flax import serialization

            params = serialization.from_bytes(
                denoiser_params_template, z["denoiser"].tobytes()
            )
    return state, cam, params
