"""Estimate the camera (zoom, offset) behind each reference screencap.

The reference's feature screencaps (endcap.png, weight_demo.jpg,
blur-ex.jpg, ...) were captured from an interactive session
(glfw_events.cpp:53-100) at unknown zoom/pan, so PSNR comparison first
needs camera registration: a coarse grid search over (zoom, off_x, off_y)
at low resolution (frames chained inside one jit — the camera is a traced
argument, so the whole grid runs as one on-device loop), then a local
refinement.  Results are printed as JSON for benchmarks/quality.py to pin.

Usage: python benchmarks/register_cameras.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.models import renderer
from raytracingdiffusioncurves_tpu.utils.image import to_uint8

XMLS = "/root/reference/optixHello/xmls"
CAPS = "/root/reference/optixHello/screencaps"

# screencap -> (scene xml, use_blur)
TARGETS = {
    "endcap.png": ("endcap.xml", False),
    "no_cap.png": ("endcap.xml", False),  # same scene; caps off is a scene
    # attribute, so this registers geometry only
    "weight_demo.jpg": ("weight_demo.xml", False),
    "blur-ex.jpg": ("DiffusionCurvePack/lady_bug.xml", True),
    "no_blur_ex.jpg": ("DiffusionCurvePack/lady_bug.xml", False),
    "gradient128AA.png": ("line.xml", False),
    "lb16.jpg": ("DiffusionCurvePack/lady_bug.xml", True),
}


def _scene(path, size):
    scene = rtdc.load_scene(os.path.join(XMLS, path))
    scene = scene.with_size(size, size)
    return rtdc.build_device_scene(scene), scene


def _ref_image(cap, size):
    from PIL import Image

    im = Image.open(os.path.join(CAPS, cap)).convert("RGB").resize((size, size))
    return jnp.asarray(np.asarray(im, np.float32) / 255.0)


def _mse_fn(dev, cfg, size, ref):
    """jitted (zoom, ox, oy) -> MSE against the reference (flip applied:
    screenshots are written flipped for diffusion saves,
    glfw_events.cpp:73-81)."""

    def mse(zoom, ox, oy):
        img, _ = renderer.trace_image(
            dev, rtdc.Camera(zoom, ox, oy), cfg, 0,
            backend="pallas" if jax.default_backend() == "tpu" else "jax",
        )
        rgb = jnp.clip(img[::-1, :, :3], 0.0, 1.0)
        return jnp.mean((rgb - ref) ** 2)

    return mse


def _grid_search(mse, zooms, oxs, oys):
    """One on-device loop over the whole grid; returns (best_mse, z, x, y)."""
    zg, xg, yg = jnp.meshgrid(zooms, oxs, oys, indexing="ij")
    zf, xf, yf = zg.reshape(-1), xg.reshape(-1), yg.reshape(-1)

    @jax.jit
    def run():
        def body(i, best):
            m = mse(zf[i], xf[i], yf[i])
            better = m < best[0]
            return jax.lax.cond(
                better,
                lambda: (m, zf[i], xf[i], yf[i]),
                lambda: best,
            )

        init = (jnp.float32(1e30), jnp.float32(1), jnp.float32(0), jnp.float32(0))
        return jax.lax.fori_loop(0, zf.shape[0], body, init)

    return tuple(float(v) for v in run())


def register(cap, coarse=48, fine=128):
    scene_path, use_blur = TARGETS[cap]
    dev, tables = _scene(scene_path, coarse)
    cfg = rtdc.RenderConfig(
        rays_per_pixel=8, use_blur=use_blur, use_denoiser=False,
        max_blur_radius=2,
    )
    ref = _ref_image(cap, coarse)
    mse = _mse_fn(dev, cfg, coarse, ref)

    # scene bounding box (world units) bounds the offset search
    pts = np.asarray(tables.vertices).reshape(-1, 2)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    span = float(max(hi[0] - lo[0], hi[1] - lo[1], 64.0))
    zooms = jnp.asarray(
        np.exp(np.linspace(np.log(0.05 * span / coarse), np.log(4 * span / coarse), 15)),
        jnp.float32,
    )
    oxs = jnp.asarray(np.linspace(lo[0] - 0.1 * span, hi[0] + 0.1 * span, 13), jnp.float32)
    oys = jnp.asarray(np.linspace(lo[1] - 0.1 * span, hi[1] + 0.1 * span, 13), jnp.float32)
    best = _grid_search(mse, zooms, oxs, oys)

    # local refinement at higher resolution
    dev_f, _ = _scene(scene_path, fine)
    ref_f = _ref_image(cap, fine)
    cfg_f = rtdc.RenderConfig(
        rays_per_pixel=16, use_blur=use_blur, use_denoiser=False,
        max_blur_radius=4,
    )
    mse_f = _mse_fn(dev_f, cfg_f, fine, ref_f)
    _, z, x, y = best
    for shrink in (0.3, 0.1, 0.03):
        zs = jnp.asarray(z * np.exp(np.linspace(-shrink, shrink, 7)), jnp.float32)
        xs = jnp.asarray(x + span * np.linspace(-shrink, shrink, 7), jnp.float32)
        ys = jnp.asarray(y + span * np.linspace(-shrink, shrink, 7), jnp.float32)
        m, z, x, y = _grid_search(mse_f, zs, xs, ys)
    psnr = -10.0 * np.log10(max(m, 1e-12))
    rec = {
        "scene": scene_path,
        "blur": use_blur,
        # zoom is tied to the registration resolution: world span = size *
        # zoom, so rendering at another size S uses zoom * size / S.
        "size": fine,
        "zoom": round(z, 6),
        "off_x": round(x, 3),
        "off_y": round(y, 3),
        "mse": round(m, 6),
        "psnr_128": round(psnr, 2),
    }
    print(json.dumps({"cap": cap, **rec}), flush=True)
    return rec


OUT_JSON = os.path.join(os.path.dirname(__file__), "cameras.json")


def main():
    names = sys.argv[1:] or list(TARGETS)
    results = {}
    if os.path.exists(OUT_JSON):
        results = json.load(open(OUT_JSON))
    for cap in names:
        try:
            results[cap] = register(cap)
        except Exception as e:
            print(json.dumps({"cap": cap, "error": repr(e)[:300]}), flush=True)
    with open(OUT_JSON, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(f"wrote {OUT_JSON}", flush=True)


if __name__ == "__main__":
    main()
