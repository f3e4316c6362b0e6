"""Quality harness: PSNR of our renders against (a) our own high-rpp ground
truth (convergence + denoiser benefit) and (b) the reference's checked-in
screencaps where available (lb16/32/64/128.jpg are lady_bug.xml at those ray
counts, SURVEY.md §4).

Monte-Carlo noise realizations differ between any two renderers (and between
our runs at different seeds), so the self-comparison PSNR(N rpp vs 1024 rpp)
is the statistically meaningful convergence measure; the cross-renderer
number vs the JPG screencaps additionally absorbs JPEG compression and the
reference's unknown denoise/AA settings — report both, trust the trend.

Usage: python benchmarks/quality.py [--size 512] [--scene lady_bug]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

import raytracingdiffusioncurves_tpu as rtdc  # noqa: E402
from raytracingdiffusioncurves_tpu.utils.image import psnr, to_uint8  # noqa: E402

SCREENCAPS = "/root/reference/optixHello/screencaps"
XMLS = "/root/reference/optixHello/xmls"
LADY = f"{XMLS}/DiffusionCurvePack/lady_bug.xml"
# Cameras estimated by benchmarks/register_cameras.py (grid + local search
# against each screencap); regenerate with that script if scenes change.
CAMERAS_JSON = os.path.join(os.path.dirname(__file__), "cameras.json")


def render(dev, rpp, seed=0, denoise=False, backend="auto"):
    cfg = rtdc.RenderConfig(
        rays_per_pixel=rpp, use_blur=True, use_denoiser=denoise, seed=seed
    )
    state = rtdc.init_frame_state(dev.width, dev.height)
    img, state = rtdc.render_frame(dev, rtdc.Camera(), state, cfg, backend=backend)
    if denoise:  # second frame so the temporal history is active
        img, _ = rtdc.render_frame(dev, rtdc.Camera(), state, cfg, backend=backend)
    return np.asarray(img)


def feature_caps(backend: str, size: int = 512, rpp: int = 128):
    """PSNR of our renders against the reference's FEATURE screencaps
    (endcap, weight_demo, blur on/off, AA line gradient — SURVEY.md §4) at
    the cameras registered by benchmarks/register_cameras.py.

    Cross-renderer PSNR absorbs JPEG compression, the reference's unknown
    AA/denoise settings, window aspect and MC noise — treat it as a
    similarity score (the reference's own lb16-vs-lb128 screencap self-PSNR,
    computed below as the calibration row, is 44.1 dB — the attainable
    cross-image ceiling), and pair it with the self-convergence metric for
    the trend."""
    import json as _json

    from PIL import Image

    if not os.path.exists(CAMERAS_JSON):
        return {}
    cams = _json.load(open(CAMERAS_JSON))
    out = {}
    # Calibration: the reference's own lb16 vs lb128 screencaps (same scene,
    # different ray counts + JPEG) set the attainable cross-image ceiling.
    la = np.asarray(
        Image.open(os.path.join(SCREENCAPS, "lb16.jpg")).convert("RGB"),
        np.float64,
    ) / 255.0
    lb = np.asarray(
        Image.open(os.path.join(SCREENCAPS, "lb128.jpg")).convert("RGB"),
        np.float64,
    ) / 255.0
    if la.shape == lb.shape:
        out["psnr_ref_lb16_vs_lb128"] = round(psnr(la, lb), 2)
    for cap, rec in cams.items():
        if "zoom" not in rec:
            continue
        scene = rtdc.load_scene(os.path.join(XMLS, rec["scene"]))
        scene = scene.with_size(size, size)
        dev = rtdc.build_device_scene(scene)
        cfg = rtdc.RenderConfig(
            rays_per_pixel=rpp, use_blur=rec.get("blur", False),
            use_denoiser=False,
        )
        # the registered zoom is tied to the registration resolution
        zoom = rec["zoom"] * rec.get("size", 128) / size
        img, _ = rtdc.trace_image(
            dev, rtdc.Camera(zoom, rec["off_x"], rec["off_y"]),
            cfg, 0, backend=backend,
        )
        ours = to_uint8(np.asarray(img), flip_vertical=True)[..., :3]
        ref = np.asarray(
            Image.open(os.path.join(SCREENCAPS, cap)).convert("RGB").resize(
                (size, size)
            ),
            np.float64,
        )
        out[f"psnr_vs_{cap}"] = round(
            psnr(ours.astype(np.float64) / 255.0, ref / 255.0), 2
        )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--gt-rpp", type=int, default=1024)
    p.add_argument("--backend", default="auto")
    p.add_argument("--features-only", action="store_true")
    args = p.parse_args()

    import jax

    if args.backend == "auto":
        args.backend = "pallas" if jax.default_backend() == "tpu" else "jax"

    if args.features_only:
        print(json.dumps(feature_caps(args.backend, args.size), indent=1))
        return

    scene = rtdc.load_scene(LADY)
    scene = scene.with_size(args.size, args.size)
    dev = rtdc.build_device_scene(scene)

    gt = render(dev, args.gt_rpp, backend=args.backend)
    gt8 = to_uint8(gt, flip_vertical=False)[..., :3].astype(np.float64) / 255.0
    results = {}
    for rpp in (16, 32, 64, 128):
        img = render(dev, rpp, backend=args.backend)
        # Quantize both sides so the self metric matches the screencap
        # metric's dynamics (raw-float MSE is dominated by the heavy-tailed
        # near-curve weights).
        img8 = to_uint8(img, flip_vertical=False)[..., :3].astype(np.float64) / 255.0
        results[f"psnr_self_{rpp}rpp"] = round(psnr(img8, gt8), 2)
        dn = render(dev, rpp, denoise=True, backend=args.backend)
        dn8 = to_uint8(dn, flip_vertical=False)[..., :3].astype(np.float64) / 255.0
        results[f"psnr_self_{rpp}rpp_denoised"] = round(psnr(dn8, gt8), 2)

        cap = os.path.join(SCREENCAPS, f"lb{rpp}.jpg")
        if os.path.exists(cap) and args.size == 512:
            from PIL import Image

            ref = np.asarray(Image.open(cap).convert("RGB"), np.float64) / 255.0
            ours = to_uint8(img, flip_vertical=True)[..., :3].astype(np.float64) / 255.0
            results[f"psnr_vs_reference_lb{rpp}"] = round(psnr(ours, ref), 2)

    results.update(feature_caps(args.backend, args.size))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
