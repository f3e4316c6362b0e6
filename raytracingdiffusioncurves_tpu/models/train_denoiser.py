"""Self-supervised training for the learned denoiser.

The OptiX denoiser the reference uses is a pretrained network
(optixHello.cpp:1057); ours trains directly on the renderer's own output —
no external dataset: for random scenes/cameras, render a noisy low-rpp frame
(+ the flow-warped previous output, matching the temporal guide layout,
optixHello.cpp:1115-1127) and supervise against a high-rpp render of the
same view.

Usage:
    python -m raytracingdiffusioncurves_tpu.models.train_denoiser \
        --scenes /root/reference/optixHello/xmls --steps 200 --out denoiser.msgpack
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Camera, RenderConfig
from ..models import denoiser as dn
from ..models import renderer
from ..ops import flow as flow_ops
from ..scene.device import build_device_scene
from ..scene.xml_loader import load_scene


def sample_example(dev, rng: np.random.Generator, size: int, backend: str, frame: int):
    """One (noisy, warped_prev, aux, target) example from a random camera."""
    zoom = float(np.exp(rng.uniform(np.log(0.3), np.log(2.0))))
    off = rng.uniform(-100, 100, 2)
    cam = Camera(zoom, float(off[0]), float(off[1]))
    lo = RenderConfig(rays_per_pixel=8, use_blur=False, use_denoiser=False, seed=frame)
    hi = RenderConfig(rays_per_pixel=256, use_blur=False, use_denoiser=False, seed=frame)
    noisy, blur_map = renderer.trace_image(dev, cam, lo, frame, backend)
    target, _ = renderer.trace_image(dev, cam, hi, frame, backend)
    # previous frame: slightly different camera, warped back by the true flow
    zoom_prev = zoom * 1.1
    prev, _ = renderer.trace_image(dev, Camera(zoom_prev, cam.offset_x, cam.offset_y),
                                   lo, frame + 1, backend)
    fl = flow_ops.add_zoom_flow(flow_ops.zero_flow(*noisy.shape[:2]), zoom_prev, zoom)
    warped = flow_ops.warp_by_flow(prev, fl)
    return dn.make_batch_from_renders(noisy, target, warped, blur_map)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scenes", default="/root/reference/optixHello/xmls")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--out", default="denoiser_params.msgpack")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-scenes", type=int, default=4)
    p.add_argument("--val-scene", default=None,
                   help="held-out scene xml for periodic validation PSNR")
    args = p.parse_args(argv)

    backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    rng = np.random.default_rng(args.seed)

    paths = sorted(glob.glob(os.path.join(args.scenes, "*.xml")))
    devs = []
    # Each distinct scene compiles its own trace kernels (minutes on a
    # tunneled TPU) — the pool size trades compile time for generalization.
    for path in paths[: args.n_scenes]:
        scene = load_scene(path)
        scene.__dict__["width"] = args.size
        scene.__dict__["height"] = args.size
        devs.append(build_device_scene(scene, flatten_subdivisions=8))

    val = None
    if args.val_scene:
        vs = load_scene(args.val_scene)
        vs.__dict__["width"] = args.size
        vs.__dict__["height"] = args.size
        val = build_device_scene(vs, flatten_subdivisions=8)

    model, state, tx = dn.create_train_state(jax.random.key(args.seed), args.size, args.size, args.lr)

    def validate():
        if val is None:
            return ""
        from ..utils.image import psnr, to_uint8

        vb = sample_example(val, np.random.default_rng(123), args.size, backend, frame=10_000)
        pred = model.apply(state.params, vb["noisy"], vb["warped_prev"], vb["aux"])
        def q(x):
            return to_uint8(np.asarray(x[0]), False).astype(np.float64) / 255.0
        return (f"  val_psnr {psnr(q(pred), q(vb['target'])):.2f} "
                f"(noisy {psnr(q(vb['noisy']), q(vb['target'])):.2f})")

    for step in range(args.steps):
        dev = devs[int(rng.integers(len(devs)))]
        batch = sample_example(dev, rng, args.size, backend, frame=step)
        state, loss = dn.train_step(model, tx, state, batch)
        if step % 50 == 0:
            print(f"step {step}: loss {float(loss):.5f}{validate()}", flush=True)

    from flax import serialization

    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(state.params))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
