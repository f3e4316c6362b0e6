"""Self-supervised training for the learned denoiser.

The OptiX denoiser the reference uses is a pretrained network
(optixHello.cpp:1057); ours trains directly on the renderer's own output —
no external dataset: for random scenes/cameras, render a noisy low-rpp frame
(+ the flow-warped previous output, matching the temporal guide layout,
optixHello.cpp:1115-1127) and supervise against a high-rpp render of the
same view.

Round-2 recipe (round 1 overfit: few scenes, one noise level, full-frame
batch-1 steps): the expensive rendering is done ONCE into an .npz dataset
(many scenes x cameras x noise levels), then training draws random crops
with flip/transpose augmentation in shuffled minibatches, conditioned on a
noise-level channel, and validates on held-out scenes.

Usage:
    # 1. render the dataset (TPU-fast; scenes compile once each)
    python -m raytracingdiffusioncurves_tpu.models.train_denoiser gen \
        --out denoise_data.npz [--val-out denoise_val.npz]
    # 2. train on crops (CPU is fine at this model size)
    python -m raytracingdiffusioncurves_tpu.models.train_denoiser train \
        --data denoise_data.npz --val denoise_val.npz --out denoiser.msgpack
"""

from __future__ import annotations

import argparse
import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Camera, RenderConfig
from ..models import denoiser as dn
from ..models import renderer
from ..ops import flow as flow_ops
from ..scene.device import build_device_scene
from ..scene.xml_loader import load_scene

XMLS = "/root/reference/optixHello/xmls"
# Held-out scenes never seen in training (validation generalization check).
VAL_SCENES = ("weight_demo.xml", "DiffusionCurvePack/zephyr.xml")
TRAIN_SCENES = (
    "arch.xml",
    "arch2.xml",
    "circles.xml",
    "endcap.xml",
    "line.xml",
    "PortalDemo.xml",
    "test.xml",
    "test2.xml",
    "test3.xml",
    "test4.xml",
    "test5.xml",
    "DiffusionCurvePack/lady_bug.xml",
    "DiffusionCurvePack/drape.xml",
    "DiffusionCurvePack/face.xml",
    "DiffusionCurvePack/roses_spirales.xml",
    "DiffusionCurvePack/behindthecurtain.xml",
    "DiffusionCurvePack/fille.xml",
    # round-3 additions (denoiser +1 dB push): the two remaining pack
    # scenes the trainer never saw — dense geometry diversity
    "DiffusionCurvePack/dolphin.xml",
    "DiffusionCurvePack/lady_bug1024.xml",
)


def sample_example(dev, rng: np.random.Generator, size: int, backend: str, frame: int,
                   rpp_lo: int = 8, rpp_hi: int = 256):
    """One (noisy, warped_prev, aux, target) example from a random camera."""
    zoom = float(np.exp(rng.uniform(np.log(0.3), np.log(2.0))))
    off = rng.uniform(-100, 100, 2)
    cam = Camera(zoom, float(off[0]), float(off[1]))
    lo = RenderConfig(rays_per_pixel=rpp_lo, use_blur=False, use_denoiser=False, seed=frame)
    hi = RenderConfig(rays_per_pixel=rpp_hi, use_blur=False, use_denoiser=False, seed=frame)
    noisy, blur_map = renderer.trace_image(dev, cam, lo, frame, backend)
    target, _ = renderer.trace_image(dev, cam, hi, frame, backend)
    # previous frame: slightly different camera, warped back by the true flow
    zoom_prev = zoom * 1.1
    prev, _ = renderer.trace_image(dev, Camera(zoom_prev, cam.offset_x, cam.offset_y),
                                   lo, frame + 1, backend)
    fl = flow_ops.add_zoom_flow(flow_ops.zero_flow(*noisy.shape[:2]), zoom_prev, zoom)
    warped = flow_ops.warp_by_flow(prev, fl)
    return dn.make_batch_from_renders(noisy, target, warped, blur_map,
                                      noise=dn.noise_level(rpp_lo))


def generate(scene_names, out_path, size=192, cams_per_scene=6, seed=0,
             backend=None, chunk_cams=9):
    """Render a dataset: every scene x camera x noise level, saved float16.

    Checkpointed per (scene, camera-chunk): each chunk's examples land in
    `<out_path>.shards/` the moment they finish, and existing shards are
    skipped on re-run — a timeout-killed gen resumes where it stopped
    instead of losing hours of renders (the round-3 45-cam regen died at
    the 4 h timeout with nothing written).  The RNG is re-seeded per chunk
    so a resumed run draws the same cameras it would have drawn fresh.
    """
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    # rpp 64 rides so the net sees near-clean inputs too (production
    # configs denoise up to 256 rpp; conditioning is aux's noise channel)
    rpp_levels = (4, 8, 16, 32, 64)
    shard_dir = str(out_path) + ".shards"
    os.makedirs(shard_dir, exist_ok=True)
    shard_paths = []
    # (index, name) pairs keep shard names / RNG seeds stable under --scenes
    # filtering (indices are positions in the full scene list).
    pairs = (list(scene_names.items()) if isinstance(scene_names, dict)
             else list(enumerate(scene_names)))
    for si, name in pairs:
        slug = name.replace("/", "_").removesuffix(".xml")
        chunks = [(c0, min(c0 + chunk_cams, cams_per_scene))
                  for c0 in range(0, cams_per_scene, chunk_cams)]
        scene_shards = [os.path.join(shard_dir, f"{si:02d}_{slug}.{c0:03d}.npz")
                        for c0, _ in chunks]
        shard_paths += scene_shards
        if all(os.path.exists(p) for p in scene_shards):
            print(f"{name}: all shards exist, skipping", flush=True)
            continue
        t0 = time.time()
        scene = load_scene(os.path.join(XMLS, name)).with_size(size, size)
        dev = build_device_scene(scene, flatten_subdivisions=8)
        for (c0, c1), sp in zip(chunks, scene_shards):
            if os.path.exists(sp):
                continue
            rng = np.random.default_rng([seed, si, c0])
            rows = {"noisy": [], "warped_prev": [], "aux": [], "target": []}
            for c in range(c0, c1):
                rpp = int(rpp_levels[c % len(rpp_levels)])
                b = sample_example(dev, rng, size, backend,
                                   frame=si * 1000 + c * 7, rpp_lo=rpp)
                for k in rows:
                    rows[k].append(np.asarray(b[k][0], np.float16))
            tmp = sp + ".tmp.npz"
            np.savez_compressed(tmp, **{k: np.stack(v) for k, v in rows.items()})
            os.replace(tmp, sp)
            print(f"  {name} cams {c0}:{c1} done ({time.time() - t0:.0f}s)",
                  flush=True)
        print(f"{name}: {cams_per_scene} examples ({time.time() - t0:.0f}s)",
              flush=True)
    data = [dict(np.load(p)) for p in shard_paths]
    np.savez_compressed(out_path,
                        **{k: np.concatenate([d[k] for d in data])
                           for k in data[0]})
    print(f"wrote {out_path}")


def _crop_batch(data, rng: np.random.Generator, batch: int, crop: int):
    """Random crops + dihedral augmentation from the f16 dataset."""
    n, h, w = data["noisy"].shape[:3]
    idx = rng.integers(n, size=batch)
    ys = rng.integers(h - crop + 1, size=batch)
    xs = rng.integers(w - crop + 1, size=batch)
    flips = rng.integers(4, size=batch)
    out = {k: [] for k in data}
    for i in range(batch):
        for k in data:
            v = data[k][idx[i], ys[i] : ys[i] + crop, xs[i] : xs[i] + crop]
            if flips[i] & 1:
                v = v[::-1]
            if flips[i] & 2:
                v = v[:, ::-1]
            out[k].append(v.astype(np.float32))
    return {k: jnp.asarray(np.stack(v)) for k, v in out.items()}


def _psnr_vs_target(model, params, data) -> float:
    """Full-image PSNR of the denoised output over a dataset (uint8 domain,
    matching utils.image.psnr semantics)."""
    from ..utils.image import psnr, to_uint8

    vals = []
    for i in range(data["noisy"].shape[0]):
        b = {k: jnp.asarray(data[k][i : i + 1], jnp.float32) for k in data}
        pred = model.apply(params, b["noisy"], b["warped_prev"], b["aux"])

        def q(x):
            return to_uint8(np.asarray(x[0]), False).astype(np.float64) / 255.0

        vals.append(psnr(q(pred), q(b["target"])))
    return float(np.mean(vals))


def _psnr_noisy(data) -> float:
    from ..utils.image import psnr, to_uint8

    vals = []
    for i in range(data["noisy"].shape[0]):
        def q(x):
            return to_uint8(np.asarray(x, np.float32), False).astype(np.float64) / 255.0

        vals.append(psnr(q(data["noisy"][i]), q(data["target"][i])))
    return float(np.mean(vals))


def train(data_path, val_path, out_path, steps=4000, batch=32, crop=64,
          lr=2e-3, seed=0, arch="cnn", base=None, ema_decay=0.999):
    # data_path: one .npz or a comma-separated list (concatenated).
    parts = [dict(np.load(p)) for p in str(data_path).split(",")]
    data = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    val = dict(np.load(val_path)) if val_path else None
    rng = np.random.default_rng(seed)
    import optax

    sched = optax.cosine_decay_schedule(lr, steps, alpha=0.1)
    model, state, tx = dn.create_train_state(
        jax.random.key(seed), crop, crop, sched, arch=arch, base=base)

    # EMA of the weights alongside raw SGD iterates: the smoothed params
    # usually score a tenth or two higher on val PSNR; best-val selection
    # below picks whichever candidate wins, so EMA can only help.
    ema = state.params
    ema_step = jax.jit(
        lambda e, p: jax.tree.map(
            lambda a, b: a * ema_decay + b * (1.0 - ema_decay), e, p
        )
    )

    best = (-1.0, state.params)
    for step in range(steps):
        b = _crop_batch(data, rng, batch, crop)
        state, loss = dn.train_step(model, tx, state, b)
        ema = ema_step(ema, state.params)
        if step % 250 == 0 or step == steps - 1:
            msg = f"step {step}: loss {float(loss):.5f}"
            if val is not None:
                vp = _psnr_vs_target(model, state.params, val)
                vp_e = _psnr_vs_target(model, ema, val)
                msg += f"  val_psnr {vp:.2f}  ema {vp_e:.2f}"
                if vp > best[0]:
                    best = (vp, jax.tree.map(np.asarray, state.params))
                if vp_e > best[0]:
                    best = (vp_e, jax.tree.map(np.asarray, ema))
            print(msg, flush=True)

    params = best[1] if best[0] > 0 else state.params
    if val is not None:
        print(f"best val_psnr {best[0]:.2f} (noisy {_psnr_noisy(val):.2f})")
    from flax import serialization

    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    print(f"wrote {out_path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen", help="render the training/validation datasets")
    g.add_argument("--out", default="denoise_data.npz")
    g.add_argument("--val-out", default=None)
    g.add_argument("--size", type=int, default=192)
    g.add_argument("--cams", type=int, default=16)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--backend", default=None, choices=("jax", "pallas"),
                   help="trace backend (default: pallas on TPU, else jax); "
                   "jax-on-TPU skips the per-scene Pallas kernel compiles")
    g.add_argument("--scenes", default=None,
                   help="comma-separated substring filter over TRAIN_SCENES "
                   "(val gen is skipped when set); scene indices keep their "
                   "TRAIN_SCENES positions so shards/seeds stay stable")
    t = sub.add_parser("train", help="train on a rendered dataset")
    t.add_argument("--data", required=True)
    t.add_argument("--val", default=None)
    t.add_argument("--out", default="denoiser_params.msgpack")
    t.add_argument("--steps", type=int, default=4000)
    t.add_argument("--batch", type=int, default=32)
    t.add_argument("--crop", type=int, default=64)
    t.add_argument("--lr", type=float, default=2e-3)
    t.add_argument("--seed", type=int, default=0)
    t.add_argument("--base", type=int, default=None,
                   help="channel width override (UNet base / CNN features)")
    t.add_argument("--arch", default="cnn", choices=("cnn", "unet"),
                   help="unet: multi-scale encoder/decoder (wider receptive "
                   "field; needs --crop a multiple of 4)")
    t.add_argument("--device", default="cpu", choices=("cpu", "auto"),
                   help="train defaults to CPU: the model is tiny, and the "
                   "single-client TPU tunnel must not be shared with a "
                   "concurrently rendering process (JAX_PLATFORMS=cpu in "
                   "the environment is overridden by the TPU bootstrap — "
                   "only an in-process platform switch works)")
    args = p.parse_args(argv)

    if args.cmd == "gen":
        scenes = TRAIN_SCENES
        if args.scenes:
            keys = args.scenes.split(",")
            scenes = {i: n for i, n in enumerate(TRAIN_SCENES)
                      if any(k in n for k in keys)}
        generate(scenes, args.out, args.size, args.cams, args.seed,
                 backend=args.backend)
        if args.val_out and not args.scenes:
            generate(VAL_SCENES, args.val_out, args.size, max(args.cams // 2, 2),
                     args.seed + 1, backend=args.backend)
    else:
        if args.device == "cpu":
            # NOTE: probing jax.default_backend() first would itself claim
            # the tunneled TPU; switch unconditionally before any device use.
            jax.config.update("jax_platforms", "cpu")
            from jax.extend.backend import clear_backends

            clear_backends()
        train(args.data, args.val, args.out, args.steps, args.batch, args.crop,
              args.lr, args.seed, arch=args.arch, base=args.base)


if __name__ == "__main__":
    main()
