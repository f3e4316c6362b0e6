"""Command-line renderer.

Mirrors the reference invocation ``OptixHello.exe <scene.xml> <rays_per_pixel>``
(README.md:10-13, optixHello.cpp:82-102) and its measurement protocol: setup
time printed once, mean frame time printed at exit
(optixHello.cpp:1156-1157,1260-1263).

    python -m raytracingdiffusioncurves_tpu <scene.xml> <rays_per_pixel>
        [--frames N] [--out image.png] [--width W --height H]
        [--no-blur] [--no-denoiser] [--no-aa] [--zoom Z --offset-x X --offset-y Y]
        [--backend auto|jax|pallas] [--viewer]
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="raytracingdiffusioncurves_tpu",
        description="TPU-native diffusion-curve renderer",
    )
    p.add_argument("scene", help="path to a diffusion curve xml")
    p.add_argument("rays", type=int, help="number of rays per pixel")
    p.add_argument("--frames", type=int, default=1, help="frames to render")
    p.add_argument("--out", default=None, help="output image path (png/jpg)")
    p.add_argument("--width", type=int, default=None, help="override image width")
    p.add_argument("--height", type=int, default=None, help="override image height")
    p.add_argument("--no-blur", action="store_true")
    p.add_argument("--no-denoiser", action="store_true")
    p.add_argument("--denoiser-weights", default=None, metavar="MSGPACK",
                   help="trained CNN denoiser weights (models/train_denoiser.py); "
                   "replaces the analytic temporal denoiser.  Default: the "
                   "newest shipped weights/denoiser*.msgpack; 'none' forces "
                   "the analytic pass")
    p.add_argument("--no-aa", action="store_true")
    p.add_argument("--no-diffusion-save", action="store_true")
    p.add_argument("--zoom", type=float, default=1.0)
    p.add_argument("--offset-x", type=float, default=0.0)
    p.add_argument("--offset-y", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--flatten-k", type=int, default=16)
    p.add_argument("--min-sub", type=int, default=None,
                   help="per-segment subdivision FLOOR for adaptive "
                   "flattening (dense scenes: 2-4 halves sub-segment count; "
                   "hit/miss stays exact under exact silhouettes)")
    p.add_argument("--sagitta", type=float, default=None,
                   help="max chord deviation (world units) for adaptive "
                   "flattening; 0.25 default, 0.5 measured quality-safe "
                   "on dense scenes (above the MC noise floor)")
    p.add_argument("--backend", choices=["auto", "jax", "pallas"], default="auto")
    p.add_argument("--device", choices=["auto", "cpu"], default="auto",
                   help="cpu: in-process platform switch BEFORE any device "
                   "use (the JAX_PLATFORMS env var is overridden by TPU "
                   "bootstraps on tunneled hosts; this flag is the reliable "
                   "way to keep a render off a busy single-client TPU)")
    p.add_argument("--viewer", action="store_true", help="open the interactive viewer")
    p.add_argument("--http-viewer", type=int, default=None, metavar="PORT",
                   help="serve the live MJPEG viewer on this port (0 = auto)")
    p.add_argument("--devices", type=int, default=0, help="shard across N devices (0 = single)")
    p.add_argument("--profile", default=None, metavar="LOGDIR",
                   help="capture a jax.profiler device trace of the timed frames")
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume temporal state + camera from a session checkpoint")
    p.add_argument("--save-session", default=None, metavar="CKPT",
                   help="write the session checkpoint on exit")
    p.add_argument("--stats", action="store_true",
                   help="print per-phase timing + metrics JSON lines on exit")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    if args.device == "cpu":
        # Switch before ANY device use (probing jax.default_backend() first
        # would itself claim a tunneled TPU) — train_denoiser does the same.
        jax.config.update("jax_platforms", "cpu")
        from jax.extend.backend import clear_backends

        clear_backends()

    # Persistent compile cache: warm processes deserialize executables
    # instead of re-jitting (cold setup was 24-44 s; see utils/compile_cache).
    from .utils import compile_cache

    compile_cache.enable()

    from . import (
        Camera,
        RenderConfig,
        build_device_scene,
        init_frame_state,
        load_scene,
        render_frame,
        save_image,
    )
    from .utils.timing import Metrics, PhaseTimer

    timer = PhaseTimer()
    metrics = Metrics()

    setup_start = time.perf_counter()
    with timer.phase("scene_load"):
        scene = load_scene(args.scene, diffusion_curve_save=not args.no_diffusion_save)
        if args.width or args.height:
            scene = scene.with_size(args.width or scene.width,
                                    args.height or scene.height)
    with timer.phase("device_build"):
        dev = build_device_scene(scene, flatten_subdivisions=args.flatten_k,
                                 min_subdivisions=args.min_sub,
                                 **({"max_sagitta": args.sagitta}
                                    if args.sagitta else {}))
    metrics.set("n_segments", dev.s_pad)
    metrics.set("width", scene.width)
    metrics.set("height", scene.height)
    config = RenderConfig(
        rays_per_pixel=args.rays,
        diffusion_curve_save=not args.no_diffusion_save,
        use_blur=not args.no_blur,
        use_aa=not args.no_aa,
        use_denoiser=not args.no_denoiser,
        seed=args.seed,
    )
    camera = Camera(args.zoom, args.offset_x, args.offset_y)
    state = init_frame_state(scene.width, scene.height)
    if args.resume:
        from .utils.checkpoint import load_session

        state, camera, _ = load_session(args.resume)
        print(f"resumed at frame {int(state.frame)} from {args.resume}")

    # Denoiser weights: an explicit path wins; the default ("auto") uses the
    # newest shipped checkpoint so `use_denoiser` means the TRAINED model
    # out of the box (the reference's pretrained OptiX model needs no flag
    # either, optixHello.cpp:1057); "none" forces the analytic pass.
    denoiser_params = None
    if not args.no_denoiser and args.denoiser_weights != "none":
        from .models import denoiser as dn

        if args.denoiser_weights not in (None, "auto"):
            denoiser_params = dn.load_params(args.denoiser_weights)
        else:
            import glob as _glob

            root = os.path.join(os.path.dirname(__file__), "..", "weights")
            # mtime picks the newest checkpoint; the name tie-break keeps
            # the choice deterministic on fresh checkouts (equal mtimes)
            cands = sorted(_glob.glob(os.path.join(root, "denoiser*.msgpack")),
                           key=lambda p: (os.path.getmtime(p), p),
                           reverse=True)
            if cands:
                denoiser_params = dn.load_params(cands[0])

    # Hoist the camera-dependent acceleration tables (the one-time accel
    # build, optixHello.cpp:764-830): the CLI renders a static camera, so
    # every frame past the first skips the prepass.  Pallas backend only.
    backend = args.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jax"
    if args.devices > 1:
        from .parallel import sharded

        mesh = sharded.make_mesh(args.devices)
        with timer.phase("accel_build"):
            tables = (
                sharded.build_cand_tables_sharded(mesh, dev, camera, config)
                if backend == "pallas"
                else None
            )
        run = lambda cam, st: sharded.render_frame_sharded(
            mesh, dev, cam, st, config, backend=backend,
            denoiser_params=denoiser_params, cand_tables=tables,
        )
    else:
        gather_len = None
        if backend == "pallas":
            from .ops import trace_pallas

            with timer.phase("accel_build"):
                tables = trace_pallas.build_cand_tables(dev, camera, config)
                gather_len = trace_pallas.seg_max_count(dev, tables)
        else:
            tables = None
        run = lambda cam, st: render_frame(
            dev, cam, st, config, backend=backend,
            denoiser_params=denoiser_params, cand_tables=tables,
            gather_len=gather_len,
        )

    # Warmup/compile counts as setup, matching the reference whose OptiX
    # pipeline compilation happens before the timer print (optixHello.cpp:1156).
    with timer.phase("compile_first_frame"):
        image, state = run(camera, state)
        image.block_until_ready()
    setup_time = time.perf_counter() - setup_start
    print(f"Setup took : {setup_time * 1000:.1f}ms")

    if args.viewer:
        from .viewer import run_viewer

        run_viewer(dev, config, camera, backend=args.backend, tables=scene,
                   denoiser_params=denoiser_params)
        return 0

    if args.http_viewer is not None:
        from .viewer import InteractiveSession
        from .viewer_http import HttpViewer

        session = InteractiveSession(
            dev, config, camera, backend=args.backend,
            denoiser_params=denoiser_params,
        )
        HttpViewer(session, port=args.http_viewer).serve_forever()
        return 0

    import contextlib

    profile_cm = contextlib.nullcontext()
    if args.profile:
        from .utils.timing import trace_to

        profile_cm = trace_to(args.profile)

    with profile_cm:
        for f in range(args.frames - 1):
            with timer.phase("frame"):
                image, state = run(camera, state)
                image.block_until_ready()
            metrics.inc("frames")
            metrics.inc("rays", scene.width * scene.height * args.rays)
            print(f"\rframe : {f + 1}", end="", flush=True)
    if timer.phases.get("frame"):
        mean_ms = timer.mean_ms("frame")
        print(f"\nAverage frame time : {mean_ms:.2f}ms")
        metrics.set("mean_frame_ms", round(mean_ms, 3))
        metrics.set(
            "rays_per_sec",
            round(scene.width * scene.height * args.rays / (mean_ms / 1000.0)),
        )
    if args.stats:
        print(timer.report())
        print(metrics.dump())

    if args.save_session:
        from .utils.checkpoint import save_session

        print(f"saved session to {save_session(args.save_session, state, camera)}")

    path = save_image(
        jax.device_get(image), args.out, flip_vertical=not args.no_diffusion_save
    )
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
