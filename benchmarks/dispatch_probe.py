"""Attribute the viewer loop's per-frame host dispatch cost (VERDICT r4 #4).

viewer_fps_r4b measured dispatch_ms = 158-349 per frame against ~28 ms of
device time.  This decomposes one InteractiveSession.render() into its
host-side pieces on the live backend:

  issue_ms     — jit call with device-resident args, NO sync (pure host
                 trace-cache lookup + argument flatten + dispatch)
  issue_np_ms  — same with one fresh host numpy bool arg per call (the
                 viewer's `_moved` flag): does the scalar transfer cost an
                 extra RPC?
  sync_ms      — block_until_ready on the returned frame (through the
                 tunnel this is >= one RTT; a local deployment pays ~0)
  put_ms       — a bare device_put of one scalar (RPC floor)
  chain_k      — K renders issued back-to-back, ONE sync at the end,
                 divided by K (what an async display loop would pay)

Usage: python benchmarks/dispatch_probe.py [--frames 30]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import raytracingdiffusioncurves_tpu as rtdc
from raytracingdiffusioncurves_tpu.utils import compile_cache

compile_cache.enable()

XML = "/root/reference/optixHello/xmls/arch.xml"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from raytracingdiffusioncurves_tpu import viewer as viewer_mod

    scene = rtdc.load_scene(XML).with_size(1920, 1088)
    dev = rtdc.build_device_scene(scene)
    cfg = rtdc.RenderConfig(
        rays_per_pixel=8, use_aa=True, use_blur=False, use_denoiser=True
    )
    session = viewer_mod.InteractiveSession(dev, cfg, progressive=True,
                                            backend="pallas")
    session._world_grid()
    np.asarray(session.render())  # compile + settle the static-camera path

    k = args.frames

    def timed(fn, n=k):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) * 1000 / n

    # issue-only: render() without its internal sync — call the underlying
    # frame fn the way render() does but skip block_until_ready by using
    # the session and discarding (render blocks internally, so measure the
    # renderer call directly).
    from raytracingdiffusioncurves_tpu.models import renderer

    tables, gl = session._accel_tables()
    moved_false = jnp.bool_(False)  # device-resident constant

    state = {"s": session.state, "p": session.prog}

    def issue():
        img, state["s"], state["p"] = renderer.render_frame_progressive(
            dev, session.camera, state["s"], state["p"], cfg, moved_false,
            backend="pallas", cand_tables=tables, gather_len=gl,
            denoiser_params=session.denoiser_params,
        )
        return img

    img = issue()
    img.block_until_ready()
    issue_ms = timed(lambda: issue())
    img = issue()
    img.block_until_ready()

    def issue_np():
        img, state["s"], state["p"] = renderer.render_frame_progressive(
            dev, session.camera, state["s"], state["p"], cfg,
            jnp.bool_(False),  # fresh host scalar -> device each call
            backend="pallas", cand_tables=tables, gather_len=gl,
            denoiser_params=session.denoiser_params,
        )
        return img

    issue_np_ms = timed(lambda: issue_np())

    # sync cost on an already-computed frame
    img = issue()
    img.block_until_ready()
    sync_ms = timed(lambda: issue().block_until_ready(), n=max(5, k // 3))

    put_ms = timed(
        lambda: jax.device_put(np.float32(1.0)).block_until_ready(),
        n=max(5, k // 3),
    )

    # chained: K issues, one sync
    t0 = time.perf_counter()
    last = None
    for _ in range(k):
        last = issue()
    last.block_until_ready()
    chain_ms = (time.perf_counter() - t0) * 1000 / k

    print(json.dumps({
        "label": "dispatch_probe_1080p8rpp",
        "issue_ms": round(issue_ms, 2),
        "issue_np_ms": round(issue_np_ms, 2),
        "sync_ms": round(sync_ms, 2),
        "put_ms": round(put_ms, 2),
        "chain_ms": round(chain_ms, 2),
    }))


if __name__ == "__main__":
    main()
