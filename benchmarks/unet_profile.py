"""Device-trace attribution of the packed UNet forward (round 5).

The XLA forward costs 20.7 ms (conv share) against a ~1.5 ms roofline and
two Pallas schedules measured slower — before a third, attribute: capture a
jax.profiler device trace of the packed forward at 1080p and print per-op
device totals, so the cost lands on named convs/fusions instead of guesses.

Usage: python benchmarks/unet_profile.py [pallas] [logdir]
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from raytracingdiffusioncurves_tpu.utils import compile_cache

compile_cache.enable()


def main():
    pallas = "pallas" in sys.argv[1:]
    logdir = next((a for a in sys.argv[1:] if a != "pallas"),
                  "/tmp/unet_prof")
    from raytracingdiffusioncurves_tpu.models import denoiser as dn

    params = dn.load_params("weights/denoiser_r3d.msgpack")
    h, w = 1088, 1920
    z3 = jnp.zeros((1, h, w, 3), jnp.float32)
    z2 = jnp.zeros((1, h, w, 2), jnp.float32)
    apply = dn.apply_unet_flat if pallas else dn.apply_unet_packed
    fn = jax.jit(lambda a, b, c: apply(params, a, b, c))
    out = fn(z3, z3, z2)
    float(out[0, 0, 0, 0])
    n = 10
    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(z3, z3, z2)
        float(out[0, 0, 0, 0])
        ms = (time.perf_counter() - t0) * 1000 / n
    print(json.dumps({"label": f"unet_prof pallas={pallas}",
                      "wall_ms_per_iter": round(ms, 2)}))

    paths = glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        print("no trace written", file=sys.stderr)
        return
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"] if isinstance(tr, dict) else tr
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            # keep only device-lane events (XLA ops), drop host python rows
            pid_name = e.get("pid")
            tot[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    for name, d in tot.most_common(40):
        print(f"{d / 1e3 / n:9.3f} ms/iter  x{cnt[name]:4d}  {name[:90]}")


if __name__ == "__main__":
    main()
