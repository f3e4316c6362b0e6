"""Single-layer microbench of the Pallas fused conv vs the XLA conv.

Round-5 attribution (kept results, benchmarks/results/conv_probe*.log):
the packed-UNet profile (unet_profile.py) showed the XLA forward dominated
by relayout copies; conv_pallas v2 (host-side X3 lane-concat) measured
7.1 ms/layer of which the XLA X3 build alone was 5.8 — the v3 "z-shift"
schedule folds column taps into output lanes in-kernel at 1x input
traffic.  This times ONE conv layer (the packed UNet's 96->96 at 544x960)
across row-block heights and buffering.

Usage: python benchmarks/conv_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from raytracingdiffusioncurves_tpu.utils import compile_cache

compile_cache.enable()

from raytracingdiffusioncurves_tpu.ops import conv_pallas  # noqa: E402


def bench(fn, args, label, n=30):
    out = fn(*args)
    out.block_until_ready()
    float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.asarray(out).ravel()[0])
    ms = (time.perf_counter() - t0) * 1000 / n
    print(json.dumps({"label": label, "ms": round(ms, 3)}), flush=True)
    return ms


def main():
    h, w, ci, co = 544, 960, 96, 96
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (h, w, ci), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, ci, co)) * 0.1
    b = jax.random.normal(jax.random.fold_in(key, 2), (co,))

    bf = jnp.bfloat16

    @jax.jit
    def xla_conv(x, k, b):
        y = jax.lax.conv_general_dilated(
            x.astype(bf)[None], k.astype(bf), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0] + b.astype(bf)
        return jnp.maximum(y, bf(0))

    bench(xla_conv, (x, k, b), "xla_conv_96x96_544x960")

    for nbuf in (2, 1):
        for th in (None, 2, 4, 8):
            conv_pallas._NBUF = nbuf
            conv_pallas._TH_OVERRIDE = th
            try:
                bench(
                    jax.jit(
                        lambda x, k, b: conv_pallas.conv3x3_same(x, k, b)
                    ),
                    (x, k, b),
                    f"pallas_nb{nbuf}_th{th}",
                )
            except Exception as e:  # Mosaic OOM etc: report, keep going
                print(json.dumps({
                    "label": f"pallas_nb{nbuf}_th{th}",
                    "error": str(e)[:160],
                }), flush=True)


if __name__ == "__main__":
    main()
