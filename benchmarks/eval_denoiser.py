"""Held-out denoiser evaluation: trained CNN vs the analytic temporal pass.

Both denoisers see the same inputs (noisy render + flow-warped previous
output) on the VALIDATION scenes only (weight_demo, zephyr — never trained
on, models/train_denoiser.py VAL_SCENES), mirroring the reference's use of
a pretrained model it never trained on its own scenes
(/root/reference/optixHello/optixHello.cpp:1057).

Usage: python benchmarks/eval_denoiser.py [--val denoise_val.npz]
           [--weights weights/denoiser.msgpack]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# Tiny CNN eval: run on CPU so it never contends with a TPU render batch
# (the env-var platform switch is ignored here — CLAUDE.md).
jax.config.update("jax_platforms", "cpu")
from jax.extend.backend import clear_backends  # noqa: E402

clear_backends()

import jax.numpy as jnp  # noqa: E402

from raytracingdiffusioncurves_tpu.models import denoiser as dn  # noqa: E402
from raytracingdiffusioncurves_tpu.ops import denoise as denoise_ops  # noqa: E402
from raytracingdiffusioncurves_tpu.ops import flow as flow_ops  # noqa: E402
from raytracingdiffusioncurves_tpu.utils.image import psnr, to_uint8  # noqa: E402


def _q(x):
    return to_uint8(np.asarray(x), False).astype(np.float64) / 255.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--val", default="denoise_val.npz")
    p.add_argument("--weights", default="weights/denoiser.msgpack")
    p.add_argument("--bilateral-bf16", action=argparse.BooleanOptionalAction,
                   default=denoise_ops.BILATERAL_BF16,
                   help="eval with the bf16 bilateral fast path "
                        "(--no-bilateral-bf16 evaluates the f32 baseline "
                        "side of the A/B; assigned unconditionally, before "
                        "any jit trace)")
    args = p.parse_args()
    denoise_ops.BILATERAL_BF16 = args.bilateral_bf16

    val = dict(np.load(args.val))
    params = dn.load_params(args.weights)
    model = dn.net_for_params(params)

    rows = {"noisy": [], "analytic": [], "cnn": []}
    for i in range(val["noisy"].shape[0]):
        noisy = jnp.asarray(val["noisy"][i], jnp.float32)
        warped = jnp.asarray(val["warped_prev"][i], jnp.float32)
        aux = jnp.asarray(val["aux"][i], jnp.float32)
        target = _q(val["target"][i])

        # analytic pass: inputs already warped, so pass zero flow; frame=1
        # enables the temporal blend (frame 0 would ignore the history).
        noisy4 = jnp.concatenate([noisy, jnp.ones(noisy.shape[:2] + (1,))], -1)
        warped4 = jnp.concatenate([warped, jnp.ones(noisy.shape[:2] + (1,))], -1)
        analytic = denoise_ops.temporal_denoise(
            noisy4, warped4, flow_ops.zero_flow(*noisy.shape[:2]), jnp.int32(1)
        )[..., :3]
        cnn = model.apply(params, noisy[None], warped[None], aux[None])[0]

        # pooled MSE, not per-example PSNR means: flat val patches quantize
        # identical to the target (MSE 0 -> PSNR inf) and poison the mean
        rows["noisy"].append(float(np.mean((_q(noisy) - target) ** 2)))
        rows["analytic"].append(float(np.mean((_q(analytic) - target) ** 2)))
        rows["cnn"].append(float(np.mean((np.asarray(_q(cnn)) - target) ** 2)))

    out = {
        k: round(float(-10.0 * np.log10(max(np.mean(v), 1e-12))), 2)
        for k, v in rows.items()
    }
    out["cnn_minus_analytic"] = round(out["cnn"] - out["analytic"], 2)
    out["n_examples"] = len(rows["noisy"])
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
