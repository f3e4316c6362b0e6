"""Quality gate for a half-resolution UNet residual (denoiser-block cost
lever): predict the CNN's residual-on-analytic at half resolution and
bilinearly upsample it onto the full-res analytic pass.  Quarter the
pixels would put the packed forward near ~6 ms (vs 20.7), but the residual
corrects per-pixel Monte-Carlo noise — this script measures what that
costs on the held-out val set before any kernel work.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
           python benchmarks/eval_halfres.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax.extend.backend import clear_backends  # noqa: E402

clear_backends()

import jax.numpy as jnp  # noqa: E402

from raytracingdiffusioncurves_tpu.models import denoiser as dn  # noqa: E402
from raytracingdiffusioncurves_tpu.utils.image import to_uint8  # noqa: E402


def _q(x):
    return to_uint8(np.asarray(x), False).astype(np.float64) / 255.0


def down2(x):
    return 0.25 * (x[:, ::2, ::2] + x[:, 1::2, ::2]
                   + x[:, ::2, 1::2] + x[:, 1::2, 1::2])


def up2(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


def main():
    val = dict(np.load("denoise_val_r3all.npz"
                       if os.path.exists("denoise_val_r3all.npz")
                       else "weights/denoise_val_r3all.npz"))
    params = dn.load_params("weights/denoiser_r3d.msgpack")
    model = dn.net_for_params(params)

    mses = {"full": [], "half": [], "analytic": []}
    for i in range(val["noisy"].shape[0]):
        noisy = jnp.asarray(val["noisy"][i], jnp.float32)[None]
        warped = jnp.asarray(val["warped_prev"][i], jnp.float32)[None]
        aux = jnp.asarray(val["aux"][i], jnp.float32)[None]
        target = _q(val["target"][i])
        h, w = noisy.shape[1:3]

        analytic = jax.vmap(dn.analytic_baseline)(noisy, warped)
        full = model.apply(params, noisy, warped, aux, analytic)

        nh, wh, ah = down2(noisy), down2(warped), down2(aux)
        an_h = jax.vmap(dn.analytic_baseline)(nh, wh)
        pred_h = model.apply(params, nh, wh, ah, an_h)
        res_h = pred_h - an_h
        half = analytic + up2(res_h, h, w)

        mses["full"].append(float(np.mean((_q(full[0]) - target) ** 2)))
        mses["half"].append(float(np.mean((_q(half[0]) - target) ** 2)))
        mses["analytic"].append(
            float(np.mean((_q(analytic[0]) - target) ** 2)))

    out = {
        k: round(-10.0 * np.log10(np.mean(v)), 2) for k, v in mses.items()
    }
    out["note"] = ("pooled-MSE PSNR on the held-out val; 'half' = full-res "
                   "analytic + bilinear-up(half-res CNN residual)")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
