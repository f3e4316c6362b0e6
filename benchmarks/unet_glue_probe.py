"""Probe the flat-chain UNet's remaining XLA glue (round 5, tail part 2).

After the flat chain (27.8 ms forward), the profile still carries ~2.2 ms
to_flat(e0a), ~1.5 ms up2f entry, ~2.1 ms depth-to-space exit and the
2.9 ms 4x4 entry conv (unet_profile.py).  Each variant here is a local
copy of apply_unet_flat with ONE glue change, timed on the TPU:

  v0      — baseline (models/denoiser.apply_unet_flat)
  vA      — 4x4 entry conv emits co_p=128 channels (zero-padded kernel),
            so to_flat(e0a) skips the 96->128 lane repack
  vB      — vA + enc2b emits 128 channels, so the up2f entry skips its
            lane repack too
  vC      — vB + depth-to-space exit via a one-hot conv_transpose
  vE      — vC + the input concat folded away: four separate 4x4 convs
            (conv linearity), no 96 MB concat materialization

Usage: python benchmarks/unet_glue_probe.py
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

import numpy as np  # noqa: E402

from raytracingdiffusioncurves_tpu.models import denoiser as dn  # noqa: E402
from raytracingdiffusioncurves_tpu.ops import conv_pallas as cp  # noqa: E402

bf = jnp.bfloat16
DN = ("NHWC", "HWIO", "NHWC")


def make_variant(params, pad_entry=False, pad_e2=False, dts_conv=False,
                 split_concat=False):
    p = params["params"]

    def kb(name):
        lay = p[name]
        return lay["kernel"], lay["bias"].astype(bf)

    def apply(noisy, warped_prev, aux):
        analytic = jax.vmap(dn.analytic_baseline)(noisy, warped_prev)
        parts = [noisy, warped_prev, analytic, aux]
        x = jnp.concatenate(parts, -1).astype(bf)
        cin0 = x.shape[-1]
        h2, w2 = x.shape[1] // 2, x.shape[2] // 2
        base = p["enc0a"]["bias"].shape[0]
        co0 = 128 if pad_entry else 4 * base

        k0a, b0a = kb("enc0a")
        k4 = jnp.zeros((4, 4, cin0, co0), bf)
        for ph, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            k4 = k4.at[
                dy : dy + 3, dx : dx + 3, :, ph * base : (ph + 1) * base
            ].set(k0a.astype(bf))
        b4 = jnp.pad(jnp.tile(b0a, 4), (0, co0 - 4 * base))
        if split_concat:
            offs = [0, 3, 6, 9, 11]
            y = None
            for i, part in enumerate(parts):
                d = jax.lax.conv_general_dilated(
                    part.astype(bf), k4[:, :, offs[i] : offs[i + 1]],
                    (2, 2), [(1, 2), (1, 2)], dimension_numbers=DN,
                )
                y = d if y is None else y + d
            e0a_img = y + b4
        else:
            e0a_img = jax.lax.conv_general_dilated(
                x, k4, (2, 2), [(1, 2), (1, 2)], dimension_numbers=DN
            ) + b4
        import flax.linen as nn

        e0a = cp.to_flat(nn.relu(e0a_img)[0])

        k0b, b0b = kb("enc0b")
        e0 = cp.conv3x3_flat(
            [e0a], [dn._pack_kernel_s1(k0b.astype(bf), [base])],
            jnp.tile(b0b, 4), h2, w2,
        )
        k1a, b1a = kb("enc1a")
        e1 = cp.conv3x3_flat(
            [e0], [dn._pack_kernel_s2(k1a.astype(bf), base)], b1a, h2, w2,
        )
        k1b, b1b = kb("enc1b")
        e1b = cp.conv3x3_flat([e1], [k1b.astype(bf)], b1b, h2, w2)

        def xconv(v, name, stride=1, act=True, co_pad=0):
            k, b = kb(name)
            if co_pad:
                k = jnp.pad(k, ((0, 0),) * 3 + ((0, co_pad),))
                b = jnp.pad(b, (0, co_pad))
            y = jax.lax.conv_general_dilated(
                v, k.astype(bf), (stride, stride), "SAME",
                dimension_numbers=DN,
            ) + b
            return nn.relu(y) if act else y

        e1_img = cp.from_flat(e1b, h2, w2, 2 * base)[None]
        e2pad = 128 - 4 * base if pad_e2 else 0
        e2 = xconv(xconv(e1_img, "enc2a", stride=2), "enc2b", co_pad=e2pad)
        up2 = jax.image.resize(e2, (1, h2, w2, e2.shape[-1]), "nearest")
        up2f = cp.to_flat(up2[0])
        kd1, bd1 = kb("dec1")
        kd1a = kd1[:, :, : 4 * base].astype(bf)
        if e2pad:
            kd1a = jnp.pad(kd1a, ((0, 0), (0, 0), (0, e2pad), (0, 0)))
        d1 = cp.conv3x3_flat(
            [up2f, e1b], [kd1a, kd1[:, :, 4 * base :].astype(bf)],
            bd1, h2, w2,
        )
        kd0, bd0 = kb("dec0")
        kd0p = dn._pack_kernel_s1(kd0, [2 * base, base])
        cg = 2 * base
        kd0_d1 = sum(
            kd0p[:, :, ph * cg : (ph + 1) * cg, :] for ph in range(4)
        ).astype(bf)
        kd0_e0 = kd0p[:, :, 4 * cg :, :].astype(bf)
        d0 = cp.conv3x3_flat(
            [d1, e0], [kd0_d1, kd0_e0], jnp.tile(bd0, 4), h2, w2,
        )
        ko, bo = kb("out")
        op = cp.conv3x3_flat(
            [d0], [dn._pack_kernel_s1(ko.astype(bf), [base])],
            jnp.tile(bo, 4), h2, w2, relu=False,
        )
        outp = cp.from_flat(op, h2, w2, 12)[None]
        if dts_conv:
            # conv_transpose(transpose_kernel=False) applies the kernel
            # spatially FLIPPED relative to the phase layout (verified on
            # CPU): phase (dy, dx) lands at kernel index (1-dy, 1-dx).
            eye = np.zeros((2, 2, 12, 3), np.float32)
            for dy in range(2):
                for dx in range(2):
                    for c in range(3):
                        eye[1 - dy, 1 - dx, (dy * 2 + dx) * 3 + c, c] = 1.0
            full = jax.lax.conv_transpose(
                outp.astype(jnp.float32), jnp.asarray(eye), (2, 2),
                "VALID", dimension_numbers=DN,
            )
            return analytic + full
        return analytic + dn._depth_to_space(outp).astype(jnp.float32)

    return apply


def bench(fn, args, label, n=20):
    out = fn(*args)
    float(out[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out[0, 0, 0, 0])
    ms = (time.perf_counter() - t0) * 1000 / n
    print(json.dumps({"label": label, "ms": round(ms, 2)}), flush=True)


def main():
    params = dn.load_params("weights/denoiser_r3d.msgpack")
    h, w = 1088, 1920
    z3 = jnp.zeros((1, h, w, 3), jnp.float32)
    z2 = jnp.zeros((1, h, w, 2), jnp.float32)
    key = jax.random.PRNGKey(0)
    n3 = jax.random.uniform(key, (1, h, w, 3))

    ref = jax.jit(lambda a, b, c: dn.apply_unet_flat(params, a, b, c))
    bench(ref, (z3, z3, z2), "v0_baseline")
    refv = np.asarray(ref(n3, n3, z2))

    variants = [
        ("vA_pad_entry", dict(pad_entry=True)),
        ("vB_pad_e2", dict(pad_entry=True, pad_e2=True)),
        ("vC_dts_conv", dict(pad_entry=True, pad_e2=True, dts_conv=True)),
        ("vE_split_concat", dict(pad_entry=True, pad_e2=True, dts_conv=True,
                                 split_concat=True)),
    ]
    for label, kw in variants:
        fn = jax.jit(make_variant(params, **kw))
        try:
            bench(fn, (z3, z3, z2), label)
            v = np.asarray(fn(n3, n3, z2))
            err = float(np.abs(v - refv).max())
            print(json.dumps({"label": label + "_maxerr", "err": err}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"label": label, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
