"""Pallas fused 3x3 convolution — the UNet denoiser's hot op.

XLA's TPU conv lowering leaves ~15x on the table at this network's channel
counts (measured, batch47: the packed UNet forward is 20.7 ms at 1080p
while its FLOP + HBM roofline sits near 1.5 ms; conv-as-9-matmuls through
XLA is worse still at 55.9, and f32 == bf16 — the cost is layout/overhead,
not arithmetic).  This kernel lowers a SAME 3x3 conv to nine statically
shifted MXU contractions over a flattened spatial axis, with the halo rows
DMA'd per block and bias + ReLU fused:

* the input is zero-padded spatially (host side) and flattened to
  ``(rows, Cin)`` with rows = (H+2)*(W+2): a shift by (du, dv) is then ONE
  static sublane slice at offset du*(W+2)+dv — no relayouts, no im2col;
* each grid step DMAs its (TH+2) input rows (+8-row alignment slack) from
  HBM into a VMEM scratch and accumulates the nine bf16 contractions in
  f32, exactly the reduction XLA's conv performs (bf16 operands, f32
  accumulator), so outputs match the XLA conv to the usual bf16-output
  rounding;
* column wrap-around garbage (a flat shift crosses row boundaries) lands
  only in the horizontal padding ring, which the host crops off.

Replaces jax.lax.conv_general_dilated for the stride-1 layers of the
packed UNet (models/denoiser.py apply_unet_packed); the reference's
denoiser is a black-box OptiX model invocation (optixHello.cpp:1199-1213),
so this file has no reference counterpart — it is the TPU-native cost
model for the same pipeline stage.

STATUS (round 4): bitwise-equal to the XLA conv in interpret mode and
compiles/runs on TPU, but not yet faster — three schedules measured:
(a) whole-block value-chain accumulation OOMs Mosaic's VMEM stack at
8-row blocks (the nine tap slices are kept live together); (b) one row
per dot fits but costs ~9 MXU-issue latencies per row (59.6 ms for the
packed UNet vs XLA's 20.7); (c) accumulating through a VMEM ref still
OOMs at 4-row blocks.  models/denoiser.py PALLAS_CONV therefore defaults
False.  The promising next schedule: pad W+2 to a sublane multiple so the
three ROW-tap offsets are 8-aligned ref slices (no whole-scratch load),
fold the three COLUMN taps into K via a host-side lane-concat, and let
pltpu.emit_pipeline double-buffer the row blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for picking the per-layer row-block height: the kernel's
# frame holds the DMA scratch, its loaded copy, slice temporaries, the f32
# accumulator and the output block — Mosaic OOMed the 256-channel dec0
# layer at a fixed 8-row block, so the host sizes the block per layer.
_VMEM_BUDGET = 9 << 20


def _conv_kernel(xf_ref, k_ref, b_ref, out_ref, scratch, acc_ref, sem, *,
                 th_rows: int, w2: int, cin: int, cout: int, relu: bool):
    g = pl.program_id(0)
    # input rows [g*TH*w2 .. + S8) of the 8-row-front-padded flat array
    # (S8 = the 8-aligned scratch length: DMA slice lengths and starts
    # must be sublane-tile multiples; TH*w2 is one because w2*TH % 8 == 0
    # is guaranteed by the host's TH choice): local row 8 + w2 is the
    # center of output-local row 0
    s8 = scratch.shape[0]
    dma = pltpu.make_async_copy(
        xf_ref.at[pl.ds(g * th_rows * w2, s8)],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    xs = scratch[...]  # (S8, Cin_p) bf16, lane-padded to 128
    n_out = th_rows * w2
    # The nine tap contractions accumulate THROUGH a VMEM ref: Mosaic's
    # stack allocator otherwise keeps the big slice temporaries live
    # together (the value-chain form OOMed at 8-row blocks; one-row dots
    # fit but pay ~9 MXU-issue latencies per row — 59.6 ms, batch r4) —
    # the ref round-trip bounds liveness at one slice + one dot output.
    acc_ref[...] = jnp.zeros((n_out, cout), jnp.float32)
    for du in range(3):
        for dv in range(3):
            off = 8 + du * w2 + dv - 1
            sl = jax.lax.slice(xs, (off, 0), (off + n_out, cin))
            acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
                sl,
                k_ref[(du * 3 + dv) * cin : (du * 3 + dv + 1) * cin, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    # Match XLA's conv + bias order exactly: the conv's f32 accumulator
    # is rounded to bf16 FIRST, then the bf16 bias is added in bf16 (what
    # `conv_general_dilated(x, k) + b` computes) — keeping the
    # packed-vs-plain parity at the same ~1-ulp class.
    y = acc_ref[...].astype(jnp.bfloat16) + b_ref[...]
    if relu:
        y = jnp.maximum(y, jnp.bfloat16(0.0))
    out_ref[...] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv3x3_same(x, k, b, relu: bool = True, interpret: bool | None = None):
    """SAME 3x3 conv of ``x`` (H, W, Cin) with ``k`` (3, 3, Cin, Cout) and
    bias ``b`` (Cout,), bf16 operands / f32 accumulation, fused ReLU.
    Returns (H, W, Cout) bf16."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w, cin0 = x.shape
    cout = k.shape[3]
    # HBM->VMEM DMA slices need a 128-aligned lane extent: pad Cin (the
    # padded kernel rows are zero, contributing nothing to the dots)
    cin = -(-cin0 // 128) * 128
    w2 = w + 2
    # Row-block height: DMA starts need th*w2 % 8 == 0; pick the largest
    # power-of-two-ish th whose frame estimate fits the budget (scratch +
    # loaded copy at 2 bytes * ~2.2x, f32 accumulator + bf16 out block).
    th = None
    for cand in (32, 16, 8, 4, 2, 1):
        if (cand * w2) % 8:
            continue
        th = cand  # smallest aligned so far (the loop descends)
        # frame ~ DMA scratch + its loaded copy + f32 acc ref + one slice
        # temp + one dot output
        est = (
            ((cand + 2) * w2 + 24) * cin * 2 * 2
            + cand * w2 * (2 * 4.0 * cout + 2 * cin)
        )
        if est <= _VMEM_BUDGET:
            break
    if th is None:  # no aligned candidate at all (w2 odd): 8*w2 rows align
        th = 8
    nb = -(-h // th)
    s8 = -(-((th + 2) * w2 + 16) // 8) * 8  # 8-aligned scratch length
    # zero pad: 1px spatial ring + 8 alignment rows front + tail slack so
    # the last block's DMA window stays in range
    total = nb * th * w2 + s8
    xp = jnp.pad(
        x.astype(jnp.bfloat16), ((1, 1), (1, 1), (0, cin - cin0))
    )
    xf = xp.reshape((h + 2) * w2, cin)
    xf = jnp.pad(xf, ((8, total - 8 - xf.shape[0]), (0, 0)))
    kf = jnp.pad(
        k.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, cin - cin0), (0, 0))
    ).reshape(9 * cin, cout)
    b2 = b.reshape(1, cout).astype(jnp.bfloat16)

    kernel = functools.partial(
        _conv_kernel, th_rows=th, w2=w2, cin=cin, cout=cout, relu=relu,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (th * w2, cout), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb * th * w2, cout), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((s8, cin), jnp.bfloat16),
            pltpu.VMEM((th * w2, cout), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf, kf, b2)
    # out row o = (r-1)*w2 + c for input row r: crop the pad ring
    return out[: h * w2].reshape(h, w2, cout)[:, 1 : w + 1, :]
