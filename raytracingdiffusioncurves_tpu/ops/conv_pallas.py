"""Pallas fused 3x3 convolution — the UNet denoiser's hot op.

XLA's TPU conv lowering leaves ~15x on the table at this network's channel
counts (measured, batch47: the packed UNet forward is 20.7 ms at 1080p
while its FLOP + HBM roofline sits near 1.5 ms; conv-as-9-matmuls through
XLA is worse still at 55.9, and f32 == bf16 — the cost is layout/overhead,
not arithmetic).

Round-5 schedule (the one batch47's STATUS named): a SAME 3x3 conv is
lowered to THREE statically shifted MXU contractions over a flattened
spatial axis, with the three COLUMN taps folded into the contraction dim
host-side and bias + ReLU fused:

* the input is zero-padded spatially and its padded width is rounded up to
  a sublane multiple (w2p % 8 == 0), so the three ROW-tap offsets
  (du * w2p) are 8-aligned ref slices — no vector realignment copies, the
  failure mode that made round 4's nine-tap schedules OOM Mosaic's stack
  (unaligned slices each materialized a realigned copy of the block);
* the three column taps become a host-side lane-concat: X3[p] =
  (x[p-1], x[p], x[p+1]) over channels, built by XLA from the padded 2-D
  image (so no row wrap-around garbage exists at all), and the kernel
  contracts (n_out, 3*Cin) x (3*Cin, Cout) once per row tap — nine taps
  in three MXU issues;
* each grid step DMAs its (TH+2) input rows from HBM into a VMEM scratch;
  with ``_NBUF = 2`` the next block's DMA is started before this block's
  dots (double-buffered through a (2, rows, lanes) scratch + a semaphore
  pair), hiding the HBM latency the single-buffered form serializes;
* the f32 tap accumulator is rounded to bf16 FIRST and the bf16 bias added
  after, exactly what ``conv_general_dilated(x, k) + b`` computes.

Replaces jax.lax.conv_general_dilated for the stride-1 layers of the
packed UNet (models/denoiser.py apply_unet_packed); the reference's
denoiser is a black-box OptiX model invocation (optixHello.cpp:1199-1213),
so this file has no reference counterpart — it is the TPU-native cost
model for the same pipeline stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for picking the per-layer row-block height: the kernel's
# frame holds the DMA scratch slots, one tap-slice temporary, the f32
# accumulator/dot output and the output block (v5e VMEM is ~16 MB/core and
# Mosaic's stack allocator needs slack).
_VMEM_BUDGET = 9 << 20

# DMA buffer slots: 2 = double-buffered (prefetch block g+1 during block
# g's dots), 1 = serialize DMA and compute (probe lever).
_NBUF = 2


def _conv_kernel(xf_ref, k_ref, b_ref, out_ref, scratch, sems, *,
                 th_rows: int, w2p: int, c3p: int, cout: int, relu: bool,
                 nbuf: int):
    g = pl.program_id(0)
    nb = pl.num_programs(0)
    n_out = th_rows * w2p
    s8 = scratch.shape[1]

    def copy_for(gi, slot):
        # front pad is 8 rows; gi * n_out and s8 are sublane multiples
        # because w2p % 8 == 0, so every DMA start/length is tile-aligned.
        return pltpu.make_async_copy(
            xf_ref.at[pl.ds(8 + gi * n_out, s8)],
            scratch.at[slot],
            sems.at[slot],
        )

    if nbuf == 1:
        copy_for(g, 0).start()
        copy_for(g, 0).wait()
        slot = 0
    else:
        @pl.when(g == 0)
        def _():
            copy_for(0, 0).start()

        @pl.when(g + 1 < nb)
        def _():
            copy_for(g + 1, (g + 1) % 2).start()

        slot = g % 2
        copy_for(g, slot).wait()

    acc = None
    for du in range(3):
        # 8-aligned ref slice (du * w2p % 8 == 0): no realign copy.
        sl = scratch[slot, pl.ds(du * w2p, n_out), :]
        d = jax.lax.dot_general(
            sl,
            k_ref[du * c3p : (du + 1) * c3p, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = d if acc is None else acc + d
    # Match XLA's conv + bias order exactly: the conv's f32 accumulator is
    # rounded to bf16 FIRST, then the bf16 bias is added in bf16 (what
    # `conv_general_dilated(x, k) + b` computes).
    y = acc.astype(jnp.bfloat16) + b_ref[...]
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
    h, w, cin = x.shape
    cout = k.shape[3]
    w2p = -(-(w + 2) // 8) * 8  # padded width, sublane-aligned
    # Lane extent of the column-folded input: 3*Cin rounded up to the
    # 128-lane DMA alignment (pad lanes are zero, contributing nothing).
    c3p = -(-(3 * cin) // 128) * 128
    nbuf = _NBUF
    # Row-block height: largest that fits the VMEM budget (scratch slots +
    # one tap slice + f32 dot out/accumulator + bf16 out block).
    co_p = -(-cout // 128) * 128
    th = 1
    for cand in (32, 16, 8, 4, 2, 1):
        est = (
            nbuf * (cand + 2) * w2p * c3p * 2
            + cand * w2p * (c3p * 2 + 2 * co_p * 4 + cout * 2)
        )
        if est <= _VMEM_BUDGET:
            th = cand
            break
    nb = -(-h // th)
    n_out = th * w2p

    bf = jnp.bfloat16
    # Padded 2-D image: 1px top/bottom ring, left ring + right pad to w2p.
    xp = jnp.pad(x.astype(bf), ((1, 1), (1, w2p - w - 1), (0, 0)))
    # Column-tap fold: X3[r, c] = (xp[r, c-1], xp[r, c], xp[r, c+1]) along
    # channels — built from the 2-D layout, so column taps never cross row
    # boundaries (no wrap-around garbage anywhere).
    xq = jnp.pad(xp, ((0, 0), (1, 1), (0, 0)))
    x3 = jnp.concatenate(
        [xq[:, 0:w2p], xq[:, 1 : w2p + 1], xq[:, 2 : w2p + 2]], axis=-1
    )
    x3 = x3.reshape((h + 2) * w2p, 3 * cin)
    # 8 front pad rows + tail so the last block's DMA window ends exactly
    # at the total: total = 8 + (nb*th + 2) * w2p.
    total = 8 + (nb * th + 2) * w2p
    x3 = jnp.pad(x3, ((8, total - 8 - x3.shape[0]), (0, c3p - 3 * cin)))
    # Kernel: row-tap-major, column taps folded into the contraction dim
    # in the same (dv, cin) order as X3's lane-concat.
    k3 = jnp.pad(
        k.astype(bf).reshape(3, 3 * cin, cout),
        ((0, 0), (0, c3p - 3 * cin), (0, 0)),
    ).reshape(3 * c3p, cout)
    b2 = b.reshape(1, cout).astype(bf)

    kernel = functools.partial(
        _conv_kernel, th_rows=th, w2p=w2p, c3p=c3p, cout=cout, relu=relu,
        nbuf=nbuf,
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
            (n_out, cout), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb * n_out, cout), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((nbuf, (th + 2) * w2p, c3p), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=interpret,
    )(x3, k3, b2)
    # out row q = (r-1)*w2p + c for image row r: crop the pad ring.
    return out[: h * w2p].reshape(h, w2p, cout)[:, 1 : w + 1, :]
