"""Pallas fused 3x3 convolution — the UNet denoiser's hot op.

XLA's TPU conv lowering leaves ~6x on the table at this network's channel
counts (measured, round 5: one 96->96 conv at the packed resolution costs
3.37 ms through XLA against a ~0.3 ms HBM roofline, and the whole packed
forward profiles as ~70% relayout copies/reshapes — benchmarks/
unet_profile.py, conv_probe.py).

Round-5 schedule ("z-shift"): a SAME 3x3 conv is lowered to three
statically shifted MXU contractions over a flattened spatial axis, with
the three COLUMN taps folded into the OUTPUT lane axis and resolved by
shifting dot outputs, never inputs:

* the input is zero-padded spatially and its padded width is rounded up
  to a sublane multiple (w2p % 8 == 0), so the three ROW-tap offsets
  (du * w2p) are 8-aligned ref slices — no input realign copies (the
  failure mode of round 4's nine-tap schedules), and no host-side X3
  lane-concat either (round 5's first cut: the XLA concat alone measured
  5.8 of the 7.1 ms layer);
* the kernel K[du] is laid out (Cin, 3 * co_p) with column tap dv in
  lane block dv (co_p = Cout padded to 128): one dot per row tap yields
  z[p, dv, co] = sum_cin x[p + du*w2p] k[du, dv], and the output is
  y[p] = sum_dv z[p + dv - 1, dv] — two sublane-realigned copies of the
  (n_out, Cout) f32 dot output per block (VPU work on the small side of
  the conv) replace the 6 input realigns / 3x input traffic of the
  alternatives;
* each grid step DMAs its (TH+2) input rows + 16 alignment slack rows
  ONCE at 1x traffic; ``_NBUF = 2`` double-buffers the DMA through a
  (2, rows, lanes) scratch + semaphore pair;
* the f32 tap accumulator is rounded to bf16 FIRST and the bf16 bias
  added after, exactly what ``conv_general_dilated(x, k) + b`` computes.

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
# frame holds the DMA scratch slots, the (n_out + 16, 3 * co_p) f32 dot
# output, the f32 y accumulator, one realign temporary and the output
# block (v5e VMEM is ~16 MB/core and Mosaic's stack allocator needs
# slack).
_VMEM_BUDGET = 12 << 20

# DMA buffer slots: 2 = double-buffered (prefetch block g+1 during block
# g's dots), 1 = serialize DMA and compute (probe lever).
_NBUF = 2
# Row-block height override (probes): None = pick by VMEM budget.
_TH_OVERRIDE = None


def _conv_kernel(xf_ref, k_ref, b_ref, out_ref, scratch, sems, *,
                 th_rows: int, w2p: int, cinp: int, cout: int, co_p: int,
                 relu: bool, nbuf: int):
    g = pl.program_id(0)
    nb = pl.num_programs(0)
    n_out = th_rows * w2p
    s8 = scratch.shape[1]

    def copy_for(gi, slot):
        # window start gi * n_out covers local tap rows [0, s8); the
        # host's 8 front-pad rows make local row 8 + w2p the center of
        # output-local row 0.  All starts/lengths are sublane multiples
        # because w2p % 8 == 0.
        return pltpu.make_async_copy(
            xf_ref.at[pl.ds(gi * n_out, s8)],
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

    # z[p', dv*co_p + co] = sum_du sum_cin x[p' + du*w2p] k[du, dv] over
    # the 8-aligned widened range p' in [-8, n_out+8) (local row p' + 8):
    # three aligned slices, three dots, one (n_out + 16, 3*co_p) f32 acc.
    z = None
    for du in range(3):
        sl = scratch[slot, pl.ds(du * w2p, n_out + 16), :]
        d = jax.lax.dot_general(
            sl,
            k_ref[du * cinp : (du + 1) * cinp, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        z = d if z is None else z + d
    # y[p] = sum_dv z[p + dv - 1, dv block]: lane starts dv*co_p are
    # 128-aligned; sublane starts 7/8/9 realign only the (n_out, cout)
    # f32 output-side slices.
    acc = None
    for dv in range(3):
        part = jax.lax.slice(
            z, (8 + dv - 1, dv * co_p), (8 + dv - 1 + n_out, dv * co_p + cout)
        )
        acc = part if acc is None else acc + part
    # Match XLA's conv + bias order exactly: the conv's f32 accumulator is
    # rounded to bf16 FIRST, then the bf16 bias is added in bf16 (what
    # `conv_general_dilated(x, k) + b` computes).
    y = acc.astype(jnp.bfloat16) + b_ref[...]
    if relu:
        y = jnp.maximum(y, jnp.bfloat16(0.0))
    out_ref[...] = y.astype(out_ref.dtype)


def _pick_th(w2p: int, cinp: int, co_p: int, cout: int, nbuf: int) -> int:
    th = 1
    for cand in (32, 16, 8, 4, 2, 1):
        n_out = cand * w2p
        est = (
            nbuf * ((cand + 2) * w2p + 16) * cinp * 2  # DMA scratch slots
            + (n_out + 16) * 3 * co_p * 4              # z dot accumulator
            + 2 * n_out * cout * 4                     # y acc + realign temp
            + n_out * cout * 2                         # out block
        )
        if est <= _VMEM_BUDGET:
            th = cand
            break
    if _TH_OVERRIDE is not None:
        th = _TH_OVERRIDE
    return th


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
    cinp = -(-cin // 128) * 128  # DMA lane alignment (pad lanes are zero)
    co_p = -(-cout // 128) * 128
    nbuf = _NBUF
    th = _pick_th(w2p, cinp, co_p, cout, nbuf)
    nb = -(-h // th)
    n_out = th * w2p

    bf = jnp.bfloat16
    # Padded 2-D image: 1px top/bottom ring, left ring + right pad to w2p,
    # lanes to cinp; flattened with 8 front pad rows + tail slack so the
    # last block's widened DMA window ends in range:
    # total = 8 + (nb*th + 2) * w2p + 16.
    xp = jnp.pad(
        x.astype(bf), ((1, 1), (1, w2p - w - 1), (0, cinp - cin))
    )
    xf = xp.reshape((h + 2) * w2p, cinp)
    total = 8 + (nb * th + 2) * w2p + 16
    xf = jnp.pad(xf, ((8, total - 8 - xf.shape[0]), (0, 0)))
    # Kernel layout: row-tap-major (3 * cinp rows); column tap dv sits in
    # output lane block dv of 3 * co_p (zeros outside [0, cout)).
    k3 = jnp.zeros((3, cinp, 3 * co_p), bf)
    kb = k.astype(bf)
    for dv in range(3):
        k3 = k3.at[:, :cin, dv * co_p : dv * co_p + cout].set(kb[:, dv])
    k3 = k3.reshape(3 * cinp, 3 * co_p)
    b2 = b.reshape(1, cout).astype(bf)

    kernel = functools.partial(
        _conv_kernel, th_rows=th, w2p=w2p, cinp=cinp, cout=cout, co_p=co_p,
        relu=relu, nbuf=nbuf,
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
            pltpu.VMEM((nbuf, (th + 2) * w2p + 16, cinp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=interpret,
    )(xf, k3, b2)
    # out row q = (r-1)*w2p + c for image row r: crop the pad ring.
    return out[: h * w2p].reshape(h, w2p, cout)[:, 1 : w + 1, :]


# ---------------------------------------------------------------------------
# Flat-chain convolution (round 5).
#
# conv3x3_same above still pays ~2.5 ms/layer of XLA relayout (pad + crop of
# a ~100 MB activation) around a ~1.3 ms kernel — any per-layer host
# relayout at 1080p costs more than the conv itself (conv_probe.py).  The
# flat chain removes them: activations STAY in one shared flat layout
# across every stride-1 layer of the packed UNet, each kernel writing ring-
# zeroed flat output (via a precomputed mask row) that the next kernel DMAs
# directly.  Group inputs (skip concats) fold into extra contraction dots,
# so dec1/dec0's channel concats vanish too.
#
# Layout (one per (h, w)): flat index a = S + R * w2p + c, where (R, c)
# index the ring-padded image (R in [0, h+2), c in [0, w2p)), S = w2p + 8
# head-guard rows, and total rows = Nb * n_out (n_out = th_ref * w2p)
# rounded up — everything outside the image region is zero (mask row).
# ---------------------------------------------------------------------------

# Reference row-block height fixing the layout's block count; per-layer th
# may be any power-of-two divisor of it (same total).
_TH_REF = 8


def _flat_geom(h: int, w: int):
    w2p = -(-(w + 2) // 8) * 8
    s_guard = w2p + 8
    th_ref = _TH_REF
    while th_ref > 1:  # the edge-block DMA scheme needs >= 3 blocks
        nb_ref = -(-(s_guard + (h + 2) * w2p + 1) // (th_ref * w2p))
        if nb_ref >= 3:
            break
        th_ref //= 2
    nb_ref = max(3, -(-(s_guard + (h + 2) * w2p + 1) // (th_ref * w2p)))
    total = nb_ref * th_ref * w2p
    return w2p, s_guard, total, th_ref


def flat_mask(h: int, w: int):
    """(total, 1) f32 0/1 row: 1 exactly on image positions (R in [1, h],
    c in [1, w]).  f32, not bf16 — Mosaic rejects bf16 compares."""
    import numpy as np

    w2p, s, total, _ = _flat_geom(h, w)
    a = np.arange(total)
    rel = a - s
    r = rel // w2p
    c = rel - r * w2p
    m = (r >= 1) & (r <= h) & (c >= 1) & (c <= w)
    return jnp.asarray(m.astype(np.float32)[:, None])


def to_flat(x):
    """(h, w, cin) -> (total, cinp) bf16 flat layout (ring + guard zeros)."""
    h, w, cin = x.shape
    w2p, s, total, _ = _flat_geom(h, w)
    cinp = -(-cin // 128) * 128
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((1, 1), (1, w2p - w - 1), (0, cinp - cin)))
    xf = xp.reshape((h + 2) * w2p, cinp)
    return jnp.pad(xf, ((s, total - s - xf.shape[0]), (0, 0)))


def from_flat(y, h: int, w: int, cout: int):
    """(total, co_p) flat -> (h, w, cout)."""
    w2p, s, _, _ = _flat_geom(h, w)
    core = y[s + w2p : s + (h + 1) * w2p]
    return core.reshape(h, w2p, y.shape[1])[:, 1 : w + 1, :cout]


def _flat_kernel(*refs, th_rows: int, w2p: int, s_guard: int,
                 cinps: tuple, cout: int, co_p: int, relu: bool, nbuf: int):
    ngrp = len(cinps)
    xfs = refs[:ngrp]
    k_ref, b_ref, mask_ref, out_ref = refs[ngrp : ngrp + 4]
    scrs = refs[ngrp + 4 : ngrp + 4 + ngrp]
    sems = refs[ngrp + 4 + ngrp :]
    g = pl.program_id(0)
    nb = pl.num_programs(0)
    n_out = th_rows * w2p
    s8 = n_out + 2 * w2p + 16
    total = xfs[0].shape[0]
    # nominal window start A* = g*n_out - s_guard: scratch row i holds
    # x[A* + i], so tap slices sit at STATIC offsets du*w2p for every
    # block.  Head (g = 0) DMAs the existing suffix into scratch offset
    # s_guard; tail (g = nb-1) the prefix — the uncovered scratch rows
    # feed only mask-zeroed outputs.
    head_len = s8 - s_guard
    tail_a = (nb - 1) * n_out - s_guard
    tail_len = total - tail_a

    def run_dma(gi, slot, op):
        for i in range(ngrp):
            src, dst, sem = xfs[i], scrs[i], sems[i]

            @pl.when(gi == 0)
            def _(src=src, dst=dst, sem=sem):
                getattr(pltpu.make_async_copy(
                    src.at[pl.ds(0, head_len)],
                    dst.at[slot, pl.ds(s_guard, head_len)],
                    sem.at[slot],
                ), op)()

            @pl.when((gi > 0) & (gi < nb - 1))
            def _(src=src, dst=dst, sem=sem):
                getattr(pltpu.make_async_copy(
                    src.at[pl.ds(
                        pl.multiple_of(gi * n_out - s_guard, 8), s8
                    )],
                    dst.at[slot],
                    sem.at[slot],
                ), op)()

            @pl.when(gi == nb - 1)
            def _(src=src, dst=dst, sem=sem):
                getattr(pltpu.make_async_copy(
                    src.at[pl.ds(tail_a, tail_len)],
                    dst.at[slot, pl.ds(0, tail_len)],
                    sem.at[slot],
                ), op)()

    if nbuf == 1:
        run_dma(g, 0, "start")
        run_dma(g, 0, "wait")
        slot = 0
    else:
        @pl.when(g == 0)
        def _():
            run_dma(g, 0, "start")

        @pl.when(g + 1 < nb)
        def _():
            run_dma(g + 1, (g + 1) % 2, "start")

        slot = g % 2
        run_dma(g, slot, "wait")

    z = None
    koff = 0
    for i in range(ngrp):
        cinp = cinps[i]
        for du in range(3):
            sl = scrs[i][slot, pl.ds(du * w2p, n_out + 16), :]
            d = jax.lax.dot_general(
                sl,
                k_ref[koff + du * cinp : koff + (du + 1) * cinp, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            z = d if z is None else z + d
        koff += 3 * cinp
    acc = None
    for dv in range(3):
        part = jax.lax.slice(
            z, (7 + dv, dv * co_p), (7 + dv + n_out, (dv + 1) * co_p)
        )
        acc = part if acc is None else acc + part
    y = acc.astype(jnp.bfloat16) + b_ref[...]
    if relu:
        y = jnp.maximum(y, jnp.bfloat16(0.0))
    # select, not multiply: ring/guard rows may hold garbage from the
    # uncovered scratch region (NaN * 0 = NaN would leak into the next
    # layer's ring taps).  The f32 compare is the Mosaic-supported form.
    out_ref[...] = jnp.where(
        mask_ref[...] > jnp.float32(0.0), y, jnp.bfloat16(0.0)
    )


def conv3x3_flat(xs, ks, b, h: int, w: int, relu: bool = True,
                 interpret: bool | None = None):
    """SAME 3x3 conv in the shared flat layout: ``xs`` are flat
    (total, cinp_i) bf16 group inputs (a channel concat folded into
    separate contraction dots), ``ks`` the matching (3, 3, cin_i, Cout)
    kernels, ``b`` (Cout,).  Returns flat (total, co_p) bf16 with ring and
    guard rows zeroed — directly consumable by the next conv3x3_flat."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    w2p, s_guard, total, th_ref = _flat_geom(h, w)
    cout = ks[0].shape[3]
    co_p = -(-cout // 128) * 128
    cinps = tuple(x.shape[1] for x in xs)
    nbuf = _NBUF
    # Row-block height: a power-of-two divisor of the layout's reference
    # height (so every layer shares the layout's total) fitting the VMEM
    # budget.
    th = 1
    cand = th_ref
    while cand >= 1:
        n_out = cand * w2p
        est = (
            nbuf * (n_out + 2 * w2p + 16) * sum(cinps) * 2
            + (n_out + 16) * 3 * co_p * 4
            + 2 * n_out * co_p * 4
            + n_out * co_p * 2
        )
        if est <= _VMEM_BUDGET or cand == 1:
            th = cand
            break
        cand //= 2
    if _TH_OVERRIDE is not None:
        th = _TH_OVERRIDE
    n_out = th * w2p
    nb = total // n_out
    assert nb >= 3, (nb, h, w, th)

    bf = jnp.bfloat16
    krows = sum(3 * c for c in cinps)
    k3 = jnp.zeros((krows, 3 * co_p), bf)
    koff = 0
    for x, k in zip(xs, ks):
        cinp = x.shape[1]
        cin = k.shape[2]
        kb = k.astype(bf)
        for du in range(3):
            for dv in range(3):
                k3 = k3.at[
                    koff + du * cinp : koff + du * cinp + cin,
                    dv * co_p : dv * co_p + cout,
                ].set(kb[du, dv])
        koff += 3 * cinp
    b2 = jnp.pad(b.reshape(1, cout).astype(bf), ((0, 0), (0, co_p - cout)))
    mask = flat_mask(h, w)

    kernel = functools.partial(
        _flat_kernel, th_rows=th, w2p=w2p, s_guard=s_guard, cinps=cinps,
        cout=cout, co_p=co_p, relu=relu, nbuf=nbuf,
    )
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.ANY) for _ in xs]
            + [
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((n_out, 1), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ]
        ),
        out_specs=pl.BlockSpec(
            (n_out, co_p), lambda g: (g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((total, co_p), jnp.bfloat16),
        scratch_shapes=(
            [
                pltpu.VMEM((nbuf, n_out + 2 * w2p + 16, c), jnp.bfloat16)
                for c in cinps
            ]
            + [pltpu.SemaphoreType.DMA((nbuf,)) for _ in cinps]
        ),
        interpret=interpret,
    )(*xs, k3, b2, mask)
