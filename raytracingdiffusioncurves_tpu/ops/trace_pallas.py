"""The Pallas trace megakernel — the production TPU path.

One fused kernel replaces the reference's entire device pipeline
(raygen + BVH traversal + closest-hit + miss + portal recursion + the
per-pixel accumulation, DeviceCode.cu:85-342): ray generation, intersection
against curve sub-segments, closest-hit selection, shading, the bounded
portal continuation loop, and the weighted per-pixel reduction, with nothing
spilled to HBM but the per-pixel sums.

Layout and acceleration strategy (see also ARCHITECTURE.md):

* rays live on the lane axis (128-wide), segments on the sublane axis;
  intersection is 6 broadcast FMAs per (segment, ray) pair on the VPU with
  division-free validity tests and a Newton-refined approximate reciprocal
  for ordering;
* each program instance covers a block of (pixel group x sample wedge):
  its rays span only 2*pi*SW/rpp of direction space, so whole 64-segment
  chunks are skipped by an exact cone/circle test against precomputed chunk
  bounding circles plus a closest-hit distance bound — the TPU-native
  replacement for OptiX's BVH (optixHello.cpp:764-830);
* the winning sub-segment's shade row is fetched with one-hot matmuls
  against bf16 hi/lo split tables (2 single-pass MXU contractions instead
  of a 6-pass f32 gather);
* per-pixel sums are accumulated across wedge grid steps in VMEM and one
  (rows, R) @ (R, PXB) matmul.

The kernel runs in interpret mode off-TPU so the same code path is testable
on CPU.
"""

from __future__ import annotations

import functools
import math
import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Camera, RenderConfig
from ..scene import device as dev
from . import candidates as cand_mod
from . import fastmath, refine, rng

# Segment chunk (sublane axis) processed per culling granule. Must match
# scene/device.py SEG_ALIGN.
SEG_CHUNK = 64
# Sentinel "no hit" distance (avoid inf arithmetic inside the kernel).
FAR = np.float32(1e30)
# The closest-hit sweep packs (t, local segment id) into one int32: positive
# f32 bit patterns order like ints, so clearing the low ID_BITS mantissa bits
# and writing the id yields a single min-reduction over both.  Quantizes the
# ordering key to 2^-16 relative — near-ties may swap winners, the same
# class as the approximate-reciprocal ordering round 1 shipped.  7 bits (not
# the 6 SEG_CHUNK needs) so candidate lists of up to 128 slots ride the key:
# scenes with s_pad <= 128 then keep full no-overflow lists and the per-wedge
# overflow lax.cond disappears from the sweep.
ID_BITS = 7
_ID_MASK = np.int32((1 << ID_BITS) - 1)
_KEY_MASK = np.int32(-(1 << ID_BITS))
_FAR_PACKED = np.int32(int(np.asarray(FAR).view(np.int32)) & ~((1 << ID_BITS) - 1))

# Samples per direction wedge: blocks cover (pixels x a contiguous sample
# range), so a block's ray directions span only 2*pi*SW/rpp — the lever that
# makes angular chunk culling effective for fans (a whole-fan block keeps
# every chunk relevant in some direction).  Multi-chunk scenes use the
# narrower wedge: measured 15.3 s -> 8.4 s on lady_bug 1080p x 256 rpp, while
# single-chunk scenes (no culling) only pay wedge-step overhead.
WEDGE_SAMPLES = 16
WEDGE_SAMPLES_MULTICHUNK = 4
# Pixel tile width; tile height is PXB / TILE_W.
TILE_W = 16
# Scenes beyond this many padded sub-segments cap rays_per_block at 1024
# (_choose_block dense): tighter origin circles shorten candidate lists AND
# tighten the per-block worst-t early exit — measured 7.2 -> 4.1 s on
# dolphin 1080p x 64 rpp, far above the extra program-entry cost.
DENSE_SPAD = 4096

# Perf-debug knob: truncate the kernel after a stage ("raygen",
# "intersect", "gather", "shade") to attribute frame time; None = full
# kernel. Not a user API — flip from perf scripts only.
_ABLATE_STAGE = None
# How the kernel transposes the per-wedge (TC_ROWS, L) transposed-consts
# block back to the (L, TC_ROWS) slot-major view the sweep reads: "native"
# uses jnp.transpose (Mosaic's own transpose); "mxu3" multiplies by a 0/1
# identity with a 3-way bf16 split of the operand (exact: the split pieces
# occupy disjoint mantissa windows, each bf16 product against 0/1 is exact,
# and the f32 accumulations reassemble the original bits).  Exactness is
# REQUIRED: these are the sweep's sign-test inputs.
_TRANSPOSE_MODE = "native"


def _transpose_block(block):
    """(r, L) -> (L, r) f32, bit-exact (see _TRANSPOSE_MODE)."""
    if _TRANSPOSE_MODE == "native":
        return jnp.transpose(block, (1, 0))
    r, L = block.shape
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    ).astype(jnp.bfloat16)
    hi = block.astype(jnp.bfloat16)
    r1 = block - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(eye, hi, dims, preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(eye, mid, dims, preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(eye, lo, dims, preferred_element_type=jnp.float32)
    return acc
# Perf-debug knob: force the full sweep even when candidate lists apply.
_DISABLE_CAND = False
# Debug knob: disable the tiled sample->pixel reduction (fall back to the
# full (R, PXB) one-hot).
_TILED_REDUCE = True
# Perf-debug knob for exact-silhouette mode: "legacy_refine" keeps the dual-
# chain sweep but swaps the root isolation for the cheap 1-iter Newton (and
# drops the fallback); "no_fallback" keeps root isolation but never takes the
# strict-fallback gather.  Attribution only — output is WRONG at silhouettes.
_EXACT_ABLATE = None
# Dense-scene attribution knobs (output WRONG where they bite — probes only):
# skip the slot->global id remap after the capped-list walk / skip the seeded
# chunk-walk continuation for overflowed cells.
_ABLATE_REMAP = False
_ABLATE_OVERFLOW_FB = False
# Slot->global remap implementation: False = 128-row masked-sum reduction,
# True = hi/lo bf16 one-hot MXU contraction (exact: id = hi*128 + lo, both
# < 256, integers below 2^8 are exact in bf16).  Output-identical; probed.
_REMAP_MXU = False

# Both sweep chains' slot->global remaps ride ONE lane-concatenated (1, 2R)
# pass per level (half the one-hot builds/contractions).  Off switch for
# A/B probes only; output-identical.
_REMAP_PAIR = True

# Precomputed remap tables: the remap's hierarchical (hi, lo) id table
# depends only on prepass data (the candidate lists), never on rays, so the
# host can build it once per (tile, wedge, level) — cand_mod.idhl_from_
# tconsts — and the kernel statically slices its level's (16, Gnp) block
# off the ref and feeds the EXACT dot the in-kernel slices16 build fed,
# minus the build.  MEASURED SLOWER on both dense headliners (batch39:
# lady_bug 411.4 vs 407.1, dolphin 690.4 vs 680.9; the v1 layout that
# contracted all levels at once was worse still, batch38: lb 427.4): the
# 16-slice build pipelines essentially for free behind the walk's MXU and
# DMA traffic, while the extra per-program operand DMA does not — and the
# batch33 chl attribution (~53/139 ms) was mostly the ablation constant-
# folding the remap DOT, not build cost.  Kept as a probe lever only.
_REMAP_PRECOMP = False

# Multi-chunk winner gathers CAN factor the per-chunk one-hot as
# (loop-invariant low-7-bit one-hot) x (per-chunk (1, R) chunk mask): the
# (128, R) i32 compare + select pair per chunk step becomes one bf16
# broadcast multiply.  Output-identical (a global id matches chunk c's
# local iota iff its high bits equal c) — but MEASURED SLOWER everywhere
# (batch31: lady_bug 429.3 vs 406.2, dolphin 762.7 vs 740.4; headline
# 38.6 vs 32.1 ms, batch29 vs batch25): the bf16 broadcast multiply sits
# on the VPU's critical path between the MXU issues, while the fresh
# compare+select pipelines with them.  Kept as a probe lever only.
_GATHER_REUSE = False

# Multi-chunk winner gathers build the low-bit one-hot ONCE per gather and
# mask the MXU OUTPUT per chunk step — acc += dot(tab[c], lo_oh) * (bi_hi
# == c) — instead of a fresh (gsc, R) i32 compare + select per step.
# Output-identical for the same reason as _GATHER_REUSE (a global id
# matches chunk c's local iota iff its high bits equal c), but the per-step
# VPU work is the (m_rows, R) mask-multiply (m_rows < gsc), not a (gsc, R)
# build — the opposite trade from _GATHER_REUSE, whose pre-MXU (gsc, R)
# bf16 multiply measured slower than the fresh build (batch31).
_GATHER_OUTMASK = False

# TIMING-ONLY ablation: remap_slots' hierarchical id table (the 16
# static (8, 1) sublane slices of tc_scratch + hi/lo split) is replaced
# by a constant — measures the table-build share of the remap cost
# (output garbage; attribution probes only).
_ABLATE_REMAP_TABLE = False

# How remap_slots builds its hierarchical id table from the scratch's ID
# column — "slices16" (16 sublane slices), "fold" (one sublane->lane fold
# reshape), "tslice8" (native transpose + 8 lane slices).  All three are
# output-identical (exact integer arithmetic); batch33 measured the
# slices16 build at ~53/139 ms of lady_bug/dolphin, so the relayout cost
# was the target — but batch34 measured "fold" SLOWER end to end on both
# dense headliners (lb 448.5 vs 439.8, dol 694.9 vs ~683 at gsc512) and
# "tslice8" crashes the Mosaic compile on both.  slices16 stays.
_REMAP_BUILD = "slices16"

# TIMING-ONLY ablation: multi-chunk winner gathers walk exactly ONE chunk
# (i_lo) instead of the winners' i_lo..i_hi span — splits the gather cost
# into per-chunk-step work vs fixed per-gather work (output garbage).
_ABLATE_GATHER_SPAN1 = False

# Multi-chunk winner gathers compute their i_lo..i_hi chunk span over HIT
# lanes only: missed rays carry the FAR key's junk low bits as their
# "winner id" (a small id, i.e. chunk ~0), so one background ray used to
# stretch the span across every chunk up to the real winners.  Output-
# identical (missed lanes' gathered rows are hit-masked downstream); off
# switch for A/B probes only.
_GATHER_HIT_SPAN = True

# Two-phase final-winner gather for exact-silhouette global-gather scenes:
# phase 1 gathers only the GEOM_ROWS geometry rows of the band winner (the
# strict-test + root-isolation inputs), the rejection decision picks the
# final winner id per ray, and phase 2 gathers the full shade+consts row
# ONCE at that id.  vs the round-2/3 split path this removes the per-wedge
# strict-fallback lax.cond (measured net-negative: batch14 lb_s05 fbnc
# 498.8 vs full 507.1 ms) and 2*(G8-GEOM_ROWS) of the 4*G8 rows a
# fallback-taking block used to gather.  Output-identical (parity-pinned).
_TWO_PHASE = True
# Fixed geometry-row order of the phase-1 table: EX, EY, C1, P0X, P0Y,
# ctrl x0,y0..x3,y3, T0, DT, BAND.
GEOM_ROWS = 16

# Slot-geometry design (round 4): capped-list scenes (s_pad > 128, no
# portals, exact+two-phase) carry a per-(tile, wedge) SLOT-SPACE hi/lo
# gather table of the GEOM_ROWS phase-1 geometry rows PLUS each slot's
# global id split as (hi, lo) bf16 rows (exact: both < 256 for every
# s_pad <= CAND_MAX_SPAD).  The sweep then keeps winners in
# (level, slot) space — no per-(wedge, level) slot->id remap matmuls, no
# hierarchical id-table builds — and phase 1 becomes ONE fixed-K MXU
# contraction over the slot axis instead of a chunk-span walk over global
# ids (batch33/35: the remap-table build + phase-1 span ablations summed
# to ~58 ms of lady_bug config3's 406 and >130 of dolphin's 690).  The
# chunk-walk overflow fallback tracks its winners as aux = n_lvls + chunk
# (ids directly computable), and its lanes take the global phase-1 gather
# inside the fallback cond.  Tie-break note: quantized-key ties across
# levels/spaces resolve by (slot | walk id) low bits instead of global-id
# low bits — the same arbitrary-at-2^-16-relative class as before (the
# exact t is recomputed from the winner row either way).  Off switch for
# A/B probes; the old remap path stays for portal scenes, non-exact
# configs, and the probe matrix.
_SLOTGEOM = True
# Slot-geom table rows: GEOM_ROWS geometry + (id hi, id lo).
SG_ROWS = GEOM_ROWS + 2

# Level-split phase-1 slot-geom dot (round 5, ROADMAP P0.1): contract the
# fixed-K slot dot over the lvl_cap level-0 slots only, and run the
# level-1+ remainder under a per-wedge any(level >= 1 winner) cond —
# candidate lists are distance-sorted, so level 0 resolves most rays and
# the common wedge halves the contraction (K = 256 -> 128 on config3,
# ~-20 ms of MAC count + half the one-hot build) against one ~12 ms-class
# cond.  EXACT: a one-hot column selects at most one slot, so the split
# partial sums only ever add zeros; when the cond is untaken no level-1
# winner exists, and miss lanes carry slotp = 0 (FAR keys have zero low
# bits, aux never updates) so they cannot trigger it.  MEASURED LOSING
# (batch52): lady_bug 386.2 vs 377.9 off, dolphin neutral (523.3/523.9)
# — most wedges carry SOME level-1 winner, so the cond fires too often to
# amortize.  Kept as a probe lever only; default OFF.
_SG_LEVEL_SPLIT = False

# Band-only sweep (round 5, ROADMAP P0.2; slot-geom scenes): the walks
# carry ONLY the band chain — the strict chain's compares/select/min
# (~12-18% of the sweep) and half the exit-reduction state disappear.
# Soundness: a band winner that passes the strict window test IS the
# strict winner (the band set is a superset, so the band min that lands in
# the strict set is the strict min; with the id riding the packed key the
# keys would be EQUAL — the round-4 clean rule is implied).  Clean-ray
# decisions therefore move from key equality to strict_accept(band
# winner's gathered geometry) — the same folded-geometry test the
# rejected rule already used — and rays whose band winner is rejected by
# root isolation RE-WALK the lists strict-only under a per-wedge
# any(rejected) cond (rare: graze wedges only), with non-rejected lanes
# seeded "settled" (key 0) so the re-walk exits as soon as the rejected
# lanes are served.  Walk early exits switch to the band chain's worst —
# a TIGHTER bound that remains exact for computing band minima.
# Deviation class vs round 4: lanes whose sweep keys agreed but whose
# folded-geometry strict test disagrees (a 2^-17-margin sliver) now take
# the isolation root instead of the Newton root of the same winner — the
# same accumulation-class as the existing folded strict test.
# MEASURED LOSING BADLY (batch54): lady_bug 496.5 vs 378.8, dolphin 723.9
# vs 527.6 — any_graze is true in MOST wedges (one graze ray per 2048-ray
# block suffices), so the re-walk branch (peel groups + scratch restage +
# its own level/chunk conds) runs nearly every wedge and dwarfs the ~15%
# sweep savings.  The strict chain's marginal cost inside the dual walk
# (2 compares + select + min on shared products) is simply cheaper than
# ANY per-wedge recovery mechanism.  Kept as a probe lever; default OFF.
_BAND_ONLY = False

# Covered-chunk diet for the overflow fallback walk (round 4): the walk is
# seeded with the capped-list state, so chunks whose every hittable segment
# already sits inside the lists (max passing-segment lb < horizon) cannot
# contribute a new winner — the prepass drops them from the chunk lists
# (candidates.segment_candidates_t chunk_cover + chunk_candidates keep).
# Dolphin-class overflow cells carry ~cand_len/SEG_CHUNK fully-covered near
# chunks that the walk otherwise re-sweeps every frame.  Off switch for
# A/B probes only; exactness is argued above (ties keep the chunk).
_CHUNK_COVER = True
# Move the ENTIRE phase-1 block (geometry gather + strict test + root
# isolation) under the per-wedge any_graze cond: all-clean wedges (the
# majority) then skip the GEOM gather too, not just the isolation
# arithmetic.  Violates the "no gathers inside traced branches" Mosaic
# rule of thumb — probe-only until measured safe (output-identical).
_PHASE1_COND = False

# In-frame (non-hoisted) prepasses build the per-cell slot shade table only
# when at least this many wedges will gather from it; below the threshold
# the global-gather path wins (see trace_sums_flat).
_SLOT_INFRAME_MIN_W = 8

# Grid dimension semantics for the trace kernel.  The pixel-block grid is
# parallel-safe (disjoint output blocks, read-only inputs); "arbitrary" is
# the conservative default, the probe harness measures "parallel" (it can
# change Mosaic's cross-program DMA pipelining).
_DIM_SEMANTICS = "arbitrary"

# Scene-horizon walk clamp: bound every distance-ordered walk's exit
# threshold by the block's max scene-circle exit distance (exact — see the
# kernel).  Off switch for ablation probes only.
_SCENE_HORIZON = True

# Dense-scene list walk: number of static lane sub-ranges (sub-tiles of
# contiguous pixel rows) walked with their OWN early exit.  1 = whole-block
# exit (default); 2/4 trade loop overhead for tighter exits.  Only the
# capped distance-ordered walk uses it (slot-mode scenes walk their short
# lists without an exit).
_WALK_SPLIT = 1

# Same idea for the sorted CHUNK walk (the deep-overflow fallback): its
# early exit compares each chunk's lower bound against the worst best-hit
# across the WHOLE block, so one background ray (best t = scene exit) forces
# the walk to visit every chunk out to the scene horizon on behalf of rays
# that settled long ago.  Splitting the ray lanes into Q static sub-ranges
# (contiguous pixel rows — ridx is pixel-major, so background regions
# cluster by sub-range) walks each with its own tighter exit.  Dolphin-class
# scenes spend >half the frame in this walk (batch13: 516 of 1087 ms).
_CWALK_SPLIT = 1

# Chunks swept per chunk-walk exit check (the list walk's paired-body trick:
# the exit's sublane min + cross-lane max reduction costs a sizable fraction
# of a chunk sweep).  Over-walking is exact — the clamped repeat of the last
# chunk is an idempotent min.  Measured (batch26/28, restored-remap kernel):
# dolphin 1080p x 64rpp 844.9 -> 820.0 (cp4) -> 814.8 (cp8), and cp8 stacks
# with the list-walk pairing (744.1 combined); lady_bug neutral (its cells
# rarely overflow past the last level).
_CWALK_PAIR = 8

# Slot GROUPS swept per list-walk exit check (the capped-level walk's
# analogue of _CWALK_PAIR; batch17 shipped a hardcoded pair of 2).
# Over-walking is exact — parked slots are guaranteed misses and clamped
# repeats of the last group are idempotent minima.  None = AUTO by scene
# class (re-measured at the round-4 slot-geom + covered-chunk state,
# batch49: DENSE scenes past DENSE_SPAD want 8 — dolphin 552.3 -> 522.7 —
# while lady_bug-class over-walks at 8: 378 -> 406; the round-3 shared
# value 4 was the compromise).  Ints override (probes; bitwise-pinned
# across pairings).
_LWALK_PAIR = None

# Capped-list LEVELS for dense scenes (s_pad > 128): each level holds 128
# distance-sorted slots; levels past the first are walked only when their
# horizon still beats some ray's best hit, and the chunk-walk fallback fires
# only past the LAST level's horizon.  More levels trade table HBM + a
# per-wedge cond for fewer chunk-walk fallbacks (the dominant dolphin cost
# at 1 level: ~68% of the frame).  None = auto by scene size (measured,
# batch11: lady_bug-class scenes peak at 2 — extra level conds cost the
# cells that never need them — while dolphin-class heavy overflow tails
# keep improving through 4: 1256 -> 1087 ms).  Ints override (probes).
_CAND_LEVELS = None


# Gather chunk-width cap (power of two, >= 128).  Wider chunks cut the
# winner-gather loop trips and spans proportionally at identical MXU pass
# count and one-hot-build element count; the per-trip one-hot temp grows
# to (gsc, R) bf16 (2 MB at 512 x 2048).  Measured (batch34): the wide
# cap wins only for DEEP tables (dolphin, 8.6k padded sub-segments:
# 740.0 -> 683.0 ms) — mid-size multi-chunk scenes lose the span
# tightness narrow chunks give (lady_bug, 1.2k: 406.5 -> 439.8 ms) —
# so _GATHER_WIDE_MIN gates which scenes see it.
_GATHER_GSC = 512
# Padded scene size ABOVE which the wide cap applies; multi-chunk tables
# at or below it keep the round-2 width 128 (batch34 A/B).  Probe lever:
# set to 0 to force the wide cap on any scene.
_GATHER_WIDE_MIN = 4096


def _gather_gsc_for(s_pad: int) -> int:
    """Gather chunk width for a scene: the whole table in one chunk when
    it fits under the cap (no loop, no span reductions); width 128 for
    mid-size multi-chunk tables; the wide cap only past _GATHER_WIDE_MIN
    (deep tables, where fewer loop trips beat tighter spans — batch34)."""
    gsc = 128
    while gsc < min(s_pad, _GATHER_GSC):
        gsc *= 2
    if gsc < s_pad and s_pad <= _GATHER_WIDE_MIN:
        return 128
    return gsc


def _lwalk_pair_for(s_pad: int) -> int:
    if _LWALK_PAIR is not None:
        return _LWALK_PAIR
    return 8 if s_pad > DENSE_SPAD else 4


def _cand_len_for(s_pad: int) -> int:
    """Candidate-list slot capacity for a scene: everything (slot mode) for
    scenes within one 128-slot level, else the auto/overridden level count
    (capped at the scene size rounded up to whole levels)."""
    if s_pad <= (1 << ID_BITS):
        return s_pad
    levels = _CAND_LEVELS if _CAND_LEVELS else (2 if s_pad <= 4096 else 4)
    return (1 << ID_BITS) * min(levels, -(-s_pad // (1 << ID_BITS)))


def _choose_block(
    rpp: int, rays_per_block: int, multi_chunk: bool = False,
    dense: bool = False,
) -> tuple[int, int, int, int]:
    """Returns (R rays/program, PXB pixels/program, SW samples/wedge,
    W wedges/pixel). R = PXB * SW, a multiple of 128; PXB a multiple of
    TILE_W so every block covers whole tile rows (tile_h >= 1 for any
    rays_per_block/rays_per_pixel combination).  ``dense`` (scenes beyond
    DENSE_SPAD padded sub-segments): smaller blocks mean tighter origin
    circles AND a tighter per-block worst-t early exit — measured
    7.2 -> 4.1 s on dolphin 1080p x 64 rpp at 1024 rays/block, far above
    the extra program-entry cost — and the wedge narrows to 2 samples
    (halving each cell's angular candidate span): dolphin sw4 1917 ->
    sw2 1559 ms at the adaptive-flattening state, re-confirmed at the
    shipped defaults (sw1 841.0 vs sw2 742.8, batch30).  Non-dense
    scenes keep sw4 — lady_bug at sw2 measured 1612 vs 408.8 (batch30)."""
    base = WEDGE_SAMPLES_MULTICHUNK if multi_chunk else WEDGE_SAMPLES
    if dense:
        base = min(base, 2)
        rays_per_block = min(rays_per_block, 1024)
    sw = math.gcd(rpp, base)
    w = rpp // sw
    if w > 32:
        # High-wedge configs carry a (W, L, C) candidate block per program;
        # alongside the (R, PXB) reduction one-hot it overflows the 16 MB
        # scoped VMEM (measured at 256 rpp / 64 wedges).  Halving the block
        # trades ~5 us/program entry for headroom.
        rays_per_block = min(rays_per_block, 2048)
    pxb = max(rays_per_block // sw, 1)
    # pxb must be a multiple of TILE_W (whole tile rows) and of
    # 128/gcd(sw, 128) (so R = pxb*sw is a multiple of the 128 lane width).
    m = TILE_W * (128 // math.gcd(sw, 128)) // math.gcd(TILE_W, 128 // math.gcd(sw, 128))
    pxb = ((pxb + m - 1) // m) * m
    return pxb * sw, pxb, sw, w


def _uniform(seed, ray_id, frame, salt):
    return rng.uniform(seed, ray_id, frame, salt)


def _trace_kernel(
    # SMEM scalars
    cam_ref,  # (8,) f32: zoom, off_x, off_y, pad, scene-circle cx, cy, r,
    #           pad — the enclosing circle of every valid chunk circle
    #           (bands included), for the scene-horizon walk clamp
    meta_ref,  # (2,) i32: frame, px_start (i32 so values >= 2^24 stay exact)
    bounds_ref,  # (n_chunks, 4) f32 chunk bounding circles [cx, cy, r, 0]
    # VMEM tables
    consts_t3_ref,  # (n_chunks, 8, sc) f32 chunk-major transposed sweep
    #              consts (rows = cand_mod.TC_ORDER, lanes = in-chunk id):
    #              both minor dims tile unpadded-ish ((8, 64)->(8, 128)),
    #              vs the (S_pad, 9) layout whose 9->128 lane padding alone
    #              was 14.8 MB of scoped VMEM for dolphin (28.8k segs)
    allt_hl_ref,  # (G, 2*ALLT_ROWS, 128) bf16: chunked shade+consts, hi
    #              halves stacked over f32 residuals — one 128-row MXU pass
    #              gathers both (M pads to 128 regardless, so two separate
    #              64-row matmuls would cost twice the MXU time)
    red_ref,  # (R, PXB) bf16 sample->pixel reduction one-hot, precomputed
    #          outside the kernel (constant across the grid; building its
    #          iota/compare in-kernel cost ~10 ms/frame on the headline)
    # optional (use_cand): (1, n_wedges, CAND_LEN, CONST_COLS) candidate
    # block, then the VMEM output (written once per program)
    *refs,  # [cand_ref?], out_ref (1, 8, PXB)
    width: int,
    height: int,
    s_pad: int,
    n_traces: int,
    config: RenderConfig,
    rays_per_program: int,
    px_per_program: int,
    samples_per_wedge: int,
    n_wedges: int,
    use_cand: bool = False,
    use_chunk_lists: bool = False,
    uniform_wd: float | None = None,
    uniform_wm: float | None = None,
    rmap: dict | None = None,  # original shade_all_t row -> compact gather row
    gather_rows: int = dev.ALLT_ROWS,  # compact row count (hi half)
    slot_mode: bool = False,  # winner gather from the candidate SLOT space
    gather_len: int = 128,  # slot one-hot length (>= every cell's count)
    two_phase: bool = False,  # phase-1 geometry gather + final-winner gather
    slotgeom: bool = False,  # slot-space geometry+id tables (_SLOTGEOM)
    wedge_shift: int = 0,  # table entries shared by 2^shift adjacent wedges
):
    # Candidate tables (transposed layout, ops/candidates.py):
    # tconsts_ref (1, W, TC_ROWS, L) f32 sweep consts + global-id row;
    # idhl_ref (1, W, n_lvls*16, Gnp) bf16 precomputed hi/lo remap tables
    # (non-slot lists under _REMAP_PRECOMP — see remap_slots);
    # tshade_ref (1, W, 2*G8, L) bf16 hi/lo per-slot shade rows (slot_mode
    # only — bigger scenes gather from the global table);
    # ccand_ref (1, W, 1) SMEM counts.
    # Chunk lists (SMEM): ids (1, W, C) i32 sorted by lower-bound distance,
    # lbs (1, W, C) f32, count (1, W, 1) i32.  Both sets ride together for
    # big candidate-list scenes: overflowed cells then fall back to the
    # sorted chunk walk instead of sweeping every chunk.
    refs = list(refs)
    # two_phase: (G, 2*GEOM_ROWS, 128) bf16 hi/lo geometry-row subset of
    # allt_hl (same chunking) for the phase-1 band-winner gather
    geom_hl_ref = refs.pop(0) if two_phase else None
    if use_cand:
        tc_scratch = refs.pop()  # (L, TC_ROWS) f32 VMEM scratch (trailing)
        tconsts_ref = refs.pop(0)
        # (1, W, 2*SG_ROWS, L) bf16 slot-space geometry+id table (_SLOTGEOM)
        # (round 5 probed an ANY + per-wedge-DMA variant: NEUTRAL on the
        # trace — the pallas pipeline already overlaps in_spec DMAs — and
        # ~+8 ms on chained config3, reverted; the table stays a padded
        # 8-multiple of rows, the block ships the 2*SG_ROWS it uses)
        sgeom_ref = refs.pop(0) if slotgeom else None
        # precomputed (1, W, Gn, n_lvls*16) bf16 remap tables (_REMAP_PRECOMP)
        idhl_ref = (
            refs.pop(0)
            if (_REMAP_PRECOMP and not slot_mode and not slotgeom)
            else None
        )
        tshade_ref = refs.pop(0) if slot_mode else None
        ccand_ref = refs.pop(0)
        # capped non-slot lists only: per-slot lower-bound distances
        # (1, W, L + 1) SMEM — slots are distance-sorted, enabling the
        # sweep's early exit and the horizon fallback
        capped = s_pad > (1 << ID_BITS)
        cslb_ref = refs.pop(0) if (capped and not slot_mode) else None
    ck_scratch = refs.pop()  # (sc, 8) f32 chunk slot-major scratch
    if use_chunk_lists:
        cids_ref, clbs_ref, ccnt_ref = refs[:3]
        refs = refs[3:]
    (out_ref,) = refs
    R = rays_per_program
    PXB = px_per_program
    SW = samples_per_wedge
    rpp = config.rays_per_pixel
    n_chunks = s_pad // SEG_CHUNK if s_pad >= SEG_CHUNK else 1
    sc = min(SEG_CHUNK, s_pad)
    f32 = jnp.float32

    _lwp = _lwalk_pair_for(s_pad)  # resolved list-walk pairing (see knob)
    pid_g = pl.program_id(0)  # pixel group
    # Sample wedges are an IN-KERNEL fori_loop, not a grid dimension: at
    # ~0.77 us fixed cost per program entry, the (blocks x wedges) grid of
    # round 2's first cut spent 25 ms/frame on the headline config in pure
    # program overhead; looping wedges inside amortizes it by n_wedges and
    # keeps the output block accumulation in registers.
    if _ABLATE_STAGE == "entry":  # pure grid/dispatch cost
        out_ref[0] = jnp.zeros((8, px_per_program), jnp.float32) + cam_ref[0]
        return
    zoom = cam_ref[0]
    off_x = cam_ref[1]
    off_y = cam_ref[2]
    frame = meta_ref[0]
    px_start = meta_ref[1]

    # Pixels are covered in TILE_W x TILE_H tiles (not row strips): a tight
    # origin bounding circle is what makes the angular chunk cull bite.
    # trace_sums_flat unscrambles the tile-ordered sums afterwards.
    tiles_x = -(-width // TILE_W)
    tile_r = pid_g // tiles_x
    tile_c = pid_g - tile_r * tiles_x

    # --- raygen (DeviceCode.cu:85-150) ---
    # Computed in (8, R/8) layout: (1, R) vectors occupy one sublane of each
    # vreg (1/8 VPU utilization), and raygen + shading are ~250 elementwise
    # ops — in round 1 they dominated the headline frame.  Ray index
    # ridx = sublane*RL + lane matches the row-major (1, R) flattening, so
    # flat()/unflat() below are pure relayouts.  Mosaic supports the fold
    # direction as tpu.reshape but not the expansion, which is written as 8
    # static lane slices + a sublane concat — that needs RL to be a lane
    # multiple, so small blocks (R < 1024) stay fully flat.
    eight = R % 1024 == 0
    RSHP = (8, R // 8) if eight else (1, R)
    RL = RSHP[1]
    sub8 = jax.lax.broadcasted_iota(jnp.int32, RSHP, 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, RSHP, 1)
    ridx = sub8 * RL + lane8

    def flat(v):  # RSHP -> (1, R)
        return v if not eight else v.reshape(1, R)

    def unflat(v):  # (1, R) -> RSHP
        if not eight:
            return v
        return jnp.concatenate(
            [v[:, i * RL : (i + 1) * RL] for i in range(8)], axis=0
        )
    # SW and TILE_W are powers of two: index chains are shifts and masks.
    sw_sh = SW.bit_length() - 1
    tw_sh = TILE_W.bit_length() - 1
    pi = ridx >> sw_sh  # pixel index within the tile
    col = tile_c * TILE_W + (pi & (TILE_W - 1))
    row = px_start // width + tile_r * (PXB // TILE_W) + (pi >> tw_sh)
    pixel = row * width + col

    # Wedge-invariant origin (pre-AA-jitter; the jitter draw is per sample).
    ox0 = (col - width // 2).astype(f32) * zoom + off_x
    if config.diffusion_curve_save:
        oy0 = ((height - row) - height // 2).astype(f32) * zoom + off_y
    else:
        oy0 = (row - height // 2).astype(f32) * zoom + off_y

    sector = jnp.float32(2.0 * np.pi) / jnp.float32(rpp)
    min_hit = jnp.float32(config.min_hit_distance)
    ids_sc = jax.lax.broadcasted_iota(jnp.int32, (sc, R), 0)

    def wedge_partial(pid_w):
        """Trace this block's rays in sample wedge ``pid_w``; returns the
        (8, R) weighted ray rows [r*w, g*w, b*w, w, blur*w, 0, 0, 0] that
        the per-program reduction matmul folds into per-pixel sums.

        Empty-wedge early-out: the prepass counts are exact, so a zero
        count means every primary ray of this wedge misses (and with no
        primary hits the portal bounces are dead too) — the whole body
        (raygen, sweep, gather, isolation, shade) is skipped.  On arch
        1024^2 HALF the (tile, wedge) cells are empty (p50 count = 0): the
        one cond per wedge buys back most of that half's frame time."""
        # Wedge-coarsened tables (4K-class configs): 2^wedge_shift
        # adjacent wedges share one conservative table entry, dividing
        # table HBM by the same factor — fine wedge geometry (raygen,
        # culling math) is untouched.
        pid_tab = pid_w if wedge_shift == 0 else pid_w >> wedge_shift
        if _ABLATE_STAGE != "entry" and (use_cand or use_chunk_lists):
            cnt0 = (
                ccand_ref[0, pid_tab, 0] if use_cand else ccnt_ref[0, pid_tab, 0]
            )
            return jax.lax.cond(
                cnt0 == 0,
                lambda: jnp.zeros((8, R), f32),
                lambda: _wedge_body(pid_w),
            )
        return _wedge_body(pid_w)

    def _wedge_body(pid_w):
        pid_tab = pid_w if wedge_shift == 0 else pid_w >> wedge_shift
        sample = pid_w * SW + (ridx & (SW - 1))
        # RNG stream keyed on the GLOBAL ray id so tile-sharded rendering is
        # bitwise identical to single-chip (tests/test_sharding.py).
        global_ray = pixel * rpp + sample

        if config.use_aa:
            u_rot, u_x, u_y = rng.uniform3(config.seed, global_ray, frame)
            theta = sector * (sample.astype(f32) + u_rot)
            ox = ox0 + u_x * zoom
            oy = oy0 + u_y * zoom
        else:
            theta = sector * sample.astype(f32)
            ox, oy = ox0, oy0
        # Shared fast sincos (ops/fastmath.py): one quadrant reduction for
        # both, bit-identical to the pure-JAX path's raygen.
        dy, dx = fastmath.sincos(theta)

        # Ray state and all per-ray shading math stay in the (8, RL) layout;
        # only the segment sweep (which broadcasts rays against segment
        # rows) sees flat (1, R) views, via cheap per-array relayouts.

        # --- portal accumulation state (RSHP layout) ---
        ones = jnp.ones(RSHP, f32)
        zeros = jnp.zeros(RSHP, f32)
        filt_r, filt_g, filt_b = ones, ones, ones
        inv_w = zeros
        blur_prod = ones
        out_r, out_g, out_b = zeros, zeros, zeros
        out_w, out_blur = zeros, zeros
        alive = ones > 0.0

        if _ABLATE_STAGE == "raygen":
            # broadcast sink (no cross-lane reduction: scalar reductions are
            # slow in Mosaic and would dominate the ablated measurement)
            return jnp.zeros((8, R), f32) + flat(dx + ox)


        # Slot-geom mode (see _SLOTGEOM): winners ride (level, slot) keys;
        # the chunk-walk fallback tags its winners aux = sg_nl + chunk so
        # they are distinguishable from list levels.  sg_nl = 0 keeps the
        # non-slot-geom walks writing the plain chunk index.
        sg_mode = use_cand and slotgeom
        sg_nl = 0
        if sg_mode:
            _cl_k = tconsts_ref.shape[3]
            sg_nl = _cl_k // min(_cl_k, 1 << ID_BITS)
        # band-only sweep applies to the slot-geom capped-list path only
        # (see _BAND_ONLY); everywhere else the dual chains stay.
        bo = sg_mode and _BAND_ONLY

        for _bounce in range(n_traces):
            # deferred overflow-fallback predicate (slot-geom mode only:
            # the fallback cond also gathers its winners' geometry, so it
            # runs after the gather helpers are defined)
            sg_need = None
            # Flat (1, R) views of the ray state for the segment sweep, plus the
            # hoisted per-ray cross term of num_s (constant across segments).
            oxf = flat(ox)
            oyf = flat(oy)
            dxf = flat(dx)
            dyf = flat(dy)
            crossf = flat(oy * dx - ox * dy)

            # Per-ray |d| scaling the silhouette band (exact_silhouettes):
            # ≈1 for primaries (fastmath.sincos is unit to ~5e-7); portal
            # continuation rays are not renormalized.  Matches the JAX
            # path's per-ray scale bit for bit.
            if config.exact_silhouettes:
                band_dsc = jnp.sqrt(flat(dx * dx + dy * dy))  # (1, R)
            else:
                band_dsc = None

            # Scene-horizon clamp (primary bounce, multi-chunk scenes): per
            # ray, the distance at which it EXITS the scene's enclosing
            # circle — past it no hit exists (hit points lie on band-widened
            # sub-segments, all inside the circle; the circle is convex so
            # the ray never re-enters).  Every distance-ordered walk clamps
            # its exit threshold by the block's max, so blocks whose rays
            # miss (or leave the scene quickly) stop walking instead of
            # sweeping to FAR.  Rays that never enter (disc < 0) or exit
            # behind the origin get 0: nothing is hittable.  The 1.00002
            # slack covers fastmath.sincos's ~5e-7 non-unit |d| and f32
            # rounding (same class as the walks' existing 1.00001).
            texit = None
            if _bounce == 0 and n_chunks > 1 and _SCENE_HORIZON:
                pcx = cam_ref[4] - oxf
                pcy = cam_ref[5] - oyf
                bq = dxf * pcx + dyf * pcy
                disc = bq * bq - (
                    pcx * pcx + pcy * pcy - cam_ref[6] * cam_ref[6]
                )
                texit = jnp.maximum(
                    jnp.where(
                        disc >= 0.0,
                        bq + jnp.sqrt(jnp.maximum(disc, 0.0)),
                        0.0,
                    ),
                    0.0,
                )  # (1, R)
                tb_full = jnp.max(texit) * jnp.float32(1.00002)
            else:
                tb_full = FAR

            def packed_min(ex, ey, c1, p0x, p0y, q, ids, band=None,
                           reduce_rows=True,
                           ox=oxf, oy=oyf, dx=dxf, dy=dyf, cross=crossf,
                           bdsc=None, chains="both"):
                """Closest hit over (n, 1) constant columns: (1, R) packed
                key(s) — (pk_band, pk_strict) in exact-silhouette mode (band
                is not None), else a single strict pk.

                Division-free validity by sign algebra, identical to the JAX
                path (scene/device.py intersect_consts): s in [0,1] iff
                num_s*(denom-num_s) >= 0; t > min_hit iff
                (num_t - min_hit*denom)*denom > 0.  The second product also
                rejects parallel rays and e = 0 padding rows (denom = 0), and
                collinear rays (num_t = 0 gives product 0, never > 0).

                ``band`` (exact silhouettes): a second acceptance widened by
                the sub-segment's capsule band — Newton decides whether the
                band winner is a real crossing; rays whose band winner is
                rejected fall back to the strict winner (itself a guaranteed
                crossing: chord endpoints lie on the curve, so s in (0,1)
                means F changes sign across the parameter window).
                """
                denom = dx * ey - dy * ex  # (n, R)
                num_t = c1 - ox * ey + oy * ex
                num_s = dy * p0x - dx * p0y + cross
                prod_s = num_s * (denom - num_s)
                prod_t = (num_t - min_hit * denom) * denom
                # Newton-refined approximate reciprocal for ordering (~2^-24
                # error; the winner's t is recomputed exactly after the gather).
                # denom = 0 rides the masked lane: r0 = inf -> t = nan -> FAR.
                r0 = pl.reciprocal(denom, approx=True)
                r = r0 * (2.0 - denom * r0)
                # Quadratic-corrected ordering estimate (dev.CONST_QUAD):
                # 2nd-order-accurate hit distance, so ranking no longer
                # flips winners by up to the chord sagitta.  Band candidates
                # can sit at t <= 0; clamp so the bit-pattern ordering
                # (positive floats only) stays valid.
                sm = num_s * r
                tmr = jnp.maximum((num_t - q * sm * (1.0 - sm)) * r, 1e-30)
                # Packed (t | local id) key built ONCE and shared by both
                # chains (the old per-chain where(ok, t, FAR) -> bitcast
                # repeated the 3-op packing); rejected lanes take the packed
                # FAR constant directly.  Output-identical: a miss lane used
                # to carry FARPACK|id, which never beats the FARPACK running-
                # minimum seed (equal t-bits, lower id wins).  NaN tmr lanes
                # (denom = 0 -> r = inf) are always rejected lanes in both
                # forms.  Positive float bit patterns order as ints.
                pk_raw = (
                    jax.lax.bitcast_convert_type(tmr, jnp.int32) & _KEY_MASK
                ) | ids

                def pmin(ok):
                    # ``reduce_rows`` False keeps the (n, R) block — the
                    # candidate walk accumulates (8, R) running minima at
                    # full sublane rate and reduces ONCE per wedge ((1, R)
                    # rows use 1 of 8 sublanes; per-group reductions were
                    # ~1/3 of the sweep stage).
                    pk = jnp.where(ok, pk_raw, _FAR_PACKED)
                    if not reduce_rows:
                        return pk  # (n, R) i32
                    return jnp.min(pk, axis=0, keepdims=True)  # (1, R) i32

                # ``chains`` (round 5, band-only sweep): "both" returns
                # (band, strict) as always; "band"/"strict" compute ONLY
                # that chain's acceptance + min — the band-only walks drop
                # the strict chain's compares/select/min entirely and the
                # rejected-ray re-walk derives the strict chain on demand.
                if band is None:
                    ps = pmin((prod_s >= 0.0) & (prod_t > 0.0))
                    return (ps, ps) if chains == "both" else (ps,)
                if chains == "strict":
                    return (pmin((prod_s >= 0.0) & (prod_t > 0.0)),)
                # Sign-free band widening (see scene/device.py
                # intersect_consts): with ms = sign(denom) * hb,
                # (num_s+ms)(denom-num_s+ms) = prod_s + hb*|denom| + hb^2.
                hb = band * (band_dsc if bdsc is None else bdsc)
                had = hb * jnp.abs(denom)
                ok_band = (prod_s + had + hb * hb >= 0.0) & (prod_t + had > 0.0)
                if chains == "band":
                    return (pmin(ok_band),)
                ok_strict = (prod_s >= 0.0) & (prod_t > 0.0)
                return pmin(ok_band), pmin(ok_strict)

            exact = config.exact_silhouettes

            # Both chains ride every sweep: pk_b (band-widened acceptance)
            # and pk_s (strict).  Without exact silhouettes they are the
            # same tensor and XLA CSE collapses the duplicate updates.
            def intersect_chunk(c, st):
                pk_b, ch_b, pk_s, ch_s = st
                # slot-major view of this chunk's consts via the scratch
                # (same exact transpose as the candidate tables)
                ck_scratch[...] = _transpose_block(consts_t3_ref[c])
                c_b, c_s = packed_min(
                    ck_scratch[:, 0:1],  # EX (cand_mod.TC_ORDER)
                    ck_scratch[:, 1:2],  # EY
                    ck_scratch[:, 2:3],  # C1
                    ck_scratch[:, 3:4],  # P0X
                    ck_scratch[:, 4:5],  # P0Y
                    ck_scratch[:, 5:6],  # QUAD
                    ids_sc,
                    band=ck_scratch[:, 6:7] if exact else None,
                )
                upd_b = c_b < pk_b
                upd_s = c_s < pk_s
                return (
                    jnp.where(upd_b, c_b, pk_b),
                    jnp.where(upd_b, c, ch_b),
                    jnp.where(upd_s, c_s, pk_s),
                    jnp.where(upd_s, c, ch_s),
                )

            def far_state(n_chains=2):
                far = jnp.full((1, R), _FAR_PACKED, jnp.int32)
                zero = jnp.zeros((1, R), jnp.int32)
                return (far, zero) * n_chains

            # --- closest hit over segment chunks, with chunk culling ---
            # The accelerating structure (the reference's GAS role,
            # optixHello.cpp:764-830): each chunk of SEG_CHUNK sub-segments has
            # a precomputed bounding circle.  A chunk is skipped with a real
            # branch when (a) its lower-bound distance exceeds the block's worst
            # current closest hit, or (b) on the primary trace, it lies entirely
            # outside the block's direction wedge.  Both tests are conservative,
            # so culling is exact.
            if use_chunk_lists and _bounce == 0:
                # --- sorted chunk candidate walk (ops/candidates.py) ---
                # The prepass compacted this (tile, wedge) block's possible
                # chunks into an ascending-lower-bound list; walk it and
                # stop as soon as the next chunk's lower bound exceeds the
                # block's worst current closest hit.  Used directly for
                # beyond-CAND_MAX_SPAD scenes, and as the overflow fallback
                # for candidate-list cells (vs round 2's first cut: a loop
                # over EVERY chunk, which dominated lady_bug's frame).
                def _chunk_walk(st0=None, chains="both"):
                    # ``st0``: seed state — the capped-candidate-list walk's
                    # result continues into the chunk walk (re-sweeping a
                    # listed segment is an idempotent min), so the early
                    # exit starts tight.  _CWALK_SPLIT > 1: walk Q static
                    # lane sub-ranges independently, each with its own
                    # early exit (see the knob's comment).  ``chains``: the
                    # walked chain set (band-only sweep / strict re-walk);
                    # state is (pk, aux) per chain, exits use the LAST
                    # chain (strict under "both", the only one otherwise).
                    n_ch = 2 if chains == "both" else 1
                    count = ccnt_ref[0, pid_tab, 0]
                    nq = _CWALK_SPLIT if R % (128 * _CWALK_SPLIT) == 0 else 1
                    rq = R // nq

                    def sub_walk(qi, stq):
                        """Walk the chunk list for lanes [qi*rq, (qi+1)*rq)
                        only.  stq: 4-tuple of (1, rq) rows."""
                        sl_q = slice(qi * rq, (qi + 1) * rq)
                        oxq, oyq = oxf[:, sl_q], oyf[:, sl_q]
                        dxq, dyq = dxf[:, sl_q], dyf[:, sl_q]
                        crq = crossf[:, sl_q]
                        bdq = band_dsc[:, sl_q] if exact else None
                        texq = (
                            texit[:, sl_q] * jnp.float32(1.00002)
                            if texit is not None
                            else None
                        )
                        ids_q = (
                            ids_sc
                            if nq == 1
                            else jax.lax.broadcasted_iota(
                                jnp.int32, (sc, rq), 0
                            )
                        )

                        def ic_q(c, st):
                            ck_scratch[...] = _transpose_block(
                                consts_t3_ref[c]
                            )
                            mins = packed_min(
                                ck_scratch[:, 0:1],
                                ck_scratch[:, 1:2],
                                ck_scratch[:, 2:3],
                                ck_scratch[:, 3:4],
                                ck_scratch[:, 4:5],
                                ck_scratch[:, 5:6],
                                ids_q,
                                band=ck_scratch[:, 6:7] if exact else None,
                                ox=oxq, oy=oyq, dx=dxq, dy=dyq, cross=crq,
                                bdsc=bdq, chains=chains,
                            )
                            # sg mode: aux = sg_nl + chunk (sg_nl = 0 keeps
                            # the plain chunk index otherwise)
                            out = []
                            for i, cm in enumerate(mins):
                                pk, ch = st[2 * i], st[2 * i + 1]
                                upd = cm < pk
                                out.append(jnp.where(upd, cm, pk))
                                out.append(jnp.where(upd, c + sg_nl, ch))
                            return tuple(out)

                        def walk_cond(state):
                            i, st = state
                            # worst per-ray best t of the STRICT chain (>=
                            # the band chain's per ray, so the early exit is
                            # conservative for both), quantized UP one key
                            # step; primary rays are unit-length to ~5e-7
                            # (fastmath.sincos), covered by the 1e-5 slack.
                            # PER-RAY min(best, scene-exit) BEFORE the max:
                            # a ray that leaves the scene quickly cannot
                            # force walks on behalf of its FAR best (nothing
                            # past its exit is hittable) — strictly tighter
                            # than the block-max texit clamp, still exact.
                            bt_up = jax.lax.bitcast_convert_type(
                                (st[-2] & _KEY_MASK) + np.int32(1 << ID_BITS),
                                f32,
                            )
                            if texq is not None:
                                bt_up = jnp.minimum(bt_up, texq)
                            worst = jnp.minimum(
                                jnp.max(bt_up) * jnp.float32(1.00001),
                                tb_full,
                            )
                            # clamp the lb read: i can sit past count (by
                            # up to _CWALK_PAIR) where (i < count) already
                            # kills the conjunction but the read still
                            # happens — and count can equal the table width
                            lb_i = clbs_ref[
                                0, pid_w,
                                jnp.minimum(i, clbs_ref.shape[2] - 1),
                            ]
                            return (i < count) & (lb_i < worst)

                        def walk_body(state):
                            i, st = state
                            st = ic_q(cids_ref[0, pid_tab, i], st)
                            # paired body (see _CWALK_PAIR): the clamped
                            # repeat of the final chunk is an idempotent min
                            for _p in range(1, _CWALK_PAIR):
                                st = ic_q(
                                    cids_ref[
                                        0, pid_w,
                                        jnp.minimum(i + _p, count - 1),
                                    ],
                                    st,
                                )
                            return i + _CWALK_PAIR, st

                        _, st = jax.lax.while_loop(
                            walk_cond, walk_body, (jnp.int32(0), stq)
                        )
                        return st

                    if nq == 1:
                        return sub_walk(
                            0, far_state(n_ch) if st0 is None else st0
                        )
                    parts = []
                    for qi in range(nq):
                        sl_q = slice(qi * rq, (qi + 1) * rq)
                        if st0 is None:
                            far = jnp.full((1, rq), _FAR_PACKED, jnp.int32)
                            zero = jnp.zeros((1, rq), jnp.int32)
                            stq = (far, zero) * n_ch
                        else:
                            stq = tuple(s[:, sl_q] for s in st0)
                        parts.append(sub_walk(qi, stq))
                    return tuple(
                        jnp.concatenate([p[k] for p in parts], axis=1)
                        for k in range(2 * n_ch)
                    )

            if use_cand and _bounce == 0:
                # --- candidate-list closest hit (ops/candidates.py) ---
                # The per-frame prepass compacted this (tile, wedge) block's
                # possible segments into cand_len gathered SLOTS; the sweep
                # walks only ceil(count/8) 8-row groups, so typical cost
                # tracks the mean candidate count (~5 on arch).  The tables
                # arrive transposed (rows, L): one exact per-wedge transpose
                # recovers the slot-major view; slots ride the packed key
                # (slot order == ascending global id == the JAX argmin's
                # tie-break).  slot_mode: the winner's shade row is gathered
                # from the per-wedge slot table with a gather_len-row
                # one-hot; otherwise slots remap to global ids post-sweep.
                #
                # Multi-LEVEL capped lists (round 3): dense scenes carry
                # n_lvls x 128 distance-sorted slots; only the first 128
                # (level 0) are walked unconditionally.  Each further level
                # is walked — staged into the same scratch, remapped with
                # its own TC_ID row, merged — only when candidates beyond
                # the previous levels could still win (same horizon logic
                # as the chunk-walk fallback, per level).  The seeded chunk
                # walk then fires only past the LAST level's horizon: on
                # dolphin 1080p the chunk-walk fallback was ~68% of the
                # frame with a single 128-slot level.
                cand_len = tconsts_ref.shape[3]
                lvl_cap = min(cand_len, 1 << ID_BITS)  # slots per level
                n_lvls = cand_len // lvl_cap
                cnt = ccand_ref[0, pid_tab, 0]
                # Slot-major consts staged through a VMEM scratch: Mosaic
                # supports dynamic sublane slices on REFS, not on values.
                tc_scratch[...] = _transpose_block(
                    tconsts_ref[0, pid_tab, :, :lvl_cap]
                )  # (lvl_cap, TC_ROWS)

                def remap_slots(pk, lvl=0):
                    """slot -> global id for level ``lvl`` (the currently
                    staged/walked one — a PYTHON constant: the level loop is
                    unrolled), then split the id into (low ID_BITS, chunk)
                    so the common unpack best_i = (pk & mask) + ch * sc
                    holds.  Lane-width generic: both chains ride ONE (1, 2R)
                    pass (remap_pair) — same data, half the op count.

                    _REMAP_PRECOMP: the (hi, lo) id table arrives
                    precomputed per (tile, wedge) (cand_mod.idhl_from_
                    tconsts) — the in-kernel 16-slice build below only runs
                    on the A/B path.  One MXU contraction of the WHOLE
                    (Gn, n_lvls*16) block computes every level's rows (M
                    pads to 128 regardless); level selection is a static
                    sublane slice of the result.

                    Hierarchical one-hot (round 3): slot = 8*g + k, so
                    id = sum_{g,k} [g == slot>>3][k == slot&7] idcol[8g+k]
                    — a (16, R) + an (8, R) one-hot build replace the flat
                    (128, R) masked sum, which measured ~93 ms of lady_bug
                    config3's 518 (batch13 noremap).  The id rides the MXU
                    as bf16 hi/lo halves (exact: hi, lo < 256 for every
                    s_pad <= CAND_MAX_SPAD = 2^15)."""
                    if _ABLATE_REMAP:  # attribution probe: slot ids ride
                        return pk, jnp.zeros_like(pk)
                    slot = pk & _ID_MASK
                    if idhl_ref is not None:
                        gn_l = idhl_ref.shape[3]  # Gnp (>= Gn, zero-padded)
                        gg = jax.lax.shift_right_logical(slot, 3)
                        kk = slot & 7
                        a_g = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (gn_l, slot.shape[1]), 0
                            )
                            == gg
                        ).astype(jnp.bfloat16)  # (Gnp, N) group one-hot
                        # this level's (16, Gnp) hi/lo table, sliced
                        # statically off the ref (lvl is a Python constant)
                        # — the exact dot slices16 fed, minus the build
                        hl = idhl_ref[0, pid_tab, lvl * 16 : (lvl + 1) * 16, :]
                        two16 = jax.lax.dot_general(
                            hl, a_g, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (16, N)
                        chi, clo = two16[:8], two16[8:]
                        b_k = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (8, slot.shape[1]), 0
                            )
                            == kk
                        )  # (8, N) sub-row one-hot
                        g = jnp.sum(
                            jnp.where(b_k, chi * 128.0 + clo, 0.0),
                            axis=0,
                            keepdims=True,
                        ).astype(jnp.int32)
                    elif _REMAP_MXU:
                        # flat hi/lo bf16 MXU remap (probe A/B): one
                        # (L, 2) @ (L, R) contraction over the full
                        # (L, R) one-hot.
                        idcol = tc_scratch[
                            :, cand_mod.TC_ID : cand_mod.TC_ID + 1
                        ]
                        ids_n = jax.lax.broadcasted_iota(
                            jnp.int32, (lvl_cap, slot.shape[1]), 0
                        )
                        onehot = (ids_n == slot).astype(jnp.bfloat16)
                        hi_f = jnp.floor(idcol * jnp.float32(1.0 / 128.0))
                        hl = jnp.concatenate(
                            [hi_f, idcol - hi_f * 128.0], axis=1
                        ).astype(jnp.bfloat16)  # (L, 2)
                        two = jax.lax.dot_general(
                            hl, onehot, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (2, R)
                        g = (
                            two[0:1] * 128.0 + two[1:2]
                        ).astype(jnp.int32)
                    else:
                        # Hierarchical id table: slot decomposes into a
                        # GROUP one-hot (MXU contraction dim, Gn entries)
                        # and a SUB-ROW one-hot (8 entries, masked sum).
                        # Three output-identical builds of the (hi, lo) id
                        # table (the decomposition is our choice; only the
                        # scratch-relayout cost differs — batch33 measured
                        # the slices16 build at ~53 ms of lady_bug's 406
                        # and ~139 of dolphin's 740):
                        #  - slices16: 16 static (8, 1) sublane slices,
                        #    [k, g] = id[8g + k]
                        #  - fold: ONE sublane->lane fold reshape
                        #    (lvl_cap, 1) -> (Gn, 8), [g, k] = id[8g + k]
                        #  - tslice8: native transpose to (1, lvl_cap) + 8
                        #    static LANE slices, [k, g] = id[k*Gn + g]
                        Gn = lvl_cap // 8
                        g_sh = Gn.bit_length() - 1
                        idc = tc_scratch[:, cand_mod.TC_ID : cand_mod.TC_ID + 1]
                        if _ABLATE_REMAP_TABLE == "bcast":
                            # timing-only attribution, UNFOLDABLE variant:
                            # the table is a broadcast of one DYNAMIC scratch
                            # value, so the MXU contraction cannot constant-
                            # fold away — isolates the relayout-build share
                            # from the matmul share (the zeros variant below
                            # may fold both).
                            hl = (
                                jnp.ones((16, Gn), jnp.float32)
                                * idc[0:1, 0:1]
                            ).astype(jnp.bfloat16)
                            cdims = (((1,), (0,)), ((), ()))
                            gg = jax.lax.shift_right_logical(slot, 3)
                            kk = slot & 7
                        elif _ABLATE_REMAP_TABLE:  # timing-only attribution
                            hl = jnp.zeros((16, Gn), jnp.bfloat16)
                            cdims = (((1,), (0,)), ((), ()))
                            gg = jax.lax.shift_right_logical(slot, 3)
                            kk = slot & 7
                        elif _REMAP_BUILD == "fold":
                            id16 = idc.reshape(Gn, 8)
                            hi = jnp.floor(id16 * jnp.float32(1.0 / 128.0))
                            hl = jnp.concatenate(
                                [hi, id16 - hi * 128.0], axis=1
                            ).astype(jnp.bfloat16)  # (Gn, 16)
                            cdims = (((0,), (0,)), ((), ()))
                            gg = jax.lax.shift_right_logical(slot, 3)
                            kk = slot & 7
                        elif _REMAP_BUILD == "tslice8":
                            idrow = jnp.transpose(idc, (1, 0))  # (1, L)
                            id8 = jnp.concatenate(
                                [
                                    idrow[:, i * Gn : (i + 1) * Gn]
                                    for i in range(8)
                                ],
                                axis=0,
                            )  # (8, Gn)
                            hi = jnp.floor(id8 * jnp.float32(1.0 / 128.0))
                            hl = jnp.concatenate(
                                [hi, id8 - hi * 128.0], axis=0
                            ).astype(jnp.bfloat16)  # (16, Gn)
                            cdims = (((1,), (0,)), ((), ()))
                            gg = slot & (Gn - 1)
                            kk = jax.lax.shift_right_logical(slot, g_sh)
                        else:  # slices16
                            idcol8 = jnp.concatenate(
                                [
                                    idc[i * 8 : (i + 1) * 8]
                                    for i in range(Gn)
                                ],
                                axis=1,
                            )
                            hi = jnp.floor(idcol8 * jnp.float32(1.0 / 128.0))
                            hl = jnp.concatenate(
                                [hi, idcol8 - hi * 128.0], axis=0
                            ).astype(jnp.bfloat16)  # (16, Gn)
                            cdims = (((1,), (0,)), ((), ()))
                            gg = jax.lax.shift_right_logical(slot, 3)
                            kk = slot & 7
                        a_g = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (Gn, slot.shape[1]), 0
                            )
                            == gg
                        ).astype(jnp.bfloat16)  # (Gn, N) group one-hot
                        # hi and lo halves stacked into ONE MXU pass (M pads
                        # to 128 regardless, so two 8-row matmuls cost twice
                        # the single 16-row one); both halves stay exact in
                        # bf16 (< 256 each for every s_pad <= 2^15).
                        two16 = jax.lax.dot_general(
                            hl, a_g, cdims, preferred_element_type=jnp.float32
                        )  # (16, R)
                        chi, clo = two16[:8], two16[8:]
                        b_k = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (8, slot.shape[1]), 0
                            )
                            == kk
                        )  # (8, N) sub-row one-hot
                        g = jnp.sum(
                            jnp.where(b_k, chi * 128.0 + clo, 0.0),
                            axis=0,
                            keepdims=True,
                        ).astype(jnp.int32)
                    # split so the common unpack (pk & mask) + ch * sc
                    # reconstructs g:  g = (g >> ID_BITS) * 2^ID_BITS
                    #                    + (g & mask),  ch * sc matches
                    # via the 2^ID_BITS // sc multiplier.
                    return (
                        (pk & _KEY_MASK) | (g & _ID_MASK),
                        jax.lax.shift_right_logical(g, ID_BITS)
                        * ((1 << ID_BITS) // sc),
                    )

                def remap_pair(pk_b, pk_s, lvl=0):
                    """Both chains through ONE remap pass: the keys ride
                    concatenated lanes (1, 2R), halving the one-hot builds
                    and MXU contractions (remap_slots is lane-generic).
                    Output-identical to two separate passes."""
                    if not _REMAP_PAIR:
                        return remap_slots(pk_b, lvl) + remap_slots(pk_s, lvl)
                    pk2 = jnp.concatenate([pk_b, pk_s], axis=1)
                    pk2m, ch2 = remap_slots(pk2, lvl)
                    return (
                        pk2m[:, :R], ch2[:, :R], pk2m[:, R:], ch2[:, R:]
                    )

                def _list_walk(lb_off, tcap, chains="both"):
                    """Distance-ordered early-exit walk of the 128-slot
                    level staged in tc_scratch (per-GROUP lbs read at
                    (lb_off >> 3) + g).  ``tcap``: optional (1, R) per-ray
                    strict-t upper bound from the already-merged previous
                    levels (quantized up one key step), so fallback levels
                    exit against hits the earlier levels already found.
                    Returns the tuple of (8, R) packed running minima —
                    (band, strict) under chains="both", one entry
                    otherwise; the exit reduction always uses the LAST.

                    _WALK_SPLIT > 1: the exit compares against the worst
                    best-hit across the WHOLE block; splitting the ray lanes
                    into Q static sub-ranges (contiguous pixel rows of the
                    tile — ridx is pixel-major) walks each with its own
                    tighter exit.  Lane slices are static and 128-aligned."""
                    n_groups = (jnp.minimum(cnt - lb_off, lvl_cap) + 7) >> 3
                    nq = _WALK_SPLIT if R % (128 * _WALK_SPLIT) == 0 else 1
                    rq = R // nq

                    def quarter_walk(qi):
                        sl_q = slice(qi * rq, (qi + 1) * rq)
                        oxq, oyq = oxf[:, sl_q], oyf[:, sl_q]
                        dxq, dyq = dxf[:, sl_q], dyf[:, sl_q]
                        crq = crossf[:, sl_q]
                        bdq = band_dsc[:, sl_q] if exact else None
                        # per-ray exit cap: min(scene exit, previous-level
                        # best t) — each min'd against this walk's own
                        # running best in walk_cond (see _chunk_walk)
                        capq = (
                            texit[:, sl_q] * jnp.float32(1.00002)
                            if texit is not None
                            else None
                        )
                        if tcap is not None:
                            tq = tcap[:, sl_q]
                            capq = tq if capq is None else jnp.minimum(capq, tq)
                        ids_8q = jax.lax.broadcasted_iota(
                            jnp.int32, (8, rq), 0
                        )

                        def groupq(i, pks):
                            sl = pl.ds(pl.multiple_of(i * 8, 8), 8)
                            mins = packed_min(
                                tc_scratch[sl, 0:1],
                                tc_scratch[sl, 1:2],
                                tc_scratch[sl, 2:3],
                                tc_scratch[sl, 3:4],
                                tc_scratch[sl, 4:5],
                                tc_scratch[sl, 5:6],
                                ids_8q + i * 8,
                                band=tc_scratch[sl, 6:7] if exact else None,
                                reduce_rows=False,
                                ox=oxq, oy=oyq, dx=dxq, dy=dyq, cross=crq,
                                bdsc=bdq, chains=chains,
                            )
                            return tuple(
                                jnp.minimum(p, m) for p, m in zip(pks, mins)
                            )

                        def walk_cond(st):
                            g, pk8s = st[0], st[-1]
                            best = jnp.min(pk8s, axis=0, keepdims=True)
                            # bitcast the VECTOR then reduce — Mosaic
                            # rejects scalar tpu.bitcast (i32 -> f32);
                            # positive-float bit patterns are monotone so
                            # max commutes.
                            bt_up = jax.lax.bitcast_convert_type(
                                (best & _KEY_MASK)
                                + np.int32(1 << ID_BITS),
                                f32,
                            )
                            if capq is not None:
                                bt_up = jnp.minimum(bt_up, capq)
                            worst = (
                                jnp.max(bt_up) * jnp.float32(1.00001)
                            )
                            return (g < n_groups) & (
                                cslb_ref[0, pid_tab, (lb_off >> 3) + g] < worst
                            )

                        def walk_body(st):
                            # PAIRED body (_lwp groups per exit
                            # check) — the check's sublane min + cross-lane
                            # max reduction costs a sizable fraction of a
                            # group sweep, and over-walking is exact (parked
                            # slots are guaranteed misses; the staged level
                            # always holds lvl_cap//8 groups, so clamped
                            # indices stay in scratch bounds — re-walking
                            # the last group is an idempotent min).
                            g, pks = st[0], st[1:]
                            pks = groupq(g, pks)
                            for _p in range(1, _lwp):
                                pks = groupq(
                                    jnp.minimum(g + _p, lvl_cap // 8 - 1),
                                    pks,
                                )
                            return (g + _lwp,) + pks

                        # First pair peeled OUTSIDE the loop: short lists
                        # (the common cell: p50 candidate count is tiny)
                        # then pay ZERO exit reductions; n_groups >= 1 is
                        # guaranteed by the callers (wedge skip / need_l),
                        # and later peel groups over-walk safely when
                        # n_groups is small (static clamp).
                        farq = jnp.full((8, rq), _FAR_PACKED, jnp.int32)
                        stq = (farq,) * (2 if chains == "both" else 1)
                        for _p in range(_lwp):
                            stq = groupq(min(_p, lvl_cap // 8 - 1), stq)
                        st0 = (jnp.int32(_lwp),) + stq
                        res = jax.lax.while_loop(walk_cond, walk_body, st0)
                        return res[1:]

                    if nq == 1:
                        return quarter_walk(0)
                    parts = [quarter_walk(qi) for qi in range(nq)]
                    return tuple(
                        jnp.concatenate([p[k] for p in parts], axis=1)
                        for k in range(len(parts[0]))
                    )

                def _cand_branch(chains="both"):
                    ids_8 = jax.lax.broadcasted_iota(jnp.int32, (8, R), 0)

                    def group(i, pks):
                        sl = pl.ds(pl.multiple_of(i * 8, 8), 8)
                        mins = packed_min(
                            tc_scratch[sl, 0:1],  # EX (cand_mod.TC_ORDER)
                            tc_scratch[sl, 1:2],  # EY
                            tc_scratch[sl, 2:3],  # C1
                            tc_scratch[sl, 3:4],  # P0X
                            tc_scratch[sl, 4:5],  # P0Y
                            tc_scratch[sl, 5:6],  # QUAD
                            ids_8 + i * 8,
                            band=tc_scratch[sl, 6:7] if exact else None,
                            reduce_rows=False, chains=chains,
                        )
                        # full-sublane-rate (8, R) running minima; ONE
                        # sublane reduction per wedge after the walk
                        return tuple(
                            jnp.minimum(p, m) for p, m in zip(pks, mins)
                        )

                    far8 = jnp.full((8, R), _FAR_PACKED, jnp.int32)
                    # capped lists (cnt can read cand_len + 1 = "dropped")
                    # walk at most the lvl_cap level-0 slots that exist
                    n_groups = (jnp.minimum(cnt, lvl_cap) + 7) >> 3
                    if slot_mode or (cand_len >= s_pad and n_lvls == 1):
                        pk8s = jax.lax.fori_loop(
                            0, n_groups, group,
                            (far8,) * (2 if chains == "both" else 1),
                        )
                    else:
                        # Distance-ordered early-exit walk (dense scenes):
                        # slots arrive sorted by conservative lower-bound
                        # distance, so stop at the first group whose min lb
                        # (its first slot's) exceeds the block's worst
                        # current STRICT closest hit — conservative for the
                        # band chain too (band keys <= strict keys per ray).
                        # Same quantize-up + unit-direction slack as the
                        # chunk walk; primary rays only (this branch is
                        # bounce 0).  On lady_bug 1080p the sweep was 817 of
                        # 1178 ms with the full fori walk.
                        pk8s = _list_walk(0, None, chains)
                    rows = [jnp.min(p8, axis=0, keepdims=True) for p8 in pk8s]
                    zero = jnp.zeros((1, R), jnp.int32)
                    if slot_mode or sg_mode:
                        # keys keep the SLOT: slot_mode gathers in slot
                        # space; sg_mode resolves ids via the slot-geom
                        # table after the sweep (aux = level 0 here)
                        out = []
                        for r in rows:
                            out += [r, zero]
                        return tuple(out)
                    return remap_pair(rows[0], rows[1])

                if slot_mode or (cand_len >= s_pad and n_lvls == 1):
                    # Overflow impossible — lists hold every segment, or the
                    # caller certified max count <= cand_len (slot_mode) —
                    # so no cond (a traced lax.cond costs real time per
                    # wedge even on the untaken side).
                    sweep_st = _cand_branch("band" if bo else "both")
                else:
                    # Capped distance-sorted lists + exact HORIZON
                    # fallbacks: ALWAYS walk level 0 first — its nearest-
                    # <= 128 candidates resolve most rays — then walk each
                    # further LEVEL, and finally the sorted chunk walk,
                    # seeded with the merged state, only when candidates
                    # beyond what was walked so far (cnt > slots walked)
                    # could still win: every dropped/deferred segment has
                    # lb >= that boundary's horizon, so horizon >= worst
                    # means none can win — each fallback step is exact.
                    # (Round 2 sent overflowed cells straight to the chunk
                    # walk; on lady_bug 1080p that walk was ~70% of the
                    # frame.)
                    st = _cand_branch("band" if bo else "both")
                    if _ABLATE_OVERFLOW_FB:  # attribution probe
                        sweep_st = st
                    else:
                        def _worst_of(pk_s_row):
                            # worst per-ray best t of the STRICT chain,
                            # quantized UP one key step; per-ray
                            # min(best, scene-exit) BEFORE the block max
                            # (see _chunk_walk's walk_cond): rays that exit
                            # the scene cannot trigger fallbacks for hits
                            # they can't see.
                            bt_up = jax.lax.bitcast_convert_type(
                                (pk_s_row & _KEY_MASK) + np.int32(1 << ID_BITS),
                                f32,
                            )
                            if texit is not None:
                                bt_up = jnp.minimum(
                                    bt_up, texit * jnp.float32(1.00002)
                                )
                            return jnp.minimum(
                                jnp.max(bt_up) * jnp.float32(1.00001), tb_full
                            )

                        for lvl in range(1, n_lvls):
                            def _lvl_walk(st, lb_off=lvl * lvl_cap, lvl=lvl):
                                tc_scratch[...] = _transpose_block(
                                    tconsts_ref[
                                        0, pid_w, :, lb_off : lb_off + lvl_cap
                                    ]
                                )
                                # previous levels' per-ray best t (the
                                # exit chain: strict under dual, band when
                                # band-only), quantized up: the level walk
                                # exits against hits already found
                                tcap = jax.lax.bitcast_convert_type(
                                    (st[-2] & _KEY_MASK)
                                    + np.int32(1 << ID_BITS),
                                    f32,
                                )
                                pk8s = _list_walk(
                                    lb_off, tcap, "band" if bo else "both"
                                )
                                rows = [
                                    jnp.min(p8, axis=0, keepdims=True)
                                    for p8 in pk8s
                                ]
                                if sg_mode:
                                    # slot-space merge: aux records the
                                    # level (lvl is a Python constant)
                                    out = []
                                    for i, r in enumerate(rows):
                                        upd = r < st[2 * i]
                                        out.append(
                                            jnp.where(upd, r, st[2 * i])
                                        )
                                        out.append(
                                            jnp.where(upd, lvl, st[2 * i + 1])
                                        )
                                    return tuple(out)
                                pk_b, ch_b, pk_s, ch_s = remap_pair(
                                    rows[0], rows[1], lvl
                                )
                                # merge (strictly-less: equal quantized keys
                                # keep the earlier level's nearer-lb winner,
                                # matching intersect_chunk's update rule)
                                upd_b = pk_b < st[0]
                                upd_s = pk_s < st[2]
                                return (
                                    jnp.where(upd_b, pk_b, st[0]),
                                    jnp.where(upd_b, ch_b, st[1]),
                                    jnp.where(upd_s, pk_s, st[2]),
                                    jnp.where(upd_s, ch_s, st[3]),
                                )

                            need_l = (cnt > lvl * lvl_cap) & (
                                cslb_ref[0, pid_tab, (lvl * lvl_cap) >> 3]
                                < _worst_of(st[-2])
                            )
                            st = jax.lax.cond(
                                need_l, _lvl_walk, lambda s: s, st
                            )
                        if cand_len < s_pad:
                            need = (cnt > cand_len) & (
                                cslb_ref[0, pid_tab, cand_len >> 3]
                                < _worst_of(st[-2])
                            )
                            if sg_mode:
                                # deferred: the sg fallback cond also
                                # gathers its winners' geometry (defined
                                # with the gather helpers below)
                                sg_need = need
                            else:
                                st = jax.lax.cond(
                                    need, _chunk_walk, lambda s: s, st
                                )
                        sweep_st = st
            elif n_chunks == 1:
                sweep_st = intersect_chunk(0, far_state())
            elif use_chunk_lists and _bounce == 0:
                sweep_st = _chunk_walk()
            else:
                # block bounding circle over ray origins
                oxmin, oxmax = jnp.min(ox), jnp.max(ox)
                oymin, oymax = jnp.min(oy), jnp.max(oy)
                bcx = 0.5 * (oxmin + oxmax)
                bcy = 0.5 * (oymin + oymax)
                br = 0.5 * jnp.sqrt((oxmax - oxmin) ** 2 + (oymax - oymin) ** 2)
                # hit t is in ray-parameter units; portal continuation rays are
                # not unit-length (PARITY.md #11), so scale the distance bound
                # by the block's max direction magnitude to stay conservative.
                maxd = jnp.sqrt(jnp.max(dx * dx + dy * dy))

                # direction wedge (primary unit-direction rays only)
                use_wedge = _bounce == 0 and n_wedges > 1
                wedge_c = sector * (pid_w.astype(f32) * SW + 0.5 * SW)
                ccx, ccy = jnp.cos(wedge_c), jnp.sin(wedge_c)
                # static wedge half-width trig (SW < rpp => hw <= pi/2)
                hw = math.pi * SW / rpp
                cos_hw = jnp.float32(math.cos(hw))
                sin_hw = jnp.float32(math.sin(hw))

                def chunk_lb(c):
                    dcx = bounds_ref[c, 0] - bcx
                    dcy = bounds_ref[c, 1] - bcy
                    dist = jnp.sqrt(dcx * dcx + dcy * dcy)
                    lb = jnp.maximum(dist - bounds_ref[c, 2] - br, 0.0)
                    if not use_wedge:
                        return lb
                    # Angular test without inverse trig (Pallas TPU has no
                    # atan2/arcsin): the chunk subtends half-angle chw with
                    # sin(chw) = (r_chunk + r_block)/dist (saturating to 1 when
                    # the circles overlap); it intersects the wedge iff the
                    # angle between the chunk direction and the wedge center is
                    # <= hw + chw, i.e. cos(angle) >= cos(hw + chw), expanded
                    # with the addition identity.  hw, chw <= pi/2 so the sum
                    # stays on the monotone branch.
                    inv_dist = 1.0 / jnp.maximum(dist, 1e-6)
                    cos_d = (dcx * ccx + dcy * ccy) * inv_dist
                    reach = bounds_ref[c, 2] + br
                    sin_chw = jnp.clip(reach * inv_dist, 0.0, 1.0)
                    cos_chw = jnp.sqrt(jnp.maximum(1.0 - sin_chw * sin_chw, 0.0))
                    cos_lim = cos_hw * cos_chw - sin_hw * sin_chw
                    # An overlapping chunk (dist <= radii) subtends the full
                    # circle — arcsin saturation only reaches pi/2, so test
                    # overlap explicitly or chunks behind the wedge would be
                    # wrongly rejected.
                    outside = (cos_d < cos_lim) & (dist > reach)
                    return jnp.where(outside, FAR, lb)

                # warm start: seed best_t from the nearest relevant chunk so
                # the sweep culls from its first iteration
                def nearest_body(c, carry):
                    near_c, near_lb = carry
                    lb = chunk_lb(c)
                    closer = lb < near_lb
                    return jnp.where(closer, c, near_c), jnp.where(closer, lb, near_lb)

                near_c, near_lb = jax.lax.fori_loop(
                    1, n_chunks, nearest_body, (jnp.int32(0), chunk_lb(0))
                )
                sweep_st = jax.lax.cond(
                    near_lb < FAR,
                    lambda st: intersect_chunk(near_c, st),
                    lambda st: st,
                    far_state(),
                )

                def sweep_body(c, st):
                    # Per-ray best t of the STRICT chain (conservative for
                    # both chains), quantized UP one key step so culling
                    # stays exact wrt the packed (quantized-down) ordering.
                    bt_up = jax.lax.bitcast_convert_type(
                        (st[2] & _KEY_MASK) + np.int32(1 << ID_BITS), f32
                    )
                    # tb_full is FAR past bounce 0 (portal rays re-enter);
                    # maxd already scales key-space t to ray-parameter units.
                    # Per-ray min(best * maxd, scene-exit) before the max —
                    # see _chunk_walk (texit is None past bounce 0).
                    bt_up = bt_up * maxd
                    if texit is not None:
                        bt_up = jnp.minimum(bt_up, texit * jnp.float32(1.00002))
                    worst = jnp.minimum(jnp.max(bt_up), tb_full)
                    take = (chunk_lb(c) < worst) & (c != near_c)
                    return jax.lax.cond(
                        take,
                        lambda st: intersect_chunk(c, st),
                        lambda st: st,
                        st,
                    )

                sweep_st = jax.lax.fori_loop(0, n_chunks, sweep_body, sweep_st)

            # Unpack both chains: global winner ids, hit masks (i32 0/1 —
            # Mosaic cannot reshape i1 vectors, and the mask is relayouted
            # for shading).  Winners' exact t is recomputed after the gather
            # (the key quantizes t to 2^-17).
            sg_b = sg_mode and _bounce == 0
            if sg_b and bo:
                # band-only sweep (see _BAND_ONLY): no strict chain —
                # clean/graze decisions move to strict_accept on the band
                # winner's gathered geometry (below), and the rejected-ray
                # strict winners come from the deferred re-walk.
                pk_b, ch_b = sweep_st
                pk_s = ch_s = hit32_s = None
                hit32 = (pk_b < _FAR_PACKED).astype(jnp.int32)
                best_i = best_i_s = None
                clean_ray = any_graze = None
            elif sg_b:
                pk_b, ch_b, pk_s, ch_s = sweep_st
                # slot-geom mode: ch_* carry aux (level, or sg_nl + chunk
                # for walk winners); ids resolve after the deferred
                # fallback via the slot-geom table.  Clean = same key AND
                # same aux (key slot bits alone are ambiguous across
                # levels/spaces).
                hit32 = (pk_b < _FAR_PACKED).astype(jnp.int32)
                hit32_s = (pk_s < _FAR_PACKED).astype(jnp.int32)
                best_i = best_i_s = None
                clean_ray = unflat(
                    ((pk_b == pk_s) & (ch_b == ch_s)).astype(jnp.int32)
                ) > 0
                any_graze = jnp.any((pk_b != pk_s) | (ch_b != ch_s))
            else:
                pk_b, ch_b, pk_s, ch_s = sweep_st
                best_i = (pk_b & _ID_MASK) + ch_b * sc
                hit32 = (pk_b < _FAR_PACKED).astype(jnp.int32)
                best_i_s = (pk_s & _ID_MASK) + ch_s * sc
                hit32_s = (pk_s < _FAR_PACKED).astype(jnp.int32)
            if exact and not sg_b:
                # CLEAN rays: identical packed key in both chains — same
                # winner (and same quantized t), or both FAR misses.  The
                # id rides the key, so key equality == winner equality.
                clean_ray = unflat((pk_b == pk_s).astype(jnp.int32)) > 0
                any_graze = jnp.any(pk_b != pk_s)

            # --- gather the winner's shade row + geometry consts (MXU) ---
            # Near-exact f32 gather from ONE 128-row bf16 matmul: the table
            # stacks bf16 high halves over bf16 f32-residuals (2*ALLT_ROWS =
            # 128 rows — exactly one MXU M tile); with a 0/1 one-hot operand
            # every product is exact and every output column has a single
            # nonzero term, so hi + lo reconstructs the f32 row to ~2^-17
            # relative — far below the renderer's pixel-scale tolerances.
            # (A plain f32 gather needs Precision.HIGHEST = 6 MXU passes.)
            if _ABLATE_STAGE == "intersect":
                if sg_b:
                    # keys/aux live (note: the deferred sg fallback walk
                    # has not run yet — its cost lands in "gather")
                    sink = hit32 + (pk_b & _ID_MASK) + ch_b
                    if not bo:
                        sink = sink + (pk_s & _ID_MASK) + ch_s
                    return jnp.zeros((8, R), f32) + sink.astype(f32)
                return jnp.zeros((8, R), f32) + (
                    hit32 + best_i + best_i_s
                ).astype(f32)

            dims = (((1,), (0,)), ((), ()))
            # Gather chunk width — read off the table (the host picks
            # _gather_gsc_for(s_pad): wider chunks mean proportionally
            # fewer loop trips AND smaller winner spans at identical MXU
            # pass count and one-hot-build element count; batch33 measured
            # the span trips at ~48 ms of lady_bug's 406 and ~188 of
            # dolphin's 740 at gsc=128).
            gsc = allt_hl_ref.shape[2]
            n_gchunks = allt_hl_ref.shape[0]

            gsc_sh = gsc.bit_length() - 1

            def _gather_any(bi, tab_ref, m_rows, hitm=None):
                """One-hot MXU gather of the winners' rows from a chunked
                (G, m_rows, gsc) hi/lo table.  Multi-chunk spans factor the
                per-chunk one-hot as (loop-invariant low-bit one-hot) x
                (per-chunk chunk mask) — one bf16 broadcast multiply per
                chunk step instead of a fresh (gsc, R) i32 compare + select
                (_GATHER_REUSE; output-identical: a global id matches chunk
                c's local iota iff its high bits equal c).

                ``hitm`` ((1, R) bool): the chunk span walks HIT lanes only.
                Missed rays carry the FAR key's junk low bits as their
                "winner id" (a small id, i.e. chunk ~0), so one background
                ray used to stretch i_lo..i_hi across every chunk up to the
                real winners — on boundary tiles that was most of the span
                cost (batch33 gspan1: ~48 ms of lady_bug's 406).  Output-
                identical: every consumer of a missed lane's gathered row
                is hit-masked downstream, so WHICH row it gathers (junk
                row, zero row, or out-of-span no-match zeros) never reaches
                the output."""
                # (bf16 compares for the one-hot build were tried — 2-packed
                # VREGs would halve the build — but this Mosaic rejects them;
                # i32 compare + bf16 select it is.)
                ids_local = jax.lax.broadcasted_iota(jnp.int32, (gsc, R), 0)
                acc2 = jnp.zeros((m_rows, R), f32)
                if n_gchunks == 1:

                    def gather_chunk(c, acc2):
                        onehot = (ids_local == bi - c * gsc).astype(
                            jnp.bfloat16
                        )  # (gsc, R)
                        return acc2 + jax.lax.dot_general(
                            tab_ref[c], onehot, dims,
                            preferred_element_type=f32,
                        )

                    return gather_chunk(0, acc2)
                # coherent blocks hit few chunks: gather only the chunk
                # range spanned by the winning sub-segment ids (hit lanes
                # only — see the docstring; all-miss blocks clamp to one
                # in-range chunk and gather garbage that stays masked)
                if hitm is not None and _GATHER_HIT_SPAN:
                    i_lo = (
                        jnp.minimum(
                            jnp.min(jnp.where(hitm, bi, jnp.int32(1 << 30))),
                            jnp.int32(n_gchunks * gsc - 1),
                        )
                        >> gsc_sh
                    )
                    i_hi = jnp.maximum(
                        jnp.max(jnp.where(hitm, bi, 0)) >> gsc_sh, i_lo
                    )
                else:
                    i_lo = jnp.min(bi) >> gsc_sh
                    i_hi = jnp.max(bi) >> gsc_sh
                if _ABLATE_GATHER_SPAN1:  # timing-only attribution
                    i_hi = i_lo
                if _GATHER_REUSE:
                    lo_oh = (ids_local == (bi & (gsc - 1))).astype(
                        jnp.bfloat16
                    )  # (gsc, R), loop-invariant
                    bi_hi = jax.lax.shift_right_logical(bi, gsc_sh)

                    def gather_chunk(c, acc2):
                        onehot = lo_oh * (bi_hi == c).astype(jnp.bfloat16)
                        return acc2 + jax.lax.dot_general(
                            tab_ref[c], onehot, dims,
                            preferred_element_type=f32,
                        )

                elif _GATHER_OUTMASK:
                    lo_oh = (ids_local == (bi & (gsc - 1))).astype(
                        jnp.bfloat16
                    )  # (gsc, R), loop-invariant
                    bi_hi = jax.lax.shift_right_logical(bi, gsc_sh)

                    def gather_chunk(c, acc2):
                        part = jax.lax.dot_general(
                            tab_ref[c], lo_oh, dims,
                            preferred_element_type=f32,
                        )  # (m_rows, R)
                        return acc2 + part * (bi_hi == c).astype(f32)

                else:

                    def gather_chunk(c, acc2):
                        onehot = (ids_local == bi - c * gsc).astype(
                            jnp.bfloat16
                        )
                        return acc2 + jax.lax.dot_general(
                            tab_ref[c], onehot, dims,
                            preferred_element_type=f32,
                        )

                return jax.lax.fori_loop(i_lo, i_hi + 1, gather_chunk, acc2)

            def gather_global(bi, hitm=None):
                """One-hot MXU gather of the winners' compact table rows."""
                acc2 = _gather_any(bi, allt_hl_ref, 2 * gather_rows, hitm)
                return acc2[:gather_rows] + acc2[gather_rows:]

            def gather_geom(bi, hitm=None):
                """Phase-1 one-hot MXU gather of the winners' GEOM_ROWS
                geometry rows only (two_phase)."""
                acc2 = _gather_any(bi, geom_hl_ref, 2 * GEOM_ROWS, hitm)
                return acc2[:GEOM_ROWS] + acc2[GEOM_ROWS:]

            if use_cand and slot_mode and _bounce == 0:
                # Slot-space gather: the winner's compact shade rows come
                # from THIS wedge's candidate slot table, so the one-hot is
                # gather_len rows (the certified max cell count, rounded to
                # 16) instead of 128 global ids — the one-hot build was the
                # single largest cost of the round-2 frame.  The BlockSpec
                # already narrowed the table's lane dim to gather_len (an
                # in-kernel sub-128 lane slice miscompiles on this Mosaic).
                tsh = tshade_ref[0, pid_tab]  # (2*G8, gather_len) bf16

                def gather(bi, hitm=None):  # slot-space: no chunk span
                    ids_local = jax.lax.broadcasted_iota(
                        jnp.int32, (gather_len, R), 0
                    )
                    onehot = (ids_local == bi).astype(jnp.bfloat16)
                    acc2 = jax.lax.dot_general(
                        tsh, onehot, dims, preferred_element_type=f32
                    )
                    return acc2[:gather_rows] + acc2[gather_rows:]
            else:
                gather = gather_global

            def winner_rows(bi, hitv, want_band=False):
                """Hoisted per-winner-chain work: the one-hot MXU gather,
                compact-row extraction (sublane relayouts) and the exact
                chord recompute (the chunk loop ordered by an approximate
                reciprocal).  Everything a per-wedge lax.cond branch should
                not contain stays here; the Newton / root-isolation
                arithmetic consuming it can then sit inside a branch.
                ``hitv`` guards Newton's t fallback input and narrows the
                multi-chunk gather span to hit lanes (_GATHER_HIT_SPAN)."""
                acc = gather(bi, flat(hitv.astype(jnp.int32)) > 0)

                def ga(row):
                    if rmap is not None:
                        row = rmap[row]
                    return unflat(acc[row : row + 1, :])

                gex = ga(dev.SHADE_COLS + dev.CONST_EX)
                gey = ga(dev.SHADE_COLS + dev.CONST_EY)
                gc1 = ga(dev.SHADE_COLS + dev.CONST_C1)
                gp0x = ga(dev.SHADE_COLS + dev.CONST_P0X)
                gp0y = ga(dev.SHADE_COLS + dev.CONST_P0Y)
                gdenom = dx * gey - dy * gex
                ginv = jnp.where(gdenom == 0.0, 0.0, 1.0 / gdenom)
                gnum_t = gc1 - ox * gey + oy * gex
                gnum_s = dy * gp0x - dx * gp0y + (oy * dx - ox * dy)
                s_chord = jnp.clip(gnum_s * ginv, 0.0, 1.0)
                gt0 = ga(dev.ALLT_T0)
                gdt = ga(dev.ALLT_DT)
                return {
                    "acc": acc,
                    "gex": gex,
                    "gey": gey,
                    "gdenom": gdenom,
                    "gnum_t": gnum_t,
                    "gnum_s": gnum_s,
                    "t_chord": jnp.where(hitv, gnum_t * ginv, 1.0),
                    "gt0": gt0,
                    "gdt": gdt,
                    "cx": tuple(
                        ga(dev.ALLT_SRC_CTRL + 2 * i) for i in range(4)
                    ),
                    "cy": tuple(
                        ga(dev.ALLT_SRC_CTRL + 2 * i + 1) for i in range(4)
                    ),
                    "tau0": gt0 + s_chord * gdt,
                    "band": ga(dev.ALLT_BAND) if want_band else None,
                }

            def newton(rw):
                # Newton-refine onto the exact cubic (ops/refine.py): kills
                # flattening facets under zoom and gives the exact normal.
                return refine.refine_hit(
                    rw["cx"], rw["cy"], rw["tau0"], ox, oy, dx, dy,
                    rw["t_chord"], min_hit,
                )

            def winner_geom(bi, hitv):
                """Phase-1 winner rows from the GEOM_ROWS-row geometry
                table (two_phase): same derived quantities as winner_rows,
                bit-identical values (the subset table carries the same
                hi/lo bf16 splits), no shade rows."""
                geo = gather_geom(bi, flat(hitv.astype(jnp.int32)) > 0)

                def ga(i):
                    return unflat(geo[i : i + 1, :])

                gex, gey, gc1 = ga(0), ga(1), ga(2)
                gp0x, gp0y = ga(3), ga(4)
                gdenom = dx * gey - dy * gex
                ginv = jnp.where(gdenom == 0.0, 0.0, 1.0 / gdenom)
                gnum_t = gc1 - ox * gey + oy * gex
                gnum_s = dy * gp0x - dx * gp0y + (oy * dx - ox * dy)
                s_chord = jnp.clip(gnum_s * ginv, 0.0, 1.0)
                gt0, gdt = ga(13), ga(14)
                return {
                    "gex": gex,
                    "gey": gey,
                    "gdenom": gdenom,
                    "gnum_t": gnum_t,
                    "gnum_s": gnum_s,
                    "t_chord": jnp.where(hitv, gnum_t * ginv, 1.0),
                    "gt0": gt0,
                    "gdt": gdt,
                    "cx": tuple(ga(5 + 2 * i) for i in range(4)),
                    "cy": tuple(ga(6 + 2 * i) for i in range(4)),
                    "tau0": gt0 + s_chord * gdt,
                    "band": ga(15),
                }

            def band_margin(rw):
                # Window margin = the parameter reach of the capsule band
                # around this chord (see refine_hit_exact): adjacent-window
                # ordering ties then resolve to the same crossing in both
                # backends.
                chord = jnp.sqrt(rw["gex"] * rw["gex"] + rw["gey"] * rw["gey"])
                return jnp.clip(
                    refine.MARGIN_SCALE * rw["band"] * rw["gdt"]
                    / jnp.maximum(chord, 1e-9),
                    0.0,
                    1.0,
                )

            def strict_accept(rw):
                # The band winner also passes the STRICT window test.
                return (
                    rw["gnum_s"] * (rw["gdenom"] - rw["gnum_s"]) >= 0.0
                ) & (
                    (rw["gnum_t"] - min_hit * rw["gdenom"]) * rw["gdenom"]
                    > 0.0
                )

            def eval_winner(bi, hitv, fb=False):
                """Gather + exact chord recompute + Newton for one winner
                chain.  Returns (acc, tau, t_ref, dbx, dby, conv, strict,
                t_chord, gt0, gdt).  ``fb``: this is the strict-fallback
                chain — its winners carry a guaranteed in-window crossing
                (chord endpoints lie on the curve), so the cheap Newton
                refine replaces root isolation (same rule as the JAX path,
                ops/intersect.py)."""
                legacy = fb or _EXACT_ABLATE == "legacy_refine"
                rw = winner_rows(bi, hitv, want_band=exact and not legacy)
                acc = rw["acc"]
                t_chord, gt0, gdt = rw["t_chord"], rw["gt0"], rw["gdt"]
                cx, cy, tau0 = rw["cx"], rw["cy"], rw["tau0"]
                gnum_s, gnum_t, gdenom = (
                    rw["gnum_s"], rw["gnum_t"], rw["gdenom"],
                )
                if exact and legacy:
                    tau, t_ref, _, _, dbx, dby = newton(rw)
                    ones_b = jnp.ones(RSHP, jnp.bool_)
                    conv = strict = ones_b
                elif exact:
                    # Per-ray CLEAN rule (mirrors ops/intersect.py): a ray
                    # whose band winner IS the strict winner holds a
                    # guaranteed crossing — the cheap Newton refine decides
                    # it; root isolation is reserved for band-only winners
                    # (grazes).  Wedge blocks with NO band-only winner skip
                    # isolation entirely (one cond per wedge; on arch the
                    # large majority of non-empty wedges are all-clean).
                    # The cheap refine, the margin and every gather/relayout
                    # are hoisted OUT of the cond: its branches are pure
                    # refine arithmetic (gathers/relayouts inside a traced
                    # branch crash this Mosaic).
                    tau_n, t_n, _, _, dbx_n, dby_n = newton(rw)
                    margin = band_margin(rw)

                    def _iso():
                        tau_i, t_i, _, _, dbx_i, dby_i, conv_i = (
                            refine.refine_hit_exact(
                                cx, cy, tau0, gt0, gdt, ox, oy, dx, dy,
                                t_chord, min_hit, margin=margin,
                            )
                        )
                        return (
                            jnp.where(clean_ray, tau_n, tau_i),
                            jnp.where(clean_ray, t_n, t_i),
                            jnp.where(clean_ray, dbx_n, dbx_i),
                            jnp.where(clean_ray, dby_n, dby_i),
                            (clean_ray | conv_i).astype(jnp.int32),
                        )

                    def _cheap():
                        return (
                            tau_n, t_n, dbx_n, dby_n,
                            jnp.ones(RSHP, jnp.int32),
                        )

                    if _EXACT_ABLATE == "iso_nocond":
                        # EXACT-OUTPUT variant: isolation always runs and
                        # the per-ray clean selects pick the cheap result —
                        # probes whether the per-wedge cond's fixed Mosaic
                        # cost exceeds the always-on isolation arithmetic.
                        tau, t_ref, dbx, dby, conv32 = _iso()
                    else:
                        tau, t_ref, dbx, dby, conv32 = jax.lax.cond(
                            any_graze, _iso, _cheap
                        )
                    conv = conv32 > 0
                    strict = (gnum_s * (gdenom - gnum_s) >= 0.0) & (
                        (gnum_t - min_hit * gdenom) * gdenom > 0.0
                    )
                else:
                    tau, t_ref, _, _, dbx, dby = refine.refine_hit(
                        cx, cy, tau0, ox, oy, dx, dy, t_chord, min_hit
                    )
                    conv = strict = None
                return (acc, tau, t_ref, dbx, dby, conv, strict, t_chord,
                        gt0, gdt)

            hit = unflat(hit32) > 0
            fused = (
                exact
                and _EXACT_ABLATE is None
                and use_cand
                and slot_mode
                and _bounce == 0
            )
            if sg_b:
                # --- slot-geom tail (see _SLOTGEOM) ---
                # 1) deferred overflow fallback: the sorted chunk walk runs
                #    under its horizon cond, and the SAME cond branch
                #    gathers its winners' phase-1 geometry from the global
                #    geom table (walk ids are directly (local | chunk) —
                #    no remap; gathers inside conds are Mosaic-safe on the
                #    paths batch24's p1c probe exercised).
                if sg_need is not None and bo:

                    def _walk_geo(st):
                        st2 = _chunk_walk(st, chains="band")
                        wb_w = st2[1] >= sg_nl
                        bi_w = (st2[0] & _ID_MASK) + (st2[1] - sg_nl) * sc
                        hm = wb_w & (st2[0] < _FAR_PACKED)
                        return st2 + (gather_geom(bi_w, hm),)

                    def _no_walk(st):
                        return st + (jnp.zeros((GEOM_ROWS, R), f32),)

                    pk_b, ch_b, geo_walk = jax.lax.cond(
                        sg_need, _walk_geo, _no_walk, (pk_b, ch_b)
                    )
                    # the walk may have replaced winners: refresh
                    hit32 = (pk_b < _FAR_PACKED).astype(jnp.int32)
                    hit = unflat(hit32) > 0
                    wb = ch_b >= sg_nl  # (1, R) band walk-winner lanes
                elif sg_need is not None:

                    def _walk_geo(st):
                        st2 = _chunk_walk(st)
                        wb_w = st2[1] >= sg_nl
                        bi_w = (st2[0] & _ID_MASK) + (st2[1] - sg_nl) * sc
                        hm = wb_w & (st2[0] < _FAR_PACKED)
                        return st2 + (gather_geom(bi_w, hm),)

                    def _no_walk(st):
                        return st + (jnp.zeros((GEOM_ROWS, R), f32),)

                    pk_b, ch_b, pk_s, ch_s, geo_walk = jax.lax.cond(
                        sg_need, _walk_geo, _no_walk,
                        (pk_b, ch_b, pk_s, ch_s),
                    )
                    # the walk may have replaced winners: refresh
                    hit32 = (pk_b < _FAR_PACKED).astype(jnp.int32)
                    hit32_s = (pk_s < _FAR_PACKED).astype(jnp.int32)
                    hit = unflat(hit32) > 0
                    clean_ray = unflat(
                        ((pk_b == pk_s) & (ch_b == ch_s)).astype(jnp.int32)
                    ) > 0
                    any_graze = jnp.any((pk_b != pk_s) | (ch_b != ch_s))
                    wb = ch_b >= sg_nl  # (1, R) band walk-winner lanes
                hit_s = None if bo else unflat(hit32_s) > 0

                # 2) slot-space phase 1: ONE fixed-K MXU pass gathers the
                #    geometry rows AND the winner's global id (hi/lo rows
                #    of the same table).  Walk lanes point one past the
                #    table (no one-hot match -> zero rows) and take the
                #    cond-gathered geometry instead.
                slotp = ch_b * lvl_cap + (pk_b & _ID_MASK)
                if sg_need is not None:
                    slotp = jnp.where(wb, jnp.int32(cand_len), slotp)
                ids_cl = jax.lax.broadcasted_iota(
                    jnp.int32, (cand_len, R), 0
                )
                sgt = sgeom_ref[0, pid_tab]  # (2*SG_ROWS, cand_len) bf16
                if _SG_LEVEL_SPLIT and cand_len > lvl_cap:
                    # level-split dot (see _SG_LEVEL_SPLIT): level-0 slots
                    # always, the level-1+ remainder under a cond.
                    oh0 = (
                        jax.lax.broadcasted_iota(jnp.int32, (lvl_cap, R), 0)
                        == slotp
                    ).astype(jnp.bfloat16)
                    acc2 = jax.lax.dot_general(
                        sgt[:, :lvl_cap], oh0, dims,
                        preferred_element_type=f32,
                    )
                    any_hi = jnp.any(
                        (slotp >= lvl_cap) & (slotp < cand_len)
                    )

                    def _hi_dot(a):
                        ohh = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (cand_len - lvl_cap, R), 0
                            )
                            + lvl_cap
                            == slotp
                        ).astype(jnp.bfloat16)
                        return a + jax.lax.dot_general(
                            sgt[:, lvl_cap:], ohh, dims,
                            preferred_element_type=f32,
                        )

                    acc2 = jax.lax.cond(any_hi, _hi_dot, lambda a: a, acc2)
                else:
                    oh_b = (ids_cl == slotp).astype(jnp.bfloat16)
                    acc2 = jax.lax.dot_general(
                        sgt, oh_b, dims, preferred_element_type=f32
                    )
                geo = acc2[:SG_ROWS] + acc2[SG_ROWS:]  # hi+lo fold
                gid_tab = (
                    geo[GEOM_ROWS : GEOM_ROWS + 1] * 128.0
                    + geo[GEOM_ROWS + 1 : GEOM_ROWS + 2]
                ).astype(jnp.int32)
                geo16 = geo[:GEOM_ROWS]
                best_i = gid_tab
                if sg_need is not None:
                    best_i = jnp.where(
                        wb, (pk_b & _ID_MASK) + (ch_b - sg_nl) * sc, best_i
                    )
                    geo16 = jnp.where(wb, geo_walk, geo16)

                # phase-1 derived quantities — bit-identical to
                # winner_geom's (the slot table carries the same hi/lo
                # bf16 splits as the global geom table)
                def ga_g(i):
                    return unflat(geo16[i : i + 1, :])

                gexg, geyg, gc1g = ga_g(0), ga_g(1), ga_g(2)
                gp0xg, gp0yg = ga_g(3), ga_g(4)
                gdenomg = dx * geyg - dy * gexg
                ginvg = jnp.where(gdenomg == 0.0, 0.0, 1.0 / gdenomg)
                gnum_tg = gc1g - ox * geyg + oy * gexg
                gnum_sg = dy * gp0xg - dx * gp0yg + (oy * dx - ox * dy)
                s_chordg = jnp.clip(gnum_sg * ginvg, 0.0, 1.0)
                gt0g, gdtg = ga_g(13), ga_g(14)
                rwg = {
                    "gex": gexg,
                    "gey": geyg,
                    "gdenom": gdenomg,
                    "gnum_t": gnum_tg,
                    "gnum_s": gnum_sg,
                    "t_chord": jnp.where(hit, gnum_tg * ginvg, 1.0),
                    "gt0": gt0g,
                    "gdt": gdtg,
                    "cx": tuple(ga_g(5 + 2 * i) for i in range(4)),
                    "cy": tuple(ga_g(6 + 2 * i) for i in range(4)),
                    "tau0": gt0g + s_chordg * gdtg,
                    "band": ga_g(15),
                }
                margin = band_margin(rwg)
                strict = strict_accept(rwg)

                if bo:
                    # --- band-only decisions (see _BAND_ONLY) ---
                    # Clean = the band winner passes the strict window
                    # test on its gathered geometry (implies it IS the
                    # strict winner); graze wedges run isolation AND, for
                    # lanes it rejects, a strict-only re-walk — both under
                    # the same per-wedge cond.
                    clean_ray = strict | ~hit
                    any_graze = jnp.any(hit & ~strict)

                    def _iso_sg_bo():
                        tau_i, t_i, _, _, dbx_i, dby_i, conv_i = (
                            refine.refine_hit_exact(
                                rwg["cx"], rwg["cy"], rwg["tau0"],
                                rwg["gt0"], rwg["gdt"], ox, oy, dx, dy,
                                rwg["t_chord"], min_hit, margin=margin,
                            )
                        )
                        rej = hit & ~(strict | conv_i)
                        any_rej = jnp.any(rej)

                        def _rewalk(_):
                            # strict-only re-walk of the lists: settled
                            # (non-rejected) lanes are seeded at key 0 and
                            # capped at t=0, so every early exit serves
                            # only the rejected lanes' needs.
                            rejf = flat(rej.astype(jnp.int32)) > 0
                            tcap_r = jnp.where(rejf, FAR, jnp.float32(0.0))

                            def _worst_s(pk_row):
                                bt = jax.lax.bitcast_convert_type(
                                    (pk_row & _KEY_MASK)
                                    + np.int32(1 << ID_BITS), f32,
                                )
                                bt = jnp.minimum(bt, tcap_r)
                                if texit is not None:
                                    bt = jnp.minimum(
                                        bt, texit * jnp.float32(1.00002)
                                    )
                                return jnp.minimum(
                                    jnp.max(bt) * jnp.float32(1.00001),
                                    tb_full,
                                )

                            tc_scratch[...] = _transpose_block(
                                tconsts_ref[0, pid_tab, :, :lvl_cap]
                            )
                            pk8r = _list_walk(0, tcap_r, "strict")
                            pk0 = jnp.min(pk8r[0], axis=0, keepdims=True)
                            zero = jnp.zeros((1, R), jnp.int32)
                            st = (
                                jnp.where(rejf, pk0, jnp.int32(0)), zero
                            )
                            for lvl in range(1, n_lvls):
                                def _lvl_s(st, lb_off=lvl * lvl_cap,
                                           lvl=lvl):
                                    tc_scratch[...] = _transpose_block(
                                        tconsts_ref[
                                            0, pid_w, :,
                                            lb_off : lb_off + lvl_cap,
                                        ]
                                    )
                                    tcap2 = jnp.minimum(
                                        jax.lax.bitcast_convert_type(
                                            (st[0] & _KEY_MASK)
                                            + np.int32(1 << ID_BITS), f32,
                                        ),
                                        tcap_r,
                                    )
                                    pk8l = _list_walk(
                                        lb_off, tcap2, "strict"
                                    )
                                    pkl = jnp.min(
                                        pk8l[0], axis=0, keepdims=True
                                    )
                                    upd = pkl < st[0]
                                    return (
                                        jnp.where(upd, pkl, st[0]),
                                        jnp.where(upd, lvl, st[1]),
                                    )

                                need_l = (cnt > lvl * lvl_cap) & (
                                    cslb_ref[0, pid_tab, (lvl * lvl_cap) >> 3]
                                    < _worst_s(st[0])
                                )
                                st = jax.lax.cond(
                                    need_l, _lvl_s, lambda s: s, st
                                )
                            if cand_len < s_pad:
                                need_c = (cnt > cand_len) & (
                                    cslb_ref[0, pid_tab, cand_len >> 3]
                                    < _worst_s(st[0])
                                )
                                st = jax.lax.cond(
                                    need_c,
                                    lambda s: _chunk_walk(
                                        s, chains="strict"
                                    ),
                                    lambda s: s, st,
                                )
                            # resolve ids: slot winners via the table's id
                            # rows (M=2 dot), walk winners directly
                            wb_s = st[1] >= sg_nl
                            slotp_s = st[1] * lvl_cap + (st[0] & _ID_MASK)
                            if cand_len < s_pad:
                                slotp_s = jnp.where(
                                    wb_s, jnp.int32(cand_len), slotp_s
                                )
                            oh_s = (ids_cl == slotp_s).astype(jnp.bfloat16)
                            two = jax.lax.dot_general(
                                sgeom_ref[
                                    0, pid_w, GEOM_ROWS : GEOM_ROWS + 2
                                ],
                                oh_s, dims, preferred_element_type=f32,
                            )
                            gid_s = (
                                two[0:1] * 128.0 + two[1:2]
                            ).astype(jnp.int32)
                            bi_s = jnp.where(
                                wb_s,
                                (st[0] & _ID_MASK) + (st[1] - sg_nl) * sc,
                                gid_s,
                            )
                            hs32 = (
                                (st[0] < _FAR_PACKED)
                                & flat(rej.astype(jnp.int32)) > 0
                            ).astype(jnp.int32)
                            return bi_s, hs32

                        def _no_rewalk(_):
                            zero = jnp.zeros((1, R), jnp.int32)
                            return zero, zero

                        bi_s, hs32 = jax.lax.cond(
                            any_rej, _rewalk, _no_rewalk, 0
                        )
                        return (
                            tau_i, t_i, dbx_i, dby_i, bi_s, hs32,
                            rej.astype(jnp.int32),
                        )

                    def _allclean_bo():
                        z = jnp.zeros(RSHP, f32)
                        zero = jnp.zeros((1, R), jnp.int32)
                        return (
                            z, z, z, z, zero, zero,
                            jnp.zeros(RSHP, jnp.int32),
                        )

                    (tau_i, t_i, dbx_i, dby_i, best_i_s, hs32f,
                     rej32) = jax.lax.cond(
                        any_graze, _iso_sg_bo, _allclean_bo
                    )
                    rejected = rej32 > 0
                    hit_pre = hit
                    use_s = rejected & (unflat(hs32f) > 0)
                    hit = (hit & ~rejected) | use_s
                    use_f = flat(use_s.astype(jnp.int32)) > 0
                    bi_f = jnp.where(use_f, best_i_s, best_i)
                    hitv2 = use_s | hit_pre
                    rw = winner_rows(bi_f, hitv2)
                    acc = rw["acc"]
                    tau_n, t_n, _, _, dbx_n, dby_n = newton(rw)
                    sel = clean_ray | use_s
                    tau = jnp.where(sel, tau_n, tau_i)
                    t_ref = jnp.where(sel, t_n, t_i)
                    dbx = jnp.where(sel, dbx_n, dbx_i)
                    dby = jnp.where(sel, dby_n, dby_i)
                    t_chord, gt0, gdt = (
                        rw["t_chord"], rw["gt0"], rw["gdt"]
                    )
                else:
                    def _iso_sg():
                        tau_i, t_i, _, _, dbx_i, dby_i, conv_i = (
                            refine.refine_hit_exact(
                                rwg["cx"], rwg["cy"], rwg["tau0"],
                                rwg["gt0"], rwg["gdt"], ox, oy, dx, dy,
                                rwg["t_chord"], min_hit, margin=margin,
                            )
                        )
                        # strict winner's global id from the slot table's id
                        # rows — needed only for rejected->fallback lanes,
                        # which exist only in graze wedges, so the M=2 dot
                        # (pads to one MXU tile) rides this cond
                        slotp_s = ch_s * lvl_cap + (pk_s & _ID_MASK)
                        if sg_need is not None:
                            slotp_s = jnp.where(
                                ch_s >= sg_nl, jnp.int32(cand_len), slotp_s
                            )
                        oh_s = (ids_cl == slotp_s).astype(jnp.bfloat16)
                        two = jax.lax.dot_general(
                            sgeom_ref[0, pid_tab, GEOM_ROWS : GEOM_ROWS + 2],
                            oh_s, dims, preferred_element_type=f32,
                        )
                        gid_s = (two[0:1] * 128.0 + two[1:2]).astype(jnp.int32)
                        return (
                            tau_i, t_i, dbx_i, dby_i,
                            (clean_ray | conv_i).astype(jnp.int32), gid_s,
                        )

                    def _allclean_sg():
                        z = jnp.zeros(RSHP, f32)
                        return (
                            z, z, z, z, jnp.ones(RSHP, jnp.int32),
                            jnp.zeros((1, R), jnp.int32),
                        )

                    tau_i, t_i, dbx_i, dby_i, conv32, gid_s_tab = jax.lax.cond(
                        any_graze, _iso_sg, _allclean_sg
                    )
                    rejected = hit & ~((conv32 > 0) | strict)
                    hit_pre = hit
                    use_s = rejected & hit_s
                    hit = (hit & ~rejected) | use_s
                    use_f = flat(use_s.astype(jnp.int32)) > 0
                    best_i_s = gid_s_tab
                    if sg_need is not None:
                        best_i_s = jnp.where(
                            ch_s >= sg_nl,
                            (pk_s & _ID_MASK) + (ch_s - sg_nl) * sc,
                            best_i_s,
                        )
                    bi_f = jnp.where(use_f, best_i_s, best_i)
                    hitv2 = use_s | hit_pre
                    rw = winner_rows(bi_f, hitv2)
                    acc = rw["acc"]
                    tau_n, t_n, _, _, dbx_n, dby_n = newton(rw)
                    sel = clean_ray | use_s
                    tau = jnp.where(sel, tau_n, tau_i)
                    t_ref = jnp.where(sel, t_n, t_i)
                    dbx = jnp.where(sel, dbx_n, dbx_i)
                    dby = jnp.where(sel, dby_n, dby_i)
                    t_chord, gt0, gdt = rw["t_chord"], rw["gt0"], rw["gdt"]
            elif fused:
                # --- fused graze cond (slot-mode scenes) ---
                # Root isolation AND the strict-fallback chain can only
                # change the output when some ray in the wedge grazes
                # (band key != strict key): all-clean wedges have conv
                # identically true, so no ray is ever rejected.  ONE
                # per-wedge cond therefore covers both; clean wedges (the
                # large majority on arch) pay only the cheap Newton and
                # the two hoisted slot gathers.  Round 2 ran the strict
                # chain unconditionally here (a separate use_s cond
                # measured slower than always-evaluating); fusing it with
                # the isolation cond removes its Newton+merge from clean
                # wedges without adding a cond.  Gathers and relayouts
                # stay OUTSIDE the cond; the branches are pure
                # refine/merge arithmetic.  Output-identical to the
                # split path (parity-pinned, tests/test_pallas.py).
                hit_s = unflat(hit32_s) > 0
                rw_b = winner_rows(best_i, hit, want_band=True)
                rw_s = winner_rows(best_i_s, hit_s)
                tau_n, t_n, _, _, dbx_n, dby_n = newton(rw_b)
                hit_i32 = hit.astype(jnp.int32)

                def _clean():
                    return (
                        rw_b["acc"], tau_n, t_n, dbx_n, dby_n, hit_i32,
                        rw_b["t_chord"], rw_b["gt0"], rw_b["gdt"],
                    )

                def _graze():
                    tau_i, t_i, _, _, dbx_i, dby_i, conv_i = (
                        refine.refine_hit_exact(
                            rw_b["cx"], rw_b["cy"], rw_b["tau0"],
                            rw_b["gt0"], rw_b["gdt"], ox, oy, dx, dy,
                            rw_b["t_chord"], min_hit,
                            margin=band_margin(rw_b),
                        )
                    )
                    tau_b = jnp.where(clean_ray, tau_n, tau_i)
                    t_b = jnp.where(clean_ray, t_n, t_i)
                    dbx_b = jnp.where(clean_ray, dbx_n, dbx_i)
                    dby_b = jnp.where(clean_ray, dby_n, dby_i)
                    conv = clean_ray | conv_i
                    rejected = hit & ~(conv | strict_accept(rw_b))
                    use_s = rejected & hit_s
                    hit_new = (hit & ~rejected) | use_s
                    use_f = flat(use_s.astype(jnp.int32)) > 0
                    tau_s, t_s, _, _, dbx_s, dby_s = newton(rw_s)

                    def mrg(s, b):
                        return jnp.where(use_s, s, b)

                    return (
                        jnp.where(use_f, rw_s["acc"], rw_b["acc"]),
                        mrg(tau_s, tau_b),
                        mrg(t_s, t_b),
                        mrg(dbx_s, dbx_b),
                        mrg(dby_s, dby_b),
                        hit_new.astype(jnp.int32),
                        mrg(rw_s["t_chord"], rw_b["t_chord"]),
                        mrg(rw_s["gt0"], rw_b["gt0"]),
                        mrg(rw_s["gdt"], rw_b["gdt"]),
                    )

                acc, tau, t_ref, dbx, dby, hit_m, t_chord, gt0, gdt = (
                    jax.lax.cond(any_graze, _graze, _clean)
                )
                hit = hit_m > 0
            elif exact and two_phase:
                # --- two-phase final-winner gather (global-gather path) ---
                # Phase 1: GEOM_ROWS-row gather at the BAND winner feeds the
                # strict test and root isolation (under the any_graze cond —
                # pure arithmetic, no gathers in the traced branches).  The
                # rejection decision then picks each ray's FINAL winner id,
                # and phase 2 gathers the full shade+consts row once at it.
                # Replaces the split path's per-wedge fallback cond + second
                # full gather (see _TWO_PHASE).  Output-identical.
                hit_s = unflat(hit32_s) > 0
                if _PHASE1_COND:
                    # probe variant: the WHOLE phase-1 block (gather incl.)
                    # under the graze cond — all-clean wedges skip it all
                    def _graze1():
                        rwg = winner_geom(best_i, hit)
                        tau_i, t_i, _, _, dbx_i, dby_i, conv_i = (
                            refine.refine_hit_exact(
                                rwg["cx"], rwg["cy"], rwg["tau0"],
                                rwg["gt0"], rwg["gdt"], ox, oy, dx, dy,
                                rwg["t_chord"], min_hit,
                                margin=band_margin(rwg),
                            )
                        )
                        conv = clean_ray | conv_i
                        rej = hit & ~(conv | strict_accept(rwg))
                        return tau_i, t_i, dbx_i, dby_i, rej.astype(jnp.int32)

                    def _clean1():
                        z = jnp.zeros(RSHP, f32)
                        return z, z, z, z, jnp.zeros(RSHP, jnp.int32)

                    tau_i, t_i, dbx_i, dby_i, rej32 = jax.lax.cond(
                        any_graze, _graze1, _clean1
                    )
                    rejected = rej32 > 0
                else:
                    rwg = winner_geom(best_i, hit)
                    margin = band_margin(rwg)
                    strict = strict_accept(rwg)

                    def _iso2():
                        tau_i, t_i, _, _, dbx_i, dby_i, conv_i = (
                            refine.refine_hit_exact(
                                rwg["cx"], rwg["cy"], rwg["tau0"],
                                rwg["gt0"], rwg["gdt"], ox, oy, dx, dy,
                                rwg["t_chord"], min_hit, margin=margin,
                            )
                        )
                        return (
                            tau_i, t_i, dbx_i, dby_i,
                            (clean_ray | conv_i).astype(jnp.int32),
                        )

                    def _allclean():
                        z = jnp.zeros(RSHP, f32)
                        # all-clean wedge: conv identically true, and the iso
                        # outputs are never selected (sel covers every ray)
                        return z, z, z, z, jnp.ones(RSHP, jnp.int32)

                    tau_i, t_i, dbx_i, dby_i, conv32 = jax.lax.cond(
                        any_graze, _iso2, _allclean
                    )
                    rejected = hit & ~((conv32 > 0) | strict)
                hit_pre = hit
                use_s = rejected & hit_s
                hit = (hit & ~rejected) | use_s
                use_f = flat(use_s.astype(jnp.int32)) > 0
                bi_f = jnp.where(use_f, best_i_s, best_i)
                # band rays (incl. rejected-to-miss) keep the band chord t;
                # fallback rays take the strict chain's (true on use_s, so
                # the select is a pure OR — Mosaic-safe, no i1 where)
                hitv2 = use_s | hit_pre
                rw = winner_rows(bi_f, hitv2)
                acc = rw["acc"]
                tau_n, t_n, _, _, dbx_n, dby_n = newton(rw)
                # clean rays: phase-2 newton == phase-1 newton bit-for-bit
                # (same row values); fallback rays: the cheap refine is the
                # strict-chain rule (guaranteed crossing); graze-accepted
                # rays keep the isolation result.
                sel = clean_ray | use_s
                tau = jnp.where(sel, tau_n, tau_i)
                t_ref = jnp.where(sel, t_n, t_i)
                dbx = jnp.where(sel, dbx_n, dbx_i)
                dby = jnp.where(sel, dby_n, dby_i)
                t_chord, gt0, gdt = rw["t_chord"], rw["gt0"], rw["gdt"]
            elif not exact:
                ev = eval_winner(best_i, hit)
                acc, tau, t_ref, dbx, dby, t_chord, gt0, gdt = (
                    (ev[0],) + ev[1:5] + ev[7:]
                )
            elif _EXACT_ABLATE in ("legacy_refine", "no_fallback"):
                ev = eval_winner(best_i, hit)
                rejected = hit & ~(ev[5] | ev[6])
                hit = hit & ~rejected
                acc, tau, t_ref, dbx, dby, t_chord, gt0, gdt = (
                    (ev[0],) + ev[1:5] + ev[7:]
                )
            else:
                # Split path (global-gather scenes and the fb_nocond /
                # iso_nocond probes).  A strict chord hit is a guaranteed
                # crossing (chord endpoints lie on the curve: s in (0,1)
                # means F changes sign across the window); band-only
                # candidates need Newton's residual to converge on one.
                # Rays whose band winner is rejected fall back to the
                # STRICT winner — the block pays the second gather only
                # when some ray needs it (same decision rule as the JAX
                # path, ops/intersect.py).
                ev = eval_winner(best_i, hit)
                rejected = hit & ~(ev[5] | ev[6])
                hit_s = unflat(hit32_s) > 0
                use_s = rejected & hit_s
                hit = (hit & ~rejected) | use_s
                use_f = flat(use_s.astype(jnp.int32)) > 0  # (1, R) for acc

                def _with_fallback():
                    ev_s = eval_winner(best_i_s, hit_s, fb=True)
                    acc_m = jnp.where(use_f, ev_s[0], ev[0])
                    rest = tuple(
                        jnp.where(use_s, s, b)
                        for s, b in zip(ev_s[1:5], ev[1:5])
                    )
                    tail = tuple(
                        jnp.where(use_s, s, b)
                        for s, b in zip(ev_s[7:], ev[7:])
                    )
                    return (acc_m,) + rest + tail

                def _no_fallback():
                    return (ev[0],) + ev[1:5] + ev[7:]

                # Cond structure (measured, arch 1024^2): the per-wedge
                # fallback lax.cond costs MORE than always evaluating the
                # strict chain when the gather is the cheap slot one-hot
                # (36.8 vs 38.8 ms) — so slot-mode wedges always evaluate
                # it; global-gather scenes (128-row one-hot chains) keep
                # the cond.  Both are output-identical.
                fb_always = (
                    use_cand and slot_mode and _bounce == 0
                ) or _EXACT_ABLATE == "fb_nocond"
                if fb_always:
                    acc, tau, t_ref, dbx, dby, t_chord, gt0, gdt = (
                        _with_fallback()
                    )
                else:
                    acc, tau, t_ref, dbx, dby, t_chord, gt0, gdt = (
                        jax.lax.cond(
                            jnp.any(use_s), _with_fallback, _no_fallback
                        )
                    )
            if _ABLATE_STAGE == "gather":
                return jnp.zeros((8, R), f32) + acc[:8]

            # Shading runs in the (8, RL) ray layout (full VPU sublane
            # utilization — the (1, R) shading of round 1 cost ~70 ms of the
            # headline frame); each consumed row of acc is relayouted once.
            # ``rmap`` translates shade_all_t row ids to the compact gather
            # table (only the rows this scene's shading actually reads are
            # gathered — the MXU gather cost is proportional to the row count).
            def g(row):
                if rmap is not None:
                    row = rmap[row]
                return unflat(acc[row : row + 1, :])

            t_hit = jnp.where(hit, t_ref, t_chord)
            s_hit = jnp.clip((tau - gt0) / jnp.where(gdt == 0.0, 1.0, gdt), 0.0, 1.0)

            def lerp(c0, c1_):
                a = g(c0)
                b = g(c1_)
                return a + (b - a) * s_hit

            # Side test (isRayRight, DeviceCode.cu:78-83): normal = (dy, -dx) of
            # the exact curve derivative, flipped by the diffusion-save
            # convention.
            nx, ny = dby, -dbx
            ndotd = nx * dx + ny * dy
            if config.diffusion_curve_save:
                is_right = ndotd > 0.0
            else:
                is_right = ndotd <= 0.0

            col_r = jnp.where(
                is_right, lerp(dev.COL_CR0, dev.COL_CR1), lerp(dev.COL_CL0, dev.COL_CL1)
            )
            col_g = jnp.where(
                is_right,
                lerp(dev.COL_CR0 + 1, dev.COL_CR1 + 1),
                lerp(dev.COL_CL0 + 1, dev.COL_CL1 + 1),
            )
            col_b = jnp.where(
                is_right,
                lerp(dev.COL_CR0 + 2, dev.COL_CR1 + 2),
                lerp(dev.COL_CL0 + 2, dev.COL_CL1 + 2),
            )

            blur_h = lerp(dev.COL_BLUR0, dev.COL_BLUR1)
            # Scene-uniform weight multiplier / degree (most scenes: the
            # defaults, optixHello.cpp:466-472,503-509) skip the gather rows and
            # the lerp; portal-free scenes skip the portal-flag row.
            wm = (
                jnp.float32(uniform_wm)
                if uniform_wm is not None
                else lerp(dev.COL_WM0, dev.COL_WM1)
            )
            if uniform_wd is None:
                wd = lerp(dev.COL_WD0, dev.COL_WD1)
            if n_traces > 1:
                is_portal = (g(dev.COL_PORTAL) > 0.0) & hit
            else:
                is_portal = jnp.zeros(RSHP, jnp.bool_)

            # weight = wm * t^(-wd) (DeviceCode.cu:330); IEEE 1/0=inf semantics
            # make weight-0 curves occlude without contributing (:310).
            # Scene-uniform weight degrees specialize the pow (exp/log pair) to
            # rsqrt / div / nothing — last-ulp differences vs the generic form,
            # well under the parity tolerances.
            t_c = jnp.maximum(t_hit, 1e-30)
            if uniform_wd == 0.5:
                w_self = jax.lax.rsqrt(t_c)
            elif uniform_wd == 0.0:
                w_self = None  # weight = wm alone
            elif uniform_wd == 1.0:
                w_self = 1.0 / t_c
            elif uniform_wd == 2.0:
                w_self = 1.0 / (t_c * t_c)
            else:
                w_self = jnp.exp(-wd * jnp.log(t_c))
            if uniform_wm == 1.0:
                w_self = jnp.ones(RSHP, f32) if w_self is None else w_self
            else:
                w_self = wm if w_self is None else wm * w_self

            terminal = alive & hit & ~is_portal
            w_final = 1.0 / (inv_w + 1.0 / w_self)
            out_r = jnp.where(terminal, filt_r * col_r, out_r)
            out_g = jnp.where(terminal, filt_g * col_g, out_g)
            out_b = jnp.where(terminal, filt_b * col_b, out_b)
            out_w = jnp.where(terminal, w_final, out_w)
            out_blur = jnp.where(terminal, blur_prod * blur_h, out_blur)

            if n_traces > 1:
                cont = alive & hit & is_portal
                filt_r = jnp.where(cont, filt_r * col_r, filt_r)
                filt_g = jnp.where(cont, filt_g * col_g, filt_g)
                filt_b = jnp.where(cont, filt_b * col_b, filt_b)
                inv_w = jnp.where(cont, inv_w + 1.0 / w_self, inv_w)
                blur_prod = jnp.where(cont, blur_prod * blur_h, blur_prod)
                # Portal exit ray (DeviceCode.cu:227-257), reference-exact
                # including the quirky sin = nx*dy + ny*dx and the
                # unnormalized rotated direction.
                nlen = jnp.sqrt(nx * nx + ny * ny)
                ninv = jnp.where(nlen > 0.0, 1.0 / nlen, 0.0)
                nxu, nyu = nx * ninv, ny * ninv
                r_cos = nxu * dx + nyu * dy
                r_sin = nxu * dy + nyu * dx
                # exact exit point/derivative on the target cubic at tau
                tcx = tuple(g(dev.ALLT_TGT_CTRL + 2 * i) for i in range(4))
                tcy = tuple(g(dev.ALLT_TGT_CTRL + 2 * i + 1) for i in range(4))
                ex_x, ex_y, ex_dbx, ex_dby = refine.bezier_and_derivative(tcx, tcy, tau)
                tnx, tny = ex_dby, -ex_dbx
                tlen = jnp.sqrt(tnx * tnx + tny * tny)
                tinv = jnp.where(tlen > 0.0, 1.0 / tlen, 0.0)
                tnx, tny = tnx * tinv, tny * tinv
                ndx = tnx * r_cos - tny * r_sin
                ndy = tny * r_cos + tnx * r_sin
                ox = jnp.where(cont, ex_x, ox)
                oy = jnp.where(cont, ex_y, oy)
                dx = jnp.where(cont, ndx, dx)
                dy = jnp.where(cont, ndy, dy)
                alive = cont

        # --- per-pixel weighted reduction (DeviceCode.cu:153-181) ---
        if _ABLATE_STAGE == "shade":
            return jnp.zeros((8, R), f32) + flat(
                out_r * out_w + out_g + out_b + out_blur
            )

        return jnp.concatenate(
            [
                flat(out_r * out_w),
                flat(out_g * out_w),
                flat(out_b * out_w),
                flat(out_w),
                flat(out_blur * out_w),
                jnp.zeros((3, R), f32),
            ],
            axis=0,
        )  # (8, R)

    # Accumulate the (8, R) weighted ray rows across wedges, then run ONE
    # sample->pixel reduction matmul per program: the reduction is linear in
    # the rows, and an M=16 matmul pays for a full 128-row MXU M tile — one
    # matmul for all wedges costs n_wedges x less than one per wedge.
    if n_wedges == 1:
        rows = wedge_partial(jnp.int32(0))
    else:
        rows = jax.lax.fori_loop(
            0,
            n_wedges,
            lambda wv, acc: acc + wedge_partial(wv),
            jnp.zeros((8, R), f32),
        )

    # Ablated runs flow through the same reduction matmul (a lane slice of
    # the (8, R) rows to (8, PXB) SIGABRTs Mosaic; the uniform reduce cost
    # is part of every ablation's baseline anyway).

    # The sample->pixel one-hot is precomputed outside the kernel (constant
    # across the grid).  Same bf16 hi/lo trick as the gather, but split at
    # runtime; the MXU accumulates in f32 so only input quantization
    # matters, and hi + lo reconstructs the f32 inputs exactly.
    reduce_oh = red_ref[...]  # (SW*128, 128) tiled or (R, PXB) full, bf16
    rows_hi = rows.astype(jnp.bfloat16)
    rows_lo = (rows - rows_hi.astype(f32)).astype(jnp.bfloat16)
    dims2 = (((1,), (0,)), ((), ()))
    rows2 = jnp.concatenate([rows_hi, rows_lo], axis=0)  # (16, R)
    if reduce_oh.shape[0] != R:
        # Tiled reduction (PXB % 128 == 0): the (R, PXB) one-hot is block
        # diagonal with the SAME (SW*128, 128) pattern per 128-pixel column
        # tile (ray ridx = pixel*SW + sample), so one small block + static
        # 128-aligned lane slices replace it — at R = 4096 the full one-hot
        # was 8 MB of the 16 MB scoped VMEM budget (dolphin at 1080p
        # overflowed it; identical MAC count either way).
        tile_rows = reduce_oh.shape[0]  # SW * 128
        both = jnp.concatenate(
            [
                jax.lax.dot_general(
                    rows2[:, j * tile_rows : (j + 1) * tile_rows],
                    reduce_oh, dims2, preferred_element_type=f32,
                )
                for j in range(PXB // 128)
            ],
            axis=1,
        )  # (16, PXB)
    else:
        both = jax.lax.dot_general(
            rows2, reduce_oh, dims2, preferred_element_type=f32,
        )  # (16, PXB): one MXU pass for hi and lo
    out_ref[0] = both[:8] + both[8:]


def _gather_rows_for(scene: dev.DeviceScene, config: RenderConfig, n_traces: int):
    """Compact gather-table row set: the MXU gather costs ~rows x K x R per
    block, so only the shade_all_t rows THIS scene's shading actually reads
    are shipped.  Shared by trace_sums_flat and the candidate prepass (the
    slot tables must carry the identical row order)."""
    used = list(range(dev.COL_CL0, dev.COL_CR1 + 3))  # 12 color rows
    used += [dev.COL_BLUR0, dev.COL_BLUR1]
    if scene.uniform_wm is None:
        used += [dev.COL_WM0, dev.COL_WM1]
    if scene.uniform_wd is None:
        used += [dev.COL_WD0, dev.COL_WD1]
    if n_traces > 1:
        used.append(dev.COL_PORTAL)
    used += [dev.ALLT_CONSTS + i for i in range(5)]  # EX, EY, C1, P0X, P0Y
    used += list(range(dev.ALLT_SRC_CTRL, dev.ALLT_SRC_CTRL + 8))
    if n_traces > 1:
        used += list(range(dev.ALLT_TGT_CTRL, dev.ALLT_TGT_CTRL + 8))
    used += [dev.ALLT_T0, dev.ALLT_DT]
    if config.exact_silhouettes:
        used.append(dev.ALLT_BAND)
    gather_rows = -(-len(used) // 8) * 8  # sublane multiple
    rmap = {r: i for i, r in enumerate(used)}
    return used, gather_rows, rmap


def _n_traces(scene: dev.DeviceScene, config: RenderConfig) -> int:
    return (config.max_trace_depth + 1) if scene.has_portals else 1


def _sg_geom_rows() -> tuple[int, ...]:
    """shade_all_t row ids of the slot-geom table's geometry rows, in the
    kernel's fixed phase-1 order (must match the two_phase geom_hl order:
    EX, EY, C1, P0X, P0Y, ctrl x0,y0..x3,y3, T0, DT, BAND)."""
    return tuple(
        [dev.ALLT_CONSTS + i for i in range(5)]
        + [dev.ALLT_SRC_CTRL + i for i in range(8)]
        + [dev.ALLT_T0, dev.ALLT_DT, dev.ALLT_BAND]
    )


def _use_slotgeom(
    s_pad: int,
    exact: bool,
    n_traces: int,
    slot_mode: bool,
    n_wedges: int | None = None,
) -> bool:
    """Whether the slot-geom design applies (see _SLOTGEOM): capped-list
    scenes only, portal-free, exact two-phase path, probe matrix off, and
    (when ``n_wedges`` is given) per-program tconsts + sgeom blocks within
    the scoped-VMEM budget — batch49's 3-level lady_bug probe (L = 384 at
    W = 64) overflowed the 16 MB limit by 24 KB with sg on.
    build_cand_tables and trace_sums_flat MUST agree (the table tuple
    grows an sgeom element when it returns True)."""
    ok = (
        _SLOTGEOM
        and not slot_mode
        and s_pad > (1 << ID_BITS)
        and n_traces == 1
        and exact
        and _TWO_PHASE
        and _EXACT_ABLATE is None
    )
    if ok and n_wedges is not None:
        cl_ = _cand_len_for(s_pad)
        blk = n_wedges * cl_ * (cand_mod.TC_ROWS * 4 + 2 * SG_ROWS * 2)
        ok = blk <= (7 << 20)
    return ok


def _grid_geom(scene: dev.DeviceScene, config: RenderConfig, w: int, n_px: int):
    """Static block/tile geometry shared by trace_sums_flat and
    build_cand_tables (they MUST agree: the tables are laid out per
    (tile, wedge))."""
    R, pxb, sw, n_wedges = _choose_block(
        config.rays_per_pixel, config.rays_per_block,
        multi_chunk=scene.s_pad > SEG_CHUNK,
        dense=scene.s_pad > DENSE_SPAD,
    )
    # Tiled pixel coverage requires whole row bands (the sharded path always
    # passes them).
    if n_px % w != 0:
        raise ValueError(f"n_px {n_px} must cover whole rows of width {w}")
    tile_h = pxb // TILE_W
    tiles_x = -(-w // TILE_W)
    n_rows = n_px // w
    tiles_y = -(-n_rows // tile_h)
    return R, pxb, sw, n_wedges, tile_h, tiles_x, tiles_y, tiles_x * tiles_y


# Candidate-table HBM cap.  The round-3 transposed layout (T, W, rows, L)
# keeps the minor dims at (rows, 128) — stored UNPADDED by XLA (round 2's
# (T, W, L, 9) layout padded to (128, 128), 14x, and capped lady_bug-class
# scenes out of segment lists).  The cap now only guards genuinely huge
# (blocks x wedges) products.  Round 4 raised it from 6 GB for the
# slot-geom tables (lady_bug/dolphin 1080p land at ~7 GB total against
# the chip's 16 GB HBM; the render's other buffers are tens of MB).
_CAND_TABLE_HBM_CAP = 10 << 30


def _seg_table_bytes(
    n_blocks: int,
    n_wedges: int,
    g8: int,
    slot: bool,
    cand_len: int = 128,
    sgeom: bool = False,
) -> int:
    per_cell = cand_mod.TC_ROWS * cand_len * 4
    if slot:
        per_cell += 2 * g8 * cand_len * 2  # bf16 hi/lo shade rows
    elif _REMAP_PRECOMP:
        # (n_lvls*16, Gnp) bf16 remap tables, minor dim XLA-padded to 128
        n_lvls = cand_len // min(cand_len, 1 << ID_BITS)
        per_cell += n_lvls * 16 * 128 * 2
    if sgeom:
        per_cell += 2 * SG_ROWS * cand_len * 2  # bf16 slot-geom rows
    return n_blocks * n_wedges * per_cell


# Max adjacent wedges sharing one (conservative, wider-span) table entry
# when fine per-wedge tables blow the HBM cap — the round-5 fix for
# 4K-class high-rpp configs, where T x W fine tables cost ~156 GB and the
# kind fell back to the full chunk sweep (config5 regressed 1.74 -> 5.8 s
# between rounds 3 and 5 because of it).
_WEDGE_COARSE_MAX = 16


# Comfortable total-table size for banded builds: the band concat holds
# input bands + the output simultaneously, so coarsen further (or demote
# the slot shade table) until the tables sit well under HBM.
_COARSE_TABLE_TARGET = 3 << 30
# Slot shade-table budget: beyond it the scene demotes to the (proven)
# global-gather full-list path rather than shipping a multi-GB per-cell
# shade table (the cheap_prepass demotion's size-driven sibling).
_SLOT_SHADE_CAP = 2 << 30


def _wedge_coarse_shift(
    scene: dev.DeviceScene,
    n_wedges: int,
    n_blocks: int,
    g8: int,
    sgeom: bool,
):
    """(shift, slot_eff) — the power-of-two wedge coarsening whose seg
    tables fit (preferring sizes under _COARSE_TABLE_TARGET) and whether
    slot shade tables ride (size-demoted past _SLOT_SHADE_CAP); None when
    nothing <= _WEDGE_COARSE_MAX fits the HBM cap."""
    slot = scene.s_pad <= (1 << ID_BITS)
    n_chunks = scene.s_pad // SEG_CHUNK if scene.s_pad >= SEG_CHUNK else 1
    cl = _cand_len_for(scene.s_pad)
    best = None
    k = 0
    while (1 << k) <= min(_WEDGE_COARSE_MAX, n_wedges):
        w_k = n_wedges >> k
        # the CAND_MAX_WEDGES prepass cap applies to the COARSENED table
        # wedge count — high-rpp configs (4K x 1024: 256 wedges) reach the
        # lists through coarsening.
        if cand_mod.use_candidates(scene.s_pad, n_chunks, w_k):
            slot_k = slot and (
                n_blocks * w_k * 2 * g8 * cl * 2 <= _SLOT_SHADE_CAP
            )
            bytes_k = _seg_table_bytes(
                n_blocks, w_k, g8, slot_k, cl, sgeom=sgeom
            )
            if bytes_k <= _CAND_TABLE_HBM_CAP:
                if best is None:
                    best = (k, slot_k)
                if bytes_k <= _COARSE_TABLE_TARGET:
                    return (k, slot_k)
        k += 1
    return best


def _accel_kind(
    scene: dev.DeviceScene,
    n_wedges: int,
    n_blocks: int,
    g8: int = dev.ALLT_ROWS,
    sgeom: bool = False,
):
    """Which camera-dependent acceleration tables this scene uses:
    'seg' (segment candidate lists, possibly wedge-coarsened), 'chunk'
    (chunk candidate lists) or None (plain chunk sweep)."""
    n_chunks = scene.s_pad // SEG_CHUNK if scene.s_pad >= SEG_CHUNK else 1
    if _DISABLE_CAND:
        return None
    if _wedge_coarse_shift(scene, n_wedges, n_blocks, g8, sgeom) is not None:
        return "seg"
    if n_chunks > 1:
        return "chunk"
    return None


# Prepass auto-banding threshold: (tiles x table-wedges) cells above which
# build_cand_tables splits the build into row bands OUTSIDE the jit — the
# one-shot 4K x 1024rpp prepass materialized ~34 GB of per-cell
# intermediates (round 5; per-cell selection intermediates are ~130 KB, so
# 25k cells keeps a band's working set ~3 GB).
_PREPASS_CELL_CAP = 12_000


def build_cand_tables(
    scene: dev.DeviceScene,
    camera: Camera,
    config: RenderConfig,
    px_start=0,
    n_px: int | None = None,
):
    """Band-splitting wrapper around the jitted prepass: huge tile counts
    (4K-class) build in whole block-row bands and concatenate along the
    tile axis, bounding the prepass working set.  The wedge-coarsening
    shift is computed once for the FULL frame and forced on every band so
    all bands share one table structure."""
    w, h = scene.width, scene.height
    if n_px is None:
        n_px = h * w
    (R, pxb, sw, n_wedges, tile_h, tiles_x, tiles_y, n_blocks) = _grid_geom(
        scene, config, w, n_px
    )
    n_tr = _n_traces(scene, config)
    used, gather_rows, _ = _gather_rows_for(scene, config, n_tr)
    slot0 = scene.s_pad <= (1 << ID_BITS)
    sg = _use_slotgeom(
        scene.s_pad, config.exact_silhouettes, n_tr, slot0, n_wedges
    )
    kind = _accel_kind(scene, n_wedges, n_blocks, gather_rows, sgeom=sg)
    if kind != "seg":
        return _build_cand_tables_inner(scene, camera, config, px_start, n_px)
    shift, slot = _wedge_coarse_shift(
        scene, n_wedges, n_blocks, gather_rows, sg
    )
    cells = n_blocks * (n_wedges >> shift)
    if cells <= _PREPASS_CELL_CAP:
        return _build_cand_tables_inner(
            scene, camera, config, px_start, n_px,
            _force_shift=(shift, slot),
        )
    n_bands = -(-cells // _PREPASS_CELL_CAP)
    row_px = pxb * tiles_x  # one whole block row of pixels
    band_px = -(-(-(-n_px // row_px)) // n_bands) * row_px
    parts = []
    off = 0
    while off < n_px:
        bp = min(band_px, n_px - off)
        part = _build_cand_tables_inner(
            scene, camera, config, px_start + off, bp,
            _force_shift=(shift, slot),
        )
        if slot:
            # narrow each band's slot shade table to its own certified
            # count before accumulating — the un-narrowed cand_len-wide
            # table at 4K is ~8.5 GB and the final concat would double it
            # past HBM; bands re-pad to the running max below.
            consts_t, tshade, counts = part
            glb = max(16, -(-int(jax.device_get(counts.max())) // 16) * 16)
            part = (consts_t, tshade[..., :glb], counts)
        parts.append(part)
        off += bp
    if slot:
        gmax = max(p[1].shape[-1] for p in parts)
        parts = [
            (
                p[0],
                jnp.pad(p[1], ((0, 0),) * 3 + ((0, gmax - p[1].shape[-1]),)),
                p[2],
            )
            for p in parts
        ]
    return tuple(
        None
        if parts[0][j] is None
        else jnp.concatenate([p[j] for p in parts], axis=0)
        for j in range(len(parts[0]))
    )


@functools.partial(
    jax.jit, static_argnames=("config", "n_px", "_force_shift")
)
def _build_cand_tables_inner(
    scene: dev.DeviceScene,
    camera: Camera,
    config: RenderConfig,
    px_start=0,
    n_px: int | None = None,
    _force_shift: int | None = None,
):
    """Build the camera-dependent acceleration tables for trace_sums_flat's
    ``cand_tables`` argument — the analogue of the reference's accel build
    (optixHello.cpp:764-830, built once and reused): the tables depend only
    on (scene, camera, config), so callers rendering several frames from one
    camera build them once instead of paying the per-frame prepass.  Returns
    a tuple of arrays (shape depends on the scene's acceleration kind), or
    None for scenes that take the plain chunk sweep.  Passing tables built
    for a DIFFERENT camera/viewport mis-culls silently — callers own the
    cache invalidation (viewer.py rebuilds on any camera change)."""
    w, h = scene.width, scene.height
    if n_px is None:
        n_px = h * w
    (R, pxb, sw, n_wedges, tile_h, tiles_x, tiles_y, n_blocks) = _grid_geom(
        scene, config, w, n_px
    )
    n_tr = _n_traces(scene, config)
    used, gather_rows, _ = _gather_rows_for(scene, config, n_tr)
    slot = scene.s_pad <= (1 << ID_BITS)
    sg = _use_slotgeom(
        scene.s_pad, config.exact_silhouettes, n_tr, slot, n_wedges
    )
    kind = _accel_kind(scene, n_wedges, n_blocks, gather_rows, sgeom=sg)
    out = ()
    ckeep = None
    if kind == "seg":
        # wedge coarsening (see _WEDGE_COARSE_MAX): tables built for
        # groups of 2^shift adjacent wedges via the WIDER samples-per-wedge
        # — the prepass's angular spans stay conservative, and the kernel
        # derives the shift from the table shape.
        shift, slot_b = (
            _force_shift
            if _force_shift is not None
            else _wedge_coarse_shift(
                scene, n_wedges, n_blocks, gather_rows, sg
            )
        )
        sw_t = sw << shift
        cand_len = _cand_len_for(scene.s_pad)
        fb = not slot and cand_len < scene.s_pad
        consts_t, shade_hl, counts, lbs, sgeom, ckeep = (
            cand_mod.segment_candidates_t(
                scene.seg_consts, scene.shade_all_t, tuple(used), w, h,
                camera.zoom_factor, camera.offset_x, camera.offset_y,
                config.rays_per_pixel, sw_t, tiles_x, tiles_y,
                TILE_W, tile_h, px_start, config.diffusion_curve_save,
                cand_len=cand_len, with_shade=slot_b,
                order="id" if slot else "dist",
                geom_rows=_sg_geom_rows() if sg else None,
                chunk_cover=fb and _CHUNK_COVER,
            )
        )
        # the slot-space gather table only rides when overflow is impossible
        # (slot mode); bigger scenes gather globally, skip its HBM, and
        # carry per-slot lower-bound distances for the early-exit sweep
        # (plus the slot-geom table when the design applies)
        if slot_b:
            out = (consts_t, shade_hl, counts)
        elif sg:
            out = (consts_t, counts, lbs, sgeom)
        else:
            out = (consts_t, counts, lbs)
        if slot_b or cand_len >= scene.s_pad:
            # no chunk-walk fallback possible: the lists/levels hold
            # every candidate
            return out
        # big scenes also ship chunk lists: the overflow fallback walks them
    if kind in ("seg", "chunk"):
        out = out + cand_mod.chunk_candidates(
            scene.chunk_bounds, w, h, camera.zoom_factor, camera.offset_x,
            camera.offset_y, config.rays_per_pixel,
            sw_t if kind == "seg" else sw, tiles_x, tiles_y,
            TILE_W, tile_h, px_start, config.diffusion_curve_save,
            keep=ckeep if kind == "seg" else None,
        )
        return out
    return None


# probe scripts clear the jitted prepass between flag flips
build_cand_tables.clear_cache = _build_cand_tables_inner.clear_cache


class WorldGrid(typing.NamedTuple):
    """Camera-INDEPENDENT acceleration structure: candidate tables built
    for a uniform world-space grid of cells instead of one camera's pixel
    tiles — the true analogue of the reference's world-space BVH
    (optixHello.cpp:764-830, built once, never rebuilt during interaction).

    Valid for any camera with zoom_factor <= zoom_max whose pixel-tile
    circle CENTERS fall inside the grid box: a tile maps to the cell
    containing its center, and every cell's lists were built for the
    coverage circle {center within the cell, radius <= the max tile radius
    at zoom_max} — a conservative superset of any such tile's candidates.
    grid_tables() selects the per-frame (T, W, ...) tables with one cheap
    gather, so moving cameras pay ~0 prepass (vs the in-frame prepass's
    tens of ms).  Callers own validity: grid_covers() checks a camera."""

    tables: tuple
    x0: float
    y0: float
    pitch_x: float
    pitch_y: float
    nx: int
    ny: int
    zoom_max: float
    gather_len: int | None


def build_cand_grid(
    scene: dev.DeviceScene,
    config: RenderConfig,
    x0: float,
    y0: float,
    x1: float,
    y1: float,
    zoom_max: float = 1.0,
) -> WorldGrid | None:
    """Build the world-space candidate grid covering tile centers in
    [x0, x1] x [y0, y1] for cameras with zoom <= zoom_max.  Returns None
    for scenes that take the plain chunk sweep (no candidate tables)."""
    w, h = scene.width, scene.height
    (R, pxb, sw, n_wedges, tile_h, tiles_x, tiles_y, n_blocks) = _grid_geom(
        scene, config, w, h * w
    )
    pitch_x = TILE_W * zoom_max
    pitch_y = tile_h * zoom_max
    nx = max(1, int(math.ceil((x1 - x0) / pitch_x)))
    ny = max(1, int(math.ceil((y1 - y0) / pitch_y)))
    n_cells = nx * ny
    ix = jnp.arange(nx, dtype=jnp.float32)
    iy = jnp.arange(ny, dtype=jnp.float32)
    cx = x0 + (ix + 0.5) * pitch_x
    cy = y0 + (iy + 0.5) * pitch_y
    bcx = jnp.broadcast_to(cx[None, :], (ny, nx)).reshape(-1)
    bcy = jnp.broadcast_to(cy[:, None], (ny, nx)).reshape(-1)
    # coverage: any tile-circle center within the cell (half-diagonal) plus
    # the largest tile circle at zoom_max (tile extent is TILE_W x tile_h
    # pixels, x zoom, AA jitter included — see cand_mod._tile_circles)
    r_max = 0.5 * zoom_max * math.hypot(TILE_W, tile_h)
    cover = 0.5 * math.hypot(pitch_x, pitch_y) + r_max
    circles = (bcx, bcy, jnp.full((n_cells,), cover, jnp.float32))

    n_tr = _n_traces(scene, config)
    used, gather_rows, _ = _gather_rows_for(scene, config, n_tr)
    slot = scene.s_pad <= (1 << ID_BITS)
    sg = _use_slotgeom(
        scene.s_pad, config.exact_silhouettes, n_tr, slot, n_wedges
    )
    kind = _accel_kind(scene, n_wedges, n_cells, gather_rows, sgeom=sg)
    if kind is None:
        return None
    out = ()
    ckeep = None
    cand_len = _cand_len_for(scene.s_pad)
    if kind == "seg":
        fbg = not slot and cand_len < scene.s_pad
        consts_t, shade_hl, counts, lbs, sgeom, ckeep = (
            cand_mod.segment_candidates_t(
                scene.seg_consts, scene.shade_all_t, tuple(used), w, h,
                1.0, 0.0, 0.0,
                config.rays_per_pixel, sw, nx, ny,
                TILE_W, tile_h, 0, config.diffusion_curve_save,
                cand_len=cand_len, with_shade=slot,
                order="id" if slot else "dist", circles=circles,
                geom_rows=_sg_geom_rows() if sg else None,
                chunk_cover=fbg and _CHUNK_COVER,
            )
        )
        if slot:
            out = (consts_t, shade_hl, counts)
        elif sg:
            out = (consts_t, counts, lbs, sgeom)
        else:
            out = (consts_t, counts, lbs)
    gl = None
    if kind == "seg" and scene.s_pad <= (1 << ID_BITS):
        gl = int(out[2].max())  # one host sync, at build time
        out = narrow_cand_tables(out, max(gl, 1))
    elif kind != "seg" or cand_len < scene.s_pad:
        out = out + cand_mod.chunk_candidates(
            scene.chunk_bounds, w, h, 1.0, 0.0, 0.0,
            config.rays_per_pixel, sw, nx, ny,
            TILE_W, tile_h, 0, config.diffusion_curve_save, circles=circles,
            keep=ckeep if kind == "seg" else None,
        )
    return WorldGrid(out, float(x0), float(y0), float(pitch_x),
                     float(pitch_y), nx, ny, float(zoom_max), gl)


@functools.partial(jax.jit, static_argnames=("config", "n_px"))
def grid_tables(
    grid: WorldGrid,
    scene: dev.DeviceScene,
    camera: Camera,
    config: RenderConfig,
    px_start=0,
    n_px: int | None = None,
):
    """Select this camera's per-(tile, wedge) tables from the world grid —
    one gather per table, jit-friendly (camera may be traced).  The result
    plugs into trace_sums_flat's ``cand_tables`` (with gather_len =
    grid.gather_len).  The caller owns validity (grid_covers).  Jitted as
    ONE dispatch: the eager form issued one device round trip per table,
    which dominated the interactive per-dispatch wall time through the
    single-client tunnel (viewer.py's moving-camera path)."""
    w, h = scene.width, scene.height
    if n_px is None:
        n_px = h * w
    (R, pxb, sw, n_wedges, tile_h, tiles_x, tiles_y, n_blocks) = _grid_geom(
        scene, config, w, n_px
    )
    bcx, bcy, _ = cand_mod._tile_circles(
        w, h, camera.zoom_factor, camera.offset_x, camera.offset_y,
        tiles_x, tiles_y, TILE_W, tile_h, px_start,
        config.diffusion_curve_save,
    )
    ix = jnp.clip(
        jnp.floor((bcx - grid.x0) / grid.pitch_x), 0, grid.nx - 1
    ).astype(jnp.int32)
    iy = jnp.clip(
        jnp.floor((bcy - grid.y0) / grid.pitch_y), 0, grid.ny - 1
    ).astype(jnp.int32)
    cid = iy * grid.nx + ix  # (T,)
    return tuple(None if t is None else t[cid] for t in grid.tables)


def grid_covers(
    grid: WorldGrid,
    scene: dev.DeviceScene,
    camera: Camera,
    config: RenderConfig,
) -> bool:
    """Host-side validity check: every tile-circle center inside the grid
    box and zoom within range.  Interactive sessions call this on camera
    change and rebuild the grid when it stops covering."""
    if float(camera.zoom_factor) > grid.zoom_max * (1 + 1e-6):
        return False
    w, h = scene.width, scene.height
    (R, pxb, sw, n_wedges, tile_h, tiles_x, tiles_y, n_blocks) = _grid_geom(
        scene, config, w, h * w
    )
    bcx, bcy, _ = cand_mod._tile_circles(
        w, h, float(camera.zoom_factor), float(camera.offset_x),
        float(camera.offset_y), tiles_x, tiles_y, TILE_W, tile_h, 0,
        config.diffusion_curve_save,
    )
    return bool(
        (bcx.min() >= grid.x0) & (bcx.max() <= grid.x0 + grid.nx * grid.pitch_x)
        & (bcy.min() >= grid.y0) & (bcy.max() <= grid.y0 + grid.ny * grid.pitch_y)
    )


def narrow_cand_tables(cand_tables, gather_len: int):
    """Pre-narrow slot-mode tables' shade lane dim to the gather_len that
    trace_sums_flat will use (rounded to 16), so the per-frame narrowing
    inside the jit is a no-op.  Call with seg_max_count's value."""
    gl = -(-max(gather_len, 1) // 16) * 16
    consts_t, tshade, counts = cand_tables[:3]
    if tshade.shape[-1] > gl:
        tshade = tshade[..., :gl]
    return (consts_t, tshade, counts) + tuple(cand_tables[3:])


def seg_max_count(scene: dev.DeviceScene, cand_tables) -> int | None:
    """Max per-(tile, wedge) candidate count of hoisted slot-mode tables, or
    None when the tables aren't slot-mode segment lists.  The caller passes
    it to trace_sums_flat as ``gather_len`` — a host sync, done once per
    camera alongside the table build (the accel-build phase)."""
    if cand_tables is None or scene.s_pad > (1 << ID_BITS):
        return None
    counts = cand_tables[2]
    if counts is None:  # size-demoted non-slot tables (lbs slot is empty)
        return None
    # (T, W, 1) hoisted single-chip tables, or (n_shards, T, W, 1) stacked
    # sharded tables (parallel/sharded.py) — the max certifies every shard.
    if counts.ndim not in (3, 4) or counts.shape[-1] != 1:
        return None
    return int(counts.max())


def trace_sums(
    scene: dev.DeviceScene,
    camera: Camera,
    config: RenderConfig,
    frame=0,
    interpret: bool | None = None,
):
    """Trace the full frame; returns per-pixel (color_sum (H,W,3),
    weight_sum (H,W), blur_sum (H,W))."""
    h, w = scene.height, scene.width
    csum, wsum, bsum = trace_sums_flat(
        scene, camera, config, frame, 0, h * w, interpret=interpret
    )
    return csum.reshape(h, w, 3), wsum.reshape(h, w), bsum.reshape(h, w)


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "n_px", "interpret", "gather_len", "cheap_prepass"
    ),
)
def trace_sums_flat(
    scene: dev.DeviceScene,
    camera: Camera,
    config: RenderConfig,
    frame,
    px_start,
    n_px: int,
    interpret: bool | None = None,
    cand_tables=None,
    gather_len: int | None = None,
    cheap_prepass: bool = False,
):
    """Trace pixels [px_start, px_start + n_px) of the scene's pixel grid;
    returns flat (color_sum (n_px, 3), weight_sum (n_px,), blur_sum (n_px,)).
    ``px_start`` is traced — tile offsets never recompile.  ``cand_tables``:
    precomputed build_cand_tables output for THIS (camera, px_start) —
    camera-static callers hoist the per-frame prepass with it.
    ``gather_len``: static certification that no (tile, wedge) cell's
    candidate count exceeds it (slot-mode scenes only; read it off the
    tables' counts via ``seg_max_count``) — the winner one-hot then shrinks
    from the full slot capacity to gather_len rows.  An UNDER-certified
    value silently mis-shades; callers own the guarantee."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    h, w = scene.height, scene.width
    rpp = config.rays_per_pixel
    # Narrow wedges keep candidate lists short AND keep pxb (pixels per
    # program) high for a fixed rays-per-program budget — widening sw to 16
    # here shrank pxb 4x, quadrupled the program count and cost +19 ms on
    # the headline (program entry ~5 us each).  Chunk-granularity scenes
    # always use the narrow wedge; candidate-list scenes too, measured.
    (R, pxb, sw, n_wedges, tile_h, tiles_x, tiles_y, n_blocks) = _grid_geom(
        scene, config, w, n_px
    )

    n_traces = (config.max_trace_depth + 1) if scene.has_portals else 1

    # Scene enclosing circle (of every valid chunk circle, bands included):
    # the kernel clamps every distance-ordered walk's exit threshold by the
    # block's max scene-exit distance — beyond it no ray can hit anything,
    # so rays that miss (or hit far) stop forcing full walks.  Exact: hit
    # points lie on band-widened sub-segments, all inside this circle.
    cbx, cby, cbr = (
        scene.chunk_bounds[:, 0], scene.chunk_bounds[:, 1],
        scene.chunk_bounds[:, 2],
    )
    cvalid = cbx < 1e29
    big = jnp.float32(1e30)
    xmin = jnp.min(jnp.where(cvalid, cbx - cbr, big))
    xmax = jnp.max(jnp.where(cvalid, cbx + cbr, -big))
    ymin = jnp.min(jnp.where(cvalid, cby - cbr, big))
    ymax = jnp.max(jnp.where(cvalid, cby + cbr, -big))
    scx = 0.5 * (xmin + xmax)
    scy = 0.5 * (ymin + ymax)
    scr = jnp.max(
        jnp.where(
            cvalid,
            jnp.sqrt((cbx - scx) ** 2 + (cby - scy) ** 2) + cbr,
            0.0,
        )
    )
    cam = jnp.asarray(
        [camera.zoom_factor, camera.offset_x, camera.offset_y, 0.0,
         0.0, 0.0, 0.0, 0.0], jnp.float32,
    )
    cam = cam.at[4].set(scx).at[5].set(scy).at[6].set(scr)
    # frame / px_start ride a separate int32 operand: squeezing them through
    # the f32 camera vector silently rounds values >= 2^24 (8K-image row
    # offsets, very long sessions).
    meta = jnp.asarray(
        [jnp.asarray(frame, jnp.int32), jnp.asarray(px_start, jnp.int32)], jnp.int32
    )

    n_chunks = scene.s_pad // SEG_CHUNK if scene.s_pad >= SEG_CHUNK else 1
    # Compact gather-table row set: the MXU gather costs ~rows x K x R per
    # block, so only the rows THIS scene's shading reads are shipped.  The
    # kernel addresses rows through ``rmap``.
    used, gather_rows, rmap = _gather_rows_for(scene, config, n_traces)
    sg0 = _use_slotgeom(
        scene.s_pad, config.exact_silhouettes, n_traces,
        scene.s_pad <= (1 << ID_BITS), n_wedges,
    )
    kind = _accel_kind(scene, n_wedges, n_blocks, gather_rows, sgeom=sg0)
    use_cand = kind == "seg"
    sg = sg0 and use_cand
    # wedge coarsening + size-driven slot demotion (shared with the table
    # builders — the same inputs give the same pair everywhere)
    _cand_coarse = (
        _wedge_coarse_shift(scene, n_wedges, n_blocks, gather_rows, sg)
        if use_cand
        else (0, scene.s_pad <= (1 << ID_BITS))
    )
    # List length: everything fits for scenes up to 2^ID_BITS sub-segments
    # (no overflow cond in the kernel at all, and the winner gather runs in
    # SLOT space — slot_mode); larger scenes carry _CAND_LEVELS 128-slot
    # LEVELS (the slot must fit the packed key, so each level remaps slots
    # to global ids post-sweep), and fall back to the sorted chunk walk only
    # past the last level's horizon — those scenes ship chunk lists
    # alongside the segment lists unless the levels hold everything.
    cand_len = _cand_len_for(scene.s_pad)
    slot_mode = use_cand and scene.s_pad <= (1 << ID_BITS) and _cand_coarse[1]
    # ``cheap_prepass`` (progressive/interactive callers whose camera moves
    # every frame): building the per-cell slot shade table in the in-frame
    # prepass costs far more than the handful of global winner gathers it
    # replaces when wedges are few (config4 interactive regressed 43 -> 67
    # ms/frame when the slot tables landed) — drop to global-gather full
    # lists, id-ordered so tie-breaks stay the JAX argmin's.  Opt-in only:
    # the demoted kernel is a different compiled graph, so its output can
    # differ from the hoisted/slot graph by FMA-contraction ulps — the
    # default in-frame path stays bit-identical to hoisted tables
    # (tests/test_pallas.py::test_hoisted_cand_tables_match_inline).
    # High-wedge frames keep slot mode either way: at 32 wedges the global
    # one-hot chains were the largest round-2 cost.
    if (
        cheap_prepass
        and cand_tables is None
        and slot_mode
        and n_wedges < _SLOT_INFRAME_MIN_W
    ):
        slot_mode = False
    use_chunk_lists = n_chunks > 1 and (not use_cand or cand_len < scene.s_pad)
    if _DISABLE_CAND:
        use_cand = use_chunk_lists = slot_mode = False
    # gather_len rounds to a bf16 sublane multiple (16): it sizes both the
    # slot one-hot and the tshade DMA block's lane dim.
    if slot_mode and gather_len is not None:
        gl = min(cand_len, -(-max(gather_len, 1) // 16) * 16)
    else:
        gl = cand_len

    # Two-phase final-winner gather (see _TWO_PHASE): only when some exact
    # global-gather path will actually run — slot-mode portal-free scenes
    # never leave the fused slot path, so skip the extra operand there.
    two_phase = (
        config.exact_silhouettes
        and _EXACT_ABLATE is None
        and _TWO_PHASE
        and (n_traces > 1 or not slot_mode)
    )

    kernel = functools.partial(
        _trace_kernel,
        width=w,
        height=h,
        s_pad=scene.s_pad,
        n_traces=n_traces,
        config=config,
        rays_per_program=R,
        px_per_program=pxb,
        samples_per_wedge=sw,
        n_wedges=n_wedges,
        use_cand=use_cand,
        use_chunk_lists=use_chunk_lists,
        uniform_wd=scene.uniform_wd,
        uniform_wm=scene.uniform_wm,
        rmap=rmap,
        gather_rows=gather_rows,
        slot_mode=slot_mode,
        gather_len=gl,
        two_phase=two_phase,
        slotgeom=sg,
    )

    # bf16 hi/lo split of the compact rows, chunked 3-D for aligned dynamic
    # indexing in-kernel, hi halves stacked over residuals so the in-kernel
    # gather is ONE MXU pass:
    # (ALLT_ROWS, S_pad) -> (ceil(S_pad/gsc), 2*gather_rows, gsc)
    gsc = _gather_gsc_for(scene.s_pad)
    s_pad128 = ((scene.s_pad + gsc - 1) // gsc) * gsc
    allt = scene.shade_all_t[jnp.asarray(used, jnp.int32)]
    if gather_rows != len(used):
        allt = jnp.pad(allt, ((0, gather_rows - len(used)), (0, 0)))
    if s_pad128 != scene.s_pad:
        allt = jnp.pad(allt, ((0, 0), (0, s_pad128 - scene.s_pad)))
    allt3 = jnp.moveaxis(allt.reshape(gather_rows, s_pad128 // gsc, gsc), 1, 0)
    allt_hi = allt3.astype(jnp.bfloat16)
    allt_lo = (allt3 - allt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    allt_hl = jnp.concatenate([allt_hi, allt_lo], axis=1)

    # Sample->pixel reduction one-hot, constant across the grid.  When PXB
    # is a 128-multiple only the (SW*128, 128) block rides (the full one-hot
    # is block diagonal in it — see the kernel's tiled reduction); tiny
    # configs (tests) keep the full (R, pxb) matrix.
    if pxb % 128 == 0 and _TILED_REDUCE:
        red_r, red_c = 128 * sw, 128
    else:
        red_r, red_c = R, pxb
    reduce_oh = (
        jax.lax.broadcasted_iota(jnp.int32, (red_r, red_c), 0) // sw
        == jax.lax.broadcasted_iota(jnp.int32, (red_r, red_c), 1)
    ).astype(jnp.bfloat16)

    # Chunk-major transposed sweep consts (see _trace_kernel): rows in
    # cand_mod.TC_ORDER, lanes = in-chunk segment id.
    n_ck = scene.s_pad // SEG_CHUNK if scene.s_pad >= SEG_CHUNK else 1
    sc_ = min(SEG_CHUNK, scene.s_pad)
    csel = scene.seg_consts[:, list(cand_mod.TC_ORDER)]  # (S_pad, 7)
    csel = jnp.pad(csel, ((0, 0), (0, 8 - csel.shape[1])))
    consts_t3 = jnp.transpose(csel.reshape(n_ck, sc_, 8), (0, 2, 1))

    operands = [cam, meta, scene.chunk_bounds, consts_t3, allt_hl, reduce_oh]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if two_phase:
        # GEOM_ROWS-row hi/lo subset of allt_hl (identical chunking and
        # bf16 splits, so phase-1 reconstruction is bit-identical to the
        # full gather's) in the kernel's fixed geometry-row order.
        gsel = jnp.asarray(
            [rmap[dev.ALLT_CONSTS + i] for i in range(5)]
            + [rmap[dev.ALLT_SRC_CTRL + i] for i in range(8)]
            + [rmap[dev.ALLT_T0], rmap[dev.ALLT_DT], rmap[dev.ALLT_BAND]],
            jnp.int32,
        )
        geom_hl = jnp.concatenate(
            [allt_hi[:, gsel, :], allt_lo[:, gsel, :]], axis=1
        )
        operands.append(geom_hl)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    # wedge-coarsening defaults (overridden when seg tables are in play)
    wedge_shift = 0
    w_t = n_wedges
    if use_cand:
        # Candidate prepass (ops/candidates.py): precomputed per camera via
        # build_cand_tables when the caller hoists it, else fused under the
        # frame jit; each program DMAs only its (tile, wedge) block.
        sgeom = None
        ckeep_if = None
        if cand_tables is not None:
            if slot_mode:
                tconsts, tshade, ccand = cand_tables[:3]
                clbslots = None
            else:
                tconsts, ccand, clbslots = cand_tables[:3]
                tshade = None
                if sg:
                    # build_cand_tables emits the slot-geom table exactly
                    # when _use_slotgeom holds (same predicate)
                    sgeom = cand_tables[3]
        else:
            tconsts, tshade, ccand, clbslots, sgeom, ckeep_if = (
                cand_mod.segment_candidates_t(
                    scene.seg_consts,
                    scene.shade_all_t,
                    tuple(used),
                    w,
                    h,
                    camera.zoom_factor,
                    camera.offset_x,
                    camera.offset_y,
                    rpp,
                    sw << _cand_coarse[0],
                    tiles_x,
                    tiles_y,
                    TILE_W,
                    tile_h,
                    px_start,
                    config.diffusion_curve_save,
                    cand_len=cand_len,
                    with_shade=slot_mode,
                    # Single-level uncapped lists never need the distance
                    # sort: the walk covers every slot, and id order keeps
                    # slot ties == global-id ties == the JAX argmin's.
                    # Multi-level lists (s_pad > 128) always sort: the
                    # level walks' early exits and horizons read the lbs.
                    order="id" if scene.s_pad <= (1 << ID_BITS) else "dist",
                    geom_rows=_sg_geom_rows() if sg else None,
                    chunk_cover=use_chunk_lists and use_cand
                    and _CHUNK_COVER,
                )
            )
        if slot_mode and tshade.shape[-1] != gl:
            # narrow the slot-gather table to the certified width (callers
            # can pre-narrow with narrow_cand_tables to keep this a no-op)
            tshade = tshade[..., :gl]
        # wedge coarsening: the shift is DERIVED from the table shape, so
        # hoisted, grid and in-frame tables all stay consistent with the
        # kernel's pid_tab indexing.
        w_t = ccand.shape[1]
        assert n_wedges % w_t == 0 and n_wedges // w_t == (
            1 << ((n_wedges // w_t).bit_length() - 1)
        ), (n_wedges, w_t)
        wedge_shift = (n_wedges // w_t).bit_length() - 1
        fold4 = lambda g: (g, 0, 0, 0)
        operands.append(tconsts)
        in_specs.append(
            pl.BlockSpec(
                (1, w_t, cand_mod.TC_ROWS, cand_len), fold4,
                memory_space=pltpu.VMEM,
            )
        )
        if sg:
            # slot-space geometry+id table (see _SLOTGEOM): each program
            # DMAs its tile's (W, 2*SG_ROWS, L) block (an ANY + per-wedge
            # DMA variant measured neutral-to-worse in round 5 — the
            # pipeline already overlaps these transfers)
            operands.append(sgeom)
            in_specs.append(
                pl.BlockSpec(
                    (1, w_t, 2 * SG_ROWS, cand_len), fold4,
                    memory_space=pltpu.VMEM,
                )
            )
        if _REMAP_PRECOMP and not slot_mode and not sg:
            # Precomputed per-(tile, wedge) hi/lo remap tables (see
            # _REMAP_PRECOMP): derived from tconsts' TC_ID row, so hoisted
            # tables need no new tuple element — the derivation is a cheap
            # in-jit relayout of the (T, W, L) id row.
            idhl = cand_mod.idhl_from_tconsts(tconsts)
            operands.append(idhl)
            in_specs.append(
                pl.BlockSpec(
                    (1, w_t, idhl.shape[2], idhl.shape[3]), fold4,
                    memory_space=pltpu.VMEM,
                )
            )
        if slot_mode:
            operands.append(tshade)
            in_specs.append(
                pl.BlockSpec(
                    (1, w_t, 2 * gather_rows, gl), fold4,
                    memory_space=pltpu.VMEM,
                )
            )
        operands.append(ccand)
        in_specs.append(
            pl.BlockSpec(
                (1, w_t, 1), lambda g: (g, 0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        if not slot_mode and scene.s_pad > (1 << ID_BITS):
            # per-GROUP lower-bound distances (SMEM, like the chunk lists'
            # clbs): slots arrive distance-sorted, so the sweep while-loop
            # stops at the first 8-slot group whose lb (its first slot's)
            # exceeds the block's worst current closest hit — one entry
            # per group (8x less SMEM DMA than per-slot; the kernel never
            # read intra-group lbs).  Group (lvl*128)>>3 lbs are the
            # HORIZONS (first deferred candidate's lb) gating each level
            # walk and the seeded chunk-walk fallback.  Matches the
            # kernel's ``capped`` flag — multi-level lists carry lbs even
            # when the levels hold every candidate.  Uncapped non-slot
            # lists (the in-frame low-wedge path) carry no lbs: the walk
            # covers every slot.
            operands.append(clbslots)
            in_specs.append(
                pl.BlockSpec(
                    (1, w_t, cand_len // 8 + 1), lambda g: (g, 0, 0),
                    memory_space=pltpu.SMEM,
                )
            )
    if use_chunk_lists:
        if cand_tables is not None:
            cids, clbs, ccnts = cand_tables[-3:]
        else:
            cids, clbs, ccnts = cand_mod.chunk_candidates(
                scene.chunk_bounds,
                w,
                h,
                camera.zoom_factor,
                camera.offset_x,
                camera.offset_y,
                rpp,
                sw << wedge_shift,
                tiles_x,
                tiles_y,
                TILE_W,
                tile_h,
                px_start,
                config.diffusion_curve_save,
                keep=ckeep_if if use_cand else None,
            )
        # Lists are laid out (T, W, C); each program takes its tile's whole
        # (W, C) wedge block and indexes the wedge in-kernel.
        fold = lambda g: (g, 0, 0)
        operands.extend([cids, clbs, ccnts])
        in_specs.extend(
            [
                pl.BlockSpec((1, cids.shape[1], n_chunks), fold,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, cids.shape[1], n_chunks), fold,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, cids.shape[1], 1), fold,
                             memory_space=pltpu.SMEM),
            ]
        )

    scratch_shapes = [pltpu.VMEM((sc_, 8), jnp.float32)]  # ck_scratch
    if use_cand:
        # one 128-slot LEVEL at a time is staged (multi-level lists restage
        # per level inside the fallback conds)
        scratch_shapes.append(
            pltpu.VMEM(
                (min(cand_len, 1 << ID_BITS), cand_mod.TC_ROWS), jnp.float32
            )
        )
    sums = pl.pallas_call(
        functools.partial(kernel, wedge_shift=wedge_shift),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 8, pxb), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 8, pxb), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(_DIM_SEMANTICS,),
        ),
    )(*operands)

    # Unscramble tile order -> row-major.  Pixel (row, col) lives in block
    # (row//TH)*tiles_x + col//16 at offset (row%TH)*16 + col%16 — a regular
    # permutation, so it is a 5-D transpose (efficient TPU copy), not a
    # gather: (8, ty, tx, th, tw) -> (8, ty, th, tx, tw), then crop the tile
    # padding beyond the image width / row count.
    sums = jnp.moveaxis(sums, 1, 0).reshape(8, tiles_y, tiles_x, tile_h, TILE_W)
    sums = sums.transpose(0, 1, 3, 2, 4).reshape(
        8, tiles_y * tile_h, tiles_x * TILE_W
    )
    sums = sums[:, :, :w].reshape(8, -1)[:, :n_px]
    return sums[0:3].T, sums[3], sums[4]
