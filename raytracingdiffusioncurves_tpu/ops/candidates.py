"""Per-(tile, wedge) segment candidate lists — the TPU-native acceleration
structure for small scenes.

The reference culls per ray through OptiX's BVH (optixHello.cpp:764-830).
A lockstep-SIMD machine wants the dual formulation: cull per *block of rays*
ahead of time.  Each Pallas program instance traces a (pixel tile x direction
wedge) block whose rays all originate inside one circle and point into one
angular wedge — so the set of segments it can possibly hit is a function of
(tile, wedge) only.  This prepass (plain JAX, runs fused under the frame jit)
tests every segment's bounding circle against each block's cone and compacts
the passing segment ids into fixed-length lists with gathered intersection
constants; the trace kernel then sweeps L candidate rows instead of all
s_pad rows.

Exactness: the circle/cone test is conservative (identical math to the
kernel's chunk test), and a (tile, wedge) cell whose candidate count exceeds
L is flagged so the kernel falls back to the full sweep for that block.

Layout notes: everything is batched (tiles x wedges x segments) elementwise
work plus one small sort — XLA-friendly, no scatter.  The candidate tables
are (tiles, wedges, L, CONST_COLS) in HBM; each program DMAs its (L, C) tile
through the normal Pallas pipeline.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..scene import device as dev

# Candidate list length (sub-segments).  Static so block shapes never depend
# on the camera; overflowing cells fall back to the full sweep.  The kernel
# sweeps only ceil(count/8) 8-row groups of the list, so the typical cost
# tracks the MEAN candidate count (~6 on arch), not CAND_LEN.
CAND_LEN = 32
# Column of the gathered candidate row holding the original segment id (f32,
# exact for ids < 2^24).  Columns 6/7 carry the segment's silhouette band
# and quadratic ordering correction (dev.CONST_BAND / CONST_QUAD) through
# the gather; the per-cell candidate count rides a separate (T, W, 1) SMEM
# operand.
COL_ID = 8

# Transposed-consts row order (segment_candidates_t): the 7 intersection
# constants the sweep reads + the global segment id (f32, exact < 2^24) in
# row TC_ID — one 8-sublane tile.  The minor dim is the 128-slot lane axis,
# so XLA stores the table with ZERO padding — the (T, W, L, 9) layout of
# round 2 padded its minor dims to (128, 128), a 14x HBM blow-up that
# capped which scenes could use segment lists.
TC_ROWS = 8
TC_ORDER = (
    dev.CONST_EX, dev.CONST_EY, dev.CONST_C1, dev.CONST_P0X, dev.CONST_P0Y,
    dev.CONST_QUAD, dev.CONST_BAND,
)
TC_ID = 7


# Largest scene (padded sub-segments) that gets per-(tile, wedge) SEGMENT
# candidate lists.  Dense scenes (dolphin, 28.8k) are covered too since the
# lists became distance-CAPPED with an exact horizon fallback: each cell
# keeps only its nearest <= cand_len candidates plus the lower-bound
# distance of the first dropped one; the kernel continues into the sorted
# chunk walk only when some ray's best hit is still beyond that horizon.
# The prepass is tile-batched (lax.map) so its (TB, S) working set stays
# bounded regardless of scene size.
CAND_MAX_SPAD = 32768

# Per-program wedge cap for candidate lists (measured): above it the
# per-program (W, L, C) VMEM candidate block exceeds the scoped budget
# (256 wedges OOMed the 4K 1024-rpp config at 32 MB vs the 16 MB limit).
# Patchable for probes exploring finer dense-scene wedges.
CAND_MAX_WEDGES = 64


def use_candidates(s_pad: int, n_chunks: int, n_wedges: int) -> bool:
    """Candidate lists pay off when the full sweep is bigger than the list
    and the wedge actually narrows directions.  Multi-chunk scenes up to
    CAND_MAX_SPAD use them too (slot-packed sweep keys + post-sweep id
    remap in the kernel); larger scenes use chunk-granularity lists.

    Wedge cap: see CAND_MAX_WEDGES."""
    return (
        s_pad > CAND_LEN
        and 1 < n_wedges <= CAND_MAX_WEDGES
        and s_pad <= CAND_MAX_SPAD
    )


def _tile_circles(
    width, height, zoom, off_x, off_y, tiles_x, tiles_y, tile_w, tile_h,
    px_start, diffusion_save,
):
    """(bcx, bcy, br) each (T,): world-space bounding circles of every pixel
    tile's ray origins (AA jitter [0, zoom) included), in the kernel's
    row-major tile order pid_g = tile_row * tiles_x + tile_col."""
    f32 = jnp.float32
    zoom = jnp.asarray(zoom, f32)
    off_x = jnp.asarray(off_x, f32)
    off_y = jnp.asarray(off_y, f32)

    tc = jnp.arange(tiles_x, dtype=jnp.int32)
    tr = jnp.arange(tiles_y, dtype=jnp.int32)
    col0 = (tc * tile_w - width // 2).astype(f32)
    x_a = col0 * zoom + off_x
    x_b = (col0 + f32(tile_w - 1)) * zoom + off_x + zoom  # + [0, zoom) jitter
    x_lo = jnp.minimum(x_a, x_b)
    x_hi = jnp.maximum(x_a, x_b)

    row0 = px_start // width + tr * tile_h
    if diffusion_save:
        ya = ((height - row0) - height // 2).astype(f32) * zoom + off_y
        yb = ((height - (row0 + tile_h - 1)) - height // 2).astype(f32) * zoom + off_y
    else:
        ya = (row0 - height // 2).astype(f32) * zoom + off_y
        yb = ((row0 + tile_h - 1) - height // 2).astype(f32) * zoom + off_y
    y_lo = jnp.minimum(jnp.minimum(ya, yb), jnp.minimum(ya, yb) + zoom)
    y_hi = jnp.maximum(jnp.maximum(ya, yb), jnp.maximum(ya, yb) + zoom)

    cx = 0.5 * (x_lo + x_hi)  # (Tx,)
    cy = 0.5 * (y_lo + y_hi)  # (Ty,)
    rx = 0.5 * (x_hi - x_lo)
    ry = 0.5 * (y_hi - y_lo)
    bcx = jnp.broadcast_to(cx[None, :], (tiles_y, tiles_x)).reshape(-1)
    bcy = jnp.broadcast_to(cy[:, None], (tiles_y, tiles_x)).reshape(-1)
    br = jnp.sqrt(
        jnp.broadcast_to(rx[None, :] ** 2, (tiles_y, tiles_x)).reshape(-1)
        + jnp.broadcast_to(ry[:, None] ** 2, (tiles_y, tiles_x)).reshape(-1)
    )
    return bcx, bcy, br


def _wedge_dirs(rpp: int, sw: int):
    """Wedge center unit vectors (W, 2-as-two-arrays) + half-width trig."""
    n_wedges = rpp // sw
    sector = 2.0 * math.pi / rpp
    hw = math.pi * sw / rpp
    wc = sector * (np.arange(n_wedges) * sw + 0.5 * sw)
    return (
        jnp.asarray(np.cos(wc), jnp.float32),
        jnp.asarray(np.sin(wc), jnp.float32),
        np.float32(math.cos(hw)),
        np.float32(math.sin(hw)),
    )


def _segment_ids(
    consts: jax.Array,
    width: int,
    height: int,
    zoom,
    off_x,
    off_y,
    rpp: int,
    sw: int,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    px_start,
    diffusion_save: bool,
    cand_len: int,
    order: str = "id",
    circles=None,
    chunk_cover: bool = False,
):
    """Shared compaction core: per-(tile, wedge) passing segment ids.

    ``circles``: optional (bcx, bcy, br) arrays overriding the pixel-tile
    circles — the world-space candidate grid builds CELL circles instead
    (camera-independent; see trace_pallas.build_cand_grid).

    Returns (ids (W, T, L) int32, counts (W, T) int32 capped at
    cand_len + 1, lbs (W, T, L) f32 conservative lower-bound distances —
    (W, T, L + 1) for order == "dist", whose extra slot holds the HORIZON:
    the lower bound of the first candidate that did NOT fit the list (1e30
    when nothing was dropped).  Every dropped segment has lb >= horizon, so
    a kernel whose worst per-ray best hit is <= horizon needs no fallback.

    ``order``: "id" sorts slots by ascending global id (slot-order ties
    == the JAX argmin's global-id tie-break); "dist" sorts by ascending
    lower-bound distance (stable, so equal-lb ties stay id-ordered) — the
    layout the kernel's early-exit sweep needs for dense scenes.  Unused
    slots hold id s_pad and lb 1e30.

    ``chunk_cover``: additionally return cmax (W, T, n_chunks) f32 — each
    SEG_CHUNK-aligned chunk's max passing-segment lb (-1 when none pass).
    A chunk with cmax < horizon has every hittable segment inside the
    lists, so the overflow chunk-walk can skip it exactly (round 4,
    dolphin-class fallback diet).  Requires s_pad % 64 == 0 (device
    tables are SEG_ALIGN-padded)."""
    f32 = jnp.float32
    s_pad = consts.shape[0]
    if circles is None:
        bcx, bcy, br = _tile_circles(
            width, height, zoom, off_x, off_y, tiles_x, tiles_y, tile_w,
            tile_h, px_start, diffusion_save,
        )
        n_tiles = tiles_x * tiles_y
    else:
        bcx, bcy, br = circles
        n_tiles = bcx.shape[0]

    # --- segment bounding circles from the intersection constants ---
    p0x = consts[:, dev.CONST_P0X]
    p0y = consts[:, dev.CONST_P0Y]
    ex = consts[:, dev.CONST_EX]
    ey = consts[:, dev.CONST_EY]
    valid = consts[:, dev.CONST_VALID] > 0.0
    mx = p0x + 0.5 * ex
    my = p0y + 0.5 * ey
    # chord half-length + silhouette band: the exact cubic can bulge up to
    # CONST_BAND beyond the chord, and the band-widened sweep can accept
    # hits there — the cull must stay conservative with respect to it.
    sr = 0.5 * jnp.sqrt(ex * ex + ey * ey) + consts[:, dev.CONST_BAND]

    ccx, ccy, cos_hw, sin_hw = _wedge_dirs(rpp, sw)
    iota = jnp.arange(s_pad, dtype=jnp.int32)

    # Tile batch size: peak HBM rides a handful of (TB, S) f32 arrays, so
    # bound TB * S at ~4M elements (dolphin 1080p: 130k cells x 28.8k
    # segments would otherwise hold several ~1 GB intermediates live).
    tb = max(1, min(n_tiles, (1 << 22) // max(s_pad, 1)))
    nb = -(-n_tiles // tb)
    pad = nb * tb - n_tiles

    def pad_t(v, fill):  # park padding tiles far away (lists unused); 1e18
        # (not 1e30) so dist = sqrt(dc^2) stays finite in f32
        if pad:
            v = jnp.concatenate([v, jnp.full((pad,), fill, f32)])
        return v.reshape(nb, tb)

    bcx_b = pad_t(bcx, 1e18)
    bcy_b = pad_t(bcy, 1e18)
    br_b = pad_t(br, 0.0)

    def one_batch(args):
        bcx, bcy, br = args  # (TB,)
        # --- cone test, same math as the kernel's chunk_lb ---
        dcx = mx[None, :] - bcx[:, None]  # (TB, S)
        dcy = my[None, :] - bcy[:, None]
        dist = jnp.sqrt(dcx * dcx + dcy * dcy)
        inv_dist = 1.0 / jnp.maximum(dist, 1e-6)
        reach = sr[None, :] + br[:, None]
        sin_chw = jnp.clip(reach * inv_dist, 0.0, 1.0)
        cos_chw = jnp.sqrt(jnp.maximum(1.0 - sin_chw * sin_chw, 0.0))
        overlap = dist <= reach
        dnx = dcx * inv_dist
        dny = dcy * inv_dist

        def one_wedge(wc):
            """Candidate ids of every batch tile for ONE wedge direction —
            the W axis is lax.map'ed so peak HBM stays at the (TB, S)
            working set."""
            wx, wy = wc
            cos_d = dnx * wx + dny * wy  # (TB, S)
            cos_lim = cos_hw * cos_chw - sin_hw * sin_chw
            mask = valid[None, :] & (overlap | (cos_d >= cos_lim))
            lb = jnp.where(
                mask, jnp.maximum(dist - reach, 0.0), jnp.float32(1e30)
            )
            if order == "dist":
                # stable sort by lb: equal-lb ties keep ascending id
                lbs, ids = jax.lax.sort(
                    (lb, jnp.broadcast_to(iota[None, :], lb.shape)),
                    dimension=-1, num_keys=1,
                )
                if s_pad > cand_len:
                    horizon = lbs[..., cand_len : cand_len + 1]
                else:
                    horizon = jnp.full(lbs.shape[:-1] + (1,), 1e30, f32)
                ids = ids[..., :cand_len]
                lbs = lbs[..., :cand_len]
                # masked entries keep their real id through the lb sort —
                # park them at s_pad so they hit the zero row downstream
                ids = jnp.where(lbs < 1e30, ids, jnp.int32(s_pad))
                lbs = jnp.concatenate([lbs, horizon], axis=-1)  # (TB, L+1)
            else:
                # --- compact passing ids (ascending) into fixed-L slots ---
                key = jnp.where(mask, iota[None, :], jnp.int32(s_pad))
                ids = jax.lax.sort(key, dimension=-1)[..., :cand_len]
                ids_safe = jnp.minimum(ids, s_pad - 1)
                lbs = jnp.where(
                    ids < s_pad,
                    jnp.take_along_axis(lb, ids_safe, axis=-1),
                    jnp.float32(1e30),
                )
            # count capped at cand_len + 1: the kernel reads
            # "count > cand_len" as the candidates-were-dropped signal.
            count = jnp.minimum(jnp.sum(mask, axis=-1), cand_len + 1).astype(
                jnp.int32
            )
            if chunk_cover:
                cm = jnp.max(
                    jnp.where(mask, jnp.maximum(dist - reach, 0.0), -1.0)
                    .reshape(mask.shape[0], s_pad // 64, 64),
                    axis=-1,
                )  # (TB, n_chunks)
            else:
                cm = jnp.zeros((mask.shape[0], 1), f32)
            return ids, count, lbs, cm

        return jax.lax.map(one_wedge, (ccx, ccy))  # (W, TB, ...)

    ids, count, lbs, cmax = jax.lax.map(one_batch, (bcx_b, bcy_b, br_b))
    # (nb, W, TB, ...) -> (W, T, ...)
    n_wedges = ccx.shape[0]
    ids = jnp.moveaxis(ids, 0, 1).reshape(n_wedges, nb * tb, -1)[:, :n_tiles]
    count = jnp.moveaxis(count, 0, 1).reshape(n_wedges, nb * tb)[:, :n_tiles]
    lbs = jnp.moveaxis(lbs, 0, 1).reshape(n_wedges, nb * tb, -1)[:, :n_tiles]
    cmax = jnp.moveaxis(cmax, 0, 1).reshape(n_wedges, nb * tb, -1)[:, :n_tiles]
    return ids, count, lbs, (cmax if chunk_cover else None)


def segment_candidates(
    consts: jax.Array,  # (S_pad, CONST_COLS) f32
    width: int,
    height: int,
    zoom,
    off_x,
    off_y,
    rpp: int,
    sw: int,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    px_start,
    diffusion_save: bool,
    cand_len: int = CAND_LEN,
) -> jax.Array:
    """Build (tiles, wedges, cand_len, CONST_COLS) candidate tables.

    Returns (cand (T, W, L, C), counts (T, W, 1) int32).

    Slot layout per (tile, wedge): gathered seg_consts rows of the passing
    segments in ascending id order; unused slots are zero rows (e = 0 rows
    can never pass the kernel's validity product).  COL_ID carries the
    original id; counts > cand_len signals overflow.
    """
    f32 = jnp.float32
    s_pad = consts.shape[0]
    ids, count, _, _ = _segment_ids(
        consts, width, height, zoom, off_x, off_y, rpp, sw, tiles_x, tiles_y,
        tile_w, tile_h, px_start, diffusion_save, cand_len,
    )
    consts_ext = jnp.concatenate([consts, jnp.zeros((1, consts.shape[1]), f32)], 0)
    cand = consts_ext[ids]  # (W, T, L, C)
    slot_used = ids < s_pad
    cand = cand.at[..., COL_ID].set(jnp.where(slot_used, ids, 0).astype(f32))
    return (
        jnp.swapaxes(cand, 0, 1),  # (T, W, L, C)
        jnp.swapaxes(count, 0, 1)[..., None],  # (T, W, 1) i32
    )


def segment_candidates_t(
    consts: jax.Array,  # (S_pad, CONST_COLS) f32
    shade_all_t: jax.Array,  # (ALLT_ROWS, S_pad) f32
    used_rows: tuple[int, ...],  # shade_all_t rows this scene's shading reads
    width: int,
    height: int,
    zoom,
    off_x,
    off_y,
    rpp: int,
    sw: int,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    px_start,
    diffusion_save: bool,
    cand_len: int = 128,
    with_shade: bool = True,
    order: str = "id",
    circles=None,
    geom_rows: tuple[int, ...] | None = None,
    chunk_cover: bool = False,
):
    """Transposed candidate tables — slots on the LANE axis (round 3).

    Returns (consts_t (T, W, TC_ROWS, L) f32,
             shade_hl (T, W, 2*G8, L) bf16   [None if not with_shade],
             counts (T, W, 1) int32,
             lbs (T, W, L//8 + 1) f32        [None unless order == "dist";
             PER-GROUP lower bounds: slots arrive distance-sorted, so an
             8-slot group's lb is its first slot's, and the kernel's walk
             exits / level horizons only ever read group boundaries —
             storing one lb per group cuts the per-program SMEM DMA 8x.
             Entry L//8 is the HORIZON — see _segment_ids],
             sgeom (T, W, 2*(G+2), L) bf16   [None unless geom_rows],
             ckeep (T, W, n_chunks) bool     [None unless chunk_cover])

    ``chunk_cover``: emit the per-(tile, wedge) chunk KEEP mask for the
    overflow fallback walk — False where every passing segment of the
    chunk has lb < horizon (i.e. is inside the lists), so chunk_candidates
    can drop it from the walk exactly (the fallback is seeded with the
    list state; re-sweeping covered chunks is pure waste — round 4,
    dolphin-class).

    ``geom_rows`` (round 4, the slot-geometry design): shade_all_t row ids
    (G of them — the kernel's fixed phase-1 geometry order) whose per-slot
    values are emitted as a SLOT-SPACE hi/lo gather table, plus two extra
    rows carrying each slot's GLOBAL id split as (hi = floor(id/128),
    lo = id - 128*hi) — both < 256 for every s_pad <= CAND_MAX_SPAD, so
    bf16 holds them exactly.  Row layout: [geom hi (G), id_hi, id_lo,
    geom lo-residuals (G), 0, 0] — the kernel's single hi+lo fold then
    reconstructs the G geometry rows bit-identically to the global
    phase-1 gather (same bf16 splits) AND yields the winner's global id,
    so capped-list scenes need neither the per-(wedge, level) slot->id
    remap matmuls nor the phase-1 chunk-span walk.
    where G8 = len(used_rows) padded to a multiple of 8 and shade_hl stacks
    bf16 high halves over bf16 f32-residuals (the same hi/lo one-hot-matmul
    gather precision as the global shade table, ~2^-17 relative).

    vs round 2's (T, W, L, C): the minor dims are now (rows, 128 lanes), so
    XLA stores them unpadded — 14x less HBM — and the kernel can gather the
    winner's shade row from the LIST SLOT space with a cand_len-row one-hot
    instead of a 128-row one over global ids.  Slots stay in ascending
    global-id order (slot-order ties == global-id-order ties == the JAX
    path's argmin).  Unused slots are zero rows (e = 0 never passes the
    validity product).
    """
    f32 = jnp.float32
    s_pad = consts.shape[0]
    ids, count, lbs, cmax = _segment_ids(
        consts, width, height, zoom, off_x, off_y, rpp, sw, tiles_x, tiles_y,
        tile_w, tile_h, px_start, diffusion_save, cand_len, order=order,
        circles=circles,
        chunk_cover=(chunk_cover and order == "dist" and s_pad % 64 == 0
                     and s_pad > cand_len),
    )
    # consts rows in TC_ORDER + global id row, zero column for unused slots
    csel = jnp.concatenate(
        [
            consts[:, list(TC_ORDER)],
            jnp.arange(s_pad, dtype=f32)[:, None],  # TC_ID row
        ],
        axis=1,
    )  # (S, 8)
    csel = jnp.concatenate([csel, jnp.zeros((1, TC_ROWS), f32)], 0)
    # Gather ROW BY ROW from 1-D views: csel[ids] (and even csel.T[:, ids])
    # canonicalizes to a gather producing an (W*T*L, 8) intermediate whose
    # 8 -> 128 HBM tile padding is 16x — lady_bug 1080p OOMed 15.75 GB on
    # exactly that transient.  Per-row gathers keep every intermediate at a
    # 128-lane minor dim ((W, T, L) f32, ~134 MB each at 1080p).
    consts_t = jnp.stack(
        [csel[:, r][ids] for r in range(TC_ROWS)], axis=-2
    )  # (W, T, 8, L)

    shade_hl = None
    if with_shade:
        g8 = -(-len(used_rows) // 8) * 8
        sel = shade_all_t[jnp.asarray(used_rows, jnp.int32)]  # (G, S)
        sel = jnp.concatenate([sel, jnp.zeros((sel.shape[0], 1), f32)], 1)
        shade = sel[:, ids]  # (G, W, T, L)
        shade = jnp.moveaxis(shade, 0, 2)  # (W, T, G, L)
        if g8 != len(used_rows):
            shade = jnp.pad(
                shade, ((0, 0), (0, 0), (0, g8 - len(used_rows)), (0, 0))
            )
        hi = shade.astype(jnp.bfloat16)
        lo = (shade - hi.astype(f32)).astype(jnp.bfloat16)
        shade_hl = jnp.swapaxes(
            jnp.concatenate([hi, lo], axis=2), 0, 1
        )  # (T, W, 2*G8, L)

    sgeom = None
    if geom_rows is not None:
        # Slot-space geometry + global-id table (see the docstring).  Built
        # with the SAME per-row 1-D gathers as the shade table (minor-dim
        # padding trap, see consts_t above), chunked over tiles so peak HBM
        # stays at the output + one chunk's transients (the whole table is
        # (T, W, 2*(G+2), L) bf16 — GBs at 1080p dense configs).
        g = len(geom_rows)
        sel = shade_all_t[jnp.asarray(geom_rows, jnp.int32)]  # (G, S)
        sel_hi = sel.astype(jnp.bfloat16)
        sel_lo = (sel - sel_hi.astype(f32)).astype(jnp.bfloat16)
        # zero column for parked slots (id == s_pad)
        zcol = jnp.zeros((sel.shape[0], 1), jnp.bfloat16)
        sel_hi = jnp.concatenate([sel_hi, zcol], 1)
        sel_lo = jnp.concatenate([sel_lo, zcol], 1)
        n_w, n_t, cl = ids.shape
        tb = max(1, min(n_t, (1 << 21) // max(n_w * cl, 1)))
        nb = -(-n_t // tb)
        ids_p = ids
        if nb * tb != n_t:
            ids_p = jnp.concatenate(
                [ids, jnp.full((n_w, nb * tb - n_t, cl), s_pad, jnp.int32)],
                axis=1,
            )
        ids_b = jnp.moveaxis(ids_p.reshape(n_w, nb, tb, cl), 1, 0)

        def one_chunk(idc):  # (W, tb, L) -> (tb, W, 2*(G+2), L) bf16
            gid_hi = jnp.floor(idc.astype(f32) * f32(1.0 / 128.0))
            rows = (
                [sel_hi[r][idc] for r in range(g)]
                + [
                    gid_hi.astype(jnp.bfloat16),
                    (idc.astype(f32) - gid_hi * 128.0).astype(jnp.bfloat16),
                ]
                + [sel_lo[r][idc] for r in range(g)]
                + [jnp.zeros_like(idc, jnp.bfloat16)] * 2
            )
            return jnp.moveaxis(jnp.stack(rows, axis=-2), 0, 1)

        sgeom = jax.lax.map(one_chunk, ids_b)  # (nb, tb, W, rows, L)
        sgeom = sgeom.reshape(nb * tb, n_w, 2 * (g + 2), cl)[:n_t]

    ckeep = None
    if cmax is not None:
        # keep a chunk iff some passing segment was dropped from the lists
        # (lb >= horizon; ties keep — conservative).  Cells that did not
        # overflow never take the fallback, so their all-False rows are
        # unreachable.
        horizon = lbs[..., -1:]  # (W, T, 1)
        ckeep = jnp.swapaxes(cmax >= horizon, 0, 1)  # (T, W, C)

    return (
        jnp.swapaxes(consts_t, 0, 1),  # (T, W, TC_ROWS, L)
        shade_hl,
        jnp.swapaxes(count, 0, 1)[..., None],  # (T, W, 1) i32
        # per-GROUP lbs: entries 0, 8, ..., L (ends at the horizon slot L)
        jnp.swapaxes(lbs, 0, 1)[..., ::8] if order == "dist" else None,
        sgeom,
        ckeep,
    )


def idhl_from_tconsts(tconsts: jax.Array) -> jax.Array:
    """Precomputed hi/lo remap tables from the TC_ID row of transposed
    candidate tables — the host-side replacement for the kernel's per-
    (wedge, level) hierarchical id-table build (16 sublane slices + hi/lo
    split per remap, measured at ~53/139 ms of lady_bug/dolphin's frame,
    batch33) which depends only on prepass data, never on rays.

    Input (T, W, TC_ROWS, L) f32; returns (T, W, n_lvls*16, Gnp) bf16
    where Gnp = max(min(L, 128)//8, 16) slot groups (zero-padded lanes
    past the real group count: the kernel's group one-hot has no matching
    row there, so padding never reaches the contraction) and, for level
    ``lvl`` and group ``g``, rows [lvl*16, lvl*16+8) carry hi =
    floor(id/128) of the group's 8 slots and rows [lvl*16+8, lvl*16+16)
    carry lo = id - 128*hi (both < 256 for every s_pad <= CAND_MAX_SPAD,
    so bf16 is exact).  The kernel statically slices its level's (16, Gnp)
    block off the REF and contracts it against the (Gnp, R) group one-hot
    — the exact dot the in-kernel slices16 build fed, minus the build."""
    t, w_, rows, cl = tconsts.shape
    lvl_cap = min(cl, 128)
    n_lvls = cl // lvl_cap
    gn = lvl_cap // 8
    ids = tconsts[:, :, TC_ID, :]  # (T, W, L) f32, exact integers
    idr = ids.reshape(t, w_, n_lvls, gn, 8)
    hi = jnp.floor(idr * jnp.float32(1.0 / 128.0))
    blk = jnp.concatenate([hi, idr - hi * 128.0], axis=-1)  # (..., gn, 16)
    blk = jnp.swapaxes(blk, 3, 4)  # (T, W, n_lvls, 16, gn)
    blk = blk.reshape(t, w_, n_lvls * 16, gn)
    if gn < 16:  # bf16 VMEM blocks want a >= 16 lane dim
        blk = jnp.pad(blk, ((0, 0), (0, 0), (0, 0), (0, 16 - gn)))
    return blk.astype(jnp.bfloat16)


def chunk_candidates(
    chunk_bounds: jax.Array,  # (n_chunks, 4) f32 [cx, cy, r, 0]
    width: int,
    height: int,
    zoom,
    off_x,
    off_y,
    rpp: int,
    sw: int,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int,
    px_start,
    diffusion_save: bool,
    circles=None,
    keep=None,
):
    """Chunk-granularity candidate lists for multi-chunk scenes.

    Returns (ids (T, W, C) int32, lbs (T, W, C) f32, counts (T, W, 1) int32):
    for each (tile, wedge), the chunk ids passing the cone test sorted by
    conservative lower-bound distance, their bounds, and how many passed.
    The trace kernel walks the first `count` entries and stops early once
    the next lower bound exceeds the block's worst current closest hit —
    the sorted order is what makes the distance cull bite immediately
    (replaces round 1's per-(block, wedge) full scalar sweep with warm
    start, the wall on lady_bug/dolphin-class scenes).

    Primary rays only (unit directions; portal bounces full-sweep).

    ``keep``: optional (T, W, C) bool from segment_candidates_t's
    chunk_cover — chunks whose hittable segments are all inside the
    per-cell segment lists are dropped from the walk (exact: the fallback
    is seeded with the list state, so covered chunks cannot contribute a
    new winner).
    """
    f32 = jnp.float32
    n_chunks = chunk_bounds.shape[0]
    if circles is None:
        bcx, bcy, br = _tile_circles(
            width, height, zoom, off_x, off_y, tiles_x, tiles_y, tile_w,
            tile_h, px_start, diffusion_save,
        )
    else:
        bcx, bcy, br = circles
    ccx, ccy, cos_hw, sin_hw = _wedge_dirs(rpp, sw)

    cxs = chunk_bounds[:, 0]
    cys = chunk_bounds[:, 1]
    rs = chunk_bounds[:, 2]
    valid = cxs < 1e29  # padding chunks are parked at 1e30

    dcx = cxs[None, :] - bcx[:, None]  # (T, C)
    dcy = cys[None, :] - bcy[:, None]
    dist = jnp.sqrt(dcx * dcx + dcy * dcy)
    inv_dist = 1.0 / jnp.maximum(dist, 1e-6)
    reach = rs[None, :] + br[:, None]
    lb = jnp.maximum(dist - reach, 0.0)
    sin_chw = jnp.clip(reach * inv_dist, 0.0, 1.0)
    cos_chw = jnp.sqrt(jnp.maximum(1.0 - sin_chw * sin_chw, 0.0))
    overlap = dist <= reach

    n_wedges = rpp // sw
    if n_wedges > 1:
        # cos-monotonicity needs hw + chw <= pi, i.e. hw <= pi/2 — true for
        # every wedge count >= 2 (same constraint as the kernel's old
        # in-kernel test, which also only ran for n_wedges > 1).
        dnx = dcx * inv_dist
        dny = dcy * inv_dist
        cos_d = (
            dnx[None] * ccx[:, None, None] + dny[None] * ccy[:, None, None]
        )  # (W, T, C)
        cos_lim = (cos_hw * cos_chw - sin_hw * sin_chw)[None]
        mask = valid[None, None, :] & (overlap[None] | (cos_d >= cos_lim))
    else:
        # single wedge = full circle: distance ordering only
        mask = jnp.broadcast_to(valid[None, None, :], (1,) + dist.shape)

    if keep is not None:
        mask = mask & jnp.swapaxes(keep, 0, 1)  # (W, T, C)
    big = jnp.float32(1e30)
    lbs = jnp.where(mask, lb[None], big)  # (W, T, C)
    ids = jnp.broadcast_to(
        jnp.arange(n_chunks, dtype=jnp.int32)[None, None, :], mask.shape
    )
    lbs, ids = jax.lax.sort((lbs, ids), dimension=-1, num_keys=1)
    counts = jnp.sum(mask, axis=-1).astype(jnp.int32)  # (W, T)
    # (T, W, C) layout: each program takes its tile's whole wedge block (the
    # kernel loops wedges in-kernel) — the (1, W, C) block equals the
    # trailing array dims, satisfying Mosaic's block-divisibility rule.
    return (
        jnp.swapaxes(ids, 0, 1),
        jnp.swapaxes(lbs, 0, 1),
        jnp.swapaxes(counts, 0, 1)[..., None],
    )
