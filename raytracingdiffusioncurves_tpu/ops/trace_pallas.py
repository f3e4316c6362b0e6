"""The Pallas trace megakernel — the production TPU path.

One fused kernel replaces the reference's entire device pipeline
(raygen + BVH traversal + closest-hit + miss + portal recursion + the
per-pixel accumulation, DeviceCode.cu:85-342): ray generation, intersection
against every curve sub-segment, closest-hit selection, shading, the bounded
portal continuation loop, and the weighted per-pixel reduction, with nothing
spilled to HBM but the per-pixel sums.

Layout strategy (see scene/device.py):

* rays live on the lane axis (128-wide), segments on the sublane axis;
* intersection is 6 broadcast FMAs per (segment, ray) pair on the VPU over
  (SC, R) tiles, with an approximate reciprocal — exact t/s are recomputed
  per ray after the winner is known;
* the winning sub-segment's shade row is fetched with a one-hot matmul
  against ``shade_all_t`` (K = segment chunk -> real MXU contraction);
* per-pixel sums are one (rows, R) @ (R, PX) matmul.

The kernel runs in interpret mode off-TPU so the same code path is testable
on CPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Camera, RenderConfig
from ..scene import device as dev
from . import rng

# Segment chunk (sublane axis) processed per inner iteration.
SEG_CHUNK = 64
# Sentinel "no hit" distance (avoid inf arithmetic inside the kernel).
FAR = np.float32(1e30)


def _choose_block(rpp: int, rays_per_block: int) -> tuple[int, int]:
    """Rays per program R (multiple of 128 and of rpp) and pixels per program."""
    r = max(rays_per_block, rpp, 128)
    r = (r // rpp) * rpp if rpp <= r else rpp
    # round up to a lane multiple while keeping divisibility by rpp
    lcm = rpp * 128 // math.gcd(rpp, 128)
    r = ((r + lcm - 1) // lcm) * lcm
    return r, r // rpp


def _uniform(seed, ray_id, frame, salt):
    return rng.uniform(seed, ray_id, frame, salt)


def _trace_kernel(
    # SMEM scalars
    cam_ref,  # (8,) f32: zoom, off_x, off_y, frame, px_start, pad...
    # VMEM tables
    consts_ref,  # (S_pad, CONST_COLS)
    allt_hi_ref,  # (ALLT_ROWS, S_pad) bf16: shade+consts, high bf16 halves
    allt_lo_ref,  # (ALLT_ROWS, S_pad) bf16: f32 residuals
    # VMEM output
    out_ref,  # (1, 8, PX)
    *,
    width: int,
    height: int,
    s_pad: int,
    n_traces: int,
    config: RenderConfig,
    rays_per_program: int,
    px_per_program: int,
):
    R = rays_per_program
    PX = px_per_program
    rpp = config.rays_per_pixel
    n_chunks = s_pad // SEG_CHUNK if s_pad >= SEG_CHUNK else 1
    sc = min(SEG_CHUNK, s_pad)

    pid = pl.program_id(0)
    zoom = cam_ref[0]
    off_x = cam_ref[1]
    off_y = cam_ref[2]
    frame = cam_ref[3].astype(jnp.int32)
    px_start = cam_ref[4].astype(jnp.int32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
    ray_id = pid * R + lane
    pixel = px_start + ray_id // rpp
    sample = ray_id - (ray_id // rpp) * rpp
    # RNG stream keyed on the GLOBAL ray id so tile-sharded rendering is
    # bitwise identical to single-chip (tests/test_sharding.py).
    global_ray = pixel * rpp + sample

    # --- raygen (DeviceCode.cu:85-150) ---
    col = pixel % width
    row = pixel // width
    ox = (col - width // 2).astype(jnp.float32) * zoom + off_x
    if config.diffusion_curve_save:
        oy = ((height - row) - height // 2).astype(jnp.float32) * zoom + off_y
    else:
        oy = (row - height // 2).astype(jnp.float32) * zoom + off_y

    sector = jnp.float32(2.0 * np.pi) / jnp.float32(rpp)
    if config.use_aa:
        u_rot = _uniform(config.seed, global_ray, frame, 0)
        theta = sector * (sample.astype(jnp.float32) + u_rot)
        ox = ox + _uniform(config.seed, global_ray, frame, 1) * zoom
        oy = oy + _uniform(config.seed, global_ray, frame, 2) * zoom
    else:
        theta = sector * sample.astype(jnp.float32)
    dx = jnp.cos(theta)
    dy = jnp.sin(theta)

    # --- portal accumulation state (1, R) ---
    f32 = jnp.float32
    ones = jnp.ones((1, R), f32)
    zeros = jnp.zeros((1, R), f32)
    filt_r, filt_g, filt_b = ones, ones, ones
    inv_w = zeros
    blur_prod = ones
    out_r, out_g, out_b = zeros, zeros, zeros
    out_w, out_blur = zeros, zeros
    alive = ones > 0.0

    min_hit = jnp.float32(config.min_hit_distance)

    for _bounce in range(n_traces):
        # --- closest hit over segment chunks ---
        best_t = jnp.full((1, R), FAR, f32)
        best_i = jnp.zeros((1, R), jnp.int32)
        for c in range(n_chunks):
            sl = pl.ds(c * sc, sc)
            ex = consts_ref[sl, dev.CONST_EX : dev.CONST_EX + 1]
            ey = consts_ref[sl, dev.CONST_EY : dev.CONST_EY + 1]
            c1 = consts_ref[sl, dev.CONST_C1 : dev.CONST_C1 + 1]
            p0x = consts_ref[sl, dev.CONST_P0X : dev.CONST_P0X + 1]
            p0y = consts_ref[sl, dev.CONST_P0Y : dev.CONST_P0Y + 1]

            denom = dx * ey - dy * ex  # (sc, R)
            num_t = c1 - ox * ey + oy * ex
            num_s = dy * p0x - dx * p0y + (oy * dx - ox * dy)
            # Validity via exact division-free sign tests (s in [0,1] iff
            # num_s agrees in sign with denom and |num_s| <= |denom|); the
            # approximate reciprocal is used only for ORDERING candidate
            # hits, where its ~2^-14 error can at worst swap two
            # nearly-equidistant segments.
            neg = denom < 0.0
            adenom = jnp.abs(denom)
            ns = jnp.where(neg, -num_s, num_s)
            nt = jnp.where(neg, -num_t, num_t)
            # Padding rows have e = 0 => denom = 0 => always invalid, so no
            # explicit validity column is needed.
            ok = (
                (denom != 0.0)
                & (ns >= 0.0)
                & (ns <= adenom)
                & (nt >= min_hit * adenom)
            )
            # Approximate reciprocal + one Newton step: ~f32-accurate
            # ordering without the VPU divide. (The raw approximation's
            # ~2^-12 error is enough to mis-order candidate hits at curve
            # junctions.)
            ad = jnp.where(adenom == 0.0, 1.0, adenom)
            r0 = pl.reciprocal(ad, approx=True)
            r = r0 * (2.0 - ad * r0)
            t = nt * r
            tm = jnp.where(ok, t, FAR)
            c_min = jnp.min(tm, axis=0, keepdims=True)  # (1, R)
            # first index achieving the min (avoids argmin lowering)
            ids = jax.lax.broadcasted_iota(jnp.int32, (sc, R), 0)
            c_arg = jnp.min(jnp.where(tm == c_min, ids, s_pad), axis=0, keepdims=True)
            upd = c_min < best_t
            best_t = jnp.where(upd, c_min, best_t)
            best_i = jnp.where(upd, c_arg + c * sc, best_i)

        # --- gather the winner's shade row + geometry consts (MXU) ---
        # Near-exact f32 gather from two single-pass bf16 matmuls: the
        # tables are pre-split into bf16 high halves + bf16 residuals; with a
        # 0/1 one-hot operand every product is exact and every output column
        # has a single nonzero term, so hi + lo reconstructs the f32 row to
        # ~2^-17 relative (~16 mantissa bits) — far below the renderer's
        # pixel-scale tolerances.  (A plain f32 gather needs
        # Precision.HIGHEST = 6 MXU passes; this costs 2.)
        acc_hi = jnp.zeros((dev.ALLT_ROWS, R), f32)
        acc_lo = jnp.zeros((dev.ALLT_ROWS, R), f32)
        dims = (((1,), (0,)), ((), ()))
        for c in range(n_chunks):
            seg_ids = jax.lax.broadcasted_iota(jnp.int32, (sc, R), 0) + c * sc
            onehot = (seg_ids == best_i).astype(jnp.bfloat16)  # (sc, R)
            sl_c = pl.ds(c * sc, sc)
            acc_hi = acc_hi + jax.lax.dot_general(
                allt_hi_ref[:, sl_c], onehot, dims, preferred_element_type=f32
            )
            acc_lo = acc_lo + jax.lax.dot_general(
                allt_lo_ref[:, sl_c], onehot, dims, preferred_element_type=f32
            )
        acc = acc_hi + acc_lo

        def g(row, n=1):
            return acc[row : row + n, :]

        # Recompute exact t, s from the gathered per-segment consts — the
        # chunk loop used an approximate reciprocal for speed.
        gex = g(dev.SHADE_COLS + dev.CONST_EX)
        gey = g(dev.SHADE_COLS + dev.CONST_EY)
        gc1 = g(dev.SHADE_COLS + dev.CONST_C1)
        gp0x = g(dev.SHADE_COLS + dev.CONST_P0X)
        gp0y = g(dev.SHADE_COLS + dev.CONST_P0Y)
        gdenom = dx * gey - dy * gex
        ginv = jnp.where(gdenom == 0.0, 0.0, 1.0 / gdenom)
        t_hit = (gc1 - ox * gey + oy * gex) * ginv
        s_hit = jnp.clip((dy * gp0x - dx * gp0y + (oy * dx - ox * dy)) * ginv, 0.0, 1.0)
        hit = best_t < FAR
        t_hit = jnp.where(hit, t_hit, 1.0)

        def lerp(c0, c1_, n=1):
            a = acc[c0 : c0 + n, :]
            b = acc[c1_ : c1_ + n, :]
            return a + (b - a) * s_hit

        # Side test (isRayRight, DeviceCode.cu:78-83): normal = (dy, -dx) of
        # the curve derivative, flipped by the diffusion-save convention.
        d_tan = lerp(dev.COL_D0X, dev.COL_D1X, 2)
        nx, ny = d_tan[1:2, :], -d_tan[0:1, :]
        ndotd = nx * dx + ny * dy
        if config.diffusion_curve_save:
            is_right = ndotd > 0.0
        else:
            is_right = ndotd <= 0.0

        cl = lerp(dev.COL_CL0, dev.COL_CL1, 3)
        cr = lerp(dev.COL_CR0, dev.COL_CR1, 3)
        col_r = jnp.where(is_right, cr[0:1], cl[0:1])
        col_g = jnp.where(is_right, cr[1:2], cl[1:2])
        col_b = jnp.where(is_right, cr[2:3], cl[2:3])

        blur_h = lerp(dev.COL_BLUR0, dev.COL_BLUR1)
        wm = lerp(dev.COL_WM0, dev.COL_WM1)
        wd = lerp(dev.COL_WD0, dev.COL_WD1)
        is_portal = (g(dev.COL_PORTAL) > 0.0) & hit

        # weight = wm * t^(-wd) (DeviceCode.cu:330); IEEE 1/0=inf semantics
        # make weight-0 curves occlude without contributing (:310).
        w_self = wm * jnp.exp(-wd * jnp.log(jnp.maximum(t_hit, 1e-30)))

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
            tex = lerp(dev.COL_EXD0X, dev.COL_EXD1X, 2)
            tnx, tny = tex[1:2, :], -tex[0:1, :]
            tlen = jnp.sqrt(tnx * tnx + tny * tny)
            tinv = jnp.where(tlen > 0.0, 1.0 / tlen, 0.0)
            tnx, tny = tnx * tinv, tny * tinv
            ndx = tnx * r_cos - tny * r_sin
            ndy = tny * r_cos + tnx * r_sin
            exo = lerp(dev.COL_EXP0X, dev.COL_EXP1X, 2)
            ox = jnp.where(cont, exo[0:1], ox)
            oy = jnp.where(cont, exo[1:2], oy)
            dx = jnp.where(cont, ndx, dx)
            dy = jnp.where(cont, ndy, dy)
            alive = cont

    # --- per-pixel weighted reduction (DeviceCode.cu:153-181) ---
    rows = jnp.concatenate(
        [
            out_r * out_w,
            out_g * out_w,
            out_b * out_w,
            out_w,
            out_blur * out_w,
            jnp.zeros((3, R), f32),
        ],
        axis=0,
    )  # (8, R)
    ray_px = jax.lax.broadcasted_iota(jnp.int32, (R, PX), 0) // rpp
    px_ids = jax.lax.broadcasted_iota(jnp.int32, (R, PX), 1)
    reduce_oh = (ray_px == px_ids).astype(jnp.bfloat16)  # (R, PX)
    # Same bf16 hi/lo trick as the gather, but split at runtime; the MXU
    # accumulates in f32 so only input quantization matters, and hi+lo
    # reconstructs the f32 inputs exactly.
    rows_hi = rows.astype(jnp.bfloat16)
    rows_lo = (rows - rows_hi.astype(f32)).astype(jnp.bfloat16)
    dims2 = (((1,), (0,)), ((), ()))
    out_ref[0] = jax.lax.dot_general(
        rows_hi, reduce_oh, dims2, preferred_element_type=f32
    ) + jax.lax.dot_general(rows_lo, reduce_oh, dims2, preferred_element_type=f32)


def trace_sums(
    scene: dev.DeviceScene,
    camera: Camera,
    config: RenderConfig,
    frame=0,
    interpret: bool | None = None,
):
    """Trace the full frame; returns per-pixel (color_sum (H,W,3),
    weight_sum (H,W), blur_sum (H,W)) — the same contract as the pure-JAX
    ``_trace_sums_jax``."""
    h, w = scene.height, scene.width
    csum, wsum, bsum = trace_sums_flat(
        scene, camera, config, frame, 0, h * w, interpret=interpret
    )
    return csum.reshape(h, w, 3), wsum.reshape(h, w), bsum.reshape(h, w)


@functools.partial(jax.jit, static_argnames=("config", "n_px", "interpret"))
def trace_sums_flat(
    scene: dev.DeviceScene,
    camera: Camera,
    config: RenderConfig,
    frame,
    px_start,
    n_px: int,
    interpret: bool | None = None,
):
    """Trace pixels [px_start, px_start + n_px) of the scene's pixel grid;
    returns flat (color_sum (n_px, 3), weight_sum (n_px,), blur_sum (n_px,)).
    ``px_start`` is traced — tile offsets never recompile."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    h, w = scene.height, scene.width
    rpp = config.rays_per_pixel
    R, px_per_program = _choose_block(rpp, config.rays_per_block)
    n_blocks = -(-n_px // px_per_program)

    n_traces = (config.max_trace_depth + 1) if scene.has_portals else 1

    cam = jnp.asarray(
        [
            camera.zoom_factor,
            camera.offset_x,
            camera.offset_y,
            jnp.asarray(frame, jnp.float32),
            jnp.asarray(px_start, jnp.float32),
            0.0,
            0.0,
            0.0,
        ],
        jnp.float32,
    )

    kernel = functools.partial(
        _trace_kernel,
        width=w,
        height=h,
        s_pad=scene.s_pad,
        n_traces=n_traces,
        config=config,
        rays_per_program=R,
        px_per_program=px_per_program,
    )

    allt_hi = scene.shade_all_t.astype(jnp.bfloat16)
    allt_lo = (scene.shade_all_t - allt_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    sums = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, px_per_program), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_blocks, 8, px_per_program), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(cam, scene.seg_consts, allt_hi, allt_lo)

    sums = jnp.moveaxis(sums, 1, 0).reshape(8, n_blocks * px_per_program)
    return sums[0:3, :n_px].T, sums[3, :n_px], sums[4, :n_px]
