"""Ray generation, closest-hit search and shading — pure-JAX path.

This is the XLA-fused (non-Pallas) implementation of the reference's OptiX
pipeline (DeviceCode.cu): ``make_rays`` is the raygen front half (:85-150),
``trace_and_shade`` replaces BVH traversal + __closesthit__/__miss__
(:185-342), and ``trace_full`` is the bounded *iterative* portal loop — the
formulation the reference sketched but abandoned in DeviceCodeIt.cu, which is
the natural shape for a lockstep SIMD machine.

The Pallas megakernel (ops/trace_pallas.py) implements the identical math
with explicit tiling; tests pin the two against each other.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Camera, RenderConfig
from ..scene import device as dev
from . import fastmath, refine, rng


class Hit(NamedTuple):
    """Per-ray closest-hit result, shaded."""

    hit: jax.Array  # bool: any valid intersection
    t: jax.Array  # ray parameter of the hit (= distance for unit dirs)
    color: jax.Array  # (N, 3) side color at the hit
    blur: jax.Array  # (N,)
    weight_mult: jax.Array  # (N,)
    weight_degree: jax.Array  # (N,)
    is_portal: jax.Array  # bool
    exit_origin: jax.Array  # (N, 2) portal exit point
    exit_dir: jax.Array  # (N, 2) portal exit direction (reference-scaled)


def make_rays(
    pixel_ids: jax.Array,
    sample_ids: jax.Array,
    width: int,
    height: int,
    camera: Camera | tuple,
    config: RenderConfig,
    frame: jax.Array | int = 0,
):
    """Stratified per-pixel ray fan (raygen, DeviceCode.cu:85-150).

    pixel_ids: (N,) int32 flat pixel index (row * width + col)
    sample_ids: (N,) int32 index of the ray within the pixel's fan

    Returns (origins (N,2), dirs (N,2)) float32.  Matches the reference:
    world origin ((col - w/2) * zoom + off_x, ...) with the y axis flipped
    for diffusion-curve saves (:103-107); base direction rotated 2*pi/N per
    sample with a uniform random rotation inside each 2*pi/N sector, plus a
    [0, zoom) origin jitter when AA is on (:117-137).
    """
    zoom, off_x, off_y = camera.zoom_factor, camera.offset_x, camera.offset_y
    n = jnp.float32(config.rays_per_pixel)
    col = pixel_ids % width
    row = pixel_ids // width

    ox = (col - width // 2).astype(jnp.float32) * zoom + off_x
    if config.diffusion_curve_save:
        oy = ((height - row) - height // 2).astype(jnp.float32) * zoom + off_y
    else:
        oy = (row - height // 2).astype(jnp.float32) * zoom + off_y

    # RNG stream is keyed on the flat ray id so the pure-JAX and Pallas paths
    # produce bit-identical jitter; one hash yields all three jitters.
    ray_ids = pixel_ids * config.rays_per_pixel + sample_ids
    u_rot, u_x, u_y = rng.uniform3(config.seed, ray_ids, frame)
    sector = jnp.float32(2.0 * np.pi) / n
    theta = sector * (sample_ids.astype(jnp.float32) + (u_rot if config.use_aa else 0.0))
    # Shared fast sincos (ops/fastmath.py) — the Pallas kernel uses the same
    # implementation so both paths emit bit-identical directions.
    sin_t, cos_t = fastmath.sincos(theta)
    dirs = jnp.stack([cos_t, sin_t], axis=-1)

    if config.use_aa:
        ox = ox + u_x * zoom
        oy = oy + u_y * zoom

    return jnp.stack([ox, oy], axis=-1), dirs


def closest_hit(
    scene: dev.DeviceScene,
    origins: jax.Array,
    dirs: jax.Array,
    min_hit_distance: float,
    band_scale=0.0,
):
    """Closest intersection of each ray against every sub-segment.

    Returns (best_idx (N,) int32, t (N,), s (N,) chord parameter, hit (N,) bool).
    Replaces optixTrace + the GAS (optixHello.cpp:764-830) with broadcast
    cross products over all segments and a min-reduction (brute force — the
    Pallas kernel adds the chunk-culling accelerator).  band_scale > 0
    widens acceptance by the silhouette band (exact-silhouette mode).
    """
    _, t, t_est, s, valid = dev.intersect_consts(
        scene.seg_consts, origins, dirs, min_hit=min_hit_distance,
        band_scale=band_scale,
    )
    # Rank by the quadratic-corrected estimate; band candidates can sit at
    # t <= 0, so clamp the ordering key exactly like the Pallas kernel's
    # positive-float bit-pattern packing.
    rank = jnp.where(valid, jnp.maximum(t_est, 1e-30), jnp.float32(np.inf))
    best = jnp.argmin(rank, axis=1).astype(jnp.int32)
    ar = jnp.arange(t.shape[0])
    hit = jnp.isfinite(rank[ar, best])
    best_t = jnp.where(hit, t[ar, best], jnp.float32(np.inf))
    best_s = jnp.clip(s[ar, best], 0.0, 1.0)
    return best, best_t, best_s, hit


def shade(
    scene: dev.DeviceScene,
    origins: jax.Array,
    dirs: jax.Array,
    best: jax.Array,
    t: jax.Array,
    s: jax.Array,
    hit: jax.Array,
    config: RenderConfig,
    refine_exact: bool | None = None,
) -> Hit:
    """Closest-hit shading (DeviceCode.cu:194-342): Newton refinement onto
    the exact cubic, attribute lerp, side test against the curve normal, and
    portal exit ray computation. Mirrors the Pallas kernel's shading stage
    (ops/trace_pallas.py) — the two are pinned by tests/test_pallas.py."""
    rows = jnp.take(scene.shade_all_t, best, axis=1)  # (ALLT_ROWS, N)

    def g(row, n=1):
        return rows[row : row + n, :]

    ox, oy = origins[:, 0], origins[:, 1]
    dx, dy = dirs[:, 0], dirs[:, 1]

    # Newton-refine onto the exact cubic (ops/refine.py); tau0 from the
    # chord parameter and the sub-segment's parameter window.
    t0 = g(dev.ALLT_T0)[0]
    dt = g(dev.ALLT_DT)[0]
    cx = tuple(g(dev.ALLT_SRC_CTRL + 2 * i)[0] for i in range(4))
    cy = tuple(g(dev.ALLT_SRC_CTRL + 2 * i + 1)[0] for i in range(4))
    if refine_exact is None:
        refine_exact = config.exact_silhouettes
    if refine_exact:
        # Exact silhouettes: the sweep accepted band candidates; a strict
        # chord hit is a guaranteed crossing (chord endpoints lie on the
        # curve), and band-only candidates need Newton's residual to
        # converge on one.
        gex = g(dev.SHADE_COLS + dev.CONST_EX)[0]
        gey = g(dev.SHADE_COLS + dev.CONST_EY)[0]
        # Window margin = the parameter reach of the capsule band around this
        # chord (see refine_hit_exact): ties between adjacent windows then
        # resolve to the same crossing in both backends.
        band = g(dev.ALLT_BAND)[0]
        chord = jnp.sqrt(gex * gex + gey * gey)
        margin = jnp.clip(
            refine.MARGIN_SCALE * band * dt / jnp.maximum(chord, 1e-9), 0.0, 1.0
        )
        tau, t_ref, _, _, dbx, dby, conv = refine.refine_hit_exact(
            cx, cy, t0 + s * dt, t0, dt, ox, oy, dx, dy, t,
            config.min_hit_distance, margin=margin,
        )
        gc1 = g(dev.SHADE_COLS + dev.CONST_C1)[0]
        gp0x = g(dev.SHADE_COLS + dev.CONST_P0X)[0]
        gp0y = g(dev.SHADE_COLS + dev.CONST_P0Y)[0]
        gden = dx * gey - dy * gex
        gnum_t = gc1 - ox * gey + oy * gex
        gnum_s = dy * gp0x - dx * gp0y + (oy * dx - ox * dy)
        strict = (gnum_s * (gden - gnum_s) >= 0.0) & (
            (gnum_t - jnp.float32(config.min_hit_distance) * gden) * gden > 0.0
        )
        hit = hit & (conv | strict)
    else:
        tau, t_ref, _, _, dbx, dby = refine.refine_hit(
            cx, cy, t0 + s * dt, ox, oy, dx, dy, t, config.min_hit_distance
        )
    t = jnp.where(hit, t_ref, t)
    sf = jnp.clip((tau - t0) / jnp.where(dt == 0.0, 1.0, dt), 0.0, 1.0)[:, None]

    def lerp(c0, c1, width=1):
        a = rows[c0 : c0 + width, :].T
        b = rows[c1 : c1 + width, :].T
        return a + (b - a) * sf

    # Exact right-hand normal (dy, -dx) at the refined parameter
    # (calculateSplineNormal, DeviceCode.cu:64-68).
    normal = jnp.stack([dby, -dbx], axis=-1)
    # Side test with the diffusion-save flip (isRayRight, DeviceCode.cu:78-83).
    ndotd = jnp.sum(normal * dirs, axis=-1)
    is_right = (ndotd <= 0.0) ^ bool(config.diffusion_curve_save)

    color_l = lerp(dev.COL_CL0, dev.COL_CL1, 3)
    color_r = lerp(dev.COL_CR0, dev.COL_CR1, 3)
    color = jnp.where(is_right[:, None], color_r, color_l)

    blur = lerp(dev.COL_BLUR0, dev.COL_BLUR1)[:, 0]
    wm = lerp(dev.COL_WM0, dev.COL_WM1)[:, 0]
    wd = lerp(dev.COL_WD0, dev.COL_WD1)[:, 0]
    is_portal = g(dev.COL_PORTAL)[0] > 0.0

    # Portal exit (DeviceCode.cu:227-257) at the exact refined parameter on
    # the exact target cubic.  The reference's "sin" is nx*dy + ny*dx — not
    # a cross product — and the rotated direction is not renormalized; both
    # reproduced verbatim since hit distances downstream are measured in
    # ray-parameter units exactly like optixGetRayTmax().
    nrm = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-30)
    ray_cos = jnp.sum(nrm * dirs, axis=-1)
    ray_sin = nrm[:, 0] * dirs[:, 1] + nrm[:, 1] * dirs[:, 0]
    tcx = tuple(g(dev.ALLT_TGT_CTRL + 2 * i)[0] for i in range(4))
    tcy = tuple(g(dev.ALLT_TGT_CTRL + 2 * i + 1)[0] for i in range(4))
    ex_x, ex_y, ex_dbx, ex_dby = refine.bezier_and_derivative(tcx, tcy, tau)
    tnorm = jnp.stack([ex_dby, -ex_dbx], axis=-1)
    tnorm = tnorm / jnp.maximum(jnp.linalg.norm(tnorm, axis=-1, keepdims=True), 1e-30)
    exit_dir = jnp.stack(
        [
            tnorm[:, 0] * ray_cos - tnorm[:, 1] * ray_sin,
            tnorm[:, 1] * ray_cos + tnorm[:, 0] * ray_sin,
        ],
        axis=-1,
    )
    exit_origin = jnp.stack([ex_x, ex_y], axis=-1)

    return Hit(
        hit=hit,
        t=jnp.where(hit, t, 1.0),
        color=color,
        blur=blur,
        weight_mult=wm,
        weight_degree=wd,
        is_portal=is_portal & hit,
        exit_origin=exit_origin,
        exit_dir=exit_dir,
    )


def trace_and_shade(scene, origins, dirs, config: RenderConfig) -> Hit:
    if not config.exact_silhouettes:
        best, t, s, hit = closest_hit(
            scene, origins, dirs, config.min_hit_distance
        )
        return shade(scene, origins, dirs, best, t, s, hit, config)

    # Exact silhouettes: two winner chains, like the Pallas kernel.  The
    # band-widened winner is Newton-verified in shade(); rays whose band
    # winner is rejected (no real crossing) fall back to the STRICT winner,
    # which is a guaranteed crossing (chord endpoints lie on the curve).
    # Per-ray |d| scales the band (≈1 for unit primaries; portal
    # continuation rays are not renormalized, PARITY #11).
    band_scale = jnp.sqrt(jnp.sum(dirs * dirs, axis=-1))  # (N,)
    best_b, t_b, s_b, hit_b = closest_hit(
        scene, origins, dirs, config.min_hit_distance, band_scale=band_scale
    )
    best_s, t_s, s_s, hit_s = closest_hit(
        scene, origins, dirs, config.min_hit_distance
    )
    hb = shade(scene, origins, dirs, best_b, t_b, s_b, hit_b, config)
    # The strict chain's winners carry a guaranteed in-window crossing, so
    # the cheap Newton refine replaces root isolation (mirrors the Pallas
    # kernel's fb=True fallback evaluation).
    hs = shade(scene, origins, dirs, best_s, t_s, s_s, hit_s, config,
               refine_exact=False)
    # Per-ray CLEAN rule: when the band winner IS the strict winner (the
    # overwhelmingly common case away from silhouettes) the hit is a
    # guaranteed crossing and the cheap Newton refine is the decision — no
    # root isolation.  Isolation is reserved for band-only winners (grazes),
    # where multiple in-window crossings are live.  The Pallas kernel
    # applies the identical per-ray rule (and skips isolation entirely for
    # wedge blocks with no band-only winner).
    clean = hit_b & hit_s & (best_b == best_s)
    use_s = (hit_b & ~hb.hit & hit_s) | clean

    def pick(a, b):
        m = use_s[:, None] if a.ndim == 2 else use_s
        return jnp.where(m, a, b)

    return Hit(*(pick(a, b) for a, b in zip(hs, hb)))


def trace_full(scene: dev.DeviceScene, origins: jax.Array, dirs: jax.Array, config: RenderConfig):
    """Full trace with bounded portal continuation.

    Returns per-ray (color (N,3), weight (N,), blur (N,)).

    Iterative reformulation of the recursive closest-hit program
    (DeviceCode.cu:219-342): across portal traversals the color filters
    multiply (:307-309), the blur values multiply (:311), and the weights
    combine harmonically — 1/(1/w_child + 1/w_self) (:310) — which is an
    additive accumulation of inverse weights.  A ray that exhausts
    max_trace_depth while still on a portal is a miss (:313-320).
    """
    n = origins.shape[0]
    f32 = jnp.float32
    filt = jnp.ones((n, 3), f32)
    inv_w = jnp.zeros((n,), f32)
    blur_prod = jnp.ones((n,), f32)
    out_color = jnp.zeros((n, 3), f32)
    out_w = jnp.zeros((n,), f32)
    out_blur = jnp.zeros((n,), f32)
    alive = jnp.ones((n,), bool)

    n_traces = (config.max_trace_depth + 1) if scene.has_portals else 1
    for _ in range(n_traces):
        h = trace_and_shade(scene, origins, dirs, config)
        w_self = h.weight_mult * jnp.power(h.t, -h.weight_degree)
        terminal = alive & h.hit & ~h.is_portal
        # Terminal hit: fold the accumulated portal filters into the result.
        # IEEE semantics are load-bearing, exactly as in the reference
        # (DeviceCode.cu:310): w_self == 0 => 1/0 = inf => weight 1/inf = 0,
        # so weight-0 curves occlude without contributing.
        w_final = 1.0 / (inv_w + 1.0 / w_self)
        out_color = jnp.where(terminal[:, None], filt * h.color, out_color)
        out_w = jnp.where(terminal, w_final, out_w)
        out_blur = jnp.where(terminal, blur_prod * h.blur, out_blur)
        # Portal hit: accumulate and continue through the portal.
        cont = alive & h.hit & h.is_portal
        filt = jnp.where(cont[:, None], filt * h.color, filt)
        inv_w = jnp.where(cont, inv_w + 1.0 / w_self, inv_w)
        blur_prod = jnp.where(cont, blur_prod * h.blur, blur_prod)
        origins = jnp.where(cont[:, None], h.exit_origin, origins)
        dirs = jnp.where(cont[:, None], h.exit_dir, dirs)
        # Miss (or terminal): ray is finished. Misses contribute weight 0.
        alive = cont

    return out_color, out_w, out_blur
