"""Newton refinement of chord hits against the true cubic.

The flattened-segment intersection (ARCHITECTURE.md) finds the winner and an
O(1/K^2)-accurate hit; two Newton iterations on

    F(tau) = cross(d, B(tau) - o) = 0

(the ray-line/curve equation) move the hit onto the exact Bezier, eliminating
flattening facets under zoom and reproducing the reference's implicit-curve
intersection (OptiX round B-spline primitive) up to winner selection.  All
functions are elementwise/broadcast-shape agnostic so the identical code runs
in the pure-JAX path and inside the Pallas kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

# One iteration suffices: the chord start point is O(1/K^2) px from the
# curve, and Newton convergence is quadratic — the residual lands far below
# a hundredth of a pixel.
NEWTON_ITERS = 1


def bezier_and_derivative(cx, cy, tau):
    """cx, cy: tuples of the 4 control coordinates (arrays). Returns
    (Bx, By, dBx, dBy) at tau."""
    x0, x1, x2, x3 = cx
    y0, y1, y2, y3 = cy
    mt = 1.0 - tau
    b0 = mt * mt * mt
    b1 = 3.0 * mt * mt * tau
    b2 = 3.0 * mt * tau * tau
    b3 = tau * tau * tau
    bx = b0 * x0 + b1 * x1 + b2 * x2 + b3 * x3
    by = b0 * y0 + b1 * y1 + b2 * y2 + b3 * y3
    d0 = 3.0 * mt * mt
    d1 = 6.0 * mt * tau
    d2 = 3.0 * tau * tau
    dbx = d0 * (x1 - x0) + d1 * (x2 - x1) + d2 * (x3 - x2)
    dby = d0 * (y1 - y0) + d1 * (y2 - y1) + d2 * (y3 - y2)
    return bx, by, dbx, dby


def refine_hit(cx, cy, tau0, ox, oy, dx, dy, t_chord, min_hit):
    """Newton-refine the cubic parameter from the chord estimate tau0.

    Returns (tau, t_ref, bx, by, dbx, dby): the refined parameter, the hit
    distance in ray-parameter units (valid for non-unit directions:
    t = (B - o) . d / (d . d)), and the exact position/derivative there.
    Falls back to (tau0, t_chord) when the ray runs nearly parallel to the
    curve tangent (|dF| ~ 0) or refinement leaves the valid range.
    """
    # Newton steps, keeping the tau0 evaluation around as the fallback —
    # exactly NEWTON_ITERS + 1 curve evaluations in total.
    b0 = bezier_and_derivative(cx, cy, tau0)
    tau, (bx, by, dbx, dby) = tau0, b0
    for _ in range(NEWTON_ITERS):
        f = dx * (by - oy) - dy * (bx - ox)
        df = dx * dby - dy * dbx
        step = jnp.where(jnp.abs(df) > 1e-12, f / jnp.where(df == 0.0, 1.0, df), 0.0)
        tau = jnp.clip(tau - step, 0.0, 1.0)
        bx, by, dbx, dby = bezier_and_derivative(cx, cy, tau)

    dd = dx * dx + dy * dy
    t_ref = ((bx - ox) * dx + (by - oy) * dy) / jnp.where(dd == 0.0, 1.0, dd)
    # Residual after refinement; a diverged ray keeps its chord solution.
    f = dx * (by - oy) - dy * (bx - ox)
    good = (t_ref >= min_hit) & (jnp.abs(f) < jnp.abs(t_chord) * 0.05 + 1.0)
    tau = jnp.where(good, tau, tau0)
    t_ref = jnp.where(good, t_ref, t_chord)
    out = tuple(jnp.where(good, a, b) for a, b in zip((bx, by, dbx, dby), b0))
    return tau, t_ref, out[0], out[1], out[2], out[3]
