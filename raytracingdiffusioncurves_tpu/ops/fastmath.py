"""Fast transcendentals shared by BOTH trace paths.

The pure-JAX path and the Pallas megakernel are pinned against each other by
tests (tests/test_pallas.py), so a fast-math replacement for ``jnp.cos`` /
``jnp.sin`` must be ONE shared implementation: both paths then make
bit-identical raygen decisions in interpret mode.

``sincos`` evaluates both functions from one quadrant reduction — about half
the arithmetic of two library calls, with every operation a plain VPU
mul/add/select (no transcendental microcode).  Accuracy is ~1 ulp f32 over
the raygen range [0, 2*pi) (see tests/test_fastmath.py), far below the
renderer's Monte-Carlo noise floor.

Replaces the reference's device libm usage in raygen
(/root/reference/optixHello/DeviceCode.cu:128-133).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_TWO_OVER_PI = np.float32(0.6366197723675814)
# pi/2 split into float32 head + tail: delta = (x - q*HI) - q*LO is exact to
# ~1 ulp for the small quotients (q <= 4) raygen produces.
_PIO2_HI = np.float32(1.5707963705062866)
_PIO2_LO = np.float32(-4.371139000186241e-08)

# Cephes sinf/cosf minimax polynomials on [-pi/4, pi/4].
_S1 = np.float32(-1.6666654611e-1)
_S2 = np.float32(8.3321608736e-3)
_S3 = np.float32(-1.9515295891e-4)
_C1 = np.float32(4.166664568298827e-2)
_C2 = np.float32(-1.388731625493765e-3)
_C3 = np.float32(2.443315711809948e-5)


def sincos(theta):
    """(sin(theta), cos(theta)) for theta in [0, ~4*pi).

    Quadrant reduction by pi/2 (exact two-term subtraction), one shared
    polynomial pair, and branch-free quadrant selection.  Requires
    theta >= 0 (the truncating int cast below is floor only for
    non-negative arguments).
    """
    x = jnp.asarray(theta, jnp.float32)
    # round-to-nearest quadrant; trunc == floor since x >= 0
    q = (x * _TWO_OVER_PI + np.float32(0.5)).astype(jnp.int32)
    qf = q.astype(jnp.float32)
    d = (x - qf * _PIO2_HI) - qf * _PIO2_LO
    z = d * d
    s = ((_S3 * z + _S2) * z + _S1) * z * d + d
    c = ((_C3 * z + _C2) * z + _C1) * (z * z) - np.float32(0.5) * z + np.float32(1.0)
    swap = (q & 1) == 1
    sin_v = jnp.where(swap, c, s)
    cos_v = jnp.where(swap, s, c)
    # cos(d + q*pi/2) sign flips for q mod 4 in {1, 2}; sin for {2, 3}
    cos_v = jnp.where(((q + 1) & 2) != 0, -cos_v, cos_v)
    sin_v = jnp.where((q & 2) != 0, -sin_v, sin_v)
    return sin_v, cos_v
