"""Counter-based stateless RNG for stratified sampling jitter.

The reference keeps one persistent curand state per pixel, seeded with the
pixel index (helperKernels.cu:151-160), and draws sequentially inside the ray
loop (DeviceCode.cu:120,135-136).  Persistent per-thread RNG state is a GPU
idiom; the TPU-native equivalent is a pure counter hash of
(seed, pixel, sample, frame, salt) — identical distribution, no state arrays,
and the same code runs in plain JAX, Pallas-compiled and Pallas-interpret
modes (uint32 ALU ops only).

The mix is the murmur3/splitmix 32-bit finalizer applied to a running
combine — not cryptographic, but well past the quality bar for Monte-Carlo
jitter (curand's XORWOW is in the same class).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_M1 = np.uint32(0x85EBCA6B)
_M2 = np.uint32(0xC2B2AE35)
_GOLDEN = np.uint32(0x9E3779B9)


def _fmix32(h):
    h = h ^ (h >> 16)
    h = h * _M1
    h = h ^ (h >> 13)
    h = h * _M2
    h = h ^ (h >> 16)
    return h


def hash_words(*words) -> jnp.ndarray:
    """Combine integer words (broadcastable arrays or scalars) into uniformly
    mixed uint32 bits."""
    h = np.uint32(0x2F6E2B1)
    for w in words:
        w = jnp.asarray(w).astype(jnp.uint32)
        h = (h ^ _fmix32(w + _GOLDEN)) * _M1 + _GOLDEN
    return _fmix32(h)


def uniform(*words) -> jnp.ndarray:
    """U[0, 1) float32 from hashed words.  (curand_uniform is (0, 1]; the
    open/closed end swap is distribution-equivalent.)"""
    bits = hash_words(*words)
    # Top 23 bits into the mantissa of [1, 2), minus 1.
    f = (bits >> np.uint32(9)) | np.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(f, jnp.float32) - np.float32(1.0)


def uniform3(*words):
    """Three U[0, 1) streams from ONE hash, bit-sliced (11+11+10 bits).

    The per-ray jitter needs three uniforms (sector rotation + x/y origin
    jitter, DeviceCode.cu:120,135-136); one 32-bit hash split into bit
    fields is 3x cheaper than three hashes and 10-11 bits of stratified
    jitter granularity is far below Monte-Carlo noise.  Fields of a mixed
    word are independent enough for jitter (not for statistics-grade use).
    """
    bits = hash_words(*words)
    # via int32: Mosaic has no uint32 -> f32 cast (fields are < 2^11, safe)
    u0 = (bits >> np.uint32(21)).astype(jnp.int32).astype(jnp.float32) * np.float32(
        1.0 / 2048.0
    )
    u1 = ((bits >> np.uint32(10)) & np.uint32(0x7FF)).astype(jnp.int32).astype(
        jnp.float32
    ) * np.float32(1.0 / 2048.0)
    u2 = (bits & np.uint32(0x3FF)).astype(jnp.int32).astype(jnp.float32) * np.float32(
        1.0 / 1024.0
    )
    return u0, u1, u2
