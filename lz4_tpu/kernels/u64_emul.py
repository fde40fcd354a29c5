"""Unsigned-64-bit arithmetic as (hi, lo) uint32 pairs.

TPUs have no native int64 (and JAX x64 is off by default), so 64-bit hash
arithmetic is emulated with 32-bit vector lanes: add-with-carry, rotations,
and 64x64→low-64 multiply built from 16-bit partial products. All functions
take and return (hi, lo) tuples of uint32 arrays and are fully vectorized.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_U16 = np.uint32(0xFFFF)


def const64(value: int):
    """Python int -> (hi, lo) uint32 pair (numpy: no backend init at import)."""
    value &= (1 << 64) - 1
    return np.uint32(value >> 32), np.uint32(value & 0xFFFFFFFF)


def add64(a, b):
    ah, al = a
    bh, bl = b
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return ah + bh + carry, lo


def xor64(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def rotl64(a, n: int):
    ah, al = a
    n = n % 64
    if n == 0:
        return ah, al
    if n == 32:
        return al, ah
    if n < 32:
        hi = (ah << n) | (al >> (32 - n))
        lo = (al << n) | (ah >> (32 - n))
        return hi, lo
    m = n - 32
    hi = (al << m) | (ah >> (32 - m))
    lo = (ah << m) | (al >> (32 - m))
    return hi, lo


def shr64(a, n: int):
    ah, al = a
    if n == 0:
        return ah, al
    if n < 32:
        return ah >> n, (al >> n) | (ah << (32 - n))
    if n == 32:
        return jnp.zeros_like(ah), ah
    return jnp.zeros_like(ah), ah >> (n - 32)


def _mul32x32_64(a, b):
    """uint32 * uint32 -> (hi, lo) uint32 via 16-bit partial products."""
    x0 = a & _U16
    x1 = a >> 16
    y0 = b & _U16
    y1 = b >> 16
    m00 = x0 * y0
    m01 = x0 * y1
    m10 = x1 * y0
    m11 = x1 * y1
    mid = m01 + m10
    carry_mid = (mid < m01).astype(jnp.uint32)
    lo = m00 + (mid << 16)
    carry_lo = (lo < m00).astype(jnp.uint32)
    hi = m11 + (mid >> 16) + (carry_mid << 16) + carry_lo
    return hi, lo


def mul64(a, b):
    """(a * b) mod 2^64 on (hi, lo) pairs."""
    ah, al = a
    bh, bl = b
    hi, lo = _mul32x32_64(al, bl)
    hi = hi + al * bh + ah * bl
    return hi, lo


def broadcast64(c, shape):
    hi, lo = c
    return jnp.broadcast_to(hi, shape), jnp.broadcast_to(lo, shape)


def where64(pred, a, b):
    return jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1])


def from_u32(x):
    """Zero-extend uint32 array -> u64 pair."""
    return jnp.zeros_like(x), x


def to_python_ints(a):
    """(hi, lo) arrays -> list of python ints (host-side)."""
    import numpy as np
    hi = np.asarray(a[0], np.uint64)
    lo = np.asarray(a[1], np.uint64)
    return ((hi << np.uint64(32)) | lo).tolist()
