"""Batched xxHash32/64 in pure JAX — vectorized across blocks.

The xxHash stripe recurrence is serial *within* a stream, so the TPU-native
formulation vectorizes *across* independent blocks (SURVEY.md §7 T1): all N
blocks advance one 16/32-byte stripe per step, with per-block masking for
ragged lengths. This is the general (any-length, any-backend) device path;
the Pallas kernel (xxhash_pallas.py) is the uniform-length TPU fast path.

Semantics identical to the scalar reference (core/xxhash_ref.py), asserted in
tests. Reference algorithm: ``xxhash32_hash.template:27-83``,
``xxhash64_hash.template:27-103``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

import numpy as _np

# numpy scalars: identical dtype semantics in jnp expressions, but no JAX
# backend initialization at import time
_P1 = _np.uint32(2654435761)
_P2 = _np.uint32(2246822519)
_P3 = _np.uint32(3266489917)
_P4 = _np.uint32(668265263)
_P5 = _np.uint32(374761393)

from . import u64_emul as u64

_Q1 = u64.const64(11400714785074694791)
_Q2 = u64.const64(14029467366897019727)
_Q3 = u64.const64(1609587929392839161)
_Q4 = u64.const64(9650029242287828579)
_Q5 = u64.const64(2870177450012600261)


def _rotl32(v, n):
    return (v << n) | (v >> (32 - n))





def _round32(v, x):
    return _rotl32(v + x * _P2, 13) * _P1


def _round64(v, x):
    return u64.mul64(u64.rotl64(u64.add64(v, u64.mul64(x, _Q2)), 31), _Q1)


def _avalanche32(h):
    h = h ^ (h >> 15)
    h = h * _P2
    h = h ^ (h >> 13)
    h = h * _P3
    return h ^ (h >> 16)


def _avalanche64(h):
    h = u64.xor64(h, u64.shr64(h, 33))
    h = u64.mul64(h, _Q2)
    h = u64.xor64(h, u64.shr64(h, 29))
    h = u64.mul64(h, _Q3)
    return u64.xor64(h, u64.shr64(h, 32))


def bytes_to_words_u32(data_u8):
    """uint8[..., 4*W] -> uint32[..., W] little-endian."""
    shape = data_u8.shape[:-1] + (data_u8.shape[-1] // 4, 4)
    return lax.bitcast_convert_type(data_u8.reshape(shape), jnp.uint32)


def bytes_to_words_u64(data_u8):
    """uint8[..., 8*W] -> ((hi, lo) uint32[..., W]) little-endian pairs."""
    w32 = bytes_to_words_u32(data_u8)  # [..., 2W]; even=lo, odd=hi (LE)
    return w32[..., 1::2], w32[..., 0::2]


@functools.partial(jax.jit, static_argnames=("seed",))
def xxh32_batch(data, lengths, seed=0):
    """Batched XXH32 over N ragged blocks.

    Args:
      data: uint8[N, L] (L a multiple of 4; bytes beyond ``lengths`` ignored).
      lengths: int32[N] actual byte length per block (0 <= len <= L).
      seed: python int (static; masked to 32 bits).

    Returns: uint32[N] hashes.
    """
    n, l_cap = data.shape
    words = bytes_to_words_u32(data)  # [N, W]
    w = words.shape[1]
    lengths = lengths.astype(jnp.int32)
    seed = jnp.uint32(seed & 0xFFFFFFFF)

    n_stripes = lengths // 16              # full 16B stripes per block
    max_stripes = l_cap // 16

    v1 = jnp.full((n,), seed + _P1 + _P2, jnp.uint32)
    v2 = jnp.full((n,), seed + _P2, jnp.uint32)
    v3 = jnp.full((n,), seed, jnp.uint32)
    v4 = jnp.full((n,), seed - _P1, jnp.uint32)

    def stripe(i, vs):
        v1, v2, v3, v4 = vs
        active = i < n_stripes
        x = lax.dynamic_slice_in_dim(words, i * 4, 4, axis=1)  # [N, 4]
        v1 = jnp.where(active, _round32(v1, x[:, 0]), v1)
        v2 = jnp.where(active, _round32(v2, x[:, 1]), v2)
        v3 = jnp.where(active, _round32(v3, x[:, 2]), v3)
        v4 = jnp.where(active, _round32(v4, x[:, 3]), v4)
        return v1, v2, v3, v4

    if max_stripes > 0:  # static: avoid tracing 4-word slices on tiny L
        v1, v2, v3, v4 = lax.fori_loop(0, max_stripes, stripe,
                                       (v1, v2, v3, v4))

    converged = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12)
                 + _rotl32(v4, 18))
    h = jnp.where(lengths >= 16, converged, seed + _P5)
    h = h + lengths.astype(jnp.uint32)

    # tail: up to 3 word steps then up to 3 byte steps
    tail_start = n_stripes * 4            # word index of tail
    tail_bytes = lengths - n_stripes * 16
    n_tail_words = tail_bytes // 4
    rows = jnp.arange(n)
    for j in range(3):
        active = j < n_tail_words
        idx = jnp.minimum(tail_start + j, w - 1)
        x = words[rows, idx]
        h = jnp.where(active, _rotl32(h + x * _P3, 17) * _P4, h)

    byte_start = n_stripes * 16 + n_tail_words * 4
    n_tail_b = tail_bytes - n_tail_words * 4
    for k in range(3):
        active = k < n_tail_b
        idx = jnp.minimum(byte_start + k, l_cap - 1)
        x = data[rows, idx].astype(jnp.uint32)
        h = jnp.where(active, _rotl32(h + x * _P5, 11) * _P1, h)

    return _avalanche32(h)


@functools.partial(jax.jit, static_argnames=("seed",))
def xxh64_batch(data, lengths, seed=0):
    """Batched XXH64 over N ragged blocks.

    64-bit lanes are emulated as (hi, lo) uint32 pairs (u64_emul) since TPUs
    have no native int64.

    Args:
      data: uint8[N, L] (L a multiple of 8).
      lengths: int32[N].
      seed: python int (any 64-bit value).

    Returns: ((hi, lo) uint32[N]) pair; use ``u64_emul.to_python_ints`` or
    ``xxh64_batch_py`` for host-side ints.
    """
    n, l_cap = data.shape
    words_hi, words_lo = bytes_to_words_u64(data)  # each [N, W]
    w = words_hi.shape[1]
    words32 = bytes_to_words_u32(data)
    lengths = lengths.astype(jnp.int32)
    seed64 = u64.broadcast64(u64.const64(seed), (n,))

    n_stripes = lengths // 32
    max_stripes = l_cap // 32

    b = lambda c: u64.broadcast64(c, (n,))
    v1 = u64.add64(u64.add64(seed64, b(_Q1)), b(_Q2))
    v2 = u64.add64(seed64, b(_Q2))
    v3 = seed64
    # seed - Q1 == seed + (2^64 - Q1)
    neg_q1 = u64.const64((1 << 64) - 11400714785074694791)
    v4 = u64.add64(seed64, b(neg_q1))

    def stripe(i, vs):
        v1, v2, v3, v4 = vs
        active = i < n_stripes
        xh = lax.dynamic_slice_in_dim(words_hi, i * 4, 4, axis=1)
        xl = lax.dynamic_slice_in_dim(words_lo, i * 4, 4, axis=1)
        def upd(v, k):
            nv = _round64(v, (xh[:, k], xl[:, k]))
            return u64.where64(active, nv, v)
        return (upd(v1, 0), upd(v2, 1), upd(v3, 2), upd(v4, 3))

    if max_stripes > 0:  # static: avoid tracing 4-word slices on tiny L
        v1, v2, v3, v4 = lax.fori_loop(0, max_stripes, stripe,
                                       (v1, v2, v3, v4))

    conv = u64.add64(u64.add64(u64.rotl64(v1, 1), u64.rotl64(v2, 7)),
                     u64.add64(u64.rotl64(v3, 12), u64.rotl64(v4, 18)))
    zero = u64.broadcast64(u64.const64(0), (n,))
    for v in (v1, v2, v3, v4):
        conv = u64.add64(u64.mul64(u64.xor64(conv, _round64(zero, v)), b(_Q1)),
                         b(_Q4))
    small = u64.add64(seed64, b(_Q5))
    h = u64.where64(lengths >= 32, conv, small)
    h = u64.add64(h, u64.from_u32(lengths.astype(jnp.uint32)))

    rows = jnp.arange(n)
    tail_bytes = lengths - n_stripes * 32
    # up to 3 8-byte steps
    tail_start64 = n_stripes * 4
    n_tail_64 = tail_bytes // 8
    for j in range(4):
        active = j < n_tail_64
        idx = jnp.minimum(tail_start64 + j, w - 1)
        x = (words_hi[rows, idx], words_lo[rows, idx])
        k1 = _round64(zero, x)
        nh = u64.add64(u64.mul64(u64.rotl64(u64.xor64(h, k1), 27), b(_Q1)), b(_Q4))
        h = u64.where64(active, nh, h)

    # up to 1 4-byte step
    rem = tail_bytes - n_tail_64 * 8
    start32 = n_stripes * 8 + n_tail_64 * 2  # index in 32-bit words
    active4 = rem >= 4
    idx32 = jnp.minimum(start32, words32.shape[1] - 1)
    x32 = u64.from_u32(words32[rows, idx32])
    nh = u64.add64(u64.mul64(u64.rotl64(u64.xor64(h, u64.mul64(x32, b(_Q1))), 23),
                             b(_Q2)), b(_Q3))
    h = u64.where64(active4, nh, h)

    # up to 3 byte steps
    byte_start = n_stripes * 32 + n_tail_64 * 8 + jnp.where(active4, 4, 0)
    n_tail_b = rem - jnp.where(active4, 4, 0)
    for k in range(4):
        active = k < n_tail_b
        idx = jnp.minimum(byte_start + k, l_cap - 1)
        x = u64.from_u32(data[rows, idx].astype(jnp.uint32))
        nh = u64.mul64(u64.rotl64(u64.xor64(h, u64.mul64(x, b(_Q5))), 11), b(_Q1))
        h = u64.where64(active, nh, h)

    return _avalanche64(h)


def xxh64_batch_py(data, lengths, seed=0):
    """Host convenience: batched XXH64 returning python ints."""
    return u64.to_python_ints(xxh64_batch(data, lengths, seed))
