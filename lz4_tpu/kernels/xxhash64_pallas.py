"""Pallas TPU kernel: batched XXH64 over uniform-length blocks.

Same lane-parallel shape as the XXH32 kernel (1024 blocks per [8, 128]
tile, word-major layout, grid-accumulated stripe chunks) with all 64-bit
arithmetic emulated as (hi, lo) uint32 register pairs — add-with-carry,
rotates, and 64x64→low-64 multiplies from 16-bit partial products — since
TPUs have no native int64. Algorithm per ``xxhash64_hash.template:27-103``.

Input layout: the same flattened ``uint32[NT*W32, 8, 128]`` used by the
XXH32 kernel (W32 = L/4 32-bit words per block); a 32-byte stripe is eight
consecutive rows, u64 word k = rows (2k = lo, 2k + 1 = hi).
Restriction: uniform L ≡ 0 (mod 32); ragged shapes use xxhash_jax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q1 = 11400714785074694791
Q2 = 14029467366897019727
Q3 = 1609587929392839161
Q4 = 9650029242287828579
Q5 = 2870177450012600261
_M32 = 0xFFFFFFFF
_M16 = 0xFFFF

LANES = 128
SUBLANES = 8
TILE = SUBLANES * LANES


def _u(c):
    return jnp.uint32(c & _M32)


def _c64(value):
    return _u(value >> 32), _u(value)


def _add64(a, b):
    lo = a[1] + b[1]
    carry = (lo < a[1]).astype(jnp.uint32)
    return a[0] + b[0] + carry, lo


def _xor64(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def _rotl64(a, n):
    ah, al = a
    n %= 64
    if n == 0:
        return ah, al
    if n == 32:
        return al, ah
    if n < 32:
        return ((ah << n) | (al >> (32 - n)), (al << n) | (ah >> (32 - n)))
    m = n - 32
    return ((al << m) | (ah >> (32 - m)), (ah << m) | (al >> (32 - m)))


def _shr64(a, n):
    ah, al = a
    if n < 32:
        return ah >> n, (al >> n) | (ah << (32 - n))
    if n == 32:
        return jnp.zeros_like(ah), ah
    return jnp.zeros_like(ah), ah >> (n - 32)


def _mul32x32_64(a, b):
    x0 = a & _u(_M16)
    x1 = a >> 16
    y0 = b & _u(_M16)
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


def _mul64(a, b):
    hi, lo = _mul32x32_64(a[1], b[1])
    return hi + a[1] * b[0] + a[0] * b[1], lo


def _mul64c(a, c):
    """a * compile-time constant c."""
    ch, cl = _c64(c)
    hi, lo = _mul32x32_64(a[1], jnp.broadcast_to(cl, a[1].shape))
    return hi + a[1] * ch + a[0] * cl, lo


def _round64(v, xh, xl):
    t = _add64(v, _mul64c((xh, xl), Q2))
    return _mul64c(_rotl64(t, 31), Q1)


def _kernel(seed_ref, words_ref, outh_ref, outl_ref, v_scratch, *,
            chunk_w: int, total_len: int):
    k = pl.program_id(1)
    num_chunks = pl.num_programs(1)
    shape = (SUBLANES, LANES)

    @pl.when(k == 0)
    def _init():
        sh = jnp.full(shape, seed_ref[0], jnp.uint32)
        sl = jnp.full(shape, seed_ref[1], jnp.uint32)
        seed = (sh, sl)
        v1 = _add64(_add64(seed, _bc(_c64(Q1), shape)), _bc(_c64(Q2), shape))
        v2 = _add64(seed, _bc(_c64(Q2), shape))
        v3 = seed
        v4 = _add64(seed, _bc(_c64((1 << 64) - Q1), shape))
        for i, v in enumerate((v1, v2, v3, v4)):
            v_scratch[2 * i] = v[0]
            v_scratch[2 * i + 1] = v[1]

    def two_stripes(g, vs):
        # 16 rows = two 32-byte stripes; u64 word k = rows (2k lo, 2k+1 hi)
        rows = words_ref[pl.ds(pl.multiple_of(g * 16, 8), 16), :, :]
        v = list(vs)
        for stripe in range(2):
            base = stripe * 8
            for lane in range(4):
                xl = rows[base + 2 * lane]
                xh = rows[base + 2 * lane + 1]
                v[lane] = _round64(v[lane], xh, xl)
        return tuple(v)

    vs = tuple((v_scratch[2 * i], v_scratch[2 * i + 1]) for i in range(4))
    vs = lax.fori_loop(0, chunk_w // 16, two_stripes, vs)
    for i, v in enumerate(vs):
        v_scratch[2 * i] = v[0]
        v_scratch[2 * i + 1] = v[1]

    @pl.when(k == num_chunks - 1)
    def _finalize():
        v = [(v_scratch[2 * i], v_scratch[2 * i + 1]) for i in range(4)]
        h = _add64(_add64(_rotl64(v[0], 1), _rotl64(v[1], 7)),
                   _add64(_rotl64(v[2], 12), _rotl64(v[3], 18)))
        zero = (jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32))
        for i in range(4):
            h = _xor64(h, _round64(zero, v[i][0], v[i][1]))
            h = _add64(_mul64c(h, Q1), _bc(_c64(Q4), shape))
        h = _add64(h, (jnp.zeros(shape, jnp.uint32),
                       jnp.full(shape, jnp.uint32(total_len))))
        h = _xor64(h, _shr64(h, 33))
        h = _mul64c(h, Q2)
        h = _xor64(h, _shr64(h, 29))
        h = _mul64c(h, Q3)
        h = _xor64(h, _shr64(h, 32))
        outh_ref[0] = h[0]
        outl_ref[0] = h[1]


def _bc(c, shape):
    return jnp.broadcast_to(c[0], shape), jnp.broadcast_to(c[1], shape)


def _pick_chunk(w: int, target: int = 1024) -> int:
    """Largest divisor of w that is a multiple of 16 and <= target."""
    best = 16
    for c in range(16, min(w, target) + 1, 16):
        if w % c == 0:
            best = c
    return best


@functools.partial(jax.jit, static_argnames=("total_len", "interpret"))
def xxh64_words_pallas_dynseed(words, total_len: int, seed_arr,
                               interpret: bool = False):
    """Traced-seed variant (uint32[2] = [hi, lo]) for the amortized
    benchmark protocol."""
    return _xxh64_words_call(words, total_len, seed_arr, interpret)


@functools.partial(jax.jit, static_argnames=("total_len", "seed", "interpret"))
def xxh64_words_pallas(words, total_len: int, seed: int = 0,
                       interpret: bool = False):
    """Batched XXH64 over tile-layout word data.

    Args:
      words: uint32[NT*W32, 8, 128], same layout as the XXH32 kernel
        (W32 = total_len // 4; u64 word k of a block = rows 2k lo, 2k+1 hi).
      total_len: static byte length of every block (multiple of 64 so the
        16-row chunk step stays aligned; others use xxhash_jax).
      seed: static python int (any 64-bit value).

    Returns: (hi uint32[NT*1024], lo uint32[NT*1024]).
    """
    wn, sub, lanes = words.shape
    if (sub, lanes) != (SUBLANES, LANES):
        raise ValueError(f"expected trailing dims (8, 128), got {(sub, lanes)}")
    w = total_len // 4
    if total_len % 64 != 0 or total_len == 0 or wn % w != 0:
        raise ValueError(f"bad total_len {total_len} for rows={wn}")
    nt = wn // w
    seed_arr = jnp.array([(seed >> 32) & _M32, seed & _M32], jnp.uint32)
    return _xxh64_words_call(words, total_len, seed_arr, interpret)


def _xxh64_words_call(words, total_len, seed_arr, interpret):
    wn, sub, lanes = words.shape
    w = total_len // 4
    nt = wn // w
    chunk_w = _pick_chunk(w)
    n_chunks = w // chunk_w

    outh, outl = pl.pallas_call(
        functools.partial(_kernel, chunk_w=chunk_w, total_len=total_len),
        grid=(nt, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk_w, SUBLANES, LANES),
                         lambda i, k, n=n_chunks: (i * n + k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, SUBLANES, LANES), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBLANES, LANES), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.uint32),
        ),
        scratch_shapes=[pltpu.VMEM((8, SUBLANES, LANES), jnp.uint32)],
        interpret=interpret,
    )(seed_arr, words)
    return outh.reshape(nt * TILE), outl.reshape(nt * TILE)
