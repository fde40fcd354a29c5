"""Pallas TPU kernel: batched XXH32 over uniform-length blocks.

TPU-native formulation: independent blocks ride the vector unit — 1024
blocks at a time as an (8 sublanes × 128 lanes) tile — while the serial
xxHash stripe recurrence runs down the grid. Input is pre-laid-out
word-major as ``uint32[NT*W, 8, 128]`` (tile t's words at rows t*W..) so one
stripe step is four full-tile unit-stride VPU loads, no gathers (SURVEY.md §7 T1; stripe algorithm per
``xxhash32_hash.template:27-83``).

- grid = (NT block-tiles, W / CHUNK_W word-chunks); the chunk dimension is
  sequential with the four [8, 128] lane accumulators carried in VMEM
  scratch, initialized at the first chunk and folded + avalanched into the
  output at the last chunk (standard grid-accumulation pattern).
- Restriction: uniform block length L ≡ 0 (mod 32); N ≡ 0 (mod 1024).
  Ragged/odd shapes route to the general JAX path (xxhash_jax.xxh32_batch).

Each 16-byte stripe costs ~20 VPU ops over 1024 blocks → compute-dense
enough to be HBM-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# python ints; materialized as literals inside the kernel (pallas kernels
# may not capture traced constants)
_P1c, _P2c, _P3c, _P4c, _P5c = (2654435761, 2246822519, 3266489917,
                                668265263, 374761393)

LANES = 128
SUBLANES = 8
TILE = SUBLANES * LANES  # 1024 blocks per grid tile


def _rotl(v, n):
    return (v << n) | (v >> (32 - n))


def _u(c):
    return jnp.uint32(c)


def _round(v, x):
    return _rotl(v + x * _u(_P2c), 13) * _u(_P1c)


def _kernel(seed_ref, words_ref, out_ref, v_scratch, *, chunk_w: int,
            total_len: int):
    k = pl.program_id(1)
    num_chunks = pl.num_programs(1)

    @pl.when(k == 0)
    def _init():
        seed = seed_ref[0]
        shape = (SUBLANES, LANES)
        v_scratch[0] = jnp.full(shape, seed + _u(_P1c) + _u(_P2c), jnp.uint32)
        v_scratch[1] = jnp.full(shape, seed + _u(_P2c), jnp.uint32)
        v_scratch[2] = jnp.full(shape, seed, jnp.uint32)
        v_scratch[3] = jnp.full(shape, seed - _u(_P1c), jnp.uint32)

    def two_stripes(g, vs):
        v1, v2, v3, v4 = vs
        # 8 words x [8, 128] blocks per step = two 16-byte stripes
        rows = words_ref[pl.ds(pl.multiple_of(g * 8, 8), 8), :, :]
        v1 = _round(v1, rows[0])
        v2 = _round(v2, rows[1])
        v3 = _round(v3, rows[2])
        v4 = _round(v4, rows[3])
        v1 = _round(v1, rows[4])
        v2 = _round(v2, rows[5])
        v3 = _round(v3, rows[6])
        v4 = _round(v4, rows[7])
        return v1, v2, v3, v4

    vs = (v_scratch[0], v_scratch[1], v_scratch[2], v_scratch[3])
    v1, v2, v3, v4 = lax.fori_loop(0, chunk_w // 8, two_stripes, vs)
    v_scratch[0] = v1
    v_scratch[1] = v2
    v_scratch[2] = v3
    v_scratch[3] = v4

    @pl.when(k == num_chunks - 1)
    def _finalize():
        h = (_rotl(v_scratch[0], 1) + _rotl(v_scratch[1], 7)
             + _rotl(v_scratch[2], 12) + _rotl(v_scratch[3], 18))
        if total_len < 16:  # static: whole input shorter than one stripe
            h = jnp.full((SUBLANES, LANES), seed_ref[0] + _u(_P5c), jnp.uint32)
        h = h + jnp.uint32(total_len)
        h = h ^ (h >> 15)
        h = h * _u(_P2c)
        h = h ^ (h >> 13)
        h = h * _u(_P3c)
        h = h ^ (h >> 16)
        out_ref[0] = h


def _pick_chunk(w: int, target: int = 1024) -> int:
    """Largest divisor of w that is a multiple of 8 and <= target."""
    best = 8
    for c in range(8, min(w, target) + 1, 8):
        if w % c == 0:
            best = c
    return best


@functools.partial(jax.jit, static_argnames=("total_len", "interpret"))
def xxh32_words_pallas_dynseed(words, total_len: int, seed_arr,
                               interpret: bool = False):
    """As ``xxh32_words_pallas`` but with a traced uint32[1] seed array —
    used by the amortized benchmark protocol (distinct seeds defeat the
    relay's content memoization without staging copies)."""
    return _xxh32_words_call(words, total_len, seed_arr, interpret)


@functools.partial(jax.jit, static_argnames=("total_len", "seed", "interpret"))
def xxh32_words_pallas(words, total_len: int, seed: int = 0,
                       interpret: bool = False):
    """Batched XXH32 over tile-layout word data — the kernel-native layout.

    Args:
      words: uint32[NT*W, 8, 128] little-endian words; block
        b = t*1024 + s*128 + l has its word w at [t*W + w, s, l]
        (W = total_len // 4). This flattened layout avoids size-1 block
        dims, which Mosaic pipelines ~300x slower. It is the layout the
        sharded device pipeline keeps end-to-end.
      total_len: static byte length of every block (multiple of 32).
      seed: static python int.

    Returns: uint32[NT * 1024].
    """
    wn, sub, lanes = words.shape
    if (sub, lanes) != (SUBLANES, LANES):
        raise ValueError(f"expected trailing dims (8, 128), got {(sub, lanes)}")
    w = total_len // 4
    if total_len % 32 != 0 or total_len == 0 or wn % w != 0:
        raise ValueError(f"bad total_len {total_len} for rows={wn}")
    nt = wn // w
    seed_arr = jnp.full((1,), seed & 0xFFFFFFFF, jnp.uint32)
    return _xxh32_words_call(words, total_len, seed_arr, interpret)


def _xxh32_words_call(words, total_len, seed_arr, interpret):
    wn, sub, lanes = words.shape
    w = total_len // 4
    nt = wn // w
    chunk_w = _pick_chunk(w)
    n_chunks = w // chunk_w

    grid = (nt, n_chunks)
    out = pl.pallas_call(
        functools.partial(_kernel, chunk_w=chunk_w, total_len=total_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk_w, SUBLANES, LANES),
                         lambda i, k, n=n_chunks: (i * n + k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUBLANES, LANES), lambda i, k: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, SUBLANES, LANES), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((4, SUBLANES, LANES), jnp.uint32)],
        interpret=interpret,
    )(seed_arr, words)
    return out.reshape(nt * TILE)


def to_tile_layout(data):
    """uint8[N, L] -> uint32[NT*W, 8, 128] kernel layout (N % 1024 == 0)."""
    n, l = data.shape
    if n % TILE != 0:
        raise ValueError(f"N must be a multiple of {TILE}, got {n}")
    w = l // 4
    words = lax.bitcast_convert_type(
        data.reshape(n, w, 4), jnp.uint32)              # [N, W]
    return (words.reshape(n // TILE, SUBLANES, LANES, w)
            .transpose(0, 3, 1, 2)                      # [NT, W, 8, 128]
            .reshape((n // TILE) * w, SUBLANES, LANES))


@functools.partial(jax.jit, static_argnames=("seed", "interpret"))
def xxh32_uniform_pallas(data, seed: int = 0, interpret: bool = False):
    """Batched XXH32 of N equal-length blocks on TPU.

    Args:
      data: uint8[N, L] with N % 1024 == 0 and L % 32 == 0, L >= 32.
      seed: static python int.
      interpret: run in Pallas interpreter mode (for CPU tests).

    Returns: uint32[N].
    """
    n, l = data.shape
    return xxh32_words_pallas(to_tile_layout(data), l, seed, interpret)


def to_tile_layout_np(data):
    """Host (numpy) variant of ``to_tile_layout``.

    Prefer this on the host side: the device-side uint8 bitcast+transpose
    lowers to a byte-granularity relayout that is pathologically slow on
    TPU for some shapes.
    """
    import numpy as np
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n, l = data.shape
    if n % TILE != 0:
        raise ValueError(f"N must be a multiple of {TILE}, got {n}")
    w = l // 4
    words = data.reshape(n, w, 4).view(np.uint32).reshape(n, w)
    return np.ascontiguousarray(
        words.reshape(n // TILE, SUBLANES, LANES, w)
        .transpose(0, 3, 1, 2)
        .reshape((n // TILE) * w, SUBLANES, LANES))
