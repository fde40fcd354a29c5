"""Device-resident streaming xxHash32/64: functional state + ``lax.scan``.

The TPU-native formulation of the reference's incremental hash state machines
(``xxhash32_streaming.template:26-139``, ``xxhash64_streaming.template``,
state layout ``AbstractStreamingXXHash32Java.java:22-44``): the streaming
state — four lane accumulators ``v1..v4``, the <16/32-byte remainder buffer,
and the 64-bit total length — is an immutable pytree of device arrays, and
chunk absorption is a jitted pure function of (state, chunk).  Bulk streams
run through ``lax.scan`` carrying the full state across fixed-size chunks
(SURVEY.md §7 item 6); a single ragged chunk advances with a dynamic-trip
``lax.fori_loop`` over its 16/32-byte stripes so short updates do not pay for
the padded capacity.

The digest is non-destructive, mirroring the reference
(``xxhash32_streaming.template:31-61``).  The 64-bit variant uses the
(hi, lo) uint32 emulation from ``u64_emul`` — TPUs have no native int64.

Semantics are pinned against the pure-Python oracle (core/xxhash_ref.py) in
tests/test_xxhash_stream.py, including the >2^32 ``total_len`` fold.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import u64_emul as u64
from .xxhash_jax import (
    _P1, _P2, _P3, _P4, _P5,
    _Q1, _Q2, _Q3, _Q4, _Q5,
    _avalanche32, _avalanche64, _rotl32, _round32, _round64,
)

_MEM32 = 16
_MEM64 = 32


class Stream32State(NamedTuple):
    """xxHash32 streaming state (all fields device arrays)."""
    seed: jnp.ndarray       # uint32[]
    v: jnp.ndarray          # uint32[4] lane accumulators
    mem: jnp.ndarray        # uint8[16] remainder buffer
    mem_size: jnp.ndarray   # int32[] valid bytes in mem (0..15)
    total_lo: jnp.ndarray   # uint32[] total length, low word
    total_hi: jnp.ndarray   # uint32[] total length, high word


class Stream64State(NamedTuple):
    """xxHash64 streaming state; v lanes as (hi, lo) uint32 pairs."""
    seed_hi: jnp.ndarray    # uint32[]
    seed_lo: jnp.ndarray    # uint32[]
    v_hi: jnp.ndarray       # uint32[4]
    v_lo: jnp.ndarray       # uint32[4]
    mem: jnp.ndarray        # uint8[32]
    mem_size: jnp.ndarray   # int32[]
    total_lo: jnp.ndarray   # uint32[]
    total_hi: jnp.ndarray   # uint32[]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def stream32_init(seed: int = 0) -> Stream32State:
    s = seed & 0xFFFFFFFF
    p1, p2 = int(_P1), int(_P2)
    v = np.array([(s + p1 + p2) & 0xFFFFFFFF, (s + p2) & 0xFFFFFFFF,
                  s, (s - p1) & 0xFFFFFFFF], np.uint32)
    return Stream32State(
        seed=jnp.uint32(s), v=jnp.asarray(v),
        mem=jnp.zeros((_MEM32,), jnp.uint8), mem_size=jnp.int32(0),
        total_lo=jnp.uint32(0), total_hi=jnp.uint32(0))


def stream64_init(seed: int = 0) -> Stream64State:
    s = seed & 0xFFFFFFFFFFFFFFFF
    lanes = [(s + 11400714785074694791 + 14029467366897019727),
             (s + 14029467366897019727),
             s,
             (s - 11400714785074694791)]
    lanes = [x & 0xFFFFFFFFFFFFFFFF for x in lanes]
    v_hi = np.array([x >> 32 for x in lanes], np.uint32)
    v_lo = np.array([x & 0xFFFFFFFF for x in lanes], np.uint32)
    return Stream64State(
        seed_hi=jnp.uint32(s >> 32), seed_lo=jnp.uint32(s & 0xFFFFFFFF),
        v_hi=jnp.asarray(v_hi), v_lo=jnp.asarray(v_lo),
        mem=jnp.zeros((_MEM64,), jnp.uint8), mem_size=jnp.int32(0),
        total_lo=jnp.uint32(0), total_hi=jnp.uint32(0))


# ---------------------------------------------------------------------------
# update (single ragged chunk)
# ---------------------------------------------------------------------------

def _splice(mem, mem_size, chunk, mem_bytes):
    """remainder ++ chunk laid into a static (cap + mem_bytes) buffer."""
    cap = chunk.shape[0]
    buf = jnp.zeros((cap + mem_bytes,), jnp.uint8)
    buf = buf.at[:mem_bytes].set(mem)
    return lax.dynamic_update_slice(buf, chunk, (mem_size,))


@jax.jit
def stream32_update(state: Stream32State, chunk, length) -> Stream32State:
    """Absorb ``chunk[:length]``; ``chunk`` is uint8[cap] with cap % 16 == 0."""
    cap = chunk.shape[0]
    assert cap % _MEM32 == 0, "chunk capacity must be a multiple of 16"
    length = jnp.int32(length)
    buf = _splice(state.mem, state.mem_size, chunk, _MEM32)
    total = state.mem_size + length
    n_stripes = total // _MEM32

    # uint32[S, 4]: stripe words, little-endian
    words = lax.bitcast_convert_type(
        buf.reshape(-1, 4, 4), jnp.uint32)  # [S, 4]

    def body(i, v):
        return _round32(v, words[i])

    v = lax.fori_loop(0, n_stripes, body, state.v)
    consumed = n_stripes * _MEM32
    new_mem = lax.dynamic_slice(buf, (consumed,), (_MEM32,))
    new_lo = state.total_lo + length.astype(jnp.uint32)
    carry = (new_lo < state.total_lo).astype(jnp.uint32)
    return Stream32State(
        seed=state.seed, v=v, mem=new_mem, mem_size=total - consumed,
        total_lo=new_lo, total_hi=state.total_hi + carry)


@jax.jit
def stream64_update(state: Stream64State, chunk, length) -> Stream64State:
    """Absorb ``chunk[:length]``; ``chunk`` is uint8[cap] with cap % 32 == 0."""
    cap = chunk.shape[0]
    assert cap % _MEM64 == 0, "chunk capacity must be a multiple of 32"
    length = jnp.int32(length)
    buf = _splice(state.mem, state.mem_size, chunk, _MEM64)
    total = state.mem_size + length
    n_stripes = total // _MEM64

    w32 = lax.bitcast_convert_type(buf.reshape(-1, 8, 4), jnp.uint32)  # [S, 8]
    w_lo, w_hi = w32[:, 0::2], w32[:, 1::2]  # each [S, 4], LE pairs

    def body(i, vs):
        vh, vl = vs
        nh, nl = _round64((vh, vl), (w_hi[i], w_lo[i]))
        return nh, nl

    v_hi, v_lo = lax.fori_loop(0, n_stripes, body, (state.v_hi, state.v_lo))
    consumed = n_stripes * _MEM64
    new_mem = lax.dynamic_slice(buf, (consumed,), (_MEM64,))
    new_lo = state.total_lo + length.astype(jnp.uint32)
    carry = (new_lo < state.total_lo).astype(jnp.uint32)
    return Stream64State(
        seed_hi=state.seed_hi, seed_lo=state.seed_lo,
        v_hi=v_hi, v_lo=v_lo, mem=new_mem, mem_size=total - consumed,
        total_lo=new_lo, total_hi=state.total_hi + carry)


# ---------------------------------------------------------------------------
# update (bulk: lax.scan carrying the state across full chunks)
# ---------------------------------------------------------------------------

@jax.jit
def stream32_update_scan(state: Stream32State, chunks) -> Stream32State:
    """Absorb ``chunks`` (uint8[n, cap], every chunk full) via ``lax.scan``
    carrying (v1..v4, remainder, total_len) — SURVEY.md §7 item 6."""
    cap = chunks.shape[1]

    def step(st, chunk):
        return stream32_update(st, chunk, jnp.int32(cap)), None

    state, _ = lax.scan(step, state, chunks)
    return state


@jax.jit
def stream64_update_scan(state: Stream64State, chunks) -> Stream64State:
    cap = chunks.shape[1]

    def step(st, chunk):
        return stream64_update(st, chunk, jnp.int32(cap)), None

    state, _ = lax.scan(step, state, chunks)
    return state


# ---------------------------------------------------------------------------
# digest (non-destructive)
# ---------------------------------------------------------------------------

@jax.jit
def stream32_digest(state: Stream32State):
    """uint32[] digest of everything absorbed so far; state unchanged."""
    v = state.v
    converged = (_rotl32(v[0], 1) + _rotl32(v[1], 7)
                 + _rotl32(v[2], 12) + _rotl32(v[3], 18))
    big = (state.total_hi > 0) | (state.total_lo >= _MEM32)
    h = jnp.where(big, converged, state.seed + _P5)
    h = h + state.total_lo  # Java adds the long totalLen into an int: low word

    words = lax.bitcast_convert_type(state.mem.reshape(4, 4), jnp.uint32)
    n_words = state.mem_size // 4
    for j in range(3):  # mem_size <= 15 -> at most 3 full words
        active = j < n_words
        h = jnp.where(active, _rotl32(h + words[j] * _P3, 17) * _P4, h)
    byte_start = n_words * 4
    n_bytes = state.mem_size - byte_start
    for k in range(3):
        active = k < n_bytes
        idx = jnp.minimum(byte_start + k, _MEM32 - 1)
        x = state.mem[idx].astype(jnp.uint32)
        h = jnp.where(active, _rotl32(h + x * _P5, 11) * _P1, h)
    return _avalanche32(h)


@jax.jit
def stream64_digest(state: Stream64State):
    """(hi, lo) uint32[] digest; state unchanged."""
    vh, vl = state.v_hi, state.v_lo
    lanes = [(vh[i], vl[i]) for i in range(4)]
    conv = u64.add64(u64.add64(u64.rotl64(lanes[0], 1), u64.rotl64(lanes[1], 7)),
                     u64.add64(u64.rotl64(lanes[2], 12), u64.rotl64(lanes[3], 18)))
    zero = (jnp.uint32(0), jnp.uint32(0))
    for lane in lanes:
        conv = u64.add64(u64.mul64(u64.xor64(conv, _round64(zero, lane)), _Q1),
                         _Q4)
    small = u64.add64((state.seed_hi, state.seed_lo), _Q5)
    big = (state.total_hi > 0) | (state.total_lo >= _MEM64)
    h = u64.where64(big, conv, small)
    h = u64.add64(h, (state.total_hi, state.total_lo))

    w32 = lax.bitcast_convert_type(state.mem.reshape(8, 4), jnp.uint32)  # [8]
    n_w64 = state.mem_size // 8
    for j in range(4):  # mem_size <= 31 -> at most 3 full u64 words
        active = j < n_w64
        x = (w32[2 * j + 1], w32[2 * j])
        k1 = _round64(zero, x)
        nh = u64.add64(u64.mul64(u64.rotl64(u64.xor64(h, k1), 27), _Q1), _Q4)
        h = u64.where64(active, nh, h)

    rem = state.mem_size - n_w64 * 8
    has4 = rem >= 4
    idx32 = jnp.minimum(n_w64 * 2, 7)
    x32 = u64.from_u32(w32[idx32])
    nh = u64.add64(u64.mul64(u64.rotl64(u64.xor64(h, u64.mul64(x32, _Q1)), 23),
                             _Q2), _Q3)
    h = u64.where64(has4, nh, h)

    byte_start = n_w64 * 8 + jnp.where(has4, 4, 0)
    n_bytes = rem - jnp.where(has4, 4, 0)
    for k in range(4):
        active = k < n_bytes
        idx = jnp.minimum(byte_start + k, _MEM64 - 1)
        x = u64.from_u32(state.mem[idx].astype(jnp.uint32))
        nh = u64.mul64(u64.rotl64(u64.xor64(h, u64.mul64(x, _Q5)), 11), _Q1)
        h = u64.where64(active, nh, h)
    return _avalanche64(h)


# ---------------------------------------------------------------------------
# host-facing helpers for the pallas-tier streaming classes
# ---------------------------------------------------------------------------

_CAP32 = 1 << 16
_CAP64 = 1 << 16


def absorb_bytes32(state: Stream32State, data) -> Stream32State:
    """Feed a host byte buffer through the device state machine.

    Full 64 KiB chunks ride ``lax.scan`` in one device call; the ragged tail
    takes one dynamic-length update.
    """
    arr = np.frombuffer(bytes(data), np.uint8)
    n_full = len(arr) // _CAP32
    if n_full:
        state = stream32_update_scan(
            state, jnp.asarray(arr[:n_full * _CAP32].reshape(n_full, _CAP32)))
    tail = arr[n_full * _CAP32:]
    if len(tail):
        chunk = np.zeros((_CAP32,), np.uint8)
        chunk[:len(tail)] = tail
        state = stream32_update(state, jnp.asarray(chunk),
                                jnp.int32(len(tail)))
    return state


def absorb_bytes64(state: Stream64State, data) -> Stream64State:
    arr = np.frombuffer(bytes(data), np.uint8)
    n_full = len(arr) // _CAP64
    if n_full:
        state = stream64_update_scan(
            state, jnp.asarray(arr[:n_full * _CAP64].reshape(n_full, _CAP64)))
    tail = arr[n_full * _CAP64:]
    if len(tail):
        chunk = np.zeros((_CAP64,), np.uint8)
        chunk[:len(tail)] = tail
        state = stream64_update(state, jnp.asarray(chunk),
                                jnp.int32(len(tail)))
    return state


def digest32(state: Stream32State) -> int:
    return int(np.asarray(stream32_digest(state)))


def digest64(state: Stream64State) -> int:
    hi, lo = stream64_digest(state)
    return (int(np.asarray(hi)) << 32) | int(np.asarray(lo))
