"""Pallas TPU kernels: on-device LZ4 block decompression.

Design (SURVEY.md §7 T1): LZ4 token streams are byte-serial, so a block is
decoded by one sequential program; throughput comes from block parallelism
and from keeping bulk byte movement vectorized. Mosaic only allows
128-aligned dynamic addressing on the lane dimension, so the kernel is built
from three aligned-window primitives (validated on hardware):

- scalar byte read  = aligned 128-load + select/reduce;
- unaligned window load  = aligned 256-load + dynamic lane rotate;
- unaligned window store = aligned 256 read-modify-write with a rotated
  value vector and an index mask.

Small-distance overlap matches (dist < 128) are handled by building a
periodic pattern vector via log-doubling with dynamic rotates — the vector
formulation of ``LZ4SafeUtils.safeIncrementalCopy``'s run-extension
semantics. Bytes are carried one-per-int32 (no sub-word vector addressing).

Malformed input sets a per-block error code with the same classification as
the reference decoders (``decompress.template:17-128``); kernels cannot
throw, so errors are checked host-side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import (
    COPY_LENGTH, MIN_MATCH, ML_BITS, ML_MASK, RUN_MASK,
)

OK = 0
ERR_MALFORMED = 1
ERR_DEST_TOO_SMALL = 2

CHUNK = 128          # copy window (one lane row)
PAD = 2 * CHUNK      # slack so 256-wide aligned windows never clamp


def _iota(n):
    return lax.broadcasted_iota(jnp.int32, (n,), 0)


def _roll2(vec, shift):
    """Dynamic circular roll of a 1-D vector (Mosaic needs rank >= 2)."""
    n = vec.shape[0]
    return pltpu.roll(vec.reshape(1, n), shift, 1).reshape(n)


def _read_byte(ref, idx):
    """ref[0, 0, idx] via an aligned window + select/reduce."""
    base = pl.multiple_of((idx // CHUNK) * CHUNK, CHUNK)
    w = ref[0, 0, pl.ds(base, CHUNK)]
    return jnp.sum(jnp.where(_iota(CHUNK) == idx - base, w, 0))


def _load_unaligned(ref, pos):
    """[CHUNK] values = ref[0, 0, pos:pos+CHUNK] (pos arbitrary).

    Two aligned window loads + a shared lane rotate + lane select (Mosaic
    has no 1-D concatenate and no unaligned vector loads).
    """
    base = pl.multiple_of((pos // CHUNK) * CHUNK, CHUNK)
    off = pos - base
    w1 = ref[0, 0, pl.ds(base, CHUNK)]
    w2 = ref[0, 0, pl.ds(base + CHUNK, CHUNK)]
    shift = (CHUNK - off) % CHUNK
    r1 = _roll2(w1, shift)
    r2 = _roll2(w2, shift)
    return jnp.where(_iota(CHUNK) < CHUNK - off, r1, r2)


def _store_unaligned(ref, pos, vals, n):
    """ref[0, 0, pos:pos+n] = vals[0:n] (pos arbitrary, n <= CHUNK).

    Two aligned read-modify-write stores sharing one rotated value vector.
    """
    base = pl.multiple_of((pos // CHUNK) * CHUNK, CHUNK)
    off = pos - base
    rolled = _roll2(vals, off)   # rolled[j] = vals[(j - off) mod CHUNK]
    io = _iota(CHUNK)
    cur1 = ref[0, 0, pl.ds(base, CHUNK)]
    mask1 = (io >= off) & (io < off + n)
    ref[0, 0, pl.ds(base, CHUNK)] = jnp.where(mask1, rolled, cur1)

    @pl.when(off + n > CHUNK)
    def _():
        cur2 = ref[0, 0, pl.ds(base + CHUNK, CHUNK)]
        mask2 = io + CHUNK < off + n
        ref[0, 0, pl.ds(base + CHUNK, CHUNK)] = jnp.where(mask2, rolled, cur2)


def _decompress_kernel(len_ref, comp_ref, out_ref, olen_ref, err_ref,
                       *, omax: int):
    """One block per grid step; len_ref is the scalar-prefetched lengths."""
    src_end = len_ref[pl.program_id(0)]
    dest_cap = jnp.int32(omax)

    def copy_literals(s, d, n):
        def body(i, _):
            off = i * CHUNK
            w = _load_unaligned(comp_ref, s + off)
            _store_unaligned(out_ref, d + off, w, jnp.minimum(CHUNK, n - off))
            return 0
        lax.fori_loop(0, (n + CHUNK - 1) // CHUNK, body, 0)

    def copy_match(d, dist, n):
        def far(_):
            def body(i, _):
                off = i * CHUNK
                w = _load_unaligned(out_ref, d - dist + off)
                _store_unaligned(out_ref, d + off, w,
                                 jnp.minimum(CHUNK, n - off))
                return 0
            lax.fori_loop(0, (n + CHUNK - 1) // CHUNK, body, 0)
            return 0

        def near(_):
            # build pattern[j mod dist] for j < CHUNK via log-doubling, then
            # copy in chunks that are a multiple of dist so every chunk
            # starts at phase 0 (no per-chunk pattern rotation needed)
            pw = _load_unaligned(out_ref, d - dist)   # first `dist` valid
            io = _iota(CHUNK)
            p = jnp.where(io < dist, pw, 0)
            width = dist
            for _step in range(7):  # dist * 2^7 >= 128 for any dist >= 1
                p = jnp.where(io < width, p, _roll2(p, width))
                width = width * 2

            chunk_eff = (CHUNK // dist) * dist

            def body(i, _):
                off = i * chunk_eff
                _store_unaligned(out_ref, d + off, p,
                                 jnp.minimum(chunk_eff, n - off))
                return 0
            lax.fori_loop(0, (n + chunk_eff - 1) // chunk_eff, body, 0)
            return 0

        lax.cond(dist >= CHUNK, far, near, 0)

    def read_ext_len(s, base):
        def cond(st):
            return jnp.logical_not(st[3])

        def body(st):
            s, length, b, _ = st
            in_range = s < src_end
            bb = jnp.where(in_range,
                           _read_byte(comp_ref, jnp.minimum(s, src_end - 1)),
                           jnp.int32(0xFF))
            s2 = jnp.where(in_range, s + 1, s)
            is_ff = in_range & (bb == 0xFF)
            return (s2, jnp.where(is_ff, length + 0xFF, length), bb,
                    jnp.logical_not(is_ff))

        s, length, b, _ = lax.while_loop(
            cond, body, (s, base, jnp.int32(0xFF), jnp.array(False)))
        return s, length + b

    def main(_):
        def cond(st):
            s, d, err, done = st
            return jnp.logical_not(done) & (err == OK)

        def body(st):
            s, d, err, done = st
            bad_src = s >= src_end
            token = _read_byte(comp_ref, jnp.minimum(s, src_end - 1))
            s = s + 1

            lit_len = token >> ML_BITS
            s, lit_len = lax.cond(
                lit_len == RUN_MASK,
                lambda a: read_ext_len(a[0], a[1]),
                lambda a: a, (s, lit_len))

            lit_end = d + lit_len
            near_end = jnp.logical_or(lit_end > dest_cap - COPY_LENGTH,
                                      s + lit_len > src_end - COPY_LENGTH)
            overflow = lit_end > dest_cap
            not_exact = s + lit_len != src_end
            is_eof = near_end & jnp.logical_not(overflow | not_exact)

            @pl.when((is_eof | jnp.logical_not(near_end)) & (err == OK)
                     & jnp.logical_not(bad_src))
            def _():
                copy_literals(s, d, lit_len)

            err_now = jnp.where(
                bad_src, ERR_MALFORMED,
                jnp.where(near_end & overflow, ERR_DEST_TOO_SMALL,
                          jnp.where(near_end & not_exact, ERR_MALFORMED, OK)))
            s = s + lit_len
            d = lit_end
            done_now = is_eof

            def do_match(args):
                s, d = args
                bad2 = s + 2 > src_end
                lo = _read_byte(comp_ref, jnp.minimum(s, src_end - 1))
                hi = _read_byte(comp_ref, jnp.minimum(s + 1, src_end - 1))
                match_dec = lo | (hi << 8)
                s2 = s + 2
                bad_off = d - match_dec < 0

                m_len = token & ML_MASK
                s2, m_len = lax.cond(
                    m_len == ML_MASK,
                    lambda a: read_ext_len(a[0], a[1]),
                    lambda a: a, (s2, m_len))
                m_len = m_len + MIN_MATCH

                overflow2 = d + m_len > dest_cap
                e = jnp.where(bad2 | bad_off | overflow2, ERR_MALFORMED, OK)

                @pl.when((e == OK) & (match_dec > 0))
                def _():
                    copy_match(d, match_dec, m_len)

                d2 = jnp.where(e == OK, d + m_len, d)
                return s2, d2, e

            s, d, err_m = lax.cond(
                (err_now == OK) & jnp.logical_not(done_now),
                do_match, lambda a: (a[0], a[1], jnp.int32(OK)), (s, d))

            err = jnp.where(err_now != OK, err_now, err_m)
            return s, d, err, done_now

        s, d, err, _ = lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), jnp.int32(OK),
                         jnp.array(False)))
        return d, err

    def empty(_):
        ok = (src_end == 1) & (_read_byte(comp_ref, 0) == 0)
        return jnp.int32(0), jnp.where(ok, OK, ERR_DEST_TOO_SMALL)

    d, err = lax.cond(dest_cap == 0, empty, main, 0)
    i = pl.program_id(0)
    olen_ref[i] = d
    err_ref[i] = err


@functools.partial(jax.jit, static_argnames=("out_max", "interpret"))
def decompress_safe_pallas(comp, comp_lens, out_max: int,
                           interpret: bool = False):
    """Batched on-device safe decompression via the Pallas kernel.

    Args:
      comp: int32[N, CMAX + PAD] compressed bytes (one per element).
      comp_lens: int32[N] exact compressed lengths.
      out_max: static max decompressed size per block.

    Returns: (out int32[N, out_max + PAD], out_lens int32[N], err int32[N]).
    """
    n, cmax_pad = comp.shape
    if cmax_pad <= PAD:
        raise ValueError("comp must carry PAD slack columns")

    def r128(x):
        return (x + 127) & ~127

    cw = r128(cmax_pad)
    ow = r128(out_max + PAD)
    if cw != cmax_pad:
        comp = jnp.pad(comp, ((0, 0), (0, cw - cmax_pad)))
    comp3 = comp.reshape(n, 1, cw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, cw), lambda i, lens: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, ow), lambda i, lens: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole-array SMEM blocks: each grid step writes its own slot
            pl.BlockSpec((n,), lambda i, lens: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((n,), lambda i, lens: (0,), memory_space=pltpu.SMEM),
        ),
    )
    out, olen, err = pl.pallas_call(
        functools.partial(_decompress_kernel, omax=out_max),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1, ow), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
        ),
        interpret=interpret,
    )(comp_lens, comp3)
    return out.reshape(n, ow)[:, :out_max + PAD], olen, err
