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

    def zero_fill(d, n):
        # null match offset (match_dec == 0): the framework defines these
        # bytes as zeros in every tier (deterministic malformed-input
        # output; Pallas out buffers are not zero-initialized, so the fill
        # is explicit here)
        z = jnp.zeros((CHUNK,), jnp.int32)

        def body(i, _):
            off = i * CHUNK
            _store_unaligned(out_ref, d + off, z, jnp.minimum(CHUNK, n - off))
            return 0
        lax.fori_loop(0, (n + CHUNK - 1) // CHUNK, body, 0)

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

                @pl.when((e == OK) & (match_dec == 0))
                def _():
                    zero_fill(d, m_len)

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


# ---------------------------------------------------------------------------
# on-device fast-scan compressor
# ---------------------------------------------------------------------------
#
# The hash table lives in VMEM as (rows, 128) int32: entry h sits at
# (h >> 7, h & 127), so every probe/update is a single *aligned* row
# read-modify-write — no scatter needed. Match length scanning compares
# 128-byte windows per step and reduces to the first mismatch lane, which
# beats the byte/word-serial scan of the scalar tiers. Algorithm semantics
# (skip acceleration, emission order, bound checks) are exactly
# compress.template:16-261, so output is byte-identical to every other tier.

_HASH_MULT_C = -1640531535  # 2654435761 as signed int32


def _hash_k(v, hash_log: int):
    prod = (v * jnp.int32(_HASH_MULT_C)).astype(jnp.uint32)
    return (prod >> (32 - hash_log)).astype(jnp.int32)


def _extract(vec, idx):
    """Scalar = vec[idx] for a loaded [CHUNK] vector (select + reduce)."""
    return jnp.sum(jnp.where(_iota(CHUNK) == idx, vec, 0))


def _read_u32_k(ref, i):
    """Little-endian u32 at byte index i (bytes are int32 elements)."""
    w = _load_unaligned(ref, i)
    io = _iota(CHUNK)
    shift = jnp.where(io < 4, io * 8, 0)
    return jnp.sum(jnp.where(io < 4, w << shift, 0))


def _tbl_get(tbl, h):
    row = tbl[h >> 7, :]
    return jnp.sum(jnp.where(_iota(CHUNK) == (h & 127), row, 0))


def _tbl_set(tbl, h, val):
    row = tbl[h >> 7, :]
    tbl[h >> 7, :] = jnp.where(_iota(CHUNK) == (h & 127), val, row)


def _common_bytes_k(ref, o1, o2, limit):
    """Prefix match length via 128-byte vector compares."""
    def cond(st):
        return jnp.logical_not(st[1])

    def body(st):
        count, _ = st
        a = _load_unaligned(ref, o1 + count)
        b = _load_unaligned(ref, o2 + count)
        bad = (a != b) | ((o2 + count + _iota(CHUNK)) >= limit)
        first = jnp.min(jnp.where(bad, _iota(CHUNK), CHUNK))
        return count + first, first < CHUNK

    count, _ = lax.while_loop(cond, body, (jnp.int32(0), jnp.array(False)))
    return count


def _common_bytes_backward_k(ref, o1, o2, l1, l2):
    def cond(st):
        return jnp.logical_not(st[1])

    def body(st):
        count, _ = st
        ok = (o1 - count > l1) & (o2 - count > l2)
        a = _read_byte(ref, jnp.maximum(o1 - count - 1, 0))
        b = _read_byte(ref, jnp.maximum(o2 - count - 1, 0))
        ok = ok & (a == b)
        return jnp.where(ok, count + 1, count), jnp.logical_not(ok)

    count, _ = lax.while_loop(cond, body, (jnp.int32(0), jnp.array(False)))
    return count


def _compress_kernel(len_ref, src_ref, out_ref, olen_ref, err_ref, tbl,
                     *, dcap: int, hash_log: int, use_window: bool):
    src_len = len_ref[pl.program_id(0)]
    dest_cap = jnp.int32(dcap)
    src_end = src_len
    src_limit = src_end - jnp.int32(5)         # LAST_LITERALS
    mflimit = src_end - jnp.int32(12)          # MF_LIMIT

    n_rows = tbl.shape[0]
    tbl[...] = jnp.zeros((n_rows, CHUNK), jnp.int32)

    def put_byte(ref, pos, val):
        vec = jnp.where(_iota(CHUNK) == 0, val, 0)
        _store_unaligned(ref, pos, vec, 1)

    def write_len_ext(d, length):
        def wcond(st):
            return st[1] >= 0xFF

        def wbody(st):
            d, length = st
            put_byte(out_ref, d, jnp.int32(0xFF))
            return d + 1, length - 0xFF

        d, length = lax.while_loop(wcond, wbody, (d, length))
        put_byte(out_ref, d, length)
        return d + 1

    def copy_src_to_out(s, d, n):
        def body(i, _):
            off = i * CHUNK
            w = _load_unaligned(src_ref, s + off)
            _store_unaligned(out_ref, d + off, w, jnp.minimum(CHUNK, n - off))
            return 0
        lax.fori_loop(0, (n + CHUNK - 1) // CHUNK, body, 0)

    def run(_):
        def cond(st):
            s, d, anchor, err, done = st
            return jnp.logical_not(done) & (err == OK)

        def body(st):
            s, d, anchor, err, done = st

            # --- find a match (skip acceleration) ---
            def s_cond(ss):
                s_cur, fwd, step, nb, ref, found, exhausted = ss
                return jnp.logical_not(found | exhausted)

            def s_body(ss):
                s_cur, fwd, step, nb, ref, found, exhausted = ss
                s_new = fwd
                fwd2 = fwd + step
                step2 = nb >> 6                     # SKIP_STRENGTH
                nb2 = nb + 1
                exhausted2 = fwd2 > mflimit

                def probe(_):
                    h = _hash_k(_read_u32_k(src_ref, s_new), hash_log)
                    r = _tbl_get(tbl, h)
                    _tbl_set(tbl, h, s_new)
                    back = s_new - r
                    eq = _read_u32_k(src_ref, r) == _read_u32_k(src_ref, s_new)
                    if use_window:
                        return r, (back < 65536) & eq
                    return r, eq

                r2, found2 = lax.cond(
                    exhausted2, lambda _: (jnp.int32(0), jnp.array(False)),
                    probe, 0)
                return s_new, fwd2, step2, nb2, r2, found2, exhausted2

            s_cur, _, _, _, ref, found, exhausted = lax.while_loop(
                s_cond, s_body,
                (s, s, jnp.int32(1), jnp.int32(64), jnp.int32(0),
                 jnp.array(False), jnp.array(False)))

            def no_match(args):
                s, d, anchor, err = args
                return s, d, anchor, err, jnp.array(True)

            def with_match(args):
                s, d, anchor, err = args
                s = s_cur
                r = ref
                excess = _common_bytes_backward_k(src_ref, r, s, 0, anchor)
                s = s - excess
                r = r - excess

                run_len = s - anchor
                token_off = d
                d = d + 1
                over = d + run_len + 8 + (run_len >> 8) > dest_cap
                err = jnp.where(over, ERR_DEST_TOO_SMALL, err)

                def emit_lit(args):
                    d, _ = args
                    big = run_len >= RUN_MASK
                    put_byte(out_ref, token_off,
                             jnp.where(big, RUN_MASK << ML_BITS,
                                       run_len << ML_BITS))
                    d = lax.cond(big,
                                 lambda dd: write_len_ext(dd, run_len - RUN_MASK),
                                 lambda dd: dd, d)
                    copy_src_to_out(anchor, d, run_len)
                    return d + run_len, 0

                d, _ = lax.cond(err == OK, emit_lit, lambda a: a, (d, 0))

                # --- inner emit loop ---
                def i_cond(ist):
                    s, r, d, tok, err, leave, done = ist
                    return jnp.logical_not(leave) & (err == OK)

                def i_body(ist):
                    s, r, d, tok, err, leave, done = ist
                    back = s - r
                    put_byte(out_ref, d, back & 0xFF)
                    put_byte(out_ref, d + 1, (back >> 8) & 0xFF)
                    d = d + 2

                    s = s + MIN_MATCH
                    r = r + MIN_MATCH
                    match_len = _common_bytes_k(src_ref, r, s, src_limit)
                    over2 = d + 6 + (match_len >> 8) > dest_cap
                    err = jnp.where(over2, ERR_DEST_TOO_SMALL, err)
                    s = s + match_len

                    def emit_ml(args):
                        d, _ = args
                        big = match_len >= ML_MASK
                        cur = _read_byte(out_ref, tok)
                        put_byte(out_ref, tok,
                                 cur | jnp.where(big, ML_MASK, match_len))
                        d = lax.cond(
                            big,
                            lambda dd: write_len_ext(dd, match_len - ML_MASK),
                            lambda dd: dd, d)
                        return d, 0

                    d, _ = lax.cond(err == OK, emit_ml, lambda a: a, (d, 0))

                    end_chunk = s > mflimit

                    def after_end(args):
                        s, r, d, tok = args
                        return s, r, d, tok, jnp.array(True), jnp.array(True)

                    def try_next(args):
                        s, r, d, tok = args
                        h2 = _hash_k(_read_u32_k(src_ref, s - 2), hash_log)
                        _tbl_set(tbl, h2, s - 2)
                        h = _hash_k(_read_u32_k(src_ref, s), hash_log)
                        r_new = _tbl_get(tbl, h)
                        _tbl_set(tbl, h, s)
                        back = s - r_new
                        eq = _read_u32_k(src_ref, r_new) == _read_u32_k(src_ref, s)
                        if use_window:
                            again = (back < 65536) & eq
                        else:
                            again = eq

                        def cont(dd):
                            put_byte(out_ref, dd, 0)
                            return dd + 1

                        tok_new = jnp.where(again, d, tok)
                        d2 = lax.cond(again, cont, lambda dd: dd, d)
                        return (s, r_new, d2, tok_new,
                                jnp.logical_not(again), jnp.array(False))

                    s, r, d, tok, leave, done = lax.cond(
                        end_chunk | (err != OK), after_end, try_next,
                        (s, r, d, tok))
                    return s, r, d, tok, err, leave, done

                s, r, d, tok, err, _, done = lax.while_loop(
                    i_cond, i_body,
                    (s, r, d, token_off, err, jnp.array(False),
                     jnp.array(False)))

                anchor = s
                s = jnp.where(done, s, s + 1)
                return s, d, anchor, err, done

            s, d, anchor, err, done = lax.cond(
                exhausted, no_match, with_match, (s, d, anchor, err))
            return s, d, anchor, err, done

        s, d, anchor, err, _ = lax.while_loop(
            cond, body,
            (jnp.int32(1), jnp.int32(0), jnp.int32(0), jnp.int32(OK),
             jnp.array(False)))
        return d, anchor, err

    def skip(_):
        return jnp.int32(0), jnp.int32(0), jnp.int32(OK)

    d, anchor, err = lax.cond(src_len >= 13, run, skip, 0)  # MIN_LENGTH

    # last literals
    run_len = src_end - anchor
    over = d + run_len + 1 + (run_len + 255 - RUN_MASK) // 255 > dest_cap
    err = jnp.where((err == OK) & over, ERR_DEST_TOO_SMALL, err)

    def last(args):
        d, _ = args
        big = run_len >= RUN_MASK
        vec = jnp.where(_iota(CHUNK) == 0,
                        jnp.where(big, RUN_MASK << ML_BITS,
                                  run_len << ML_BITS), 0)
        _store_unaligned(out_ref, d, vec, 1)
        d = d + 1
        d = lax.cond(big, lambda dd: write_len_ext(dd, run_len - RUN_MASK),
                     lambda dd: dd, d)
        copy_src_to_out(anchor, d, run_len)
        return d + run_len, 0

    d, _ = lax.cond(err == OK, last, lambda a: a, (d, 0))
    i = pl.program_id(0)
    olen_ref[i] = d
    err_ref[i] = err


@functools.partial(jax.jit, static_argnames=("dest_cap", "interpret"))
def compress_fast_pallas(src, src_lens, dest_cap: int,
                         interpret: bool = False):
    """Batched on-device fast-scan compression via the Pallas kernel.

    Per-block dispatch between the <64KB (13-bit hash) and windowed general
    (12-bit hash) variants is resolved statically from the row capacity:
    callers with mixed sizes should split batches (the reference picks per
    call, compress.template:146-147); for uniform frame pipelines every
    block takes the same path, keeping output byte-identical to the other
    tiers.

    Args:
      src: int32[N, L + PAD] input bytes (one per element).
      src_lens: int32[N] exact lengths (every block must be on the same
        side of LZ4_64K_LIMIT as the static capacity L).
      dest_cap: static per-block output capacity.

    Returns: (out int32[N, dest_cap + PAD], out_lens int32[N], err int32[N]).
    """
    from ..core.constants import HASH_LOG, HASH_LOG_64K, LZ4_64K_LIMIT
    n, l_pad = src.shape
    l_cap = l_pad - PAD
    if l_cap + PAD != l_pad or l_cap < 0:
        raise ValueError("src must carry PAD slack columns")
    small = l_cap < LZ4_64K_LIMIT
    hash_log = HASH_LOG_64K if small else HASH_LOG
    use_window = not small
    n_rows = (1 << hash_log) // CHUNK

    def r128(x):
        return (x + 127) & ~127

    sw = r128(l_pad)
    ow = r128(dest_cap + PAD)
    if sw != l_pad:
        src = jnp.pad(src, ((0, 0), (0, sw - l_pad)))
    src3 = src.reshape(n, 1, sw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, sw), lambda i, lens: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, ow), lambda i, lens: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i, lens: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((n,), lambda i, lens: (0,), memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[pltpu.VMEM((n_rows, CHUNK), jnp.int32)],
    )
    out, olen, err = pl.pallas_call(
        functools.partial(_compress_kernel, dcap=dest_cap, hash_log=hash_log,
                          use_window=use_window),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1, ow), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.int32),
        ),
        interpret=interpret,
    )(src_lens, src3)
    return out.reshape(n, ow)[:, :dest_cap + PAD], olen, err
