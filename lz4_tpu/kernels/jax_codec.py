"""Pure-JAX batched LZ4 block codec: jittable, vmappable, backend-agnostic.

This is the device-side re-formulation of the LZ4 block format as a lockstep
state machine (SURVEY.md §7 T1): every block is decoded/encoded by a
``lax.while_loop`` whose per-block scalar state is batched via ``jax.vmap``,
so N independent blocks advance together under one ``jit``. Byte copies are
chunked masked window copies (``dynamic_slice`` + ``dynamic_update_slice``);
overlap-aware match copies use modulo-gather into the (unmodified) match
window, which reproduces the run-extension semantics of
``LZ4SafeUtils.wild/safeIncrementalCopy`` without read-after-write hazards.

Device layout: bytes are carried one-per-int32 (values 0..255) because TPU
vector memory has no efficient sub-word scalar addressing; buffers carry a
``PAD`` slack so fixed-size windows never clamp. Kernels cannot throw, so
malformed input / overflow is reported through a per-block error code
(checked host-side), mirroring the plan in SURVEY.md §7 "hard parts" #5.

Algorithm semantics (hash probing, skip acceleration, emission order, bound
checks) match the reference codecs exactly — compressed output is
byte-identical to the safe/native tiers (asserted in tests/test_jax_kernels.py).
Reference: ``src/build/source_templates/compress.template:16-261``,
``decompress.template:17-128``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.constants import (
    COPY_LENGTH, HASH_LOG, HASH_LOG_64K, HASH_TABLE_SIZE, HASH_TABLE_SIZE_64K,
    LAST_LITERALS, LZ4_64K_LIMIT, MAX_DISTANCE, MF_LIMIT, MIN_LENGTH,
    MIN_MATCH, ML_BITS, ML_MASK, RUN_MASK, SKIP_STRENGTH,
)

# error codes surfaced per block (kernels cannot throw)
OK = 0
ERR_MALFORMED = 1
ERR_DEST_TOO_SMALL = 2

PAD = 64          # slack so fixed-size windows never go out of range
_CHUNK = 16       # window size for chunked copies

import numpy as _np

_HASH_MULT = _np.int32(-1640531535)  # == 2654435761 as uint32 (numpy: no backend init at import)


def _hash(v, hash_log: int):
    # (v * 2654435761) >>> (32 - hash_log) on uint32 semantics
    prod = (v * _HASH_MULT).astype(jnp.uint32)
    return (prod >> (32 - hash_log)).astype(jnp.int32)


def _read_u32le(buf, i):
    return (buf[i] | (buf[i + 1] << 8) | (buf[i + 2] << 16) | (buf[i + 3] << 24))


def _copy_forward(dst, dst_pos, src, src_pos, n):
    """dst[dst_pos:dst_pos+n] = src[src_pos:src_pos+n] in masked _CHUNK windows."""
    def body(i, dst):
        off = i * _CHUNK
        window = lax.dynamic_slice(src, (src_pos + off,), (_CHUNK,))
        cur = lax.dynamic_slice(dst, (dst_pos + off,), (_CHUNK,))
        mask = (jnp.arange(_CHUNK) + off) < n
        return lax.dynamic_update_slice(dst, jnp.where(mask, window, cur),
                                        (dst_pos + off,))
    return lax.fori_loop(0, (n + _CHUNK - 1) // _CHUNK, body, dst)


def _match_copy(dst, d_pos, dist, n):
    """Overlap-aware incremental copy: byte i reads dst[d_pos - dist + i mod' ...].

    For dist >= 1, index modulo the pattern window reproduces the
    run-extension behavior (pattern bytes live before d_pos and are never
    modified by this copy). dist == 0 is the reference's benign no-op
    (LZ4Test.testNullMatchDec).
    """
    safe_dist = jnp.maximum(dist, 1)
    m_off = d_pos - dist

    def body(i, dst):
        off = i * _CHUNK
        rel = (off + jnp.arange(_CHUNK)) % safe_dist
        window = dst[m_off + rel]
        cur = lax.dynamic_slice(dst, (d_pos + off,), (_CHUNK,))
        mask = ((jnp.arange(_CHUNK) + off) < n) & (dist > 0)
        return lax.dynamic_update_slice(dst, jnp.where(mask, window, cur),
                                        (d_pos + off,))
    return lax.fori_loop(0, (n + _CHUNK - 1) // _CHUNK, body, dst)


def _read_len_ext(src, s, src_end, base_len):
    """Read 0xFF-run length extension: the `while (b == 0xFF)` loop of
    decompress.template:27-33, with the Safe variant's src_end guard."""
    def cond(st):
        s, length, b, stop = st
        return jnp.logical_not(stop)

    def body(st):
        s, length, b, _ = st
        in_range = s < src_end
        b_new = jnp.where(in_range, src[jnp.minimum(s, src_end - 1)], jnp.int32(0xFF))
        s_new = jnp.where(in_range, s + 1, s)
        is_ff = jnp.logical_and(in_range, b_new == 0xFF)
        length_new = jnp.where(is_ff, length + 0xFF, length)
        stop = jnp.logical_not(is_ff)
        return s_new, length_new, b_new, stop

    s, length, b, _ = lax.while_loop(
        cond, body, (s, base_len, jnp.int32(0xFF), jnp.array(False)))
    # final non-0xFF byte is added (or 0xFF if the guard stopped the loop)
    return s, length + b


# ---------------------------------------------------------------------------
# decompress (safe variant: exact compressed size known)
# ---------------------------------------------------------------------------

def _decompress_one(comp, comp_len, out_max: int, fast: bool = False):
    """Decode one block. comp: int32[CMAX+PAD].

    Returns (out, out_len, src_read, err). ``fast=False`` implements the
    Safe-variant contract (exact compressed size; literals must end exactly
    at src_end), ``fast=True`` the Fast-variant contract (exact decompressed
    size drives EOF; comp_len is just the available bytes) — mirroring the
    two template variants (decompress.template:17-47).
    """
    dest_cap = out_max
    out = jnp.zeros((out_max + PAD,), jnp.int32)
    src_end = comp_len

    def empty_case(_):
        if fast:
            ok = comp[0] == 0
            err = jnp.where(ok, OK, ERR_MALFORMED)
            return out, jnp.int32(0), jnp.int32(1), jnp.int32(err)
        ok = jnp.logical_and(comp_len == 1, comp[0] == 0)
        err = jnp.where(ok, OK, ERR_DEST_TOO_SMALL)
        return out, jnp.int32(0), jnp.int32(1), jnp.int32(err)

    def main_case(_):
        def cond(st):
            s, d, out, err, done = st
            return jnp.logical_and(jnp.logical_not(done), err == OK)

        def body(st):
            s, d, out, err, done = st

            bad_src = s >= src_end
            token = comp[jnp.minimum(s, src_end - 1)]
            s = s + 1

            lit_len = token >> ML_BITS
            s, lit_len = lax.cond(
                lit_len == RUN_MASK,
                lambda a: _read_len_ext(comp, a[0], src_end, a[1]),
                lambda a: a, (s, lit_len))

            lit_end = d + lit_len
            if fast:
                near_end = lit_end > dest_cap - COPY_LENGTH
                overflow = jnp.array(False)
                not_exact = lit_end != dest_cap
            else:
                near_end = jnp.logical_or(lit_end > dest_cap - COPY_LENGTH,
                                          s + lit_len > src_end - COPY_LENGTH)
                overflow = lit_end > dest_cap
                not_exact = s + lit_len != src_end
            src_short = s + lit_len > src_end  # reading past available bytes

            # EOF literals-only case
            def eof_fn(out):
                return _copy_forward(out, d, comp, s, lit_len)
            is_eof = near_end & jnp.logical_not(overflow | not_exact | src_short)
            out = lax.cond(is_eof | jnp.logical_not(near_end),
                           lambda o: _copy_forward(o, d, comp, s, lit_len),
                           lambda o: o, out)

            err_now = jnp.where(
                bad_src, ERR_MALFORMED,
                jnp.where(near_end & overflow, ERR_DEST_TOO_SMALL,
                          jnp.where(near_end & not_exact, ERR_MALFORMED,
                                    jnp.where(near_end & src_short,
                                              ERR_MALFORMED, OK))))

            s = s + lit_len
            d = lit_end
            done_now = is_eof

            # match part (only when continuing)
            def match_fn(args):
                s, d, out = args
                off_lo = comp[jnp.minimum(s, src_end - 1)]
                off_hi = comp[jnp.minimum(s + 1, src_end - 1)]
                bad_src2 = s + 2 > src_end
                match_dec = off_lo | (off_hi << 8)
                s2 = s + 2
                match_off = d - match_dec
                bad_off = match_off < 0

                m_len = token & ML_MASK
                s2, m_len = lax.cond(
                    m_len == ML_MASK,
                    lambda a: _read_len_ext(comp, a[0], src_end, a[1]),
                    lambda a: a, (s2, m_len))
                m_len = m_len + MIN_MATCH

                m_end = d + m_len
                overflow2 = m_end > dest_cap

                err2 = jnp.where(bad_src2 | bad_off | overflow2, ERR_MALFORMED, OK)
                out2 = lax.cond(err2 == OK,
                                lambda o: _match_copy(o, d, match_dec, m_len),
                                lambda o: o, out)
                d2 = jnp.where(err2 == OK, m_end, d)
                return s2, d2, out2, err2

            s, d, out, err_m = lax.cond(
                (err_now == OK) & jnp.logical_not(done_now),
                match_fn, lambda a: (a[0], a[1], a[2], jnp.int32(OK)), (s, d, out))

            err = jnp.where(err_now != OK, err_now, err_m)
            return s, d, out, err, done_now

        s0 = jnp.int32(0)
        d0 = jnp.int32(0)
        s, d, out_f, err, _ = lax.while_loop(
            cond, body, (s0, d0, out, jnp.int32(OK), jnp.array(False)))
        return out_f, d, s, err

    return lax.cond(dest_cap == 0, empty_case, main_case, operand=None)


@functools.partial(jax.jit, static_argnames=("out_max",))
def decompress_safe_batch(comp, comp_lens, out_max: int):
    """Batched safe decompression (exact compressed size known).

    Args:
      comp: int32[N, CMAX + PAD] compressed bytes, one byte per element.
      comp_lens: int32[N] exact compressed length of each block.
      out_max: static maximum decompressed size per block.

    Returns:
      (out int32[N, out_max + PAD], out_lens int32[N], err int32[N]).
    """
    out, out_lens, _, err = jax.vmap(
        lambda c, l: _decompress_one(c, l, out_max))(comp, comp_lens)
    return out, out_lens, err


@functools.partial(jax.jit, static_argnames=("dest_len",))
def decompress_fast_batch(comp, comp_avail, dest_len: int):
    """Batched fast decompression (exact decompressed size known).

    Args:
      comp: int32[N, CMAX + PAD] compressed bytes.
      comp_avail: int32[N] bytes available in each row (not necessarily the
        exact compressed length — the Fast contract's point).
      dest_len: static exact decompressed size of every block.

    Returns:
      (out int32[N, dest_len + PAD], src_read int32[N], err int32[N]).
    """
    out, _, src_read, err = jax.vmap(
        lambda c, l: _decompress_one(c, l, dest_len, fast=True))(comp, comp_avail)
    return out, src_read, err


# ---------------------------------------------------------------------------
# compress (fast scan)
# ---------------------------------------------------------------------------

def _write_len_ext(dest, d, length):
    """writeLen: emit length as 0xFF-run + remainder (LZ4SafeUtils.java:152-158)."""
    def wcond(st):
        d, length, dest = st
        return length >= 0xFF

    def wbody(st):
        d, length, dest = st
        dest = dest.at[d].set(0xFF)
        return d + 1, length - 0xFF, dest

    d, length, dest = lax.while_loop(wcond, wbody, (d, length, dest))
    dest = dest.at[d].set(length)
    return dest, d + 1


def _common_bytes(buf, o1, o2, limit):
    """commonBytes: prefix-match length, chunked 8-at-a-time then bytewise."""
    def cond(st):
        count, stop = st
        return jnp.logical_not(stop)

    def body(st):
        count, _ = st
        a = lax.dynamic_slice(buf, (o1 + count,), (8,))
        b = lax.dynamic_slice(buf, (o2 + count,), (8,))
        in_range = o2 + count + 8 <= limit
        all_eq = jnp.all(a == b) & in_range
        count_new = jnp.where(all_eq, count + 8, count)
        return count_new, jnp.logical_not(all_eq)

    count, _ = lax.while_loop(cond, body, (jnp.int32(0), jnp.array(False)))

    def bcond(st):
        count, stop = st
        return jnp.logical_not(stop)

    def bbody(st):
        count, _ = st
        ok = jnp.logical_and(o2 + count < limit,
                             buf[o1 + count] == buf[jnp.minimum(o2 + count, buf.shape[0] - 1)])
        return jnp.where(ok, count + 1, count), jnp.logical_not(ok)

    count, _ = lax.while_loop(bcond, bbody, (count, jnp.array(False)))
    return count


def _common_bytes_backward(buf, o1, o2, l1, l2):
    def cond(st):
        count, stop = st
        return jnp.logical_not(stop)

    def body(st):
        count, _ = st
        ok = (o1 - count > l1) & (o2 - count > l2)
        idx1 = jnp.maximum(o1 - count - 1, 0)
        idx2 = jnp.maximum(o2 - count - 1, 0)
        ok = ok & (buf[idx1] == buf[idx2])
        return jnp.where(ok, count + 1, count), jnp.logical_not(ok)

    count, _ = lax.while_loop(cond, body, (jnp.int32(0), jnp.array(False)))
    return count


def _compress_one(src, src_len, dest_cap: int, hash_log: int, use_window: bool):
    """Fast-scan compress one block; mirrors compress.template exactly.

    hash_log/use_window select the <64KB variant (13-bit table, relative
    offsets, no window check) vs the general variant (12-bit table, absolute
    offsets, MAX_DISTANCE window check). Offsets are kept absolute in both —
    equivalent since the block base is 0.
    """
    table_size = 1 << hash_log
    dest = jnp.zeros((dest_cap + PAD,), jnp.int32)
    src_end = src_len
    src_limit = src_end - LAST_LITERALS
    mflimit = src_end - MF_LIMIT

    def read32(i):
        return _read_u32le(src, i)

    # ---- main compression loop (only if src_len >= MIN_LENGTH) ----
    def run(_):
        ht0 = jnp.zeros((table_size,), jnp.int32)

        # state: s, d, anchor, ht, dest, err, done
        def cond(st):
            s, d, anchor, ht, dest, err, done = st
            return jnp.logical_not(done) & (err == OK)

        def body(st):
            s, d, anchor, ht, dest, err, done = st

            # --- find a match (skip acceleration) ---
            # search state: s_cur, forward, step, nb, ref, found, exhausted
            def s_cond(ss):
                s_cur, forward, step, nb, ref, found, exhausted, ht = ss
                return jnp.logical_not(found | exhausted)

            def s_body(ss):
                s_cur, forward, step, nb, ref, found, exhausted, ht = ss
                s_new = forward
                forward_new = forward + step
                step_new = nb >> SKIP_STRENGTH
                nb_new = nb + 1
                exhausted_new = forward_new > mflimit

                def probe(args):
                    ht, = args
                    h = _hash(read32(s_new), hash_log)
                    ref = ht[h]
                    ht = ht.at[h].set(s_new)
                    back = s_new - ref
                    eq = (read32(ref) == read32(s_new))
                    if use_window:
                        ok = (back < MAX_DISTANCE) & eq
                    else:
                        ok = eq
                    return ht, ref, ok

                ht, ref_new, found_new = lax.cond(
                    exhausted_new,
                    lambda a: (a[0], jnp.int32(0), jnp.array(False)),
                    probe, (ht,))
                return (s_new, forward_new, step_new, nb_new, ref_new,
                        found_new, exhausted_new, ht)

            s_cur, _, _, _, ref, found, exhausted, ht = lax.while_loop(
                s_cond, s_body,
                (s, s, jnp.int32(1), jnp.int32(1 << SKIP_STRENGTH),
                 jnp.int32(0), jnp.array(False), jnp.array(False), ht))

            def no_match(args):
                s, d, anchor, ht, dest, err = args
                return s, d, anchor, ht, dest, err, jnp.array(True)

            def with_match(args):
                s, d, anchor, ht, dest, err = args
                s = s_cur
                r = ref
                # catch up
                excess = _common_bytes_backward(src, r, s, 0, anchor)
                s = s - excess
                r = r - excess

                run_len = s - anchor
                token_off = d
                d = d + 1
                over = d + run_len + (2 + 1 + LAST_LITERALS) + (run_len >> 8) > dest_cap
                err = jnp.where(over, ERR_DEST_TOO_SMALL, err)

                def emit(args):
                    d, dest = args
                    big = run_len >= RUN_MASK
                    dest = dest.at[token_off].set(
                        jnp.where(big, RUN_MASK << ML_BITS, run_len << ML_BITS))
                    d, dest = lax.cond(
                        big,
                        lambda a: (lambda dd: (dd[1], dd[0]))(
                            _write_len_ext(a[1], a[0], run_len - RUN_MASK)),
                        lambda a: a, (d, dest))
                    dest = _copy_forward(dest, d, src, anchor, run_len)
                    return d + run_len, dest

                d, dest = lax.cond(err == OK, emit, lambda a: a, (d, dest))

                # --- inner emit loop ---
                # state: s, r, d, ht, dest, err, leave(inner), done(outer)
                def i_cond(ist):
                    s, r, d, tok, ht, dest, err, leave, done = ist
                    return jnp.logical_not(leave) & (err == OK)

                def i_body(ist):
                    s, r, d, tok, ht, dest, err, leave, done = ist
                    back = s - r
                    dest = dest.at[d].set(back & 0xFF)
                    dest = dest.at[d + 1].set((back >> 8) & 0xFF)
                    d = d + 2

                    s = s + MIN_MATCH
                    r = r + MIN_MATCH
                    match_len = _common_bytes(src, r, s, src_limit)
                    over2 = d + (1 + LAST_LITERALS) + (match_len >> 8) > dest_cap
                    err = jnp.where(over2, ERR_DEST_TOO_SMALL, err)
                    s = s + match_len

                    def emit_ml(args):
                        d, dest = args
                        big = match_len >= ML_MASK
                        dest = dest.at[tok].set(
                            dest[tok] | jnp.where(big, ML_MASK, match_len))
                        d, dest = lax.cond(
                            big,
                            lambda a: (lambda dd: (dd[1], dd[0]))(
                                _write_len_ext(a[1], a[0], match_len - ML_MASK)),
                            lambda a: a, (d, dest))
                        return d, dest

                    d, dest = lax.cond(err == OK, emit_ml, lambda a: a, (d, dest))

                    end_chunk = s > mflimit

                    def after_end(args):
                        s, r, d, tok, ht, dest = args
                        return s, r, d, tok, ht, dest, jnp.array(True), jnp.array(True)

                    def try_next(args):
                        s, r, d, tok, ht, dest = args
                        h2 = _hash(read32(s - 2), hash_log)
                        ht = ht.at[h2].set(s - 2)
                        h = _hash(read32(s), hash_log)
                        r_new = ht[h]
                        ht = ht.at[h].set(s)
                        back = s - r_new
                        eq = read32(r_new) == read32(s)
                        if use_window:
                            again = (back < MAX_DISTANCE) & eq
                        else:
                            again = eq

                        def cont(args):
                            d, dest = args
                            dest = dest.at[d].set(0)
                            return d + 1, dest

                        tok_new = jnp.where(again, d, tok)
                        d, dest = lax.cond(again, cont, lambda a: a, (d, dest))
                        return (s, r_new, d, tok_new, ht, dest,
                                jnp.logical_not(again), jnp.array(False))

                    s, r, d, tok, ht, dest, leave, done = lax.cond(
                        end_chunk | (err != OK), after_end, try_next,
                        (s, r, d, tok, ht, dest))
                    return s, r, d, tok, ht, dest, err, leave, done

                s, r, d, tok, ht, dest, err, _, done = lax.while_loop(
                    i_cond, i_body,
                    (s, r, d, token_off, ht, dest, err,
                     jnp.array(False), jnp.array(False)))

                anchor = s
                s = jnp.where(done, s, s + 1)
                return s, d, anchor, ht, dest, err, done

            s, d, anchor, ht, dest, err, done = lax.cond(
                exhausted, no_match, with_match, (s, d, anchor, ht, dest, err))
            return s, d, anchor, ht, dest, err, done

        s0 = jnp.int32(1)
        anchor0 = jnp.int32(0)
        s, d, anchor, ht, dest_f, err, _ = lax.while_loop(
            cond, body,
            (s0, jnp.int32(0), anchor0, ht0, dest, jnp.int32(OK),
             jnp.array(False)))
        return d, anchor, dest_f, err

    def skip(_):
        return jnp.int32(0), jnp.int32(0), dest, jnp.int32(OK)

    d, anchor, dest, err = lax.cond(src_len >= MIN_LENGTH, run, skip,
                                    operand=None)

    # ---- last literals ----
    run_len = src_end - anchor
    over = d + run_len + 1 + (run_len + 255 - RUN_MASK) // 255 > dest_cap
    err = jnp.where((err == OK) & over, ERR_DEST_TOO_SMALL, err)

    def last(args):
        d, dest = args
        big = run_len >= RUN_MASK
        dest = dest.at[d].set(
            jnp.where(big, RUN_MASK << ML_BITS, run_len << ML_BITS))
        d = d + 1
        d, dest = lax.cond(
            big,
            lambda a: (lambda dd: (dd[1], dd[0]))(
                _write_len_ext(a[1], a[0], run_len - RUN_MASK)),
            lambda a: a, (d, dest))
        dest = _copy_forward(dest, d, src, anchor, run_len)
        return d + run_len, dest

    d, dest = lax.cond(err == OK, last, lambda a: a, (d, dest))
    return dest, d, err


@functools.partial(jax.jit, static_argnames=("dest_cap",))
def compress_fast_batch(src, src_lens, dest_cap: int):
    """Batched fast-scan compression.

    Args:
      src: int32[N, L + PAD] input bytes (one per element).
      src_lens: int32[N] exact input length per block.
      dest_cap: static per-block output capacity
        (use ``max_compressed_length(L)``).

    Returns:
      (dest int32[N, dest_cap + PAD], lens int32[N], err int32[N]).

    Dispatch matches the reference: blocks < LZ4_64K_LIMIT use the 13-bit
    hash (compress64k), larger blocks the 12-bit windowed general path —
    selected per block so output is byte-identical to the other tiers.
    """
    def one(s, l):
        small = _compress_one(s, l, dest_cap, HASH_LOG_64K, use_window=False)
        # only trace the general variant when blocks can exceed the limit
        if s.shape[0] - PAD >= LZ4_64K_LIMIT:
            big = _compress_one(s, l, dest_cap, HASH_LOG, use_window=True)
            return jax.tree.map(
                lambda a, b: jnp.where(l < LZ4_64K_LIMIT, a, b), small, big)
        return small

    return jax.vmap(one)(src, src_lens)


# ---------------------------------------------------------------------------
# byte <-> device layout helpers (host side)
# ---------------------------------------------------------------------------

def to_device_layout(blocks: list[bytes], block_cap: int):
    """Pack python byte blocks into (int32[N, block_cap+PAD], lengths)."""
    import numpy as np
    n = len(blocks)
    arr = np.zeros((n, block_cap + PAD), np.int32)
    lens = np.zeros((n,), np.int32)
    for i, b in enumerate(blocks):
        a = np.frombuffer(b, np.uint8)
        arr[i, :len(a)] = a
        lens[i] = len(a)
    return arr, lens


def from_device_layout(arr, lens) -> list[bytes]:
    """Unpack (int32[N, L], lengths) into python byte blocks."""
    import numpy as np
    arr = np.asarray(arr, dtype=np.int32)
    lens = np.asarray(lens)
    return [np.asarray(arr[i, :lens[i]], np.uint8).astype(np.uint8).tobytes()
            for i in range(arr.shape[0])]
