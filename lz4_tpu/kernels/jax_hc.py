"""Pure-JAX batched LZ4 HC compressor: jittable, vmappable.

The HC algorithm's labeled-goto control flow (``compress_hc.template:43-157``
with loops ``main``/``search2``/``search3``) is re-encoded as a phase machine:
one ``lax.while_loop`` whose state carries a phase id dispatched by
``lax.switch`` — the idiomatic functional translation of irregular control
flow for XLA. The chained match finder (``hashtable.template:23-161``: 15-bit
head table + 16-bit chain-delta table, repetition fast path, search capped at
``1 << (level - 1)`` attempts) is carried as dense int32 arrays in the loop
state.

Semantics are exactly the reference's; compressed output is byte-identical
to the safe/native HC tiers at every level (asserted in tests). Per-block
error flags replace exceptions as in jax_codec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.constants import (
    LAST_LITERALS, MAX_DISTANCE, MF_LIMIT, MIN_MATCH, ML_BITS, ML_MASK,
    OPTIMAL_ML, RUN_MASK,
)
from .jax_codec import (
    OK, ERR_DEST_TOO_SMALL, PAD, _common_bytes, _common_bytes_backward,
    _copy_forward, _read_u32le, _write_len_ext, _hash,
)

HASH_LOG_HC = 15
_MASK = MAX_DISTANCE - 1

# phases
_MAIN, _SEARCH2, _SEARCH3, _DONE = 0, 1, 2, 3


def _add_hash(ht, chain, off, src):
    h = _hash(_read_u32le(src, off), HASH_LOG_HC)
    delta = jnp.minimum(off - ht[h], MAX_DISTANCE - 1) & 0xFFFF
    chain = chain.at[off & _MASK].set(delta)
    ht = ht.at[h].set(off)
    return ht, chain


def _insert(ht, chain, ntu, off, src):
    def cond(st):
        ht, chain, ntu = st
        return ntu < off

    def body(st):
        ht, chain, ntu = st
        ht, chain = _add_hash(ht, chain, ntu, src)
        return ht, chain, ntu + 1

    return lax.while_loop(cond, body, (ht, chain, ntu))


def _next(chain, off):
    return off - chain[off & _MASK]


def _best_match(ht, chain, ntu, off, match_limit, max_attempts, src):
    """insertAndFindBestMatch (hashtable.template:85-134).

    Returns (ht, chain, ntu, found, m_start, m_ref, m_len).
    """
    ht, chain, ntu = _insert(ht, chain, ntu, off, src)
    ref0 = ht[_hash(_read_u32le(src, off), HASH_LOG_HC)]

    m_len = jnp.int32(0)
    m_ref = jnp.int32(0)

    # potential repetition fast path
    is_rep = (ref0 >= off - 4) & (ref0 <= off) & (ref0 >= 0)
    rep_eq = is_rep & (_read_u32le(src, jnp.maximum(ref0, 0)) == _read_u32le(src, off))

    def rep_fn(_):
        ln = MIN_MATCH + _common_bytes(src, ref0 + MIN_MATCH, off + MIN_MATCH,
                                       match_limit)
        return ln, ref0, off - ref0

    rep_len, rep_ref, rep_delta = lax.cond(
        rep_eq, rep_fn, lambda _: (jnp.int32(0), jnp.int32(0), jnp.int32(0)), 0)
    m_len = rep_len
    m_ref = jnp.where(rep_eq, rep_ref, m_ref)
    ref = jnp.where(is_rep, _next(chain, jnp.maximum(ref0, 0)), ref0)

    lo = jnp.maximum(0, off - MAX_DISTANCE + 1)

    def a_cond(st):
        ref, m_len, m_ref, i, stop = st
        return jnp.logical_not(stop)

    def a_body(st):
        ref, m_len, m_ref, i, _ = st
        out_of_range = (ref < lo) | (ref > off) | (i >= max_attempts)

        def probe(_):
            eq = _read_u32le(src, jnp.maximum(ref, 0)) == _read_u32le(src, off)

            def match_fn(_):
                ln = MIN_MATCH + _common_bytes(
                    src, ref + MIN_MATCH, off + MIN_MATCH, match_limit)
                better = ln > m_len
                return jnp.where(better, ln, m_len), jnp.where(better, ref, m_ref)

            return lax.cond(eq, match_fn, lambda _: (m_len, m_ref), 0)

        m_len2, m_ref2 = lax.cond(out_of_range, lambda _: (m_len, m_ref), probe, 0)
        ref2 = jnp.where(out_of_range, ref, _next(chain, jnp.maximum(ref, 0)))
        return ref2, m_len2, m_ref2, i + 1, out_of_range

    ref, m_len, m_ref, _, _ = lax.while_loop(
        a_cond, a_body, (ref, m_len, m_ref, jnp.int32(0), jnp.array(False)))

    # repetition chain propagation (hashtable.template:119-131)
    def propagate(args):
        ht, chain, ntu = args
        end = off + rep_len - (MIN_MATCH - 1)
        d16 = rep_delta & 0xFFFF

        def c1(st):
            chain, ptr = st
            return ptr < end - rep_delta

        def b1(st):
            chain, ptr = st
            return chain.at[ptr & _MASK].set(d16), ptr + 1

        chain, ptr = lax.while_loop(c1, b1, (chain, off))

        def c2(st):
            ht, chain, ptr = st
            return ptr < end

        def b2(st):
            ht, chain, ptr = st
            chain = chain.at[ptr & _MASK].set(d16)
            ht = ht.at[_hash(_read_u32le(src, ptr), HASH_LOG_HC)].set(ptr)
            return ht, chain, ptr + 1

        ht, chain, ptr = lax.while_loop(c2, b2, (ht, chain, ptr))
        return ht, chain, end

    ht, chain, ntu = lax.cond(rep_len != 0, propagate,
                              lambda a: a, (ht, chain, ntu))

    return ht, chain, ntu, m_len != 0, off, m_ref, m_len


def _wider_match(ht, chain, ntu, off, start_limit, match_limit, min_len,
                 max_attempts, src):
    """insertAndFindWiderMatch (hashtable.template:136-161).

    Returns (ht, chain, ntu, found, m_start, m_ref, m_len).
    """
    ht, chain, ntu = _insert(ht, chain, ntu, off, src)
    ref = ht[_hash(_read_u32le(src, off), HASH_LOG_HC)]
    lo = jnp.maximum(0, off - MAX_DISTANCE + 1)

    m_len = min_len
    m_ref = jnp.int32(0)
    m_start = jnp.int32(0)

    def a_cond(st):
        ref, m_len, m_ref, m_start, i, stop = st
        return jnp.logical_not(stop)

    def a_body(st):
        ref, m_len, m_ref, m_start, i, _ = st
        out_of_range = (ref < lo) | (ref > off) | (i >= max_attempts)

        def probe(_):
            eq = _read_u32le(src, jnp.maximum(ref, 0)) == _read_u32le(src, off)

            def match_fn(_):
                fwd = MIN_MATCH + _common_bytes(
                    src, ref + MIN_MATCH, off + MIN_MATCH, match_limit)
                bwd = _common_bytes_backward(src, ref, off, 0, start_limit)
                ln = fwd + bwd
                better = ln > m_len
                return (jnp.where(better, ln, m_len),
                        jnp.where(better, ref - bwd, m_ref),
                        jnp.where(better, off - bwd, m_start))

            return lax.cond(eq, match_fn, lambda _: (m_len, m_ref, m_start), 0)

        m2 = lax.cond(out_of_range, lambda _: (m_len, m_ref, m_start), probe, 0)
        ref2 = jnp.where(out_of_range, ref, _next(chain, jnp.maximum(ref, 0)))
        return (ref2, m2[0], m2[1], m2[2], i + 1, out_of_range)

    ref, m_len, m_ref, m_start, _, _ = lax.while_loop(
        a_cond, a_body,
        (ref, m_len, m_ref, m_start, jnp.int32(0), jnp.array(False)))

    return ht, chain, ntu, m_len > min_len, m_start, m_ref, m_len


def _encode_sequence(src, anchor, m_start, m_ref, m_len, dest, d, dest_cap):
    """LZ4SafeUtils.encodeSequence:100-139 as pure function.

    Returns (dest, d, err).
    """
    run_len = m_start - anchor
    token_off = d
    d = d + 1
    over = d + run_len + (2 + 1 + LAST_LITERALS) + (run_len >> 8) > dest_cap
    err = jnp.where(over, ERR_DEST_TOO_SMALL, OK)

    def emit(args):
        dest, d = args
        big = run_len >= RUN_MASK
        token = jnp.where(big, RUN_MASK << ML_BITS, run_len << ML_BITS)
        d, dest = lax.cond(
            big,
            lambda a: (lambda dd: (dd[1], dd[0]))(
                _write_len_ext(a[1], a[0], run_len - RUN_MASK)),
            lambda a: a, (d, dest))
        dest = _copy_forward(dest, d, src, anchor, run_len)
        d = d + run_len

        match_dec = m_start - m_ref
        dest = dest.at[d].set(match_dec & 0xFF)
        dest = dest.at[d + 1].set((match_dec >> 8) & 0xFF)
        d = d + 2

        ml = m_len - 4
        over2 = d + (1 + LAST_LITERALS) + (ml >> 8) > dest_cap
        e2 = jnp.where(over2, ERR_DEST_TOO_SMALL, OK)

        def emit_ml(args):
            dest, d, token = args
            big2 = ml >= ML_MASK
            token = token | jnp.where(big2, ML_MASK, ml)
            d, dest = lax.cond(
                big2,
                lambda a: (lambda dd: (dd[1], dd[0]))(
                    _write_len_ext(a[1], a[0], ml - RUN_MASK)),
                lambda a: a, (d, dest))
            return dest, d, token

        dest, d, token = lax.cond(e2 == OK, emit_ml,
                                  lambda a: a, (dest, d, token))
        dest = dest.at[token_off].set(token)
        return dest, d, e2

    dest, d, err2 = lax.cond(err == OK, emit,
                             lambda a: (a[0], a[1], jnp.int32(OK)), (dest, d))
    return dest, d, jnp.where(err != OK, err, err2)


def _compress_hc_one(src, src_len, dest_cap: int, level: int):
    max_attempts = jnp.int32(1 << (level - 1))
    src_end = src_len
    mf_limit = src_end - MF_LIMIT
    match_limit = src_end - LAST_LITERALS

    dest0 = jnp.zeros((dest_cap + PAD,), jnp.int32)
    ht0 = jnp.full((1 << HASH_LOG_HC,), -1, jnp.int32)
    chain0 = jnp.zeros((MAX_DISTANCE,), jnp.int32)

    zm = (jnp.int32(0), jnp.int32(0), jnp.int32(0))  # (start, ref, len)

    # state: phase, s, d, anchor, ht, chain, ntu, dest, err,
    #        m0, m1, m2, m3  (each a 3-tuple)
    def cond(st):
        phase = st[0]
        err = st[8]
        return (phase != _DONE) & (err == OK)

    def main_phase(st):
        phase, s, d, anchor, ht, chain, ntu, dest, err, m0, m1, m2, m3 = st

        def finish(args):
            return (jnp.int32(_DONE),) + tuple(args[1:])

        def step(args):
            phase, s, d, anchor, ht, chain, ntu, dest, err, m0, m1, m2, m3 = args
            ht, chain, ntu, found, ms, mr, ml = _best_match(
                ht, chain, ntu, s, match_limit, max_attempts, src)
            m1n = (ms, mr, ml)

            def no(a):
                # no match at s: advance
                return (jnp.int32(_MAIN), s + 1, d, anchor, ht, chain, ntu, dest, err,
                        m0, m1, m2, m3)

            def yes(a):
                return (jnp.int32(_SEARCH2), s, d, anchor, ht, chain, ntu, dest, err,
                        m1n, m1n, m2, m3)  # m0 = m1 (saved)

            return lax.cond(found, yes, no, 0)

        return lax.cond(s >= mf_limit, finish, step,
                        (phase, s, d, anchor, ht, chain, ntu, dest, err,
                         m0, m1, m2, m3))

    def search2_phase(st):
        phase, s, d, anchor, ht, chain, ntu, dest, err, m0, m1, m2, m3 = st
        m1s, m1r, m1l = m1
        m1end = m1s + m1l

        hit_limit = m1end >= mf_limit

        def no_wider(args):
            ht, chain, ntu = args
            return ht, chain, ntu, jnp.array(False), jnp.int32(0), jnp.int32(0), jnp.int32(0)

        ht, chain, ntu, found2, w_s, w_r, w_l = lax.cond(
            hit_limit, no_wider,
            lambda a: _wider_match(a[0], a[1], a[2], m1end - 2, m1s + 1,
                                   match_limit, m1l, max_attempts, src),
            (ht, chain, ntu))

        def encode_single(_):
            dest2, d2, e = _encode_sequence(src, anchor, m1s, m1r, m1l,
                                            dest, d, dest_cap)
            return (jnp.int32(_MAIN), m1end, d2, m1end, ht, chain, ntu, dest2, e,
                    m0, m1, m2, m3)

        def have_wider(_):
            m2n = (w_s, w_r, w_l)
            # empirical correction: if we skipped too much, restore m0
            m0s, m0r, m0l = m0
            use_m0 = (m0s < m1s) & (w_s < m1s + m0l)
            m1c = (jnp.where(use_m0, m0s, m1s),
                   jnp.where(use_m0, m0r, m1r),
                   jnp.where(use_m0, m0l, m1l))

            too_small = w_s - m1c[0] < 3  # first match too small: removed

            def replace(_):
                return (jnp.int32(_SEARCH2), s, d, anchor, ht, chain, ntu, dest, err,
                        m0, m2n, m2, m3)

            def to_search3(_):
                return (jnp.int32(_SEARCH3), s, d, anchor, ht, chain, ntu, dest, err,
                        m0, m1c, m2n, m3)

            return lax.cond(too_small, replace, to_search3, 0)

        return lax.cond(found2, have_wider, encode_single, 0)

    def search3_phase(st):
        phase, s, d, anchor, ht, chain, ntu, dest, err, m0, m1, m2, m3 = st
        m1s, m1r, m1l = m1
        m2s, m2r, m2l = m2

        # OPTIMAL_ML truncation correction on m2 (compress_hc.template:78-90)
        def fix_m2(_):
            new_len = jnp.minimum(m1l, OPTIMAL_ML)
            new_len = jnp.where(
                m1s + new_len > m2s + m2l - MIN_MATCH,
                m2s - m1s + m2l - MIN_MATCH, new_len)
            corr = new_len - (m2s - m1s)
            do = corr > 0
            return (jnp.where(do, m2s + corr, m2s),
                    jnp.where(do, m2r + corr, m2r),
                    jnp.where(do, m2l - corr, m2l))

        m2s, m2r, m2l = lax.cond(m2s - m1s < OPTIMAL_ML, fix_m2,
                                 lambda _: (m2s, m2r, m2l), 0)
        m2c = (m2s, m2r, m2l)
        m1end = m1s + m1l
        m2end = m2s + m2l

        hit_limit = m2s + m2l >= mf_limit
        ht, chain, ntu, found3, w_s, w_r, w_l = lax.cond(
            hit_limit,
            lambda a: (a[0], a[1], a[2], jnp.array(False),
                       jnp.int32(0), jnp.int32(0), jnp.int32(0)),
            lambda a: _wider_match(a[0], a[1], a[2], m2end - 3, m2s,
                                   match_limit, m2l, max_attempts, src),
            (ht, chain, ntu))

        def encode_two(_):
            # no better match: up to 2 sequences (template :93-104)
            m1l2 = jnp.where(m2s < m1end, m2s - m1s, m1l)
            dest1, d1, e1 = _encode_sequence(src, anchor, m1s, m1r, m1l2,
                                             dest, d, dest_cap)
            a1 = m1s + m1l2
            dest2, d2, e2 = _encode_sequence(src, a1, m2s, m2r, m2l,
                                             dest1, d1, dest_cap)
            e = jnp.where(e1 != OK, e1, e2)
            return (jnp.int32(_MAIN), m2end, d2, m2end, ht, chain, ntu, dest2, e,
                    m0, m1, m2c, m3)

        def have_m3(_):
            m3n = (w_s, w_r, w_l)

            def not_enough_space(_):
                # m3 starts within m1.end + 3 (template :106-126)
                def seq3_becomes_seq1(_):
                    # m3.start >= m1.end: write seq1 now, drop seq2
                    def fix2(_):
                        corr = m1end - m2s
                        f = (m2s + corr, m2r + corr, m2l - corr)
                        return lax.cond(f[2] < MIN_MATCH,
                                        lambda __: m3n, lambda __: f, 0)

                    m2f = lax.cond(m2s < m1end, fix2, lambda _: m2c, 0)
                    dest1, d1, e1 = _encode_sequence(
                        src, anchor, m1s, m1r, m1l, dest, d, dest_cap)
                    return (jnp.int32(_SEARCH2), m1end, d1, m1end, ht, chain, ntu,
                            dest1, e1, m2f, m3n, m2f, m3n)

                def m3_replaces_m2(_):
                    return (jnp.int32(_SEARCH3), s, d, anchor, ht, chain, ntu, dest, err,
                            m0, m1, m3n, m3n)

                return lax.cond(w_s >= m1end, seq3_becomes_seq1,
                                m3_replaces_m2, 0)

            def three_ascending(_):
                # write at least seq1 (template :129-153)
                def overlap(_):
                    def small_gap(_):
                        l = jnp.minimum(m1l, OPTIMAL_ML)
                        l = jnp.where(m1s + l > m2end - MIN_MATCH,
                                      m2end - m1s - MIN_MATCH, l)
                        corr = m1s + l - m2s
                        return l, (m2s + corr, m2r + corr, m2l - corr)

                    def big_gap(_):
                        return m2s - m1s, m2c

                    return lax.cond(m2s - m1s < ML_MASK, small_gap, big_gap, 0)

                m1l2, m2f = lax.cond(m2s < m1end, overlap,
                                     lambda _: (m1l, m2c), 0)
                dest1, d1, e1 = _encode_sequence(
                    src, anchor, m1s, m1r, m1l2, dest, d, dest_cap)
                new_anchor = m1s + m1l2
                return (jnp.int32(_SEARCH3), new_anchor, d1, new_anchor, ht, chain, ntu,
                        dest1, e1, m0, m2f, m3n, m3n)

            return lax.cond(w_s < m1end + 3, not_enough_space,
                            three_ascending, 0)

        return lax.cond(found3, have_m3, encode_two, 0)

    def body(st):
        return lax.switch(st[0], [main_phase, search2_phase, search3_phase], st)

    init = (jnp.int32(_MAIN), jnp.int32(1), jnp.int32(0), jnp.int32(0),
            ht0, chain0, jnp.int32(0), dest0, jnp.int32(OK),
            zm, zm, zm, zm)
    final = lax.while_loop(cond, body, init)
    _, s, d, anchor, ht, chain, ntu, dest, err = final[:9]

    # last literals
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


@functools.partial(jax.jit, static_argnames=("dest_cap", "level"))
def compress_hc_batch(src, src_lens, dest_cap: int, level: int = 9):
    """Batched LZ4 HC compression on device.

    Args:
      src: int32[N, L + PAD] input bytes (one per element).
      src_lens: int32[N].
      dest_cap: static per-block output capacity.
      level: static compression level 1..17.

    Returns: (dest int32[N, dest_cap + PAD], lens int32[N], err int32[N]).
    """
    if not 1 <= level <= 17:
        raise ValueError(f"level must be 1..17, got {level}")
    return jax.vmap(lambda s, l: _compress_hc_one(s, l, dest_cap, level))(
        src, src_lens)
