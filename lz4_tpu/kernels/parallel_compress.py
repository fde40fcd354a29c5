"""Device-parallel LZ4 compressor, freed from compressed-byte identity.

The north-star sketch (BASELINE.json) built for real and MEASURED: every
phase of LZ4 compression reformulated as batched array ops so XLA can run
whole 64KB blocks' match searches in parallel, instead of translating the
reference's strictly serial probe loop (compress.template:160-257). The
output is valid LZ4 block format decodable by every tier, but NOT
byte-identical to the reference algorithm — the identity constraint is what
previously ruled device compression out (docs/ROADMAP.md §3); the driver's
actual bar is ratio <= reference + bit-exact decompressed bytes.

Phases (per block, vmapped over the batch):

1. match finding WITHOUT a hash table: stable argsort of each position's
   4-byte word puts equal words adjacent, so the sorted predecessor is the
   nearest previous position with exactly the same 4 bytes — the same
   candidate a 1-entry hash table would yield, minus hash collisions, and
   it needs no serial table build (sort replaces the scatter).
2. parallel verification/extension: the base 4-byte match is equal by
   construction; extension compares 4-byte words at candidate+4k via one
   gather per step (K steps, linear cap) plus an exact 1-3 byte tail. For
   distances 1..4 an exact unbounded run length comes gather-free from a
   reverse cummin over byte-equality masks (covers RLE-heavy data the
   length cap would hurt).
3. compact sequence resolution: a greedy walk per SEG-byte segment
   (lax.scan over SEG steps, all segments of all blocks walking in
   lockstep lanes). Match lengths are pre-clamped at segment ends, so
   segments resolve independently; literal gaps spanning boundaries are
   free because literals are just the gaps between selected matches.
4. device emission: per-sequence output sizes -> exclusive scan ->
   a single searchsorted byte-map classifies every output byte
   (token / length-extension / literal / offset) and one gather pulls the
   literal bytes.

Measured numbers and the resulting device-vs-host division of labor live
in docs/PERF.md (VERDICT r3 #1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..core.constants import (
    LAST_LITERALS, MAX_DISTANCE, MF_LIMIT, MIN_MATCH, ML_BITS, ML_MASK,
    RUN_MASK,
)

SEG = 512          # resolution segment (greedy walk length; matches clamp here)
EXT_STEPS = 15     # 4-byte extension steps -> hashed-match cap 4 + 60 + 3
RLE_DISTS = (1, 2, 3, 4)
PAD = 80           # input slack so word/extension reads never clamp


def _words4(x):
    """int32[L+PAD] bytes -> int32[L+PAD-3] little-endian 4-byte words."""
    return (x[:-3] | (x[1:-2] << 8) | (x[2:-1] << 16) | (x[3:] << 24))


def _nearest_prev_equal(x4, n):
    """For each i: nearest j < i with x4[j] == x4[i], else -1.

    Stable argsort groups equal words with ascending positions; the sorted
    predecessor is exactly the nearest previous equal word.
    """
    L = x4.shape[0]
    live = jnp.arange(L) < n
    # push padding/ghost rows to the end of the sort order deterministically
    key = jnp.where(live, x4, jnp.int32(0x7FFFFFFF))
    order = jnp.argsort(key, stable=True)              # positions, sorted by word
    k_sorted = key[order]
    prev_pos = jnp.concatenate([jnp.full((1,), -1, jnp.int32),
                                order[:-1].astype(jnp.int32)])
    same = jnp.concatenate([jnp.zeros((1,), bool),
                            k_sorted[1:] == k_sorted[:-1]])
    cand_sorted = jnp.where(same, prev_pos, -1)
    cand = jnp.zeros((L,), jnp.int32).at[order].set(cand_sorted)
    return jnp.where(live, cand, -1)


def _extend_match(x, x4, cand, n):
    """Match length at i against candidate j (>=4 guaranteed), linear 4-byte
    steps + exact 1-3 byte tail, capped at 4 + 4*EXT_STEPS + 3."""
    L = cand.shape[0]
    L4 = x4.shape[0]
    i = jnp.arange(L)
    length = jnp.full((L,), MIN_MATCH, jnp.int32)
    alive = cand >= 0
    j = jnp.maximum(cand, 0)
    for k in range(1, EXT_STEPS + 1):
        off = 4 * k
        cand_w = x4[jnp.minimum(j + off, L4 - 1)]
        # x4[i + off] is a pure shift: a static slice, not a gather
        # (PAD guarantees off + L <= L4)
        here_w = x4[off:off + L]
        ok = alive & (cand_w == here_w) & (i + off + 4 <= n)
        length = jnp.where(ok, length + 4, length)
        alive = ok
    # exact tail: up to 3 more bytes (length already advances per step)
    for _ in range(3):
        cb = x[jnp.minimum(j + length, x.shape[0] - 1)]
        hb = x[jnp.minimum(i + length, x.shape[0] - 1)]
        ok = alive & (cb == hb) & (i + length < n)
        length = jnp.where(ok, length + 1, length)
        alive = ok
    return jnp.where(cand >= 0, length, 0)


def _rle_lengths(x, n, dist):
    """Exact forward run length of x[i] == x[i - dist] (0 where unequal or
    i < dist), via reverse cummin of not-equal positions. Gather-free."""
    L = x.shape[0] - PAD
    i = jnp.arange(L)
    eq = jnp.zeros((L,), bool)
    eq = eq.at[dist:].set(x[dist:L] == x[:L - dist])
    eq = eq & (i < n)
    # next position with eq == False, scanning right-to-left
    stop = jnp.where(eq, jnp.int32(L + PAD), i)
    next_stop = lax.associative_scan(jnp.minimum, stop, reverse=True)
    return jnp.minimum(next_stop, n) - i


def _extend_back(x, dist, n):
    """Backward extension: bext[i] = consecutive t >= 1 with
    x[i-t] == x[i-dist[i]-t] (capped at BEXT). Applied at emission, where
    it is additionally capped by the literal gap before the match."""
    BEXT = 7
    L = dist.shape[0]
    i = jnp.arange(L)
    j = i - dist
    bext = jnp.zeros((L,), jnp.int32)
    alive = dist > 0
    for _ in range(BEXT):
        t = bext + 1
        ok = (alive & (i - t >= 0) & (j - t >= 0)
              & (x[jnp.maximum(i - t, 0)] == x[jnp.maximum(j - t, 0)]))
        bext = jnp.where(ok, t, bext)
        alive = ok
    return bext


def _ext_bytes(v):
    """Number of 0xFF/remainder extension bytes for run value v >= 0
    (writeLen encoding: emit while v >= 255)."""
    return jnp.where(v >= RUN_MASK, 1 + (v - RUN_MASK) // 255, 0)


def _resolve_segments(mlen, n):
    """Greedy per-segment walk: from each SEG boundary, select the match at
    p when mlen[p] >= 4 (advance by its length) else advance 1 byte.
    Returns the selected-match mask. mlen must already be clamped so
    p + mlen[p] never crosses the segment end."""
    L = mlen.shape[0]
    n_segs = (L + SEG - 1) // SEG
    seg_start = jnp.arange(n_segs) * SEG
    seg_end = jnp.minimum(seg_start + SEG, n)

    def step(p, _):
        l = mlen[jnp.minimum(p, L - 1)]
        is_m = (l >= MIN_MATCH) & (p < seg_end)
        sel_pos = jnp.where(is_m, p, L)          # L = dropped slot
        p_next = jnp.where(is_m, p + l, p + 1)
        return p_next, sel_pos

    _, sel_log = lax.scan(step, seg_start, None, length=SEG)
    sel = jnp.zeros((L + 1,), bool).at[sel_log.reshape(-1)].set(
        True, mode="drop")
    return sel[:L]


def _compress_block(x_u8, n, cap):
    """One block: int32[L+PAD] bytes (0..255), length n -> (out[cap], out_len).

    out_len carries the byte count, or -1 if cap is too small.
    """
    L = x_u8.shape[0] - PAD
    x = x_u8
    x4 = _words4(x)
    i = jnp.arange(L)

    # ---- phase 1+2: candidates and lengths ----
    cand = _nearest_prev_equal(x4[:L], n)
    # the 2-byte offset field caps distances at MAX_DISTANCE - 1 = 65535;
    # the NEAREST previous equal word being out of window means every other
    # occurrence is too, so dropping the candidate is exact, not a heuristic
    cand = jnp.where(i - cand < MAX_DISTANCE, cand, -1)
    hashed_len = _extend_match(x, x4, cand, n)[:L]
    hashed_dist = jnp.where(cand >= 0, i - cand, 0)

    best_len = hashed_len
    best_dist = hashed_dist
    for d in RLE_DISTS:
        rl = _rle_lengths(x, n, d)
        take = rl > best_len
        best_len = jnp.where(take, rl, best_len)
        best_dist = jnp.where(take, jnp.int32(d), best_dist)

    # format clamps: matches stop at the segment end (independent greedy
    # resolution), start at or before mflimit, end with >= LAST_LITERALS
    # trailing literals (compress.template: MF_LIMIT / LAST_LITERALS rules)
    seg_end = (i // SEG + 1) * SEG
    limit = jnp.minimum(jnp.minimum(seg_end, n - LAST_LITERALS) - i,
                        best_len)
    mlen = jnp.where((i + MF_LIMIT <= n) & (limit >= MIN_MATCH), limit, 0)

    # ---- phase 3: greedy resolution ----
    sel = _resolve_segments(mlen, n)

    # ---- phase 4: sequences + emission ----
    MS = L // 4 + 1
    n_match = jnp.sum(sel.astype(jnp.int32))
    rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
    tgt = jnp.where(sel, rank, MS)
    m_pos = jnp.full((MS,), 0, jnp.int32).at[tgt].set(i, mode="drop")
    m_len = jnp.zeros((MS,), jnp.int32).at[tgt].set(mlen, mode="drop")
    m_dist = jnp.zeros((MS,), jnp.int32).at[tgt].set(best_dist, mode="drop")

    s_idx = jnp.arange(MS)
    is_m0 = s_idx < n_match

    # continuation merging: a selected match that starts exactly where the
    # previous one ends, at the same distance, is the SAME underlying match
    # split by the length cap or a segment boundary — fold such chains into
    # one sequence (long-run ratio recovery; the format has no length cap)
    prev0 = jnp.maximum(s_idx - 1, 0)
    cont = ((s_idx > 0) & is_m0
            & (m_pos == m_pos[prev0] + m_len[prev0])
            & (m_dist == m_dist[prev0]))
    head = is_m0 & ~cont
    gid = jnp.where(is_m0, jnp.cumsum(head.astype(jnp.int32)) - 1, MS)
    g_pos = jnp.zeros((MS,), jnp.int32).at[
        jnp.where(head, gid, MS)].set(m_pos, mode="drop")
    g_dist = jnp.zeros((MS,), jnp.int32).at[
        jnp.where(head, gid, MS)].set(m_dist, mode="drop")
    g_len = jnp.zeros((MS,), jnp.int32).at[gid].add(
        jnp.where(is_m0, m_len, 0), mode="drop")
    n_match = jnp.sum(head.astype(jnp.int32))
    m_pos, m_len, m_dist = g_pos, g_len, g_dist

    n_seq = n_match + 1                       # final literals-only sequence
    is_seq = s_idx < n_seq
    is_match_seq = s_idx < n_match
    prev_end = jnp.where(s_idx == 0, 0,
                         m_pos[jnp.maximum(s_idx - 1, 0)]
                         + m_len[jnp.maximum(s_idx - 1, 0)])
    lit_start = prev_end
    lit_len = jnp.where(is_match_seq, m_pos - lit_start,
                        jnp.where(is_seq, n - lit_start, 0))

    # backward extension into the literal gap (commonBytesBackward analog);
    # the match END is unchanged, so downstream sequences are unaffected
    bext_all = _extend_back(x, best_dist, n)
    bk = jnp.where(is_match_seq,
                   jnp.minimum(bext_all[jnp.clip(m_pos, 0, L - 1)], lit_len),
                   0)
    m_pos = m_pos - bk
    m_len = m_len + bk
    lit_len = lit_len - bk

    lit_ext = _ext_bytes(lit_len)
    ml_run = jnp.maximum(m_len - MIN_MATCH, 0)
    ml_ext = jnp.where(is_match_seq, _ext_bytes(ml_run), 0)
    seq_size = jnp.where(
        is_seq,
        1 + lit_ext + lit_len + jnp.where(is_match_seq, 2 + ml_ext, 0),
        0)
    out_start = jnp.cumsum(seq_size) - seq_size
    total = out_start[-1] + seq_size[-1]

    # token values
    lit_tok = jnp.minimum(lit_len, RUN_MASK)
    ml_tok = jnp.where(is_match_seq, jnp.minimum(ml_run, ML_MASK), 0)
    token = (lit_tok << ML_BITS) | ml_tok

    # classify every output byte by its sequence + within-sequence offset
    q = jnp.arange(cap)
    seq_of = jnp.clip(
        jnp.searchsorted(out_start, q, side="right") - 1, 0, MS - 1)
    r = q - out_start[seq_of]
    litext_n = lit_ext[seq_of]
    litlen_n = lit_len[seq_of]
    mlext_n = ml_ext[seq_of]

    # region boundaries within a sequence
    lit_begin = 1 + litext_n
    off_begin = lit_begin + litlen_n
    mlext_begin = off_begin + 2

    # literal-extension byte t: 255 while remaining >= 255
    lit_rem = litlen_n - RUN_MASK
    t_l = r - 1
    lit_ext_val = jnp.where(t_l < litext_n - 1, 255,
                            lit_rem - 255 * jnp.maximum(litext_n - 1, 0))
    # match-extension byte
    ml_rem = jnp.maximum(m_len[seq_of] - MIN_MATCH, 0) - ML_MASK
    t_m = r - mlext_begin
    ml_ext_val = jnp.where(t_m < mlext_n - 1, 255,
                           ml_rem - 255 * jnp.maximum(mlext_n - 1, 0))
    # literal bytes: gather from source
    lit_src = lit_start[seq_of] + (r - lit_begin)
    lit_val = x[jnp.clip(lit_src, 0, L + PAD - 1)]
    # offset bytes (little-endian)
    dist_q = m_dist[seq_of]
    off_val = jnp.where(r == off_begin, dist_q & 0xFF, dist_q >> 8)

    val = jnp.where(
        r == 0, token[seq_of],
        jnp.where(r < lit_begin, lit_ext_val,
                  jnp.where(r < off_begin, lit_val,
                            jnp.where(r < mlext_begin, off_val, ml_ext_val))))
    out = jnp.where(q < total, val, 0).astype(jnp.int32)

    # n == 0 falls out naturally: one sequence, lit_len 0 -> the single
    # zero token the reference's lastLiterals emits
    out_len = jnp.where(total > cap, -1, total)
    return out, out_len


@functools.partial(jax.jit, static_argnames=("cap",))
def compress_parallel_batch(arr, lens, cap: int):
    """Batched device-parallel compress.

    Args:
      arr: int32[N, L + PAD] byte values 0..255 (jax_codec layout, but with
        this module's PAD slack).
      lens: int32[N] actual block lengths (<= L).
      cap: static per-block output capacity.

    Returns (out int32[N, cap], out_lens int32[N]); out_lens[i] == -1 when
    cap was too small for block i.
    """
    return jax.vmap(lambda x, n: _compress_block(x, n, cap))(arr, lens)


def to_layout(blocks, block_len: int):
    """list[bytes] -> (int32[N, block_len+PAD], int32[N])."""
    import numpy as np
    n = len(blocks)
    arr = np.zeros((n, block_len + PAD), np.int32)
    lens = np.zeros((n,), np.int32)
    for k, b in enumerate(blocks):
        if b:
            arr[k, :len(b)] = np.frombuffer(b, np.uint8)
        lens[k] = len(b)
    return arr, lens


def compress_blocks(blocks, block_len: int | None = None):
    """Host convenience: list[bytes] -> list[bytes] of valid LZ4 blocks."""
    import numpy as np
    if not blocks:
        return []
    block_len = block_len or max(len(b) for b in blocks)
    block_len = max(4, (block_len + 3) & ~3)
    arr, lens = to_layout(blocks, block_len)
    from ..core.constants import max_compressed_length
    cap = max_compressed_length(block_len)
    out, out_lens = compress_parallel_batch(jnp.asarray(arr),
                                            jnp.asarray(lens), cap)
    out = np.asarray(out)
    out_lens = np.asarray(out_lens)
    if (out_lens < 0).any():
        from ..core.errors import Lz4Error
        raise Lz4Error("parallel compress: dest capacity too small")
    return [out[k, :out_lens[k]].astype(np.uint8).tobytes()
            for k in range(len(blocks))]
