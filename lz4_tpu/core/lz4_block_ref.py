"""Pure-Python reference implementation of the LZ4 block codec.

This is the framework's "safe instance" and correctness oracle: a scalar,
exact-semantics implementation of the LZ4 fast-scan compressor and the
fast/safe decompressors. The native (C++) tier and the Pallas TPU kernels are
differentially tested against it.

The algorithm (hash-chain probing, skip heuristic, back-extension, token
emission) follows the reference's generated codecs
(``src/build/source_templates/compress.template:16-261`` and
``decompress.template:17-128``; helpers
``src/java/net/jpountz/lz4/LZ4SafeUtils.java:28-159``) so that compressed
output is byte-identical to lz4-java (and therefore to liblz4) at the same
settings. Little-endian 4-byte reads are used for hashing, matching the
reference on LE hardware (``SafeUtils.java:55-61``).

Buffers: ``src`` is any bytes-like object supporting indexing and slicing
(bytes, bytearray, memoryview); ``dest`` must be a mutable bytes-like
(bytearray or writable memoryview).
"""

from __future__ import annotations

import struct

from .constants import (
    COPY_LENGTH, HASH_TABLE_SIZE, HASH_TABLE_SIZE_64K, LAST_LITERALS,
    LZ4_64K_LIMIT, MAX_DISTANCE, MF_LIMIT, MIN_LENGTH, MIN_MATCH, ML_BITS,
    ML_MASK, RUN_MASK, SKIP_STRENGTH, hash_64k, hash_general,
    max_compressed_length,
)
from .errors import Lz4Error

__all__ = [
    "compress_fast", "compress_fast_alloc",
    "decompress_fast", "decompress_safe",
    "decompress_fast_alloc", "decompress_safe_alloc",
]

_U32 = struct.Struct("<I")


def _read_u32le(buf, i: int) -> int:
    return _U32.unpack_from(buf, i)[0]


def _common_bytes(buf, o1: int, o2: int, limit: int) -> int:
    """Length of the common prefix of buf[o1:] and buf[o2:], with o2 < limit.

    Chunked comparison for speed; exact same result as the byte loop in
    ``LZ4SafeUtils.commonBytes`` (LZ4SafeUtils.java:60-66).
    """
    count = 0
    # fast path: compare 64-byte chunks while they are fully in range
    step = 64
    while o2 + count + step <= limit and o1 + count + step <= o2 + count:
        # slices never overlap forward reads here only when o2-o1 >= step;
        # fall through to byte loop otherwise
        if bytes(buf[o1 + count:o1 + count + step]) != bytes(buf[o2 + count:o2 + count + step]):
            break
        count += step
    while o2 + count < limit and buf[o1 + count] == buf[o2 + count]:
        count += 1
    return count


def _common_bytes_backward(buf, o1: int, o2: int, l1: int, l2: int) -> int:
    count = 0
    while o1 - count > l1 and o2 - count > l2 and buf[o1 - count - 1] == buf[o2 - count - 1]:
        count += 1
    return count


def _write_len(length: int, dest, d_off: int) -> int:
    while length >= 0xFF:
        dest[d_off] = 0xFF
        d_off += 1
        length -= 0xFF
    dest[d_off] = length
    d_off += 1
    return d_off


def _last_literals(src, s_off: int, run_len: int, dest, d_off: int, dest_end: int) -> int:
    if d_off + run_len + 1 + (run_len + 255 - RUN_MASK) // 255 > dest_end:
        raise Lz4Error("maxDestLen is too small")
    if run_len >= RUN_MASK:
        dest[d_off] = RUN_MASK << ML_BITS
        d_off = _write_len(run_len - RUN_MASK, dest, d_off + 1)
    else:
        dest[d_off] = run_len << ML_BITS
        d_off += 1
    dest[d_off:d_off + run_len] = src[s_off:s_off + run_len]
    return d_off + run_len


def _check_range(buf, off: int, length: int) -> None:
    if length < 0:
        raise ValueError("lengths must be >= 0")
    if length > 0 and (off < 0 or off + length > len(buf)):
        raise IndexError(f"range [{off}, {off + length}) out of bounds for length {len(buf)}")


def _compress64k(src, src_off: int, src_len: int, dest, dest_off: int, dest_end: int) -> int:
    """Fast-scan path for inputs < LZ4_64K_LIMIT, 16-bit-offset hash table."""
    src_end = src_off + src_len
    src_limit = src_end - LAST_LITERALS
    mflimit = src_end - MF_LIMIT

    s_off = src_off
    d_off = dest_off
    anchor = s_off

    if src_len >= MIN_LENGTH:
        hash_table = [0] * HASH_TABLE_SIZE_64K
        s_off += 1

        run = True
        while run:
            # --- find a match (with skip acceleration) ---
            forward_off = s_off
            step = 1
            search_match_nb = 1 << SKIP_STRENGTH
            while True:
                s_off = forward_off
                forward_off += step
                step = search_match_nb >> SKIP_STRENGTH
                search_match_nb += 1
                if forward_off > mflimit:
                    run = False
                    break
                h = hash_64k(_read_u32le(src, s_off))
                ref = src_off + hash_table[h]
                hash_table[h] = s_off - src_off
                if src[ref:ref + 4] == src[s_off:s_off + 4]:
                    break
            if not run:
                break

            # --- catch up (extend match backwards) ---
            excess = _common_bytes_backward(src, ref, s_off, src_off, anchor)
            s_off -= excess
            ref -= excess

            run_len = s_off - anchor
            token_off = d_off
            d_off += 1
            if d_off + run_len + (2 + 1 + LAST_LITERALS) + (run_len >> 8) > dest_end:
                raise Lz4Error("maxDestLen is too small")

            if run_len >= RUN_MASK:
                dest[token_off] = RUN_MASK << ML_BITS
                d_off = _write_len(run_len - RUN_MASK, dest, d_off)
            else:
                dest[token_off] = run_len << ML_BITS
            dest[d_off:d_off + run_len] = src[anchor:anchor + run_len]
            d_off += run_len

            while True:
                # encode offset
                back = s_off - ref
                dest[d_off] = back & 0xFF
                dest[d_off + 1] = (back >> 8) & 0xFF
                d_off += 2

                s_off += MIN_MATCH
                ref += MIN_MATCH
                match_len = _common_bytes(src, ref, s_off, src_limit)
                if d_off + (1 + LAST_LITERALS) + (match_len >> 8) > dest_end:
                    raise Lz4Error("maxDestLen is too small")
                s_off += match_len

                if match_len >= ML_MASK:
                    dest[token_off] |= ML_MASK
                    d_off = _write_len(match_len - ML_MASK, dest, d_off)
                else:
                    dest[token_off] |= match_len

                if s_off > mflimit:
                    anchor = s_off
                    run = False
                    break

                hash_table[hash_64k(_read_u32le(src, s_off - 2))] = s_off - 2 - src_off
                h = hash_64k(_read_u32le(src, s_off))
                ref = src_off + hash_table[h]
                hash_table[h] = s_off - src_off
                if src[s_off:s_off + 4] != src[ref:ref + 4]:
                    break

                token_off = d_off
                d_off += 1
                dest[token_off] = 0

            if not run:
                break
            anchor = s_off
            s_off += 1

    d_off = _last_literals(src, anchor, src_end - anchor, dest, d_off, dest_end)
    return d_off - dest_off


def _compress_general(src, src_off: int, src_len: int, dest, dest_off: int, dest_end: int) -> int:
    """Fast-scan path for inputs >= LZ4_64K_LIMIT with a 64KB window."""
    src_end = src_off + src_len
    src_limit = src_end - LAST_LITERALS
    mflimit = src_end - MF_LIMIT

    s_off = src_off
    d_off = dest_off
    anchor = s_off
    s_off += 1

    hash_table = [anchor] * HASH_TABLE_SIZE

    run = True
    while run:
        # --- find a match (with skip acceleration and window check) ---
        forward_off = s_off
        step = 1
        search_match_nb = 1 << SKIP_STRENGTH
        while True:
            s_off = forward_off
            forward_off += step
            step = search_match_nb >> SKIP_STRENGTH
            search_match_nb += 1
            if forward_off > mflimit:
                run = False
                break
            h = hash_general(_read_u32le(src, s_off))
            ref = hash_table[h]
            back = s_off - ref
            hash_table[h] = s_off
            if back < MAX_DISTANCE and src[ref:ref + 4] == src[s_off:s_off + 4]:
                break
        if not run:
            break

        excess = _common_bytes_backward(src, ref, s_off, src_off, anchor)
        s_off -= excess
        ref -= excess

        run_len = s_off - anchor
        token_off = d_off
        d_off += 1
        if d_off + run_len + (2 + 1 + LAST_LITERALS) + (run_len >> 8) > dest_end:
            raise Lz4Error("maxDestLen is too small")

        if run_len >= RUN_MASK:
            dest[token_off] = RUN_MASK << ML_BITS
            d_off = _write_len(run_len - RUN_MASK, dest, d_off)
        else:
            dest[token_off] = run_len << ML_BITS
        dest[d_off:d_off + run_len] = src[anchor:anchor + run_len]
        d_off += run_len

        while True:
            dest[d_off] = back & 0xFF
            dest[d_off + 1] = (back >> 8) & 0xFF
            d_off += 2

            s_off += MIN_MATCH
            match_len = _common_bytes(src, ref + MIN_MATCH, s_off, src_limit)
            if d_off + (1 + LAST_LITERALS) + (match_len >> 8) > dest_end:
                raise Lz4Error("maxDestLen is too small")
            s_off += match_len

            if match_len >= ML_MASK:
                dest[token_off] |= ML_MASK
                d_off = _write_len(match_len - ML_MASK, dest, d_off)
            else:
                dest[token_off] |= match_len

            if s_off > mflimit:
                anchor = s_off
                run = False
                break

            hash_table[hash_general(_read_u32le(src, s_off - 2))] = s_off - 2
            h = hash_general(_read_u32le(src, s_off))
            ref = hash_table[h]
            hash_table[h] = s_off
            back = s_off - ref
            if back >= MAX_DISTANCE or src[ref:ref + 4] != src[s_off:s_off + 4]:
                break

            token_off = d_off
            d_off += 1
            dest[token_off] = 0

        if not run:
            break
        anchor = s_off
        s_off += 1

    d_off = _last_literals(src, anchor, src_end - anchor, dest, d_off, dest_end)
    return d_off - dest_off


def compress_fast(src, src_off: int, src_len: int, dest, dest_off: int, max_dest_len: int) -> int:
    """LZ4 fast-scan block compression. Returns the compressed length."""
    _check_range(src, src_off, src_len)
    _check_range(dest, dest_off, max_dest_len)
    dest_end = dest_off + max_dest_len
    if src_len < LZ4_64K_LIMIT:
        return _compress64k(src, src_off, src_len, dest, dest_off, dest_end)
    return _compress_general(src, src_off, src_len, dest, dest_off, dest_end)


def compress_fast_alloc(src) -> bytes:
    """Convenience: compress a full buffer into a fresh bytes object."""
    src = bytes(src)
    dest = bytearray(max_compressed_length(len(src)))
    n = compress_fast(src, 0, len(src), dest, 0, len(dest))
    return bytes(dest[:n])


def _incremental_copy(dest, match_off: int, d_off: int, match_len: int) -> None:
    """Overlap-aware match copy: repeats the window when distance < length.

    Equivalent to ``safe/wildIncrementalCopy`` (LZ4SafeUtils.java:41-57) —
    byte i of the copy reads ``dest[match_off + i]`` including bytes written
    earlier in this same copy.
    """
    dist = d_off - match_off
    if dist == 0:
        # matchDec == 0: the reference pins only that this must neither
        # throw nor loop (LZ4Test.testNullMatchDec, LZ4Test.java:350-361);
        # the bytes themselves are unspecified (Java self-copies, leaving
        # whatever the dest buffer held). This framework defines them as
        # zeros in EVERY tier so the output of malformed input is
        # deterministic and byte-identical across tiers regardless of
        # buffer history.
        dest[d_off:d_off + match_len] = bytes(match_len)
        return
    if dist >= match_len:
        dest[d_off:d_off + match_len] = dest[match_off:match_off + match_len]
    else:
        pattern = bytes(dest[match_off:d_off])
        reps = -(-match_len // dist)
        dest[d_off:d_off + match_len] = (pattern * reps)[:match_len]


def decompress_fast(src, src_off: int, dest, dest_off: int, dest_len: int) -> int:
    """Decompress a block whose *decompressed* size is exactly known.

    Returns the number of bytes read from ``src``. Mirrors the "Fast"
    template variant (decompress.template:17-128).
    """
    if src_off < 0 or src_off >= len(src):
        raise IndexError(f"src_off {src_off} out of bounds")
    _check_range(dest, dest_off, dest_len)

    if dest_len == 0:
        if src[src_off] != 0:
            raise Lz4Error(f"Malformed input at {src_off}")
        return 1

    dest_end = dest_off + dest_len
    src_len_total = len(src)
    s_off = src_off
    d_off = dest_off

    while True:
        if s_off >= src_len_total:
            raise Lz4Error(f"Malformed input at {s_off}")
        token = src[s_off]
        s_off += 1

        literal_len = token >> ML_BITS
        if literal_len == RUN_MASK:
            while True:
                if s_off >= src_len_total:
                    raise Lz4Error(f"Malformed input at {s_off}")
                b = src[s_off]
                s_off += 1
                if b != 0xFF:
                    break
                literal_len += 0xFF
            literal_len += b

        literal_copy_end = d_off + literal_len
        if literal_copy_end > dest_end - COPY_LENGTH:
            if literal_copy_end != dest_end:
                raise Lz4Error(f"Malformed input at {s_off}")
            if s_off + literal_len > src_len_total:
                raise Lz4Error(f"Malformed input at {s_off}")
            dest[d_off:literal_copy_end] = src[s_off:s_off + literal_len]
            s_off += literal_len
            d_off = literal_copy_end
            break  # EOF

        if s_off + literal_len + 2 > src_len_total:
            raise Lz4Error(f"Malformed input at {s_off}")
        dest[d_off:literal_copy_end] = src[s_off:s_off + literal_len]
        s_off += literal_len
        d_off = literal_copy_end

        match_dec = src[s_off] | (src[s_off + 1] << 8)
        s_off += 2
        match_off = d_off - match_dec
        if match_off < dest_off:
            raise Lz4Error(f"Malformed input at {s_off}")

        match_len = token & ML_MASK
        if match_len == ML_MASK:
            while True:
                if s_off >= src_len_total:
                    raise Lz4Error(f"Malformed input at {s_off}")
                b = src[s_off]
                s_off += 1
                if b != 0xFF:
                    break
                match_len += 0xFF
            match_len += b
        match_len += MIN_MATCH

        match_copy_end = d_off + match_len
        if match_copy_end > dest_end:
            raise Lz4Error(f"Malformed input at {s_off}")
        _incremental_copy(dest, match_off, d_off, match_len)
        d_off = match_copy_end

    return s_off - src_off


def decompress_safe(src, src_off: int, src_len: int, dest, dest_off: int, dest_len: int,
                    hist: int = 0) -> int:
    """Decompress a block whose *compressed* size is exactly known.

    Returns the number of bytes written to ``dest``. Mirrors the "Safe"
    template variant (decompress.template:17-128).

    ``hist`` > 0 extends the match window to that many bytes of ``dest``
    BEFORE ``dest_off`` (linked-block frame mode; decode-only opt-in — the
    reference refuses dependent frames, LZ4FrameOutputStream.java:361-363).
    """
    _check_range(src, src_off, src_len)
    _check_range(dest, dest_off, dest_len)
    if hist < 0 or hist > dest_off:
        raise ValueError("hist must be within the bytes before dest_off")

    if dest_len == 0:
        if src_len != 1 or src[src_off] != 0:
            raise Lz4Error("Output buffer too small")
        return 0

    src_end = src_off + src_len
    dest_end = dest_off + dest_len
    s_off = src_off
    d_off = dest_off

    while True:
        if s_off >= src_end:
            raise Lz4Error(f"Malformed input at {s_off}")
        token = src[s_off]
        s_off += 1

        literal_len = token >> ML_BITS
        if literal_len == RUN_MASK:
            b = 0xFF
            while s_off < src_end:
                b = src[s_off]
                s_off += 1
                if b != 0xFF:
                    break
                literal_len += 0xFF
            literal_len += b

        literal_copy_end = d_off + literal_len
        if literal_copy_end > dest_end - COPY_LENGTH or s_off + literal_len > src_end - COPY_LENGTH:
            if literal_copy_end > dest_end:
                raise Lz4Error("Output buffer too small")
            if s_off + literal_len != src_end:
                raise Lz4Error(f"Malformed input at {s_off}")
            dest[d_off:literal_copy_end] = src[s_off:s_off + literal_len]
            s_off += literal_len
            d_off = literal_copy_end
            break  # EOF

        dest[d_off:literal_copy_end] = src[s_off:s_off + literal_len]
        s_off += literal_len
        d_off = literal_copy_end

        match_dec = src[s_off] | (src[s_off + 1] << 8)
        s_off += 2
        match_off = d_off - match_dec
        if match_off < dest_off - hist:
            raise Lz4Error(f"Malformed input at {s_off}")

        match_len = token & ML_MASK
        if match_len == ML_MASK:
            b = 0xFF
            while s_off < src_end:
                b = src[s_off]
                s_off += 1
                if b != 0xFF:
                    break
                match_len += 0xFF
            match_len += b
        match_len += MIN_MATCH

        match_copy_end = d_off + match_len
        if match_copy_end > dest_end:
            raise Lz4Error(f"Malformed input at {s_off}")
        _incremental_copy(dest, match_off, d_off, match_len)
        d_off = match_copy_end

    return d_off - dest_off


def decompress_fast_alloc(src, decompressed_len: int) -> bytes:
    dest = bytearray(decompressed_len)
    decompress_fast(src, 0, dest, 0, decompressed_len)
    return bytes(dest)


def decompress_safe_alloc(src, max_decompressed_len: int) -> bytes:
    dest = bytearray(max_decompressed_len)
    n = decompress_safe(src, 0, len(src), dest, 0, max_decompressed_len)
    return bytes(dest[:n])
