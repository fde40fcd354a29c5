"""LZ4 block codec tests: roundtrips, golden corpus, malformed inputs.

Models the reference test strategy (SURVEY.md §4): cross-implementation
roundtrips (LZ4Test.java:305-324), Calgary corpus (LZ4Test.java:335-348),
adversarial inputs (LZ4Test.java:350-419), and property tests with a
compressibility dial (AbstractLZ4Test.java:334-341).
"""

import random

import pytest

from lz4_tpu.core.constants import max_compressed_length
from lz4_tpu.core.errors import Lz4Error
from lz4_tpu.core.lz4_block_ref import (
    compress_fast, compress_fast_alloc, decompress_fast, decompress_safe,
    decompress_fast_alloc, decompress_safe_alloc,
)
from lz4_tpu.core.lz4_hc_ref import compress_hc, compress_hc_alloc

from conftest import random_bytes


def roundtrip_all(data: bytes):
    """Compress with fast + HC, decompress with both decompressors, byte-equal."""
    for compressed in (compress_fast_alloc(data),
                       compress_hc_alloc(data, 9)):
        assert decompress_safe_alloc(compressed, len(data) + 32) == data
        assert decompress_fast_alloc(compressed, len(data)) == data
        # fast decompressor must report exact bytes read
        dest = bytearray(len(data))
        n_read = decompress_fast(compressed, 0, dest, 0, len(data))
        assert n_read == len(compressed)


@pytest.mark.parametrize("length", [0, 1, 4, 12, 13, 64, 255, 4096, 65535, 65536,
                                    65547, 70000, 131072])
@pytest.mark.parametrize("alphabet", [1, 2, 16, 256])
def test_roundtrip_random(length, alphabet, rng):
    roundtrip_all(random_bytes(rng, length, alphabet))


def test_roundtrip_calgary(calgary):
    for name, data in calgary.items():
        c = compress_fast_alloc(data)
        assert decompress_safe_alloc(c, len(data)) == data
        assert decompress_fast_alloc(c, len(data)) == data


def test_hc_beats_fast_on_calgary(calgary):
    for name, data in calgary.items():
        c_fast = compress_fast_alloc(data)
        c_hc = compress_hc_alloc(data, 9)
        assert len(c_hc) <= len(c_fast), name
        assert decompress_safe_alloc(c_hc, len(data)) == data


@pytest.mark.parametrize("level", [1, 2, 5, 9, 12, 17])
def test_hc_levels_roundtrip(level, calgary):
    data = calgary["geo"][:30000]
    c = compress_hc_alloc(data, level)
    assert decompress_safe_alloc(c, len(data)) == data


def test_hc_higher_level_not_worse(calgary):
    data = calgary["book1"][:100000]
    sizes = [len(compress_hc_alloc(data, lv)) for lv in (1, 5, 9, 13)]
    assert sizes == sorted(sizes, reverse=True) or all(
        sizes[i] >= sizes[i + 1] - 16 for i in range(len(sizes) - 1))


def test_max_compressed_length_bound():
    # worst case: incompressible data must fit in maxCompressedLength
    rng = random.Random(99)
    for length in (0, 1, 254, 255, 256, 5000, 65547):
        data = random_bytes(rng, length, 256)
        bound = max_compressed_length(length)
        dest = bytearray(bound)
        n = compress_fast(data, 0, length, dest, 0, bound)
        assert n <= bound
    with pytest.raises(ValueError):
        max_compressed_length(-1)
    with pytest.raises(ValueError):
        max_compressed_length(0x7E000000)


def test_compress_dest_too_small(rng):
    data = random_bytes(rng, 65536, 256)  # incompressible
    dest = bytearray(1000)
    with pytest.raises(Lz4Error):
        compress_fast(data, 0, len(data), dest, 0, len(dest))
    with pytest.raises(Lz4Error):
        compress_hc(data, 0, len(data), dest, 0, len(dest), 9)


def test_offsets_roundtrip(rng):
    """Compression/decompression at nonzero src/dest offsets."""
    data = random_bytes(rng, 10000, 8)
    pad = 17
    src = bytes(pad) + data + bytes(pad)
    dest = bytearray(pad + max_compressed_length(len(data)))
    n = compress_fast(src, pad, len(data), dest, pad, len(dest) - pad)
    restored = bytearray(len(data) + 2 * pad)
    written = decompress_safe(dest, pad, n, restored, pad, len(data))
    assert written == len(data)
    assert bytes(restored[pad:pad + len(data)]) == data


# ---------------------------------------------------------------------------
# adversarial / malformed inputs (LZ4Test.java:350-419)
# ---------------------------------------------------------------------------

def test_null_match_dec_does_not_hang_or_throw():
    # 1 literal, match with matchDec=0, 8 literals — must not throw nor hang
    invalid = bytes([16, 42, 0, 0, 128, 42, 42, 42, 42, 42, 42, 42, 42])
    decompress_fast(invalid, 0, bytearray(13), 0, 13)
    decompress_safe(invalid, 0, len(invalid), bytearray(20), 0, 20)


def test_null_match_dec_bytes_are_zeros_across_tiers():
    """The reference pins only no-throw/no-hang for null match offsets
    (LZ4Test.java:350-361); the bytes are unspecified there. This framework
    defines them as ZEROS in every tier, so even malformed-input output is
    deterministic and byte-identical across tiers — regardless of dest
    buffer history or the native shortcut's wild-copy slop (found by the
    tools/diff_fuzz.py oracle: the native tier used to leak slop bytes
    where the safe tier left fresh-buffer zeros)."""
    from lz4_tpu.api.factory import Lz4Factory

    # 4 literals, null match (len 4+3), 14 trailing literals: long enough
    # that the native shortcut path (blind 16B literal copy) runs first
    lits = bytes(range(65, 69))
    tail = bytes(range(80, 94))
    stream = bytes([0x43]) + lits + bytes([0, 0]) + bytes([0xE0]) + tail
    out_len = 4 + 7 + 14
    expect = lits + b"\x00" * 7 + tail

    tiers = [Lz4Factory.safe_instance()]
    try:
        tiers.append(Lz4Factory.native_instance())
    except Exception:
        pass
    for tier in tiers:
        # dirty dest: the zeros must be written, not inherited
        dest = bytearray(b"\xAA" * (out_len + 8))
        n = tier.safe_decompressor().decompress(stream, 0, len(stream),
                                                dest, 0, out_len)
        assert n == out_len, tier.impl
        assert bytes(dest[:out_len]) == expect, tier.impl
        dest2 = bytearray(b"\x55" * (out_len + 8))
        read = tier.fast_decompressor().decompress(stream, 0, dest2, 0,
                                                   out_len)
        assert read == len(stream), tier.impl
        assert bytes(dest2[:out_len]) == expect, tier.impl


def test_extension_length_bomb_raises():
    """~8.4M 0xFF extension bytes would wrap the int32 length accumulator
    negative and bypass every downstream bound check (converting to an
    ~2^64 memset/memcpy in the native tier — found by review); all tiers
    must reject with an error instead. Also pins the match-length side."""
    from lz4_tpu.api.factory import Lz4Factory

    def bombs(n_ext):
        lit = bytes([0xF0]) + b"\xFF" * n_ext + bytes([0x00])
        # 5 literals so a match is legal, offset 1, then the 0xFF run
        match = (bytes([0x5F]) + b"12345" + bytes([0x01, 0x00])
                 + b"\xFF" * n_ext + bytes([0x00]))
        return (lit, match)

    # native: full-size bombs that actually wrap int32 without the guard
    try:
        nat = Lz4Factory.native_instance()
    except Exception:
        nat = None
    if nat is not None:
        for bomb in bombs(8_500_000):
            with pytest.raises(Lz4Error):
                nat.safe_decompressor().decompress_alloc(
                    bomb, 0, len(bomb), 1 << 16)
            with pytest.raises(Lz4Error):
                nat.fast_decompressor().decompress_alloc(bomb, 0, 1 << 16)
    # safe tier: arbitrary-precision ints cannot wrap; a small bomb pins
    # the same reject-on-bounds behavior without an 8M-iteration walk
    safe = Lz4Factory.safe_instance()
    for bomb in bombs(50_000):
        with pytest.raises(Lz4Error):
            safe.safe_decompressor().decompress_alloc(
                bomb, 0, len(bomb), 1 << 16)


def test_ends_with_match_throws():
    invalid = bytes([96, 42, 43, 44, 45, 46, 47, 5, 0])
    with pytest.raises(Lz4Error):
        decompress_fast(invalid, 0, bytearray(10), 0, 10)
    with pytest.raises(Lz4Error):
        decompress_safe(invalid, 0, len(invalid), bytearray(20), 0, 20)


@pytest.mark.parametrize("n_literals", [1, 2, 3, 4])
def test_ends_with_less_than_5_literals_throws(n_literals):
    base = bytes([96, 42, 43, 44, 45, 46, 47, 5, 0])
    invalid = base + bytes([n_literals << 4]) + bytes(n_literals)
    with pytest.raises(Lz4Error):
        decompress_fast(invalid, 0, bytearray(20), 0, 20)
    with pytest.raises(Lz4Error):
        decompress_safe(invalid, 0, len(invalid), bytearray(20), 0, 20)


def test_decompress_empty_dest():
    # destLen == 0: src must be exactly one zero token
    assert decompress_safe(b"\x00", 0, 1, bytearray(0), 0, 0) == 0
    assert decompress_fast(b"\x00", 0, bytearray(0), 0, 0) == 1
    with pytest.raises(Lz4Error):
        decompress_safe(b"\x10\x00", 0, 2, bytearray(0), 0, 0)
    with pytest.raises(Lz4Error):
        decompress_fast(b"\x10", 0, bytearray(0), 0, 0)


def test_truncated_compressed_data_throws(rng):
    data = random_bytes(rng, 10000, 4)
    c = compress_fast_alloc(data)
    for cut in (1, 2, len(c) // 2, len(c) - 1):
        truncated = c[:cut]
        with pytest.raises(Lz4Error):
            decompress_safe(truncated, 0, len(truncated), bytearray(len(data)), 0, len(data))


def test_dest_too_small_throws(rng):
    data = random_bytes(rng, 10000, 4)
    c = compress_fast_alloc(data)
    with pytest.raises(Lz4Error):
        decompress_safe(c, 0, len(c), bytearray(len(data) // 2), 0, len(data) // 2)


def test_match_at_max_distance(rng):
    """Match construction exactly at MAX_DISTANCE (LZ4Test.java:465-475)."""
    from lz4_tpu.core.constants import MAX_DISTANCE
    seq = bytes(rng.randrange(256) for _ in range(64))
    data = seq + bytes(MAX_DISTANCE - len(seq)) + seq
    c = compress_fast_alloc(data)
    assert decompress_safe_alloc(c, len(data)) == data


def test_incompressible_worst_case(rng):
    """Every byte distinct pattern: compressed stream is pure literals."""
    data = random_bytes(rng, 300, 256)
    c = compress_fast_alloc(data)
    assert decompress_safe_alloc(c, len(data)) == data
    assert len(c) >= len(data)  # stored as literals plus headers


def test_literal_run_regression_issue12():
    """~500-byte literal array regression vector (LZ4Test.java:487-541 analog):
    a long literal run followed by a short repeated tail."""
    data = bytes(range(256)) + bytes(range(255, -1, -1)) + b"abcd" * 16
    c = compress_fast_alloc(data)
    assert decompress_safe_alloc(c, len(data)) == data


class TestBlockStreamOneShots:
    """Native one-call LZ4Block codec vs the stream classes."""

    def test_byte_parity(self, calgary):
        import io
        from lz4_tpu.formats import (Lz4BlockOutputStream,
                                     compress_block_stream)
        data = calgary["geo"]
        for bs in (64, 4096, 65536):
            out = io.BytesIO()
            s = Lz4BlockOutputStream(out, block_size=bs)
            s.write(data)
            s.finish()
            assert compress_block_stream(data, bs) == out.getvalue()

    def test_roundtrip_and_cross_reader(self, calgary):
        import io
        from lz4_tpu.formats import (Lz4BlockInputStream,
                                     compress_block_stream,
                                     decompress_block_stream)
        data = calgary["geo"]
        st = compress_block_stream(data, 8192)
        assert decompress_block_stream(st) == data
        assert Lz4BlockInputStream(io.BytesIO(st)).read() == data

    def test_concatenated(self):
        from lz4_tpu.formats import (compress_block_stream,
                                     decompress_block_stream)
        a = compress_block_stream(b"first", 64)
        b = compress_block_stream(b"second", 64)
        assert decompress_block_stream(a + b,
                                       stop_on_empty_block=False) == b"firstsecond"
        assert decompress_block_stream(a + b) == b"first"

    def test_empty(self):
        from lz4_tpu.formats import (compress_block_stream,
                                     decompress_block_stream)
        st = compress_block_stream(b"", 64)
        assert decompress_block_stream(st) == b""

    def test_corruption_raises(self, calgary):
        import pytest
        from lz4_tpu.core.errors import Lz4FrameError
        from lz4_tpu.formats import (compress_block_stream,
                                     decompress_block_stream)
        st = bytearray(compress_block_stream(calgary["geo"][:10000], 4096))
        bad = bytearray(st); bad[0] ^= 0xFF  # magic
        with pytest.raises(Lz4FrameError):
            decompress_block_stream(bytes(bad))
        bad = bytearray(st); bad[40] ^= 0xFF  # payload -> checksum mismatch
        with pytest.raises(Lz4FrameError):
            decompress_block_stream(bytes(bad))
        with pytest.raises(Lz4FrameError):
            decompress_block_stream(bytes(st[:30]))  # truncated

    def test_overlong_compressed_len_rejected_early(self):
        """A header claiming a compressed_len beyond the bound of its
        block size must be rejected BEFORE any attempt to read/buffer the
        (attacker-controlled, up to 4GB-1) payload — r5 hardening. Driven
        through the streaming reader, which reads from a short-read mock
        so an unbounded read attempt would raise the wrong error."""
        import io
        import struct

        import pytest

        from lz4_tpu.core.errors import Lz4FrameError
        from lz4_tpu.formats import Lz4BlockInputStream

        token = 0x20 | 4  # LZ4, block size 2^14
        header = (b"LZ4Block" + bytes([token])
                  + struct.pack("<I", 0xFFFFFFF0)   # absurd compressed_len
                  + struct.pack("<I", 1 << 14)      # plausible original_len
                  + struct.pack("<I", 0))
        with pytest.raises(Lz4FrameError, match="corrupted"):
            Lz4BlockInputStream(io.BytesIO(header + b"xx")).read()
