"""xxHash32/64 tests: known vectors, streaming vs one-shot, checksum quirk.

Models the reference's XXHash32Test/XXHash64Test strategy
(``src/test/net/jpountz/xxhash/XXHash32Test.java:77-191``): differential
comparison across implementations and streaming chunkings.
"""

import random

import pytest

from lz4_tpu.core.xxhash_ref import (
    StreamingXXH32, StreamingXXH64, as_s32, as_s64, xxh32, xxh64,
)
from lz4_tpu.api.factory import XXHashFactory

# Canonical test vectors for XXH32/XXH64 (seed 0 and seed'd).
KNOWN_32 = [
    (b"", 0, 0x02CC5D05),
    (b"a", 0, 0x550D7456),
    (b"abc", 0, 0x32D153FF),
    (b"message digest", 0, 0x7C948494),
    (b"abcdefghijklmnopqrstuvwxyz", 0, 0x63A14D5F),
    (b"", 1, 0x0B2CB792),
]
KNOWN_64 = [
    (b"", 0, 0xEF46DB3751D8E999),
    (b"a", 0, 0xD24EC4F1A98C6E5B),
    (b"abc", 0, 0x44BC2CF5AD770999),
]


@pytest.mark.parametrize("data,seed,expected", KNOWN_32)
def test_xxh32_known_vectors(data, seed, expected):
    assert xxh32(data, 0, len(data), seed) == expected


@pytest.mark.parametrize("data,seed,expected", KNOWN_64)
def test_xxh64_known_vectors(data, seed, expected):
    assert xxh64(data, 0, len(data), seed) == expected


@pytest.mark.parametrize("length", [0, 1, 3, 4, 15, 16, 17, 31, 32, 33, 100, 1000, 4096])
@pytest.mark.parametrize("seed", [0, 1, -1 & 0xFFFFFFFF, 0x9747B28C])
def test_streaming_matches_oneshot_32(length, seed, rng):
    data = bytes(rng.randrange(256) for _ in range(length))
    expect = xxh32(data, 0, length, seed)
    s = StreamingXXH32(seed)
    off = 0
    while off < length:
        chunk = rng.randrange(1, 20)
        chunk = min(chunk, length - off)
        s.update(data, off, chunk)
        off += chunk
    assert s.get_value() == expect
    # non-destructive get_value
    assert s.get_value() == expect


@pytest.mark.parametrize("length", [0, 1, 7, 8, 31, 32, 33, 63, 64, 65, 1000])
def test_streaming_matches_oneshot_64(length, rng):
    seed = 0x0102030405060708
    data = bytes(rng.randrange(256) for _ in range(length))
    expect = xxh64(data, 0, length, seed)
    s = StreamingXXH64(seed)
    off = 0
    while off < length:
        chunk = min(rng.randrange(1, 40), length - off)
        s.update(data, off, chunk)
        off += chunk
    assert s.get_value() == expect


def test_streaming_reset(rng):
    data = bytes(rng.randrange(256) for _ in range(100))
    s = StreamingXXH32(42)
    s.update(data)
    v1 = s.get_value()
    s.reset()
    s.update(data)
    assert s.get_value() == v1


def test_checksum_view_masks_to_28_bits():
    # reference quirk: asChecksum() masks with 0xFFFFFFFL (7 F's)
    s = StreamingXXH32(0)
    s.update(b"hello world hello world")
    assert s.checksum_value() == s.get_value() & 0xFFFFFFF
    assert s.checksum_value() < (1 << 28)


def test_factory_signed_semantics():
    f = XXHashFactory.safe_instance()
    data = b"\xff" * 64
    h = f.hash32().hash(data, 0, len(data), 0)
    assert -(1 << 31) <= h < (1 << 31)
    assert h & 0xFFFFFFFF == xxh32(data, 0, len(data), 0)
    h64 = f.hash64().hash(data, 0, len(data), 0)
    assert -(1 << 63) <= h64 < (1 << 63)
    assert h64 & 0xFFFFFFFFFFFFFFFF == xxh64(data, 0, len(data), 0)


def test_factory_streaming_matches_oneshot():
    f = XXHashFactory.safe_instance()
    data = bytes(range(256)) * 3
    s = f.new_streaming_hash32(7)
    s.update(data)
    assert s.get_value() == f.hash32().hash(data, 0, len(data), 7)
    s64 = f.new_streaming_hash64(7)
    s64.update(data)
    assert s64.get_value() == f.hash64().hash(data, 0, len(data), 7)


def test_offsets_and_ranges(rng):
    data = bytes(rng.randrange(256) for _ in range(300))
    assert xxh32(data, 10, 100, 5) == xxh32(data[10:110], 0, 100, 5)
    with pytest.raises(IndexError):
        xxh32(data, 250, 100, 0)
    with pytest.raises(IndexError):
        xxh32(data, -1, 10, 0)


def test_long_accumulation_multi_mb():
    """Reduced-scale analog of the reference's >8GB test4GB accumulation
    (XXHash32Test.java:144-166): many random-sized updates, continuous
    comparison against the one-shot hash."""
    rng = random.Random(1234)
    s32 = StreamingXXH32(0)
    s64 = StreamingXXH64(0)
    total = bytearray()
    for _ in range(50):
        chunk = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 5000)))
        total.extend(chunk)
        s32.update(chunk)
        s64.update(chunk)
        assert s32.get_value() == xxh32(total)
        assert s64.get_value() == xxh64(total)


def test_as_checksum_adapter_quirk():
    """asChecksum() object parity: 28-bit mask (seven F's), byte + slice
    update overloads, reset (StreamingXXHash32.java:95-131)."""
    from lz4_tpu.api.factory import XXHashFactory
    for factory in (XXHashFactory.fastest_instance(),
                    XXHashFactory.safe_instance()):
        sh = factory.new_streaming_hash32(0x9747B28C)
        c = sh.as_checksum()
        c.update(b"hello world")
        v = c.get_value()
        assert v == sh.get_value() & 0xFFFFFFF
        assert v <= 0xFFFFFFF
        c.reset()
        c.update(ord("h"))
        c.update(b"xello worldx", 1, 10)
        assert c.get_value() == v


@pytest.mark.slow
def test_streaming_hash_8gib_total_len_boundary():
    """Cross BOTH total_len folds, 2^32 and 2^33 (XXHash32Test.java:144-166
    hashes >8GB continuously): 136 x 64MiB updates (8.5 GiB) through the
    native streaming state must equal (a) the native one-shot over the same
    bytes (tpulz4_xxh32 takes an int64 length) and (b) a second streaming
    pass fed odd-sized updates, so the 16/32-byte remainder buffer carries
    nonzero fill across nearly every update — for both xxh32 and xxh64."""
    np = pytest.importorskip("numpy")
    try:
        from lz4_tpu.api.factory import XXHashFactory
        xf = XXHashFactory.native_instance()
    except Exception:
        pytest.skip("native tier unavailable")

    chunk_mib = 64
    n_chunks = 136                        # 136 * 64 MiB = 8.5 GiB > 2^33
    chunk_len = chunk_mib << 20
    total = n_chunks * chunk_len
    assert total > (1 << 33)

    rng = np.random.default_rng(0xFEED)
    base = rng.integers(0, 256, chunk_len, dtype=np.uint8)
    big = np.empty(total, np.uint8)
    s32 = xf.new_streaming_hash32(0)
    s64 = xf.new_streaming_hash64(0)
    for i in range(n_chunks):
        piece = base ^ np.uint8(i & 0xFF)  # distinct content per chunk
        big[i * chunk_len:(i + 1) * chunk_len] = piece
        mv = memoryview(big)[i * chunk_len:(i + 1) * chunk_len]
        s32.update(mv, 0, chunk_len)
        s64.update(mv, 0, chunk_len)

    one32 = xf.hash32().hash(big, 0, total, 0)
    one64 = xf.hash64().hash(big, 0, total, 0)
    assert s32.get_value() == one32
    assert s64.get_value() == one64

    # second pass: odd update sizes (prime stride) keep the remainder
    # buffer non-empty at every boundary while total_len crosses 2^33
    o32 = xf.new_streaming_hash32(0)
    o64 = xf.new_streaming_hash64(0)
    step = 33_554_467                     # prime, ~32 MiB
    mv = memoryview(big)
    pos = 0
    while pos < total:
        n = min(step, total - pos)
        o32.update(mv, pos, n)
        o64.update(mv, pos, n)
        pos += n
    assert o32.get_value() == one32
    assert o64.get_value() == one64
