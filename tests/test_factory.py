"""Factory dispatch tests: singletons, self-test, tier fallback, HC levels."""

import pytest

from lz4_tpu.api.factory import Lz4Factory, XXHashFactory
from lz4_tpu.core.errors import Lz4Error


def test_safe_instance_singleton():
    assert Lz4Factory.safe_instance() is Lz4Factory.safe_instance()
    assert XXHashFactory.safe_instance() is XXHashFactory.safe_instance()


def test_fastest_instance_always_available():
    f = Lz4Factory.fastest_instance()
    data = b"the quick brown fox jumps over the lazy dog" * 10
    c = f.fast_compressor().compress_alloc(data)
    assert f.safe_decompressor().decompress_alloc(c, 0, len(c), len(data)) == data


def test_high_compressor_levels():
    f = Lz4Factory.safe_instance()
    assert f.high_compressor() is f.high_compressor(9)
    assert f.high_compressor(1) is not f.high_compressor(17)
    # out-of-range levels are clamped (reference raises for <1; we clamp at
    # both ends like highCompressor(int) clamps high levels is NOT what the
    # reference does for low — it raises; match that for negatives)
    data = b"abcabcabcabc" * 100
    for level in (1, 9, 17):
        c = f.high_compressor(level).compress_alloc(data)
        d = f.safe_decompressor().decompress_alloc(c, 0, len(c), len(data))
        assert d == data


def test_cross_tier_roundtrip_matrix(rng):
    """Compress with any available tier, decompress with any other
    (LZ4Test.java:305-324 differential matrix)."""
    factories = [Lz4Factory.safe_instance()]
    for ctor in (Lz4Factory.native_instance, Lz4Factory.pallas_instance):
        try:
            factories.append(ctor())
        except Exception:
            pass
    data = bytes(rng.randrange(16) for _ in range(1500))
    compressed = []
    for f in factories:
        compressed.append(f.fast_compressor().compress_alloc(data))
        compressed.append(f.high_compressor(9).compress_alloc(data))
    for f in factories:
        for c in compressed:
            assert f.safe_decompressor().decompress_alloc(c, 0, len(c), len(data)) == data
            assert f.fast_decompressor().decompress_alloc(c, 0, len(data)) == data
