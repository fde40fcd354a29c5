"""Storage-abstraction harness: every tier must accept bytes, bytearray and
memoryview (including sliced views with nonzero offsets and read-only
views), mirroring the reference's byte[]/ByteBuffer Tester matrix
(``AbstractLZ4Test.java:66-116,343-357``). Read-only destinations must
raise (the ReadOnlyBufferException analog)."""

import pytest

from lz4_tpu.api.factory import Lz4Factory, XXHashFactory

from conftest import random_bytes


def _tiers():
    out = [Lz4Factory.safe_instance()]
    try:
        out.append(Lz4Factory.native_instance())
    except Exception:
        pass
    return out


def _src_variants(data: bytes):
    pad = 7
    yield "bytes", data, 0
    yield "bytearray", bytearray(data), 0
    yield "memoryview", memoryview(data), 0
    yield "sliced-view", memoryview(bytes(pad) + data + bytes(pad))[pad:pad + len(data)], 0
    padded = bytes(pad) + data
    yield "offset-bytes", padded, pad


@pytest.mark.parametrize("tier", range(2))
def test_compress_from_any_storage(tier, rng):
    tiers = _tiers()
    if tier >= len(tiers):
        pytest.skip("tier unavailable")
    f = tiers[tier]
    data = random_bytes(rng, 3000, 8)
    expect = f.fast_compressor().compress_alloc(data)
    for name, buf, off in _src_variants(data):
        got = f.fast_compressor().compress_alloc(buf, off, len(data))
        assert got == expect, name


@pytest.mark.parametrize("tier", range(2))
def test_decompress_into_any_mutable_storage(tier, rng):
    tiers = _tiers()
    if tier >= len(tiers):
        pytest.skip("tier unavailable")
    f = tiers[tier]
    data = random_bytes(rng, 2000, 8)
    comp = f.fast_compressor().compress_alloc(data)
    for make in (lambda: bytearray(len(data)),
                 lambda: memoryview(bytearray(len(data)))):
        dest = make()
        n = f.safe_decompressor().decompress(comp, 0, len(comp), dest, 0, len(data))
        assert n == len(data)
        assert bytes(dest[:n]) == data


@pytest.mark.parametrize("tier", range(2))
def test_readonly_dest_raises(tier, rng):
    tiers = _tiers()
    if tier >= len(tiers):
        pytest.skip("tier unavailable")
    f = tiers[tier]
    data = random_bytes(rng, 500, 8)
    comp = f.fast_compressor().compress_alloc(data)
    ro = memoryview(bytes(len(data)))  # read-only view
    with pytest.raises((TypeError, ValueError)):
        f.safe_decompressor().decompress(comp, 0, len(comp), ro, 0, len(data))


def test_hash_from_any_storage(rng):
    data = random_bytes(rng, 1000, 256)
    for name in ("safe", "native"):
        try:
            f = XXHashFactory._instance(name)
        except Exception:
            continue
        expect = f.hash32().hash(data, 0, len(data), 0)
        for vname, buf, off in _src_variants(data):
            assert f.hash32().hash(buf, off, len(data), 0) == expect, (name, vname)


@pytest.mark.parametrize("tier", range(2))
def test_with_length_through_storage_matrix(tier, rng):
    """The reference routes the same storage matrix through the WithLength
    wrappers (AbstractLZ4Test.java:146-164,187-205)."""
    from lz4_tpu.formats.with_length import (Lz4CompressorWithLength,
                                             Lz4DecompressorWithLength)
    tiers = _tiers()
    if tier >= len(tiers):
        pytest.skip("tier unavailable")
    f = tiers[tier]
    comp = Lz4CompressorWithLength(f.fast_compressor())
    dec = Lz4DecompressorWithLength(f.fast_decompressor())
    data = random_bytes(rng, 3000, 8)
    expect = comp.compress_alloc(data)
    for name, src, off in _src_variants(bytes(expect)):
        got = dec.decompress_alloc(src, off)
        assert bytes(got) == data, name
    for name, src, off in _src_variants(data):
        c = comp.compress_alloc(src, off, len(data))
        assert bytes(c) == bytes(expect), name
