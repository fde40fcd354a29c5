"""Golden-vector pinning: exact output bytes locked down.

These vectors were produced by the reference-semantics codecs and manually
verified token-by-token against the public LZ4 block/frame specifications
(token = (litLen<<4)|matchLen-4, 0xFF run extensions, 2-byte LE offsets,
frame magic/FLG/BD/HC layout). Pinning them guards every tier against
silent format drift: all tiers must keep producing these exact bytes.
"""

import pytest

from lz4_tpu.api.factory import Lz4Factory, XXHashFactory
from lz4_tpu.formats.frame import compress_frame, decompress_frame

FAST_INPUT = b"abcabcabcabcabcabcabcabcabc"
FAST_GOLDEN = bytes.fromhex("3f616263030000506263616263")

HC_INPUT = bytes(range(16)) * 8
HC_GOLDEN = bytes.fromhex(
    "ff01000102030405060708090a0b0c0d0e0f100058500b0c0d0e0f")

FRAME_INPUT = b"hello hello hello hello hello!"
FRAME_GOLDEN = bytes.fromhex(
    "04224d18607073100000006f68656c6c6f2006000050656c6c6f2100000000")

XXH_INPUT = b"tpu-lz4"
XXH32_GOLDEN = 0xA554D005
XXH64_GOLDEN = 0x2177B3AB30980651


def _tiers():
    out = [Lz4Factory.safe_instance()]
    for ctor in (Lz4Factory.native_instance, Lz4Factory.pallas_instance):
        try:
            out.append(ctor())
        except Exception:
            pass
    return out


def test_fast_golden_all_tiers():
    for f in _tiers():
        assert f.fast_compressor().compress_alloc(FAST_INPUT) == FAST_GOLDEN, f


def test_hc_golden_all_tiers():
    for f in _tiers():
        assert f.high_compressor(9).compress_alloc(HC_INPUT) == HC_GOLDEN, f


def test_frame_golden():
    assert compress_frame(FRAME_INPUT) == FRAME_GOLDEN
    assert decompress_frame(FRAME_GOLDEN) == FRAME_INPUT


def test_golden_decodes_everywhere():
    for f in _tiers():
        assert (f.safe_decompressor().decompress_alloc(
            FAST_GOLDEN, 0, len(FAST_GOLDEN), len(FAST_INPUT)) == FAST_INPUT)
        assert (f.fast_decompressor().decompress_alloc(
            HC_GOLDEN, 0, len(HC_INPUT)) == HC_INPUT)


def test_xxhash_golden():
    for name in ("safe", "native", "pallas"):
        try:
            f = XXHashFactory._instance(name)
        except Exception:
            continue
        assert f.hash32().hash(XXH_INPUT, 0, len(XXH_INPUT), 0) & 0xFFFFFFFF \
            == XXH32_GOLDEN, name
        assert (f.hash64().hash(XXH_INPUT, 0, len(XXH_INPUT), 0)
                & 0xFFFFFFFFFFFFFFFF) == XXH64_GOLDEN, name
