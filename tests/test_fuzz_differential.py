"""Randomized cross-tier differential fuzz (seeded, bounded runtime).

The condensed form of the reference's randomizedtesting property matrix
(LZ4Test.java:305-324 + AbstractLZ4Test random generators): generated
inputs sweep compressibility structures; native and safe tiers must emit
byte-identical compressed streams, and every decoder contract must
roundtrip.
"""

import random

import pytest

from lz4_tpu.api import native_instances as ni
from lz4_tpu.api.factory import Lz4Factory
from lz4_tpu.core.constants import max_compressed_length


def _gen(rng, kind, n):
    if kind == 0:   # incompressible
        return bytes(rng.randrange(256) for _ in range(min(n, 20000)))
    if kind == 1:   # constant
        return bytes(n)
    if kind == 2:   # small alphabet
        sym = rng.randrange(2, 30)
        return bytes(rng.randrange(sym) for _ in range(min(n, 30000)))
    if kind == 3:   # periodic (overlap matches at every distance)
        p = rng.randrange(1, 40)
        unit = bytes(rng.randrange(256) for _ in range(p))
        return (unit * (n // p + 1))[:n]
    if kind == 4:   # text-like
        words = [b"the", b"compression", b"lz4", b" ", b"block", b"\n"]
        parts = []
        while sum(map(len, parts)) < min(n, 30000):
            parts.append(rng.choice(words))
        return b"".join(parts)
    half = n // 2   # compressible prefix + random tail
    return bytes(half) + bytes(rng.randrange(256) for _ in range(min(half, 8000)))


@pytest.mark.parametrize("seed", [11, 29, 2026])
def test_cross_tier_differential(seed):
    rng = random.Random(seed)
    safe = Lz4Factory.safe_instance()
    fast_n, fast_s = ni.FastCompressor(), safe.fast_compressor()
    dec_n, decf_n = ni.SafeDecompressor(), ni.FastDecompressor()
    for i in range(24):
        n = rng.choice([0, 1, 7, 64, 1000, 8192, 65536, 70000])
        data = _gen(rng, i % 6, n)
        cap = max_compressed_length(len(data))
        b1 = bytearray(cap)
        n1 = fast_n.compress(data, 0, len(data), b1, 0, cap)
        if len(data) <= 20000:
            b2 = bytearray(cap)
            n2 = fast_s.compress(data, 0, len(data), b2, 0, cap)
            assert bytes(b1[:n1]) == bytes(b2[:n2]), f"tier mismatch iter {i}"
        comp = bytes(b1[:n1])
        out = bytearray(len(data))
        w = dec_n.decompress(comp, 0, n1, out, 0, len(out)) if data else 0
        assert bytes(out[:w]) == data
        if data:
            out2 = bytearray(len(data))
            r = decf_n.decompress(comp, 0, out2, 0, len(data))
            assert r == n1 and bytes(out2) == data


@pytest.mark.parametrize("level", [1, 9, 17])
def test_hc_tier_differential(level):
    rng = random.Random(level * 7)
    safe = Lz4Factory.safe_instance()
    for i in range(4):
        data = _gen(rng, rng.randrange(6), rng.choice([500, 5000, 15000]))
        cap = max_compressed_length(len(data))
        hb = bytearray(cap)
        hn = ni.HighCompressor(level).compress(data, 0, len(data), hb, 0, cap)
        hs = bytearray(cap)
        hn2 = safe.high_compressor(level).compress(data, 0, len(data),
                                                   hs, 0, cap)
        assert bytes(hb[:hn]) == bytes(hs[:hn2]), f"HC mismatch iter {i}"
        out = bytearray(len(data))
        if data:
            ni.SafeDecompressor().decompress(bytes(hb[:hn]), 0, hn,
                                             out, 0, len(out))
        assert bytes(out) == data
