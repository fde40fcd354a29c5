"""Segment-executor decode kernel: bit-exactness vs the reference oracle.

Runs in Pallas interpret mode on the CPU mesh (tests/conftest.py); the same
kernel is exercised compiled on real TPU hardware by the bench harness.
Mirrors the reference's cross-implementation differential testing
(LZ4Test.java:305-324): compress with one tier, decode with another,
byte-equal.
"""

import random

import numpy as np
import pytest

from lz4_tpu.core.lz4_block_ref import compress_fast_alloc
from lz4_tpu.kernels import gather_decode, segment_decode


def _roundtrip(blocks, out_len):
    comp = [compress_fast_alloc(b) for b in blocks]
    out = segment_decode.decompress_blocks(comp, out_len, interpret=True)
    assert len(out) == len(blocks)
    for i, (o, b) in enumerate(zip(out, blocks)):
        assert o == b, f"block {i} mismatch"


def test_calgary_blocks(calgary):
    data = calgary["geo"]
    bl = 4096
    _roundtrip([data[i * bl:(i + 1) * bl] for i in range(5)], bl)


def test_mixed_compressibility():
    rng = random.Random(11)
    bl = 2048
    blocks = [
        bytes(rng.randrange(256) for _ in range(bl)),      # incompressible
        bytes(bl),                                          # all zeros
        (b"abcdef" * 1000)[:bl],                            # period 6
        (bytes([1]) * bl),                                  # period 1 (RLE)
        bytes(rng.randrange(4) for _ in range(bl)),         # small alphabet
    ]
    _roundtrip(blocks, bl)


def test_small_distance_overlaps():
    # every distance in [1, 16) x long match: the pattern-doubling path
    rng = random.Random(5)
    blocks = []
    bl = 1024
    for period in range(1, 16):
        unit = bytes(rng.randrange(256) for _ in range(period))
        blocks.append((unit * (bl // period + 1))[:bl])
    _roundtrip(blocks, bl)


def test_short_and_ragged_blocks():
    rng = random.Random(9)
    blocks = [bytes(rng.randrange(8) for _ in range(n))
              for n in (13, 64, 100, 501, 777)]
    out_len = max(len(b) for b in blocks)
    comp = [compress_fast_alloc(b) for b in blocks]
    out = segment_decode.decompress_blocks(comp, out_len, interpret=True)
    for o, b in zip(out, blocks):
        assert o == b


def test_parse_packed_matches_parse_blocks(calgary):
    data = calgary["geo"][:32768]
    bl = 4096
    blocks = [data[i * bl:(i + 1) * bl] for i in range(8)]
    comp = [compress_fast_alloc(b) for b in blocks]
    a1, n1, t1 = gather_decode.parse_blocks(comp)
    packed = b"".join(comp)
    offs = np.cumsum([0] + [len(c) for c in comp[:-1]]).astype(np.int64)
    lens = np.array([len(c) for c in comp], np.int32)
    max_seq = a1["lit_out"].shape[1]
    a2, n2, t2 = gather_decode.parse_packed(packed, offs, lens, max_seq)
    assert (n1 == n2).all() and (t1 == t2).all()
    for k in a1:
        assert (a1[k] == a2[k]).all(), k


def test_parse_packed_tail_modes(calgary):
    data = calgary["geo"][:8192]
    comp = [compress_fast_alloc(data[:4096]), compress_fast_alloc(data[4096:])]
    packed = b"".join(comp)
    offs = np.array([0, len(comp[0])], np.int64)
    lens = np.array([len(comp[0]), len(comp[1])], np.int32)
    arrs, n_seq, _ = gather_decode.parse_packed(packed, offs, lens, 4096,
                                                sentinel_tails=False)
    for i in range(2):
        r = int(n_seq[i])
        assert (arrs["lit_len"][i, r:] == 0).all()
        assert (arrs["m_len"][i, r:] == 0).all()
    arrs_s, _, _ = gather_decode.parse_packed(packed, offs, lens, 4096,
                                              sentinel_tails=True)
    for i in range(2):
        r = int(n_seq[i])
        assert (arrs_s["lit_out"][i, r:] == 1 << 30).all()
        assert (arrs_s["m_out"][i, r:] == 1 << 30).all()


def test_parse_packed_malformed_raises():
    from lz4_tpu.core.errors import Lz4Error
    bad = b"\xf0\x01"  # literal run extension truncated
    with pytest.raises(Lz4Error):
        gather_decode.parse_packed(bad, np.zeros(1, np.int64),
                                   np.array([len(bad)], np.int32), 64)


def test_segment_stream_engine(calgary):
    import io
    from lz4_tpu.streams import pipeline
    data = calgary["geo"][:32768]
    dst = io.BytesIO()
    pipeline.compress_stream(io.BytesIO(data), dst, engine="segment",
                             block_size=pipeline.BlockSize.SIZE_64KB)
    out = io.BytesIO()
    pipeline.decompress_stream(io.BytesIO(dst.getvalue()), out,
                               engine="segment")
    assert out.getvalue() == data
