"""Gather-decode tests: host parse + device pointer-doubling resolution must
be bit-exact against the reference, including periodic overlap matches and
the null-match-offset zeros quirk."""

import numpy as np
import pytest

from lz4_tpu.core.lz4_block_ref import compress_fast_alloc
from lz4_tpu.core.errors import Lz4Error
from lz4_tpu.kernels.gather_decode import decompress_blocks, parse_blocks

from conftest import random_bytes


def test_gather_decode_matches_reference(rng):
    cases = [random_bytes(rng, n, a) for a, n in
             [(4, 1000), (16, 3000), (256, 200), (2, 500), (1, 2000),
              (8, 64), (3, 13)]]
    cases += [b"abc" * 700, bytes(1500), b"x" + b"ab" * 400]
    comp = [compress_fast_alloc(b) for b in cases]
    outs = decompress_blocks(comp, max(len(b) for b in cases))
    for got, want in zip(outs, cases):
        assert got == want


def test_gather_decode_null_match_offset():
    ok = bytes([16, 42, 0, 0, 128] + [42] * 8)
    out = decompress_blocks([ok], 13)[0]
    assert len(out) == 13
    assert out[0] == 42 and out[1:5] == bytes(4) and out[5:] == b"*" * 8


def test_parse_rejects_malformed():
    bad = bytes([96, 42, 43, 44, 45, 46, 47, 5])  # truncated
    with pytest.raises(Lz4Error):
        parse_blocks([bad])


def test_parse_sequence_tables_consistent(rng):
    data = random_bytes(rng, 5000, 8)
    comp = compress_fast_alloc(data)
    arrs, n_seq, out_total = parse_blocks([comp])
    n = int(n_seq[0])
    assert int(out_total[0]) == len(data)
    # output coverage: literals + matches tile [0, len) in order
    pos = 0
    for k in range(n):
        assert arrs["lit_out"][0, k] == pos
        pos += int(arrs["lit_len"][0, k])
        assert arrs["m_out"][0, k] == pos
        pos += int(arrs["m_len"][0, k])
    assert pos == len(data)
