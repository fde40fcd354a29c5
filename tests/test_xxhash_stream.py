"""Device streaming hash (kernels/xxhash_stream.py) vs the pure oracle.

Pins the lax.scan state machine — (v1..v4, remainder, total_len) carried
functionally — against core/xxhash_ref.py across chunkings that exercise
every remainder/stripe boundary, matching the reference streaming tests
(XXHash32Test.java:122-143)."""

import random

import numpy as np
import pytest

from lz4_tpu.core.xxhash_ref import StreamingXXH32, StreamingXXH64
from lz4_tpu.kernels import xxhash_stream as xs


@pytest.mark.parametrize("seed", [0, 1, 0x9747B28C, -1])
def test_stream32_matches_oracle_across_chunkings(seed):
    rng = random.Random(seed & 0xFF)
    st = xs.stream32_init(seed)
    ref = StreamingXXH32(seed)
    for n in (0, 1, 3, 4, 15, 16, 17, 31, 32, 100, 1000, 65536, 70000):
        data = bytes(rng.randrange(256) for _ in range(min(n, 4096)))
        data = (data * (n // max(1, len(data)) + 1))[:n]
        st = xs.absorb_bytes32(st, data)
        ref.update(data)
        assert xs.digest32(st) == ref.get_value()


@pytest.mark.parametrize("seed", [0, 0x9747B28C, -(1 << 40)])
def test_stream64_matches_oracle_across_chunkings(seed):
    rng = random.Random(seed & 0xFF)
    st = xs.stream64_init(seed)
    ref = StreamingXXH64(seed)
    for n in (0, 1, 7, 8, 9, 31, 32, 33, 100, 1000, 65536, 70001):
        data = bytes(rng.randrange(256) for _ in range(min(n, 4096)))
        data = (data * (n // max(1, len(data)) + 1))[:n]
        st = xs.absorb_bytes64(st, data)
        ref.update(data)
        assert xs.digest64(st) == ref.get_value()


def test_stream32_scan_bulk_equals_incremental():
    """lax.scan over full chunks == byte-at-a-time oracle."""
    rng = np.random.default_rng(3)
    data = rng.integers(0, 256, 5 * 65536 + 123, dtype=np.uint8).tobytes()
    st = xs.absorb_bytes32(xs.stream32_init(11), data)
    ref = StreamingXXH32(11)
    for i in range(0, len(data), 997):  # odd-size updates
        ref.update(data[i:i + 997])
    assert xs.digest32(st) == ref.get_value()


def test_stream_digest_is_non_destructive():
    st = xs.stream32_init(0)
    st = xs.absorb_bytes32(st, b"hello world, this is a stream")
    first = xs.digest32(st)
    assert xs.digest32(st) == first
    st = xs.absorb_bytes32(st, b"more")
    ref = StreamingXXH32(0)
    ref.update(b"hello world, this is a streammore")
    assert xs.digest32(st) == ref.get_value()


def test_pallas_tier_streaming_routes_to_device_state():
    from lz4_tpu.api import pallas_instances as pi
    s = pi.StreamingXXH32(42)
    assert isinstance(s._state, xs.Stream32State)
    s.update(b"abc" * 100)
    ref = StreamingXXH32(42)
    ref.update(b"abc" * 100)
    from lz4_tpu.core.xxhash_ref import as_s32
    assert s.get_value() == as_s32(ref.get_value())
    s.reset()
    s.update(b"xyz")
    ref2 = StreamingXXH32(42)
    ref2.update(b"xyz")
    assert s.get_value() == as_s32(ref2.get_value())
