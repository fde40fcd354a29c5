"""Auxiliary subsystem tests: multihost degenerate path, elastic recovery,
config knobs, profiling hooks, timing utilities."""

import io

import numpy as np
import pytest

from conftest import random_bytes


def test_multihost_single_process(rng):
    import jax
    from lz4_tpu.dist import compress_blocks_multihost, process_block_range
    from lz4_tpu.core.lz4_block_ref import compress_fast_alloc
    assert jax.process_count() == 1
    start, end = process_block_range(10)
    assert (start, end) == (0, 10)
    blocks = [random_bytes(rng, 500, 8) for _ in range(5)]
    comp = compress_blocks_multihost(blocks)
    assert comp == [compress_fast_alloc(b) for b in blocks]


def test_recovery_clean_path(rng):
    from lz4_tpu.dist import compress_blocks_verified
    from lz4_tpu.core.lz4_block_ref import decompress_safe_alloc
    blocks = [random_bytes(rng, 800, 8) for _ in range(4)]
    comp, retried = compress_blocks_verified(blocks)
    assert retried == []
    for raw, c in zip(blocks, comp):
        assert decompress_safe_alloc(c, len(raw)) == raw


def test_recovery_retries_bad_engine(rng):
    """An engine that corrupts one block: verification catches it and the
    safe tier re-runs exactly that block."""
    from lz4_tpu.dist import compress_blocks_verified
    from lz4_tpu.streams.pipeline import BatchEngine, get_engine
    good = get_engine("safe")

    def flaky_compress(blocks):
        out = good.compress_batch(blocks)
        out[1] = out[1][:-2] + b"\x00\x00"  # corrupt block 1
        return out

    flaky = BatchEngine("flaky", flaky_compress, good.decompress_batch)
    blocks = [random_bytes(rng, 700, 8) for _ in range(3)]
    comp, retried = compress_blocks_verified(blocks, engine=flaky)
    assert retried == [1]
    from lz4_tpu.core.lz4_block_ref import decompress_safe_alloc
    for raw, c in zip(blocks, comp):
        assert decompress_safe_alloc(c, len(raw)) == raw


def test_default_tier_env(monkeypatch):
    from lz4_tpu.api.factory import Lz4Factory
    monkeypatch.setenv("TPULZ4_DEFAULT_TIER", "safe")
    assert Lz4Factory.fastest_instance().impl == "safe"
    monkeypatch.setenv("TPULZ4_DEFAULT_TIER", "bogus")
    with pytest.raises(ValueError):
        Lz4Factory.fastest_instance()
    monkeypatch.delenv("TPULZ4_DEFAULT_TIER")


def test_timing_utils():
    from lz4_tpu.utils import DeviceTimer, median_throughput
    t = DeviceTimer()
    with t.section("a"):
        pass
    assert "a" in t.spans and "a=" in t.report()
    gbps = median_throughput(lambda x: sum(x), [[1], [2], [3]], 10 ** 9)
    assert gbps > 0
    with pytest.raises(ValueError):
        median_throughput(lambda x: x, [[1]], 1)


def test_buffer_utils():
    from lz4_tpu.utils import as_bytes, chunk_bytes
    assert as_bytes(bytearray(b"ab")) == b"ab"
    assert chunk_bytes(b"abcdef", 4) == [b"abcd", b"ef"]
    assert chunk_bytes(b"", 4) == []
    with pytest.raises(TypeError):
        as_bytes("str")
