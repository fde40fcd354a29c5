"""Device-parallel compressor (VERDICT r3 #1): valid-format output, every
tier decodes it, corpus ratio tracked against the reference algorithm.

Output is intentionally NOT byte-identical to the reference (that
constraint is what previously ruled device compression out); the contract
is: any decoder accepts it, decompressed bytes are exact, and the ratio
stays close to the reference's (pinned loosely here; measured precisely in
the bench / docs/PERF.md).
"""

import random

import numpy as np
import pytest

from lz4_tpu.core.lz4_block_ref import compress_fast_alloc, decompress_safe_alloc
from lz4_tpu.kernels import parallel_compress as pc

from conftest import random_bytes


BL = 2048  # small blocks keep the (one-off) XLA compile in test budget


def _roundtrip(data: bytes, block_len: int = BL):
    comp = pc.compress_blocks([data], block_len)[0]
    assert bytes(decompress_safe_alloc(comp, len(data))) == data
    return comp


def test_edge_cases():
    for data in (b"", b"a", b"abcd", b"abcd" * 3, bytes(17), b"x" * 2048):
        _roundtrip(data)


def test_random_and_compressible(rng):
    random.seed(11)
    for alphabet in (1, 3, 16, 256):
        for n in (5, 100, 1000, 2048):
            _roundtrip(random_bytes(rng, n, alphabet))


def test_periodic_data_merges_long_matches():
    # period 46 > RLE distances and > one extension cap: continuation
    # merging must recover a near-reference ratio
    data = (b"the quick brown fox jumps over the lazy dog. " * 60)[:2048]
    comp = _roundtrip(data)
    ref = compress_fast_alloc(data)
    assert len(comp) <= len(ref) * 1.35, (len(comp), len(ref))


def test_rle_runs_exact():
    data = bytes(1500) + b"\x01" * 500
    comp = _roundtrip(data)
    ref = compress_fast_alloc(data)
    assert len(comp) <= len(ref) + 8, (len(comp), len(ref))


def test_batch_matches_single(rng):
    blocks = [random_bytes(rng, n, 8) for n in (0, 7, 500, 2048, 1333)]
    batch = pc.compress_blocks(blocks, BL)
    for b, c in zip(blocks, batch):
        assert bytes(decompress_safe_alloc(c, len(b))) == b


def test_corpus_ratio_near_reference(calgary):
    """Corpus-level ratio within 15% of the reference algorithm at this
    block size (the precise 64KB-block numbers live in the bench)."""
    tot_ours = tot_ref = 0
    for name, data in calgary.items():
        blocks = [data[o:o + BL] for o in range(0, 16 * BL, BL)]
        comp = pc.compress_blocks(blocks, BL)
        for b, c in zip(blocks, comp):
            assert bytes(decompress_safe_alloc(c, len(b))) == b, name
        tot_ours += sum(len(c) for c in comp)
        tot_ref += sum(len(compress_fast_alloc(b)) for b in blocks)
    assert tot_ours <= tot_ref * 1.15, (tot_ours, tot_ref)


def test_offset_window_clamp_beyond_64k():
    """Blocks larger than 64KB must drop match candidates farther than the
    2-byte offset field can express (MAX_DISTANCE); an out-of-window repeat
    used to emit a truncated offset and decode to WRONG bytes silently."""
    rng = np.random.default_rng(7)
    head = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    mid = rng.integers(0, 256, 69_900, dtype=np.uint8).tobytes()
    blk = head + mid + head          # repeat of head at distance > 65535
    comp = pc.compress_blocks([blk])[0]
    assert bytes(decompress_safe_alloc(comp, len(blk))) == blk

    # and a repeat just INSIDE the window still compresses as a match:
    # same length, same prefix, tail repeated from an in-window position —
    # must come out smaller than the out-of-window variant above
    base = head + mid
    near = base + base[-65_000:-65_000 + 64]
    comp2 = pc.compress_blocks([near])[0]
    assert bytes(decompress_safe_alloc(comp2, len(near))) == near
    assert len(near) == len(blk)
    assert len(comp2) < len(comp) - 20


def test_native_and_jax_decoders_accept_output(rng):
    native = pytest.importorskip("lz4_tpu.api.native_instances")
    from lz4_tpu.api.factory import Lz4Factory
    from lz4_tpu.kernels import jax_codec

    data = random_bytes(rng, 2048, 5)
    comp = pc.compress_blocks([data], BL)[0]
    nat = Lz4Factory.native_instance()
    assert bytes(nat.safe_decompressor().decompress_alloc(
        comp, 0, len(comp), len(data))) == data
    arr, lens = jax_codec.to_device_layout([comp], max(4, len(comp)))
    out, out_lens, err = jax_codec.decompress_safe_batch(arr, lens, len(data))
    assert int(np.asarray(err)[0]) == 0
    assert jax_codec.from_device_layout(out, out_lens)[0] == data
