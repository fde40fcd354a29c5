"""Device-kernel tests (CPU backend / interpret mode): batched JAX codec and
xxHash kernels vs the scalar reference oracle — the cross-implementation
differential matrix of SURVEY.md §4.1 applied to the device tier."""

import numpy as np
import pytest

from lz4_tpu.core.constants import max_compressed_length
from lz4_tpu.core.lz4_block_ref import compress_fast_alloc, decompress_safe_alloc
from lz4_tpu.core.xxhash_ref import xxh32, xxh64
from lz4_tpu.kernels import jax_codec
from lz4_tpu.kernels.xxhash_jax import xxh32_batch, xxh64_batch_py
from lz4_tpu.kernels.xxhash_pallas import xxh32_uniform_pallas

from conftest import random_bytes


@pytest.fixture(scope="module")
def blocks(request):
    import random
    rng = random.Random(42)
    out = []
    for alpha, size in [(1, 100), (4, 1000), (16, 3000), (256, 500),
                        (2, 0), (8, 13), (3, 64)]:
        out.append(bytes(rng.randrange(alpha) for _ in range(size)))
    return out


def test_decompress_batch_matches_reference(blocks):
    comp = [compress_fast_alloc(b) for b in blocks]
    cmax = max(len(c) for c in comp)
    omax = max(len(b) for b in blocks)
    carr, clens = jax_codec.to_device_layout(comp, cmax)
    out, olens, err = jax_codec.decompress_safe_batch(carr, clens, omax)
    assert np.asarray(err).tolist() == [0] * len(blocks)
    assert np.asarray(olens).tolist() == [len(b) for b in blocks]
    outs = jax_codec.from_device_layout(out, olens)
    for got, want in zip(outs, blocks):
        assert got == want


def test_decompress_batch_malformed_flags():
    bad = bytes([96, 42, 43, 44, 45, 46, 47, 5, 0])   # ends with match
    ok = bytes([16, 42, 0, 0, 128] + [42] * 8)        # null matchDec
    carr, clens = jax_codec.to_device_layout([bad, ok], 32)
    out, olens, err = jax_codec.decompress_safe_batch(carr, clens, 20)
    err = np.asarray(err)
    assert err[0] != 0       # malformed must be flagged
    assert err[1] == 0       # null matchDec must NOT be flagged


def test_compress_batch_byte_parity(blocks):
    srcs = blocks
    l_max = max(len(b) for b in srcs)
    sarr, slens = jax_codec.to_device_layout(srcs, l_max)
    dcap = max_compressed_length(l_max)
    dest, dlens, err = jax_codec.compress_fast_batch(sarr, slens, dcap)
    assert np.asarray(err).tolist() == [0] * len(srcs)
    douts = jax_codec.from_device_layout(dest, dlens)
    for got, src in zip(douts, srcs):
        assert got == compress_fast_alloc(src)


def test_compress_batch_roundtrip_via_reference(blocks, rng):
    data = random_bytes(rng, 2000, 8)
    sarr, slens = jax_codec.to_device_layout([data], 2048)
    dest, dlens, err = jax_codec.compress_fast_batch(
        sarr, slens, max_compressed_length(2048))
    assert np.asarray(err)[0] == 0
    comp = jax_codec.from_device_layout(dest, dlens)[0]
    assert decompress_safe_alloc(comp, len(data)) == data


def test_xxh32_batch_matches_reference(rng):
    L = 128
    lens = [0, 1, 4, 15, 16, 17, 31, 64, 127, 128]
    datas = [random_bytes(rng, ln, 256) + bytes(L - ln) for ln in lens]
    arr = np.frombuffer(b"".join(datas), np.uint8).reshape(len(lens), L)
    for seed in (0, 0x9747B28C):
        h = np.asarray(xxh32_batch(arr, np.array(lens, np.int32), seed))
        expect = [xxh32(datas[i][:lens[i]], 0, lens[i], seed)
                  for i in range(len(lens))]
        assert h.tolist() == expect


def test_xxh64_batch_matches_reference(rng):
    L = 128
    lens = [0, 1, 7, 8, 31, 32, 33, 36, 40, 100, 128]
    datas = [random_bytes(rng, ln, 256) + bytes(L - ln) for ln in lens]
    arr = np.frombuffer(b"".join(datas), np.uint8).reshape(len(lens), L)
    for seed in (0, 0xDEADBEEFCAFEBABE):
        h = xxh64_batch_py(arr, np.array(lens, np.int32), seed)
        expect = [xxh64(datas[i][:lens[i]], 0, lens[i], seed)
                  for i in range(len(lens))]
        assert h == expect


@pytest.mark.parametrize("L", [32, 64, 256])
def test_xxh32_pallas_interpret_matches_reference(L, rng):
    N = 1024
    raw = random_bytes(rng, N * L, 256)
    data = np.frombuffer(raw, np.uint8).reshape(N, L)
    h = np.asarray(xxh32_uniform_pallas(data, 0, interpret=True))
    expect = [xxh32(data[i].tobytes(), 0, L, 0) for i in range(0, N, 41)]
    assert h[::41].tolist() == expect


@pytest.mark.parametrize("case", ["text", "repetitive", "zeros", "incompressible"])
def test_lz4_pallas_decompress_interpret(case, rng):
    from lz4_tpu.kernels.lz4_pallas import decompress_safe_pallas, PAD as KPAD
    data = {
        "text": random_bytes(rng, 3000, 8),
        "repetitive": b"abc" * 1000,
        "zeros": bytes(2500),
        "incompressible": random_bytes(rng, 1500, 256),
    }[case]
    comp = compress_fast_alloc(data)
    carr = np.zeros((1, len(comp) + KPAD), np.int32)
    carr[0, :len(comp)] = np.frombuffer(comp, np.uint8)
    out, olens, err = decompress_safe_pallas(
        carr, np.array([len(comp)], np.int32), len(data), interpret=True)
    assert int(np.asarray(err)[0]) == 0
    assert int(np.asarray(olens)[0]) == len(data)
    got = np.asarray(out)[0, :len(data)].astype(np.uint8).tobytes()
    assert got == data


def test_lz4_pallas_decompress_malformed_interpret():
    from lz4_tpu.kernels.lz4_pallas import decompress_safe_pallas, PAD as KPAD
    bad = bytes([96, 42, 43, 44, 45, 46, 47, 5, 0])
    carr = np.zeros((1, 16 + KPAD), np.int32)
    carr[0, :len(bad)] = np.frombuffer(bad, np.uint8)
    out, olens, err = decompress_safe_pallas(
        carr, np.array([len(bad)], np.int32), 20, interpret=True)
    assert int(np.asarray(err)[0]) != 0
    ok = bytes([16, 42, 0, 0, 128] + [42] * 8)
    carr2 = np.zeros((1, 16 + KPAD), np.int32)
    carr2[0, :len(ok)] = np.frombuffer(ok, np.uint8)
    out, olens, err = decompress_safe_pallas(
        carr2, np.array([len(ok)], np.int32), 20, interpret=True)
    assert int(np.asarray(err)[0]) == 0


def test_lz4_pallas_null_match_bytes_are_zeros():
    """Null-offset match bytes are explicit zeros (tier-wide definition;
    Pallas out buffers are not zero-initialized, so the kernel must fill)."""
    from lz4_tpu.kernels.lz4_pallas import decompress_safe_pallas, PAD as KPAD

    # 4 literals, null match len 7, 14 trailing literals (same vector as
    # tests/test_lz4_block.py::test_null_match_dec_bytes_are_zeros_across_tiers)
    lits = bytes(range(65, 69))
    tail = bytes(range(80, 94))
    stream = bytes([0x43]) + lits + bytes([0, 0]) + bytes([0xE0]) + tail
    out_len = 4 + 7 + 14
    expect = lits + b"\x00" * 7 + tail
    carr = np.zeros((1, len(stream) + KPAD), np.int32)
    carr[0, :len(stream)] = np.frombuffer(stream, np.uint8)
    out, olens, err = decompress_safe_pallas(
        carr, np.array([len(stream)], np.int32), out_len, interpret=True)
    assert int(np.asarray(err)[0]) == 0
    assert int(np.asarray(olens)[0]) == out_len
    got = np.asarray(out)[0, :out_len].astype(np.uint8).tobytes()
    assert got == expect


@pytest.mark.parametrize("L", [64, 256])
def test_xxh64_pallas_interpret_matches_reference(L, rng):
    from lz4_tpu.kernels.xxhash64_pallas import xxh64_words_pallas
    from lz4_tpu.kernels.xxhash_pallas import to_tile_layout_np
    N = 1024
    raw = random_bytes(rng, N * L, 256)
    data = np.frombuffer(raw, np.uint8).reshape(N, L)
    words = to_tile_layout_np(data)
    hi, lo = xxh64_words_pallas(words, L, 0xCAFEBABE12345678, interpret=True)
    hi = np.asarray(hi).astype(np.uint64)
    lo = np.asarray(lo).astype(np.uint64)
    got = ((hi << np.uint64(32)) | lo)
    expect = [xxh64(data[i].tobytes(), 0, L, 0xCAFEBABE12345678)
              for i in range(0, N, 61)]
    assert got[::61].tolist() == expect


def test_tile_layout_np_matches_device(rng):
    from lz4_tpu.kernels.xxhash_pallas import to_tile_layout, to_tile_layout_np
    data = np.frombuffer(random_bytes(rng, 1024 * 64, 256), np.uint8).reshape(1024, 64)
    assert np.array_equal(np.asarray(to_tile_layout(data)), to_tile_layout_np(data))


def test_lz4_pallas_compress_interpret(rng):
    from lz4_tpu.kernels.lz4_pallas import compress_fast_pallas, PAD as KPAD
    from lz4_tpu.core.constants import max_compressed_length
    blocks = [random_bytes(rng, n, a) for a, n in
              [(4, 1000), (256, 300), (1, 500), (8, 13), (3, 0)]]
    L = max(len(b) for b in blocks)
    N = len(blocks)
    sarr = np.zeros((N, L + KPAD), np.int32)
    slens = np.zeros((N,), np.int32)
    for i, b in enumerate(blocks):
        sarr[i, :len(b)] = np.frombuffer(b, np.uint8)
        slens[i] = len(b)
    out, olens, err = compress_fast_pallas(
        sarr, slens, max_compressed_length(L), interpret=True)
    assert not np.asarray(err).any()
    out = np.asarray(out)
    olens = np.asarray(olens)
    for i, b in enumerate(blocks):
        got = out[i, :olens[i]].astype(np.uint8).tobytes()
        assert got == compress_fast_alloc(b), i


def test_pallas_tier_batch_apis_route_to_mosaic(monkeypatch, rng):
    """VERDICT #5: the factory 'pallas' tier batch APIs run the Mosaic
    kernels (interpret mode stands in for hardware here), byte-identical."""
    monkeypatch.setenv("TPULZ4_PALLAS_INTERPRET", "1")
    from lz4_tpu.api import pallas_instances as pi
    assert pi._mosaic_mode() == "interpret"

    blocks = [random_bytes(rng, n, a) for a, n in
              [(4, 800), (256, 200), (8, 64)]]
    comp = pi.FastCompressor().compress_batch(blocks)
    assert comp == [compress_fast_alloc(b) for b in blocks]
    out = pi.SafeDecompressor().decompress_batch(comp, 1024)
    assert out == blocks

    data = np.frombuffer(random_bytes(rng, 4 * 64, 256), np.uint8).reshape(4, 64)
    lens = np.full((4,), 64, np.int32)
    got = np.asarray(pi.XXH32().hash_batch(data, lens, 3))
    expect = [xxh32(data[i].tobytes(), 0, 64, 3) for i in range(4)]
    assert got.tolist() == expect

    # ragged batches fall back to the general pure-JAX kernel
    lens2 = np.array([64, 63, 64, 1], np.int32)
    got2 = np.asarray(pi.XXH32().hash_batch(data, lens2, 3))
    expect2 = [xxh32(data[i].tobytes(), 0, int(lens2[i]), 3) for i in range(4)]
    assert got2.tolist() == expect2


def test_pallas_tier_xxh64_hash_batch_routes_to_mosaic(monkeypatch, rng):
    """VERDICT r3 #4: XXH64.hash_batch routes uniform batches to the Mosaic
    tile kernel (interpret mode stands in for hardware) and ragged batches
    to the general pure-JAX kernel — both matching the reference oracle."""
    monkeypatch.setenv("TPULZ4_PALLAS_INTERPRET", "1")
    from lz4_tpu.api import pallas_instances as pi
    assert pi._mosaic_mode() == "interpret"

    seed = 0xCAFEBABE12345678
    data = np.frombuffer(random_bytes(rng, 4 * 64, 256), np.uint8).reshape(4, 64)
    lens = np.full((4,), 64, np.int32)
    hi, lo = pi.XXH64().hash_batch(data, lens, seed)
    got = [(int(h) << 32) | int(l) for h, l in
           zip(np.asarray(hi), np.asarray(lo))]
    expect = [xxh64(data[i].tobytes(), 0, 64, seed) for i in range(4)]
    assert got == expect

    # ragged batches fall back to the general pure-JAX kernel
    lens2 = np.array([64, 63, 64, 1], np.int32)
    hi2, lo2 = pi.XXH64().hash_batch(data, lens2, seed)
    got2 = [(int(h) << 32) | int(l) for h, l in
            zip(np.asarray(hi2), np.asarray(lo2))]
    expect2 = [xxh64(data[i].tobytes(), 0, int(lens2[i]), seed)
               for i in range(4)]
    assert got2 == expect2
