"""Opt-in turbo compressor (VERDICT r3 #2): the modern-heuristic fast mode.

Contract: valid LZ4 block output decodable by EVERY tier; byte-identical to
the default fast path for inputs < 64KB (same compress64k routing); on the
> 64KB general path output differs from the reference algorithm but must be
no larger than the default path's on the bench corpus (the 5-byte-hash
finder finds strictly more matches — docs/PERF.md has the measured pareto).
The default mode stays byte-identical everywhere; turbo is opt-in, the same
freedom the reference's JNI tier takes (net_jpountz_lz4_LZ4JNI.c:75 calls
modern LZ4_compress_default, whose bytes differ from its Java tiers).
"""

import pytest

from lz4_tpu.core.errors import Lz4Error

native = pytest.importorskip("lz4_tpu.api.native_instances")

from lz4_tpu.api.factory import Lz4Factory  # noqa: E402
from lz4_tpu.core.lz4_block_ref import decompress_safe_alloc  # noqa: E402
from conftest import random_bytes  # noqa: E402


@pytest.fixture(scope="module")
def nat():
    return Lz4Factory.native_instance()


@pytest.mark.parametrize("length", [0, 1, 13, 5000, 65535, 65546])
def test_turbo_below_64k_is_byte_identical(length, nat, rng):
    data = random_bytes(rng, length, 8)
    assert (nat.turbo_compressor().compress_alloc(data)
            == nat.fast_compressor().compress_alloc(data))


@pytest.mark.parametrize("alphabet", [1, 4, 64, 256])
@pytest.mark.parametrize("length", [65547, 100000, 300000])
def test_turbo_general_path_roundtrips_in_every_tier(length, alphabet, nat,
                                                     rng):
    data = random_bytes(rng, length, alphabet)
    comp = nat.turbo_compressor().compress_alloc(data)
    # native safe decoder
    assert bytes(nat.safe_decompressor().decompress_alloc(
        comp, 0, len(comp), length)) == data
    # native fast decoder (exact destLen contract)
    out = bytearray(length)
    n_read = nat.fast_decompressor().decompress(comp, 0, out, 0, length)
    assert n_read == len(comp) and bytes(out) == data
    # pure-Python oracle decoder
    assert bytes(decompress_safe_alloc(comp, length)) == data


def test_turbo_no_larger_than_default_on_corpus(nat, calgary):
    """Corpus-level (the driver's ratio bar) the turbo output is strictly
    smaller; per file it may lose a hair on sparse data (pic: +0.17%, the
    5-byte hash skips some 4-byte matches) — bounded here at +0.5%."""
    total_turbo = total_fast = 0
    for name, data in calgary.items():
        blob = (data * (300000 // len(data) + 1))[:300000]
        turbo = len(nat.turbo_compressor().compress_alloc(blob))
        fast = len(nat.fast_compressor().compress_alloc(blob))
        assert turbo <= fast * 1.005, (name, turbo, fast)
        total_turbo += turbo
        total_fast += fast
    assert total_turbo < total_fast


def test_turbo_dest_too_small_raises(nat, rng):
    data = random_bytes(rng, 70000, 256)  # incompressible: needs ~full dest
    dest = bytearray(1000)
    with pytest.raises(Lz4Error):
        nat.turbo_compressor().compress(data, 0, len(data), dest, 0, len(dest))


def test_turbo_factory_fallback_on_safe_tier():
    safe = Lz4Factory.safe_instance()
    assert safe.turbo_compressor() is safe.fast_compressor()


def test_turbo_packed_batch_roundtrip(nat, rng):
    from lz4_tpu.api import native_instances as ni
    data = random_bytes(rng, 5 * 100000 + 321, 8)
    comp, offs, lens = ni.compress_fast_packed(data, 100000, turbo=True)
    dec, dlens = ni.decompress_safe_packed(comp, offs, lens, 100000)
    assert bytes(dec[:len(data)]) == data
    # turbo batch == turbo one-shot per block
    one = nat.turbo_compressor().compress_alloc(data[:100000])
    assert bytes(comp[int(offs[0]):int(offs[0]) + int(lens[0])]) == one


def test_turbo_frame_level_minus_one(nat, rng):
    from lz4_tpu.api import native_instances as ni
    from lz4_tpu.formats.frame import decompress_frame
    data = random_bytes(rng, (1 << 20) + 999, 16)
    fr = ni.compress_frame_packed(data, block_size_id=6,  # 1MB blocks
                                  flags=ni.F_CONTENT_CHECKSUM, level=-1)
    # native reader and the pure-Python frame reader both decode it
    dec, _ = ni.decompress_frame_packed(bytes(fr))
    assert bytes(dec) == data
    assert decompress_frame(bytes(fr)) == data
