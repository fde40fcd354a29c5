"""Device HC compressor tests: byte-parity with the host HC reference at
multiple levels, roundtrip through all decompressors."""

import numpy as np
import pytest

from lz4_tpu.core.constants import max_compressed_length
from lz4_tpu.core.lz4_block_ref import decompress_safe_alloc
from lz4_tpu.core.lz4_hc_ref import compress_hc_alloc
from lz4_tpu.kernels.jax_codec import to_device_layout, from_device_layout
from lz4_tpu.kernels.jax_hc import compress_hc_batch

from conftest import random_bytes


@pytest.fixture(scope="module")
def hc_blocks():
    import random
    rng = random.Random(77)
    out = []
    for alpha, size in [(4, 400), (16, 800), (256, 200), (2, 300),
                        (8, 64), (1, 500), (6, 1000), (3, 13), (5, 0)]:
        out.append(bytes(rng.randrange(alpha) for _ in range(size)))
    return out


@pytest.mark.parametrize("level", [1, 9, 12])
def test_device_hc_byte_parity(level, hc_blocks):
    blocks = hc_blocks
    l_cap = max(4, max(len(b) for b in blocks))
    arr, lens = to_device_layout(blocks, l_cap)
    dest, dlens, err = compress_hc_batch(
        arr, lens, max_compressed_length(l_cap), level)
    assert not np.asarray(err).any()
    outs = from_device_layout(dest, dlens)
    for got, src in zip(outs, blocks):
        assert got == compress_hc_alloc(src, level)


def test_device_hc_roundtrip(rng):
    data = random_bytes(rng, 1200, 8)
    arr, lens = to_device_layout([data], 1200)
    dest, dlens, err = compress_hc_batch(arr, lens, max_compressed_length(1200), 9)
    assert int(np.asarray(err)[0]) == 0
    comp = from_device_layout(dest, dlens)[0]
    assert decompress_safe_alloc(comp, len(data)) == data
