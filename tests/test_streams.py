"""Streaming pipeline + CLI tests: batched engines, frame interop with the
one-block reader/writer, skippable/concatenated streams through the
pipeline path."""

import io

import pytest

from lz4_tpu.core.errors import Lz4Error
from lz4_tpu.formats.frame import (
    BlockSize, compress_frame, decompress_frame, make_skippable_frame,
)
from lz4_tpu.streams import compress_stream, decompress_stream, get_engine

from conftest import random_bytes


ENGINES = ["safe", "native"]


@pytest.mark.parametrize("engine", ENGINES)
@pytest.mark.parametrize("size", [0, 1, 1000, 65536, 300000])
def test_stream_roundtrip(engine, size, rng):
    try:
        eng = get_engine(engine)
    except Exception:
        pytest.skip(f"engine {engine} unavailable")
    data = random_bytes(rng, size, 8)
    out = io.BytesIO()
    compress_stream(io.BytesIO(data), out, engine=eng)
    restored = io.BytesIO()
    n = decompress_stream(io.BytesIO(out.getvalue()), restored, engine=eng)
    assert restored.getvalue() == data
    assert n == size


def test_stream_interop_with_frame_module(rng):
    """Pipeline output must decode with the one-block frame reader and
    vice versa."""
    data = random_bytes(rng, 150000, 8)
    out = io.BytesIO()
    compress_stream(io.BytesIO(data), out, block_size=BlockSize.SIZE_64KB)
    assert decompress_frame(out.getvalue()) == data

    framed = compress_frame(data, block_size=BlockSize.SIZE_256KB)
    restored = io.BytesIO()
    decompress_stream(io.BytesIO(framed), restored)
    assert restored.getvalue() == data


def test_stream_concatenated_and_skippable(rng):
    a = random_bytes(rng, 5000, 8)
    b = random_bytes(rng, 7000, 8)
    blob = io.BytesIO()
    compress_stream(io.BytesIO(a), blob)
    blob.write(make_skippable_frame(b"meta" * 5))
    compress_stream(io.BytesIO(b), blob)
    restored = io.BytesIO()
    decompress_stream(io.BytesIO(blob.getvalue()), restored)
    assert restored.getvalue() == a + b


def test_stream_corruption_detected(rng):
    data = random_bytes(rng, 50000, 4)
    out = io.BytesIO()
    compress_stream(io.BytesIO(data), out)
    blob = bytearray(out.getvalue())
    blob[500] ^= 0xFF
    with pytest.raises(Lz4Error):  # corrupt payload: malformed block or checksum
        decompress_stream(io.BytesIO(bytes(blob)), io.BytesIO())


def test_stream_small_batches(rng):
    """Batching boundary: batch smaller than the number of blocks."""
    data = random_bytes(rng, 64 * 40, 8)
    out = io.BytesIO()
    compress_stream(io.BytesIO(data), out, block_size=BlockSize.SIZE_64KB,
                    batch_blocks=3)
    restored = io.BytesIO()
    decompress_stream(io.BytesIO(out.getvalue()), restored, batch_blocks=2)
    assert restored.getvalue() == data


def test_cli_roundtrip(tmp_path, rng):
    from lz4_tpu.__main__ import main
    data = random_bytes(rng, 100000, 8)
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.lz4"
    back = tmp_path / "back.bin"
    src.write_bytes(data)
    main(["compress", str(src), str(dst), "--engine", "safe"])
    main(["decompress", str(dst), str(back), "--engine", "safe"])
    assert back.read_bytes() == data
    main(["xxh32", str(src)])
    main(["xxh64", str(src)])


@pytest.mark.parametrize("engine", ["safe", "native", "sharded"])
def test_stream_hc_engine_byte_exact(engine, rng):
    """HC through every engine family (get_engine(level=...)): the stream
    bytes must equal the host HC frame writer's (VERDICT #7)."""
    from lz4_tpu.api.factory import Lz4Factory
    from lz4_tpu.formats.frame import FrameFlag

    try:
        eng = get_engine(engine, level=9)
    except Exception:
        pytest.skip(f"engine {engine} unavailable")
    assert eng.name == f"{engine}-hc9"
    data = random_bytes(rng, 3000, 5)
    out = io.BytesIO()
    # pass the NAME: compress_stream builds the engine's own HC family
    # (an instance would be re-wrapped toward native HC for compat)
    compress_stream(io.BytesIO(data), out, engine=engine, level=9)
    hc = Lz4Factory.safe_instance().high_compressor(9)
    expect = compress_frame(
        data, block_size=BlockSize.SIZE_64KB,
        features=(FrameFlag.BLOCK_INDEPENDENCE, FrameFlag.CONTENT_CHECKSUM),
        compressor=hc)
    assert out.getvalue() == expect
    assert decompress_frame(out.getvalue()) == data


def test_get_engine_hc_names():
    eng = get_engine("safe", level=9)
    assert eng.name == "safe-hc9"
    eng = get_engine("sharded", level=17)
    assert eng.name == "sharded-hc17"


def test_turbo_engine_stream_roundtrip(tmp_path, rng):
    """level=-1 routes the stream pipeline through the turbo compressor;
    the frames stay standard and every reader decodes them."""
    import io
    pytest.importorskip("lz4_tpu.api.native_instances")
    from lz4_tpu.streams import compress_stream, decompress_stream
    from lz4_tpu.formats.frame import decompress_frame

    data = random_bytes(rng, 200000, 8)
    buf = io.BytesIO()
    n = compress_stream(io.BytesIO(data), buf, engine="native", level=-1)
    assert n == len(buf.getvalue())
    assert decompress_frame(buf.getvalue()) == data
    out = io.BytesIO()
    buf.seek(0)
    assert decompress_stream(buf, out) == len(data)
    assert out.getvalue() == data
