"""Container format tests: Frame v1.5.1, LZ4Block stream, with-length codec.

Models the reference's LZ4FrameIOStreamTest (parameterized sizes, skippable
frames, concatenated frames, content size, block checksums, per-byte paths)
and LZ4BlockStreamingTest (mock partial-I/O streams, concatenated streams).
"""

import io
import struct

import pytest

from lz4_tpu.api.factory import Lz4Factory
from lz4_tpu.core.errors import Lz4FrameError
from lz4_tpu.formats import (
    BlockSize, FrameFlag, Lz4BlockInputStream, Lz4BlockOutputStream,
    Lz4CompressorWithLength, Lz4DecompressorWithLength, Lz4FrameInputStream,
    Lz4FrameOutputStream, compress_frame, decompress_frame,
    get_decompressed_length, make_skippable_frame,
)

from conftest import random_bytes


class ShortReadStream(io.RawIOBase):
    """Mock stream returning short reads (LZ4BlockStreamingTest.java:42-125)."""

    def __init__(self, data, max_chunk=3):
        self._data = data
        self._pos = 0
        self._max_chunk = max_chunk

    def read(self, n=-1):
        if self._pos >= len(self._data):
            return b""
        take = min(n if n >= 0 else self._max_chunk, self._max_chunk,
                   len(self._data) - self._pos)
        out = self._data[self._pos:self._pos + take]
        self._pos += take
        return out


FRAME_SIZES = [0, 1, 1023, 1024, 1025, 65536, 131072]


@pytest.mark.parametrize("size", FRAME_SIZES)
def test_frame_roundtrip(size, rng):
    data = random_bytes(rng, size, 32)
    framed = compress_frame(data)
    assert framed[:4] == struct.pack("<I", 0x184D2204)
    assert decompress_frame(framed) == data


@pytest.mark.parametrize("block_size", list(BlockSize))
def test_frame_block_sizes(block_size, rng):
    data = random_bytes(rng, 200000, 16)
    framed = compress_frame(data, block_size=block_size)
    assert decompress_frame(framed) == data


def test_frame_all_features(rng):
    data = random_bytes(rng, 100000, 8)
    features = (FrameFlag.BLOCK_INDEPENDENCE, FrameFlag.CONTENT_CHECKSUM,
                FrameFlag.BLOCK_CHECKSUM)
    framed = compress_frame(data, features=features, known_size=True)
    assert decompress_frame(framed) == data


def test_frame_content_size_accessor(rng):
    data = random_bytes(rng, 5000, 8)
    framed = compress_frame(data, known_size=True)
    stream = Lz4FrameInputStream(io.BytesIO(framed))
    out = stream.read()
    assert out == data
    assert stream.expected_content_size == len(data)


def test_frame_content_checksum_detects_corruption(rng):
    data = random_bytes(rng, 50000, 4)
    framed = bytearray(compress_frame(
        data, features=(FrameFlag.BLOCK_INDEPENDENCE, FrameFlag.CONTENT_CHECKSUM)))
    # corrupt a payload byte (past the 7-byte header)
    framed[100] ^= 0x01
    with pytest.raises(Lz4FrameError):
        decompress_frame(bytes(framed))


def test_frame_block_checksum_detects_corruption(rng):
    data = random_bytes(rng, 50000, 4)
    framed = bytearray(compress_frame(
        data, features=(FrameFlag.BLOCK_INDEPENDENCE, FrameFlag.BLOCK_CHECKSUM)))
    framed[200] ^= 0xFF
    with pytest.raises(Lz4FrameError):
        decompress_frame(bytes(framed))


def test_frame_header_checksum_detects_corruption(rng):
    framed = bytearray(compress_frame(b"hello world"))
    framed[5] ^= 0x10  # flip a BD bit → descriptor hash mismatch
    with pytest.raises(Lz4FrameError):
        decompress_frame(bytes(framed))


def test_frame_incompressible_stored_raw(rng):
    data = random_bytes(rng, 70000, 256)
    framed = compress_frame(data, block_size=BlockSize.SIZE_64KB)
    # first block size word has the incompressible mask set
    size_word = struct.unpack_from("<I", framed, 7)[0]
    assert size_word & 0x80000000
    assert decompress_frame(framed) == data


def test_concatenated_frames(rng):
    a = random_bytes(rng, 3000, 8)
    b = random_bytes(rng, 4000, 8)
    blob = compress_frame(a) + compress_frame(b)
    assert decompress_frame(blob) == a + b
    # read_single_frame stops after the first frame
    assert decompress_frame(blob, read_single_frame=True) == a


def test_skippable_frames(rng):
    data = random_bytes(rng, 2000, 8)
    blob = (make_skippable_frame(b"metadata" * 10, subtype=3)
            + compress_frame(data)
            + make_skippable_frame(b"trailer")
            + compress_frame(data))
    assert decompress_frame(blob) == data + data


def test_frame_nonframe_magic_raises():
    with pytest.raises(Lz4FrameError):
        decompress_frame(b"\x00\x01\x02\x03garbagegarbage")


def test_frame_short_reads(rng):
    data = random_bytes(rng, 30000, 8)
    framed = compress_frame(data, features=(
        FrameFlag.BLOCK_INDEPENDENCE, FrameFlag.CONTENT_CHECKSUM))
    stream = Lz4FrameInputStream(ShortReadStream(framed))
    out = bytearray()
    while True:
        chunk = stream.read(7)
        if not chunk:
            break
        out.extend(chunk)
    assert bytes(out) == data


def test_frame_per_byte_write(rng):
    data = random_bytes(rng, 5000, 8)
    out = io.BytesIO()
    stream = Lz4FrameOutputStream(out, block_size=BlockSize.SIZE_64KB)
    for i in range(len(data)):
        stream.write(data[i:i + 1])
    stream.close_keep_underlying()
    assert decompress_frame(out.getvalue()) == data


def test_frame_empty_content():
    framed = compress_frame(b"")
    # magic + FLG + BD + HC + endmark
    assert len(framed) == 4 + 1 + 1 + 1 + 4
    assert decompress_frame(framed) == b""


def test_frame_truncated_raises(rng):
    data = random_bytes(rng, 10000, 8)
    framed = compress_frame(data)
    with pytest.raises(Lz4FrameError):
        decompress_frame(framed[:len(framed) // 2])


# ---------------------------------------------------------------------------
# LZ4Block legacy stream
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("size", [0, 1, 100, 65535, 65536, 65537, 200000])
def test_block_stream_roundtrip(size, rng):
    data = random_bytes(rng, size, 16)
    out = io.BytesIO()
    s = Lz4BlockOutputStream(out)
    s.write(data)
    s.finish()
    blob = out.getvalue()
    assert blob[:8] == b"LZ4Block"
    r = Lz4BlockInputStream(io.BytesIO(blob))
    assert r.read() == data


@pytest.mark.parametrize("block_size", [64, 1024, 1 << 16, 1 << 20])
def test_block_stream_block_sizes(block_size, rng):
    data = random_bytes(rng, 150000, 8)
    out = io.BytesIO()
    s = Lz4BlockOutputStream(out, block_size=block_size)
    s.write(data)
    s.finish()
    r = Lz4BlockInputStream(io.BytesIO(out.getvalue()))
    assert r.read() == data


def test_block_stream_concatenated(rng):
    """stopOnEmptyBlock=False reads across stream boundaries
    (LZ4BlockStreamingTest.java:309-348)."""
    a = random_bytes(rng, 5000, 8)
    b = random_bytes(rng, 6000, 8)
    out = io.BytesIO()
    for part in (a, b):
        s = Lz4BlockOutputStream(out)
        s.write(part)
        s.finish()
    blob = out.getvalue()
    # default: stop at the first end marker
    assert Lz4BlockInputStream(io.BytesIO(blob)).read() == a
    # concatenated mode: read everything
    r = Lz4BlockInputStream(io.BytesIO(blob), stop_on_empty_block=False)
    assert r.read() == a + b


def test_block_stream_corruption_detected(rng):
    data = random_bytes(rng, 10000, 8)
    out = io.BytesIO()
    s = Lz4BlockOutputStream(out)
    s.write(data)
    s.finish()
    blob = bytearray(out.getvalue())
    blob[30] ^= 0xFF  # corrupt payload → checksum mismatch
    with pytest.raises(Lz4FrameError):
        Lz4BlockInputStream(io.BytesIO(bytes(blob))).read()
    blob2 = bytearray(out.getvalue())
    blob2[0] = 0x58  # corrupt magic
    with pytest.raises(Lz4FrameError):
        Lz4BlockInputStream(io.BytesIO(bytes(blob2))).read()


def test_block_stream_short_reads(rng):
    data = random_bytes(rng, 20000, 8)
    out = io.BytesIO()
    s = Lz4BlockOutputStream(out, block_size=4096)
    s.write(data)
    s.finish()
    r = Lz4BlockInputStream(ShortReadStream(out.getvalue(), max_chunk=5))
    got = bytearray()
    while True:
        chunk = r.read(11)
        if not chunk:
            break
        got.extend(chunk)
    assert bytes(got) == data


def test_block_stream_sync_flush(rng):
    data = random_bytes(rng, 100, 8)
    out = io.BytesIO()
    s = Lz4BlockOutputStream(out, block_size=1 << 16, sync_flush=True)
    s.write(data)
    s.flush()  # must emit the partial block immediately
    partial = out.getvalue()
    assert len(partial) > 0
    s.finish()
    r = Lz4BlockInputStream(io.BytesIO(out.getvalue()))
    assert r.read() == data


def test_block_stream_hc_compressor(rng):
    data = random_bytes(rng, 50000, 4)
    f = Lz4Factory.safe_instance()
    out = io.BytesIO()
    s = Lz4BlockOutputStream(out, compressor=f.high_compressor(9))
    s.write(data)
    s.finish()
    assert Lz4BlockInputStream(io.BytesIO(out.getvalue())).read() == data


# ---------------------------------------------------------------------------
# with-length codec
# ---------------------------------------------------------------------------

def test_with_length_roundtrip(rng):
    f = Lz4Factory.safe_instance()
    data = random_bytes(rng, 12345, 8)
    comp = Lz4CompressorWithLength(f.fast_compressor())
    blob = comp.compress_alloc(data)
    assert get_decompressed_length(blob) == len(data)
    for decomp in (Lz4DecompressorWithLength(f.fast_decompressor()),
                   Lz4DecompressorWithLength(f.safe_decompressor())):
        assert decomp.decompress_alloc(blob) == data


def test_with_length_offsets(rng):
    f = Lz4Factory.safe_instance()
    data = random_bytes(rng, 999, 8)
    comp = Lz4CompressorWithLength(f.fast_compressor())
    dest = bytearray(50 + comp.max_compressed_length(len(data)))
    n = comp.compress(data, 0, len(data), dest, 50, len(dest) - 50)
    decomp = Lz4DecompressorWithLength(f.safe_decompressor())
    restored = bytearray(len(data))
    assert decomp.decompress(dest, 50, restored, 0, n) == len(data)
    assert bytes(restored) == data
