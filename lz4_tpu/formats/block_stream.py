"""Legacy "LZ4Block" proprietary stream format (Kafka/Spark-style).

Byte-compatible with lz4-java's ``LZ4BlockOutputStream``/``LZ4BlockInputStream``
(``LZ4BlockOutputStream.java:39-69,189-266``,
``LZ4BlockInputStream.java:150-260``):

stream = block* end_block
block  = magic("LZ4Block") token(1) compressed_len(4 LE)
         original_len(4 LE) checksum(4 LE) payload
token  = method | level, method in {0x10 raw, 0x20 LZ4},
         level = ceil(log2(block_size)) - 10
end    = token(RAW|level) with zero lengths and zero checksum

The default checksum is xxHash32 with seed 0x9747b28c viewed through the
``Checksum`` adapter, i.e. masked to **28 bits** (the reference's seven-F
``0xFFFFFFFL`` quirk, StreamingXXHash32.java:101-107).
"""

from __future__ import annotations

import io
import struct

from ..core.errors import Lz4FrameError
from ..api.factory import Lz4Factory, XXHashFactory
from ..native.build import NativeBuildError

MAGIC = b"LZ4Block"
MAGIC_LENGTH = len(MAGIC)
HEADER_LENGTH = MAGIC_LENGTH + 1 + 4 + 4 + 4  # 21

COMPRESSION_LEVEL_BASE = 10
MIN_BLOCK_SIZE = 64
MAX_BLOCK_SIZE = 1 << (COMPRESSION_LEVEL_BASE + 0x0F)  # 32 MB

COMPRESSION_METHOD_RAW = 0x10
COMPRESSION_METHOD_LZ4 = 0x20

DEFAULT_SEED = 0x9747B28C

_U32 = struct.Struct("<I")


def _compression_level(block_size: int) -> int:
    if block_size < MIN_BLOCK_SIZE:
        raise ValueError(f"blockSize must be >= {MIN_BLOCK_SIZE}, got {block_size}")
    if block_size > MAX_BLOCK_SIZE:
        raise ValueError(f"blockSize must be <= {MAX_BLOCK_SIZE}, got {block_size}")
    return max(0, (block_size - 1).bit_length() - COMPRESSION_LEVEL_BASE)


def default_checksum():
    """The reference's default: xxh32(seed 0x9747b28c) via the 28-bit adapter."""
    stream = XXHashFactory.fastest_instance().new_streaming_hash32(DEFAULT_SEED)

    def check(data, off, length) -> int:
        stream.reset()
        stream.update(data, off, length)
        return stream.get_value() & 0xFFFFFFF

    return check


class Lz4BlockOutputStream(io.RawIOBase):
    """File-like LZ4Block writer."""

    def __init__(self, out, block_size: int = 1 << 16, compressor=None,
                 checksum=None, sync_flush: bool = False):
        super().__init__()
        self._out = out
        self._block_size = block_size
        self._level = _compression_level(block_size)
        self._compressor = compressor or Lz4Factory.fastest_instance().fast_compressor()
        self._checksum = checksum or default_checksum()
        self._sync_flush = sync_flush
        self._buffer = bytearray()
        self._compressed = bytearray(
            self._compressor.max_compressed_length(block_size))
        self._finished = False

    def writable(self) -> bool:
        return True

    def write(self, data) -> int:
        if self._finished:
            raise ValueError("This stream is already closed")
        data = memoryview(data)
        written = len(data)
        while len(data) > 0:
            take = min(self._block_size - len(self._buffer), len(data))
            self._buffer += data[:take]
            data = data[take:]
            if len(self._buffer) == self._block_size:
                self._flush_buffered_data()
        return written

    def _flush_buffered_data(self) -> None:
        if not self._buffer:
            return
        o = len(self._buffer)
        check = self._checksum(self._buffer, 0, o) & 0xFFFFFFFF
        compressed_len = self._compressor.compress(
            self._buffer, 0, o, self._compressed, 0, len(self._compressed))
        if compressed_len >= o:
            method = COMPRESSION_METHOD_RAW
            compressed_len = o
            payload = bytes(self._buffer)
        else:
            method = COMPRESSION_METHOD_LZ4
            payload = bytes(self._compressed[:compressed_len])
        header = (MAGIC + bytes([method | self._level])
                  + _U32.pack(compressed_len) + _U32.pack(o) + _U32.pack(check))
        self._out.write(header + payload)
        self._buffer.clear()

    def flush(self) -> None:
        if not self._finished and self._sync_flush:
            self._flush_buffered_data()
        if hasattr(self._out, "flush"):
            self._out.flush()

    def finish(self) -> None:
        """Write remaining data and the empty-block end marker
        (LZ4BlockOutputStream.java:255-266)."""
        if self._finished:
            return
        self._flush_buffered_data()
        header = (MAGIC + bytes([COMPRESSION_METHOD_RAW | self._level])
                  + _U32.pack(0) + _U32.pack(0) + _U32.pack(0))
        self._out.write(header)
        if hasattr(self._out, "flush"):
            self._out.flush()
        self._finished = True

    def close(self) -> None:
        if not self.closed:
            self.finish()
            super().close()


class Lz4BlockInputStream(io.RawIOBase):
    """File-like LZ4Block reader.

    ``stop_on_empty_block=False`` reads across concatenated streams
    (LZ4BlockInputStream.java:117-119,223-232).
    """

    def __init__(self, inp, decompressor=None, checksum=None,
                 stop_on_empty_block: bool = True):
        super().__init__()
        self._in = inp
        self._decompressor = decompressor or Lz4Factory.fastest_instance().fast_decompressor()
        self._checksum = checksum or default_checksum()
        self._stop_on_empty_block = stop_on_empty_block
        self._buffer = b""
        self._pos = 0
        self._finished = False

    def readable(self) -> bool:
        return True

    def _try_read_fully(self, n: int):
        data = b""
        while len(data) < n:
            chunk = self._in.read(n - len(data))
            if not chunk:
                if not data:
                    return None
                raise Lz4FrameError("Stream ended prematurely")
            data += chunk
        return data

    def _refill(self) -> None:
        header = self._try_read_fully(HEADER_LENGTH)
        if header is None:
            if not self._stop_on_empty_block:
                self._finished = True
                return
            raise Lz4FrameError("Stream ended prematurely")
        if header[:MAGIC_LENGTH] != MAGIC:
            raise Lz4FrameError("Stream is corrupted")
        token = header[MAGIC_LENGTH]
        method = token & 0xF0
        level = COMPRESSION_LEVEL_BASE + (token & 0x0F)
        if method not in (COMPRESSION_METHOD_RAW, COMPRESSION_METHOD_LZ4):
            raise Lz4FrameError("Stream is corrupted")
        compressed_len = _U32.unpack_from(header, MAGIC_LENGTH + 1)[0]
        original_len = _U32.unpack_from(header, MAGIC_LENGTH + 5)[0]
        check = _U32.unpack_from(header, MAGIC_LENGTH + 9)[0]
        if (original_len > (1 << level)
                or (original_len == 0) != (compressed_len == 0)
                or (method == COMPRESSION_METHOD_RAW and original_len != compressed_len)):
            raise Lz4FrameError("Stream is corrupted")
        # compressed_len is attacker-controlled up to 4GB-1; a payload can
        # never exceed the compressed bound of its block size, so reject
        # before _try_read_fully buffers it (r5 hardening)
        from ..core.constants import max_compressed_length
        if compressed_len > max_compressed_length(1 << level):
            raise Lz4FrameError("Stream is corrupted")
        if original_len == 0:
            if check != 0:
                raise Lz4FrameError("Stream is corrupted")
            if self._stop_on_empty_block:
                self._finished = True
            else:
                self._refill()  # concatenated stream: try the next block
            return

        payload = self._try_read_fully(compressed_len)
        if payload is None:
            raise Lz4FrameError("Stream ended prematurely")
        if method == COMPRESSION_METHOD_RAW:
            raw = payload
        else:
            dest = bytearray(original_len)
            n_read = self._decompressor.decompress(payload, 0, dest, 0, original_len)
            if n_read != compressed_len:
                raise Lz4FrameError("Stream is corrupted")
            raw = bytes(dest)
        if (self._checksum(raw, 0, original_len) & 0xFFFFFFFF) != check:
            raise Lz4FrameError("Stream is corrupted")
        self._buffer = raw
        self._pos = 0

    def _fill(self) -> bool:
        while self._pos >= len(self._buffer):
            if self._finished:
                return False
            self._buffer = b""
            self._pos = 0
            self._refill()
            if self._finished:
                return False
        return True

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            chunks = []
            while self._fill():
                chunks.append(self._buffer[self._pos:])
                self._pos = len(self._buffer)
            return b"".join(chunks)
        if n == 0:
            return b""
        if not self._fill():
            return b""
        take = min(n, len(self._buffer) - self._pos)
        out = self._buffer[self._pos:self._pos + take]
        self._pos += take
        return out

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[:len(data)] = data
        return len(data)


def compress_block_stream(data, block_size: int = 1 << 16) -> bytes:
    """One-shot: wrap ``data`` in a complete LZ4Block stream.

    Routed through the native one-call codec (threaded blocks in C++,
    byte-identical output) when available.
    """
    try:
        from ..api import native_instances as ni
        return ni.compress_block_stream_packed(data, block_size)
    except (ImportError, NativeBuildError):
        out = io.BytesIO()
        s = Lz4BlockOutputStream(out, block_size=block_size)
        s.write(data)
        s.finish()
        return out.getvalue()


def decompress_block_stream(data, stop_on_empty_block: bool = True) -> bytes:
    """One-shot: decode an LZ4Block stream (concatenated streams supported
    with ``stop_on_empty_block=False``)."""
    try:
        from ..api import native_instances as ni
        out, _ = ni.decompress_block_stream_packed(
            bytes(data), stop_on_empty_block=stop_on_empty_block)
        return out
    except (ImportError, NativeBuildError):
        return Lz4BlockInputStream(
            io.BytesIO(data),
            stop_on_empty_block=stop_on_empty_block).read()
