"""Length-prefixed convenience codec.

Counterpart of ``LZ4CompressorWithLength`` / ``LZ4DecompressorWithLength``
(``LZ4CompressorWithLength.java:45-57,155-159``,
``LZ4DecompressorWithLength.java:41-131``): prepends the 4-byte little-endian
original length to the compressed block. Not interoperable with any other
format (reference docstring, LZ4CompressorWithLength.java:22-28).
"""

from __future__ import annotations

import struct

from ..core.errors import Lz4Error

_U32 = struct.Struct("<I")
PREFIX_LENGTH = 4


class Lz4CompressorWithLength:
    """Wraps any compressor; output = length(4 LE) + compressed block."""

    def __init__(self, compressor):
        self._compressor = compressor

    def max_compressed_length(self, length: int) -> int:
        return self._compressor.max_compressed_length(length) + PREFIX_LENGTH

    def compress(self, src, src_off: int, src_len: int, dest, dest_off: int,
                 max_dest_len: int) -> int:
        if max_dest_len < PREFIX_LENGTH:
            raise Lz4Error("maxDestLen is too small")
        n = self._compressor.compress(
            src, src_off, src_len, dest, dest_off + PREFIX_LENGTH,
            max_dest_len - PREFIX_LENGTH)
        dest[dest_off:dest_off + PREFIX_LENGTH] = _U32.pack(src_len)
        return n + PREFIX_LENGTH

    def compress_alloc(self, src, src_off: int = 0, src_len: int | None = None) -> bytes:
        if src_len is None:
            src_len = len(src) - src_off
        dest = bytearray(self.max_compressed_length(src_len))
        n = self.compress(src, src_off, src_len, dest, 0, len(dest))
        return bytes(dest[:n])


def get_decompressed_length(src, src_off: int = 0) -> int:
    """Read the original length from the prefix
    (LZ4DecompressorWithLength.java:41-75)."""
    return _U32.unpack_from(src, src_off)[0]


class Lz4DecompressorWithLength:
    """Wraps either a fast or a safe decompressor
    (LZ4DecompressorWithLength.java:84-131)."""

    def __init__(self, decompressor):
        from ..api.abstract import Lz4FastDecompressor, Lz4SafeDecompressor
        if isinstance(decompressor, Lz4FastDecompressor):
            self._fast = decompressor
            self._safe = None
        elif isinstance(decompressor, Lz4SafeDecompressor):
            self._fast = None
            self._safe = decompressor
        else:
            raise TypeError("expected a fast or safe decompressor")

    def decompress(self, src, src_off: int, dest, dest_off: int,
                   src_len: int | None = None) -> int:
        """Decompress a length-prefixed block; returns bytes written."""
        dest_len = get_decompressed_length(src, src_off)
        if dest_len > len(dest) - dest_off:
            raise Lz4Error("Output buffer too small")
        if self._fast is not None:
            self._fast.decompress(src, src_off + PREFIX_LENGTH, dest, dest_off, dest_len)
            return dest_len
        if src_len is None:
            src_len = len(src) - src_off
        return self._safe.decompress(
            src, src_off + PREFIX_LENGTH, src_len - PREFIX_LENGTH,
            dest, dest_off, dest_len)

    def decompress_alloc(self, src, src_off: int = 0,
                         src_len: int | None = None) -> bytes:
        dest_len = get_decompressed_length(src, src_off)
        dest = bytearray(dest_len)
        self.decompress(src, src_off, dest, 0, src_len)
        return bytes(dest)
