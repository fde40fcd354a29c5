"""The "safe" tier: codec instances backed by the pure-Python reference core.

This is the equivalent of lz4-java's pure-Java "JavaSafe" implementation
family (loaded by class-name convention from ``LZ4Factory.java:176-202``):
always available, always correct, used as the differential-testing oracle for
the native and Pallas tiers.
"""

from __future__ import annotations

from ..core import lz4_block_ref, lz4_hc_ref, xxhash_ref
from ..core.constants import DEFAULT_COMPRESSION_LEVEL
from .abstract import (
    Lz4Compressor, Lz4FastDecompressor, Lz4SafeDecompressor,
    StreamingXXHash32, StreamingXXHash64, XXHash32, XXHash64,
)


class FastCompressor(Lz4Compressor):
    def compress(self, src, src_off, src_len, dest, dest_off, max_dest_len):
        return lz4_block_ref.compress_fast(src, src_off, src_len, dest, dest_off, max_dest_len)


class HighCompressor(Lz4Compressor):
    def __init__(self, level: int = DEFAULT_COMPRESSION_LEVEL):
        self.level = level

    def compress(self, src, src_off, src_len, dest, dest_off, max_dest_len):
        return lz4_hc_ref.compress_hc(src, src_off, src_len, dest, dest_off,
                                      max_dest_len, self.level)

    def __repr__(self):
        return f"{type(self).__name__}(level={self.level})"


class FastDecompressor(Lz4FastDecompressor):
    def decompress(self, src, src_off, dest, dest_off, dest_len):
        return lz4_block_ref.decompress_fast(src, src_off, dest, dest_off, dest_len)


class SafeDecompressor(Lz4SafeDecompressor):
    def decompress(self, src, src_off, src_len, dest, dest_off, max_dest_len):
        return lz4_block_ref.decompress_safe(src, src_off, src_len, dest, dest_off, max_dest_len)


class XXH32(XXHash32):
    def hash(self, buf, off, length, seed):
        return xxhash_ref.as_s32(xxhash_ref.xxh32(buf, off, length, seed))


class XXH64(XXHash64):
    def hash(self, buf, off, length, seed):
        return xxhash_ref.as_s64(xxhash_ref.xxh64(buf, off, length, seed))


class StreamingXXH32(StreamingXXHash32):
    def __init__(self, seed: int):
        super().__init__(seed)
        self._state = xxhash_ref.StreamingXXH32(seed)

    def update(self, buf, off: int = 0, length: int | None = None):
        self._state.update(buf, off, length)

    def get_value(self) -> int:
        return xxhash_ref.as_s32(self._state.get_value())

    def reset(self) -> None:
        self._state.reset()


class StreamingXXH64(StreamingXXHash64):
    def __init__(self, seed: int):
        super().__init__(seed)
        self._state = xxhash_ref.StreamingXXH64(seed)

    def update(self, buf, off: int = 0, length: int | None = None):
        self._state.update(buf, off, length)

    def get_value(self) -> int:
        return xxhash_ref.as_s64(self._state.get_value())

    def reset(self) -> None:
        self._state.reset()
