"""T3 container formats: LZ4 Frame v1.5.1, legacy LZ4Block stream,
length-prefixed convenience codec (SURVEY.md §2.4)."""

from .frame import (
    BlockSize, FrameFlag, Lz4FrameInputStream, Lz4FrameOutputStream,
    compress_frame, decompress_frame, make_skippable_frame,
)
from .block_stream import (Lz4BlockInputStream, Lz4BlockOutputStream,
                           compress_block_stream, decompress_block_stream)
from .with_length import (
    Lz4CompressorWithLength, Lz4DecompressorWithLength, get_decompressed_length,
)

__all__ = [
    "BlockSize", "FrameFlag", "Lz4FrameInputStream", "Lz4FrameOutputStream",
    "compress_frame", "decompress_frame", "make_skippable_frame",
    "Lz4BlockInputStream", "Lz4BlockOutputStream",
    "compress_block_stream", "decompress_block_stream",
    "Lz4CompressorWithLength", "Lz4DecompressorWithLength",
    "get_decompressed_length",
]
