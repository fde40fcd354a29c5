"""T2 API layer: abstract codec types and self-testing tier factories."""

from .abstract import (
    Lz4Compressor, Lz4FastDecompressor, Lz4SafeDecompressor,
    StreamingXXHash32, StreamingXXHash64, XXHash32, XXHash64,
)
from .factory import Lz4Factory, XXHashFactory

__all__ = [
    "Lz4Compressor", "Lz4FastDecompressor", "Lz4SafeDecompressor",
    "StreamingXXHash32", "StreamingXXHash64", "XXHash32", "XXHash64",
    "Lz4Factory", "XXHashFactory",
]
