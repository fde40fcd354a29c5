"""T0 core layer: format constants and the pure-Python reference codecs.

The reference codecs are the framework's "safe instance": the always-correct
scalar oracle used for differential testing of the native (C++) tier and the
Pallas TPU kernels, mirroring the role of lz4-java's pure-Java "safe"
implementations (SURVEY.md §7 T0).
"""

from . import constants
from .errors import Lz4Error, Lz4FrameError
from .lz4_block_ref import (
    compress_fast, compress_fast_alloc,
    decompress_fast, decompress_fast_alloc,
    decompress_safe, decompress_safe_alloc,
)
from .lz4_hc_ref import compress_hc, compress_hc_alloc
from .xxhash_ref import (
    StreamingXXH32, StreamingXXH64, as_s32, as_s64, as_u32, as_u64,
    xxh32, xxh64,
)
from .constants import max_compressed_length

__all__ = [
    "constants", "Lz4Error", "Lz4FrameError",
    "compress_fast", "compress_fast_alloc",
    "decompress_fast", "decompress_fast_alloc",
    "decompress_safe", "decompress_safe_alloc",
    "compress_hc", "compress_hc_alloc",
    "StreamingXXH32", "StreamingXXH64",
    "xxh32", "xxh64", "as_s32", "as_s64", "as_u32", "as_u64",
    "max_compressed_length",
]
