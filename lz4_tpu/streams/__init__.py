"""T4 streams layer: host-side streaming IO feeding batched codec engines."""

from .pipeline import (
    BatchEngine, compress_stream, decompress_stream, get_engine,
)

__all__ = ["BatchEngine", "compress_stream", "decompress_stream", "get_engine"]
