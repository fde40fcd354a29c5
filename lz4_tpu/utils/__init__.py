"""Utility layer: measurement protocol and buffer helpers."""

from .timing import DeviceTimer, median_throughput
from .buffers import as_bytes, chunk_bytes
from .config import default_tier
from .profiling import annotate, trace

__all__ = ["DeviceTimer", "median_throughput", "as_bytes", "chunk_bytes",
           "default_tier", "annotate", "trace"]
