"""tpu-lz4: a TPU-native LZ4 + xxHash framework built from scratch in JAX/Pallas.

Provides the full capability surface of lz4/lz4-java — LZ4 fast-scan block
compression, LZ4 HC (levels 1-17), fast/safe block decompression, the
interoperable LZ4 Frame format (v1.5.1, skippable + concatenated frames), the
legacy LZ4Block stream format, length-prefixed convenience codecs, and
xxHash32/64 one-shot + streaming checksums — behind a self-testing factory
with three interchangeable tiers:

- ``safe``    : pure-Python reference (the correctness oracle)
- ``native``  : C++ shared library via ctypes (the JNI-equivalent tier)
- ``pallas``  : batched JAX/Pallas TPU kernels (block-parallel compute)

plus a data-parallel sharding runtime over a ``jax.sharding.Mesh`` for
multi-chip / multi-host frame compression (SURVEY.md §7 T5).
"""

__version__ = "0.5.0"

from .core import (  # noqa: F401
    Lz4Error, Lz4FrameError, max_compressed_length,
)
from .api.factory import Lz4Factory, XXHashFactory  # noqa: F401

__all__ = [
    "Lz4Error", "Lz4FrameError", "max_compressed_length",
    "Lz4Factory", "XXHashFactory",
    "__version__",
]
