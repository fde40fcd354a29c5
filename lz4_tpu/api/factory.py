"""Factories: tier discovery, caching, self-test, and fastest-instance dispatch.

``Lz4Factory`` / ``XXHashFactory`` mirror the reference entry points
(``LZ4Factory.java:91-220``, ``XXHashFactory.java:80-242``):

- implementations are loaded by *module-name convention*
  (``lz4_tpu.api.<impl>_instances``) — the dynamic-loading analog of the
  reference's reflective class loading (``LZ4Factory.java:176-182``);
- factory instances are cached singletons (``LZ4Factory.java:59-61``);
- HC compressors are pre-built for every level 1..17
  (``LZ4Factory.java:189-202``);
- every factory construction runs a compress/decompress round-trip self-test
  (``LZ4Factory.java:204-220``) — a factory that fails it is never returned;
- ``fastest_instance()`` prefers ``native`` (C++), then ``pallas`` for batch
  work, then falls back to the pure-Python ``safe`` tier
  (``LZ4Factory.java:138-173``).

Tiers:

======== ==========================================================
name     backing
======== ==========================================================
safe     pure-Python reference core (always available)
native   C++ shared library via ctypes (JNI-equivalent)
pallas   batched JAX/Pallas TPU kernels (device-side, batch-oriented)
======== ==========================================================
"""

from __future__ import annotations

import importlib
import threading

from ..core.constants import MAX_COMPRESSION_LEVEL
from ..core.errors import Lz4Error
from .abstract import (
    Lz4Compressor, Lz4FastDecompressor, Lz4SafeDecompressor,
    StreamingXXHash32, StreamingXXHash64, XXHash32, XXHash64,
)

_SELF_TEST_DATA = (b"12345345234572" * 9)[:100]  # arbitrary, compressible


class Lz4Factory:
    """Entry point: obtain compressors/decompressors for one tier."""

    _instances: dict[str, "Lz4Factory"] = {}
    _lock = threading.RLock()

    def __init__(self, impl: str):
        self.impl = impl
        mod = importlib.import_module(f"lz4_tpu.api.{impl}_instances")
        self._fast_compressor: Lz4Compressor = mod.FastCompressor()
        self._fast_decompressor: Lz4FastDecompressor = mod.FastDecompressor()
        self._safe_decompressor: Lz4SafeDecompressor = mod.SafeDecompressor()
        # pre-build HC compressors for every level (LZ4Factory.java:189-202)
        self._high_compressors: dict[int, Lz4Compressor] = {
            level: mod.HighCompressor(level)
            for level in range(1, MAX_COMPRESSION_LEVEL + 1)
        }
        self._self_test()

    # -- singleton accessors -------------------------------------------------

    @classmethod
    def _instance(cls, impl: str) -> "Lz4Factory":
        with cls._lock:
            inst = cls._instances.get(impl)
            if inst is None:
                inst = cls(impl)
                cls._instances[impl] = inst
            return inst

    @classmethod
    def safe_instance(cls) -> "Lz4Factory":
        """Pure-Python reference tier (always available)."""
        return cls._instance("safe")

    @classmethod
    def native_instance(cls) -> "Lz4Factory":
        """C++ tier via ctypes; raises if the shared library can't be built/loaded."""
        return cls._instance("native")

    @classmethod
    def pallas_instance(cls) -> "Lz4Factory":
        """JAX/Pallas TPU tier; raises if JAX is unavailable."""
        return cls._instance("pallas")

    @classmethod
    def fastest_instance(cls) -> "Lz4Factory":
        """Native if it works, else pallas, else safe (LZ4Factory.java:162-173).

        ``TPULZ4_DEFAULT_TIER`` forces a specific tier (utils/config.py).
        """
        from ..utils.config import default_tier
        forced = default_tier()
        if forced is not None:
            return cls._instance(forced)
        for impl in ("native", "pallas", "safe"):
            try:
                return cls._instance(impl)
            except Exception:
                continue
        raise Lz4Error("no LZ4 implementation available")  # pragma: no cover

    @classmethod
    def fastest_python_instance(cls) -> "Lz4Factory":
        """Fastest tier not requiring the native library (cf. fastestJavaInstance)."""
        for impl in ("pallas", "safe"):
            try:
                return cls._instance(impl)
            except Exception:
                continue
        raise Lz4Error("no LZ4 implementation available")  # pragma: no cover

    # -- instance accessors --------------------------------------------------

    def fast_compressor(self) -> Lz4Compressor:
        return self._fast_compressor

    def high_compressor(self, level: int | None = None) -> Lz4Compressor:
        """HC compressor; level defaults to 9 (LZ4Factory.java:263-270)."""
        if level is None:
            from ..core.constants import DEFAULT_COMPRESSION_LEVEL
            level = DEFAULT_COMPRESSION_LEVEL
        if level < 1:
            level = 1  # reference clamps low levels to the default path's min
        if level > MAX_COMPRESSION_LEVEL:
            level = MAX_COMPRESSION_LEVEL
        return self._high_compressors[level]

    def turbo_compressor(self) -> Lz4Compressor:
        """Opt-in modern-heuristic fast compressor (VERDICT r3 #2).

        Native tier only: valid LZ4 output decodable by every tier, smaller
        AND faster than :meth:`fast_compressor` on inputs > 64KB, but not
        byte-identical to the reference algorithm there (the reference's own
        JNI tier takes the same freedom, ``net_jpountz_lz4_LZ4JNI.c:75``).
        Other tiers fall back to :meth:`fast_compressor` — graceful
        degradation, mirroring the factory's tier-fallback philosophy.
        """
        turbo = getattr(self, "_turbo_compressor", None)
        if turbo is None:
            mod = importlib.import_module(f"lz4_tpu.api.{self.impl}_instances")
            cls_ = getattr(mod, "TurboCompressor", None)
            if cls_ is None:
                turbo = self._fast_compressor
            else:
                turbo = cls_()
                # construction self-test, same contract as _self_test
                data = _SELF_TEST_DATA
                comp = bytearray(turbo.max_compressed_length(len(data)))
                n = turbo.compress(data, 0, len(data), comp, 0, len(comp))
                restored = bytearray(len(data))
                written = self._safe_decompressor.decompress(
                    comp, 0, n, restored, 0, len(data))
                if written != len(data) or bytes(restored) != data:
                    raise Lz4Error(
                        f"{self.impl} instance is broken (turbo compressor)")
            self._turbo_compressor = turbo
        return turbo

    def fast_decompressor(self) -> Lz4FastDecompressor:
        return self._fast_decompressor

    def safe_decompressor(self) -> Lz4SafeDecompressor:
        return self._safe_decompressor

    # deprecated aliases kept for API parity with the reference
    # (LZ4Factory.java:299-311)
    def decompressor(self) -> Lz4FastDecompressor:
        """Deprecated: use :meth:`fast_decompressor`."""
        return self._fast_decompressor

    def unknown_size_decompressor(self) -> Lz4SafeDecompressor:
        """Deprecated: use :meth:`safe_decompressor`."""
        return self._safe_decompressor

    # -- self-test (LZ4Factory.java:204-220) ---------------------------------

    def _self_test(self) -> None:
        data = _SELF_TEST_DATA
        for compressor in (self._fast_compressor, self._high_compressors[9]):
            compressed = bytearray(compressor.max_compressed_length(len(data)))
            compressed_len = compressor.compress(
                data, 0, len(data), compressed, 0, len(compressed))
            # test fast decompressor
            restored = bytearray(len(data))
            n_read = self._fast_decompressor.decompress(
                compressed, 0, restored, 0, len(data))
            if n_read != compressed_len or bytes(restored) != data:
                raise Lz4Error(f"{self.impl} instance is broken (fast decompressor)")
            # test safe decompressor
            restored = bytearray(len(data))
            n_written = self._safe_decompressor.decompress(
                compressed, 0, compressed_len, restored, 0, len(data))
            if n_written != len(data) or bytes(restored) != data:
                raise Lz4Error(f"{self.impl} instance is broken (safe decompressor)")

    def __repr__(self):
        return f"Lz4Factory(impl={self.impl!r})"


class XXHashFactory:
    """Entry point for xxHash32/64 one-shot and streaming hashes."""

    _instances: dict[str, "XXHashFactory"] = {}
    _lock = threading.RLock()

    def __init__(self, impl: str):
        self.impl = impl
        mod = importlib.import_module(f"lz4_tpu.api.{impl}_instances")
        self._hash32: XXHash32 = mod.XXH32()
        self._hash64: XXHash64 = mod.XXH64()
        self._streaming32_cls = mod.StreamingXXH32
        self._streaming64_cls = mod.StreamingXXH64
        self._self_test()

    @classmethod
    def _instance(cls, impl: str) -> "XXHashFactory":
        with cls._lock:
            inst = cls._instances.get(impl)
            if inst is None:
                inst = cls(impl)
                cls._instances[impl] = inst
            return inst

    @classmethod
    def safe_instance(cls) -> "XXHashFactory":
        return cls._instance("safe")

    @classmethod
    def native_instance(cls) -> "XXHashFactory":
        return cls._instance("native")

    @classmethod
    def pallas_instance(cls) -> "XXHashFactory":
        return cls._instance("pallas")

    @classmethod
    def fastest_instance(cls) -> "XXHashFactory":
        from ..utils.config import default_tier
        forced = default_tier()
        if forced is not None:
            return cls._instance(forced)
        for impl in ("native", "pallas", "safe"):
            try:
                return cls._instance(impl)
            except Exception:
                continue
        raise Lz4Error("no xxHash implementation available")  # pragma: no cover

    @classmethod
    def fastest_python_instance(cls) -> "XXHashFactory":
        for impl in ("pallas", "safe"):
            try:
                return cls._instance(impl)
            except Exception:
                continue
        raise Lz4Error("no xxHash implementation available")  # pragma: no cover

    def hash32(self) -> XXHash32:
        return self._hash32

    def hash64(self) -> XXHash64:
        return self._hash64

    def new_streaming_hash32(self, seed: int = 0) -> StreamingXXHash32:
        return self._streaming32_cls(seed)

    def new_streaming_hash64(self, seed: int = 0) -> StreamingXXHash64:
        return self._streaming64_cls(seed)

    # self-test comparing one-shot against streaming (XXHashFactory.java:184-203)
    def _self_test(self) -> None:
        import random
        rng = random.Random(0xCAFEBABE)
        data = bytes(rng.randrange(256) for _ in range(100))
        seed = rng.randrange(-1 << 31, 1 << 31)
        h1 = self._hash32.hash(data, 0, len(data), seed)
        s32 = self._streaming32_cls(seed)
        s32.update(data, 0, len(data))
        if h1 != s32.get_value():
            raise Lz4Error(f"{self.impl} xxhash32 instance is broken")
        h2 = self._hash64.hash(data, 0, len(data), seed)
        s64 = self._streaming64_cls(seed)
        s64.update(data, 0, len(data))
        if h2 != s64.get_value():
            raise Lz4Error(f"{self.impl} xxhash64 instance is broken")

    def __repr__(self):
        return f"XXHashFactory(impl={self.impl!r})"
