"""The "pallas" tier: codec instances backed by the JAX/Pallas device kernels.

This tier runs the compute on the accelerator (TPU; CPU backend in tests).
Its sweet spot is the *batched* API (``compress_batch``/``decompress_batch``/
``hash32_batch``) used by the sharded pipeline (dist/); the scalar
one-block-at-a-time methods satisfy the common factory contract by running a
batch of one, which is correct but latency-bound — exactly the trade the
reference's JNI tier makes for tiny inputs vs call overhead.

All four codec roles run on device, including HC (kernels/jax_hc.py — the
lazy 3-match optimizer as a jitted phase machine with the chained match
finder in dense device arrays).
"""

from __future__ import annotations

import numpy as np

from ..core.constants import DEFAULT_COMPRESSION_LEVEL, max_compressed_length
from ..core.errors import Lz4Error
from ..kernels import jax_codec
from ..kernels.xxhash_jax import xxh32_batch, xxh64_batch_py
from .abstract import (
    Lz4Compressor, Lz4FastDecompressor, Lz4SafeDecompressor,
    StreamingXXHash32, StreamingXXHash64, XXHash32, XXHash64,
)


def _check_range(buf, off, length):
    if length < 0:
        raise ValueError("lengths must be >= 0")
    if length > 0 and (off < 0 or off + length > len(buf)):
        raise IndexError(f"range [{off}, {off + length}) out of bounds")


def _pad4(n: int) -> int:
    return max(4, (n + 3) & ~3)


class FastCompressor(Lz4Compressor):
    def compress(self, src, src_off, src_len, dest, dest_off, max_dest_len):
        _check_range(src, src_off, src_len)
        _check_range(dest, dest_off, max_dest_len)
        block = bytes(src[src_off:src_off + src_len])
        arr, lens = jax_codec.to_device_layout([block], _pad4(src_len))
        out, out_lens, err = jax_codec.compress_fast_batch(
            arr, lens, max_compressed_length(_pad4(src_len)))
        if int(np.asarray(err)[0]) == jax_codec.ERR_DEST_TOO_SMALL:
            raise Lz4Error("maxDestLen is too small")
        n = int(np.asarray(out_lens)[0])
        if n > max_dest_len:
            raise Lz4Error("maxDestLen is too small")
        data = jax_codec.from_device_layout(out, out_lens)[0]
        dest[dest_off:dest_off + n] = data
        return n

    # ---- batched device API (used by dist/) ----
    def compress_batch(self, blocks: list[bytes]):
        """Compress many blocks on device; returns list[bytes]."""
        if not blocks:
            return []
        cap = _pad4(max(len(b) for b in blocks))
        arr, lens = jax_codec.to_device_layout(blocks, cap)
        out, out_lens, err = jax_codec.compress_fast_batch(
            arr, lens, max_compressed_length(cap))
        if np.asarray(err).any():
            raise Lz4Error("device compression failed")
        return jax_codec.from_device_layout(out, out_lens)


class HighCompressor(Lz4Compressor):
    """Device HC: the chained-match lazy optimizer as a jitted phase machine
    (kernels/jax_hc.py); byte-identical output to the host tiers."""

    def __init__(self, level: int = DEFAULT_COMPRESSION_LEVEL):
        self.level = level

    def compress(self, src, src_off, src_len, dest, dest_off, max_dest_len):
        from ..kernels.jax_hc import compress_hc_batch
        _check_range(src, src_off, src_len)
        _check_range(dest, dest_off, max_dest_len)
        block = bytes(src[src_off:src_off + src_len])
        arr, lens = jax_codec.to_device_layout([block], _pad4(src_len))
        out, out_lens, err = compress_hc_batch(
            arr, lens, max_compressed_length(_pad4(src_len)), self.level)
        if int(np.asarray(err)[0]) == jax_codec.ERR_DEST_TOO_SMALL:
            raise Lz4Error("maxDestLen is too small")
        n = int(np.asarray(out_lens)[0])
        if n > max_dest_len:
            raise Lz4Error("maxDestLen is too small")
        data = jax_codec.from_device_layout(out, out_lens)[0]
        dest[dest_off:dest_off + n] = data
        return n

    def compress_batch(self, blocks: list[bytes]):
        from ..kernels.jax_hc import compress_hc_batch
        if not blocks:
            return []
        cap = _pad4(max(len(b) for b in blocks))
        arr, lens = jax_codec.to_device_layout(blocks, cap)
        out, out_lens, err = compress_hc_batch(
            arr, lens, max_compressed_length(cap), self.level)
        if np.asarray(err).any():
            raise Lz4Error("device HC compression failed")
        return jax_codec.from_device_layout(out, out_lens)

    def __repr__(self):
        return f"{type(self).__name__}(level={self.level})"


class SafeDecompressor(Lz4SafeDecompressor):
    def decompress(self, src, src_off, src_len, dest, dest_off, max_dest_len):
        _check_range(src, src_off, src_len)
        _check_range(dest, dest_off, max_dest_len)
        block = bytes(src[src_off:src_off + src_len])
        arr, lens = jax_codec.to_device_layout([block], _pad4(src_len))
        out, out_lens, err = jax_codec.decompress_safe_batch(
            arr, lens, max(1, max_dest_len))
        code = int(np.asarray(err)[0])
        if code == jax_codec.ERR_DEST_TOO_SMALL:
            raise Lz4Error("Output buffer too small")
        if code != jax_codec.OK:
            raise Lz4Error("Malformed input")
        n = int(np.asarray(out_lens)[0])
        data = jax_codec.from_device_layout(out, out_lens)[0]
        dest[dest_off:dest_off + n] = data
        return n

    def decompress_batch(self, blocks: list[bytes], max_dest_len: int):
        """Decompress many blocks on device; returns list[bytes]."""
        if not blocks:
            return []
        cap = _pad4(max(len(b) for b in blocks))
        arr, lens = jax_codec.to_device_layout(blocks, cap)
        out, out_lens, err = jax_codec.decompress_safe_batch(
            arr, lens, max_dest_len)
        codes = np.asarray(err)
        if codes.any():
            bad = int(np.nonzero(codes)[0][0])
            raise Lz4Error(f"Malformed input in block {bad}")
        return jax_codec.from_device_layout(out, out_lens)


class FastDecompressor(Lz4FastDecompressor):
    """Exact-decompressed-size contract on the device fast-mode kernel,
    which reports the number of source bytes consumed per block."""

    def decompress(self, src, src_off, dest, dest_off, dest_len):
        if src_off < 0 or src_off >= len(src):
            raise IndexError(f"src_off {src_off} out of bounds")
        _check_range(dest, dest_off, dest_len)
        block = bytes(src[src_off:])
        arr, lens = jax_codec.to_device_layout([block], _pad4(len(block)))
        out, src_read, err = jax_codec.decompress_fast_batch(
            arr, lens, dest_len)
        if int(np.asarray(err)[0]) != jax_codec.OK:
            raise Lz4Error("Malformed input")
        data = jax_codec.from_device_layout(
            out, np.full((1,), dest_len, np.int32))[0]
        dest[dest_off:dest_off + dest_len] = data
        return int(np.asarray(src_read)[0])


def _s32(v):
    v = int(v) & 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _s64(v):
    v = int(v) & 0xFFFFFFFFFFFFFFFF
    return v - (1 << 64) if v >= (1 << 63) else v


class XXH32(XXHash32):
    def hash(self, buf, off, length, seed):
        _check_range(buf, off, length)
        cap = _pad4(length)
        arr = np.zeros((1, cap), np.uint8)
        arr[0, :length] = np.frombuffer(bytes(buf[off:off + length]), np.uint8)
        h = np.asarray(xxh32_batch(arr, np.array([length], np.int32),
                                   int(seed) & 0xFFFFFFFF))
        return _s32(h[0])

    def hash_batch(self, data, lengths, seed=0):
        """uint8[N, L], int32[N] -> uint32[N] on device."""
        return xxh32_batch(data, lengths, int(seed) & 0xFFFFFFFF)


class XXH64(XXHash64):
    def hash(self, buf, off, length, seed):
        _check_range(buf, off, length)
        cap = max(8, (length + 7) & ~7)
        arr = np.zeros((1, cap), np.uint8)
        arr[0, :length] = np.frombuffer(bytes(buf[off:off + length]), np.uint8)
        h = xxh64_batch_py(arr, np.array([length], np.int32),
                           int(seed) & 0xFFFFFFFFFFFFFFFF)
        return _s64(h[0])


class StreamingXXH32(StreamingXXHash32):
    """Streaming hash for the device tier.

    The xxHash streaming state is tiny (4 accumulators + <16B remainder), so
    chunk accumulation runs on the host reference state machine while one-shot
    bulk hashing uses the device kernels — the same split the reference makes
    between streaming JNI state and one-shot calls.
    """

    def __init__(self, seed: int):
        super().__init__(seed)
        from ..core.xxhash_ref import StreamingXXH32 as _Ref
        self._state = _Ref(seed)

    def update(self, buf, off: int = 0, length: int | None = None):
        self._state.update(buf, off, length)

    def get_value(self) -> int:
        return _s32(self._state.get_value())

    def reset(self) -> None:
        self._state.reset()


class StreamingXXH64(StreamingXXHash64):
    def __init__(self, seed: int):
        super().__init__(seed)
        from ..core.xxhash_ref import StreamingXXH64 as _Ref
        self._state = _Ref(seed)

    def update(self, buf, off: int = 0, length: int | None = None):
        self._state.update(buf, off, length)

    def get_value(self) -> int:
        return _s64(self._state.get_value())

    def reset(self) -> None:
        self._state.reset()
