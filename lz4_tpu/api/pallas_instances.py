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

import os

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


# -- Mosaic routing ----------------------------------------------------------
#
# The batch APIs run the hand-written Mosaic kernels (kernels/lz4_pallas.py,
# kernels/xxhash_pallas.py) whenever an accelerator backend is present;
# on CPU they use the pure-JAX lockstep kernels (byte-identical output), or
# the Mosaic kernels in Pallas interpreter mode when
# ``TPULZ4_PALLAS_INTERPRET=1`` (slow; used by tests to pin the routing).

def _mosaic_mode():
    """'device' on an accelerator backend, 'interpret' when forced, else None."""
    if os.environ.get("TPULZ4_PALLAS_INTERPRET") == "1":
        return "interpret"
    try:
        import jax
        if jax.devices()[0].platform != "cpu":
            return "device"
    except Exception:  # pragma: no cover - no backend at all
        pass
    return None


def _to_i32_layout(blocks, cap: int, pad: int):
    """list[bytes] -> (int32[N, cap+pad] one-byte-per-element, int32[N])."""
    n = len(blocks)
    arr = np.zeros((n, cap + pad), np.int32)
    lens = np.zeros((n,), np.int32)
    for i, b in enumerate(blocks):
        if b:
            arr[i, :len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    return arr, lens


def _from_i32_layout(out, lens):
    out = np.asarray(out)
    lens = np.asarray(lens)
    return [out[i, :int(lens[i])].astype(np.uint8).tobytes()
            for i in range(len(lens))]


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
        """Compress many blocks on device; returns list[bytes].

        Routes to the Mosaic kernel (kernels/lz4_pallas.py) on accelerator
        backends; pure-JAX lockstep kernel on CPU. Output is byte-identical
        either way (both mirror compress.template:16-261 exactly).
        """
        if not blocks:
            return []
        mode = _mosaic_mode()
        if mode is not None:
            from ..kernels import lz4_pallas as lp
            cap = _pad4(max(len(b) for b in blocks))
            arr, lens = _to_i32_layout(blocks, cap, lp.PAD)
            out, out_lens, err = lp.compress_fast_pallas(
                arr, lens, max_compressed_length(cap),
                interpret=(mode == "interpret"))
            if np.asarray(err).any():
                raise Lz4Error("device compression failed")
            return _from_i32_layout(out, out_lens)
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
        """Decompress many blocks on device; returns list[bytes].

        Mosaic kernel on accelerator backends, pure-JAX kernel on CPU —
        see FastCompressor.compress_batch.
        """
        if not blocks:
            return []
        mode = _mosaic_mode()
        if mode is not None:
            from ..kernels import lz4_pallas as lp
            cap = _pad4(max(len(b) for b in blocks))
            arr, lens = _to_i32_layout(blocks, cap, lp.PAD)
            out, out_lens, err = lp.decompress_safe_pallas(
                arr, lens, max_dest_len, interpret=(mode == "interpret"))
            codes = np.asarray(err)
            if codes.any():
                bad = int(np.nonzero(codes)[0][0])
                raise Lz4Error(f"Malformed input in block {bad}")
            return _from_i32_layout(out, out_lens)
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
        """uint8[N, L], int32[N] -> uint32[N] on device.

        Uniform-length batches (L % 32 == 0, all lengths == L) route to the
        Mosaic tile kernel (kernels/xxhash_pallas.py) on accelerator
        backends, padding N up to the kernel's 1024-block tile; ragged
        batches use the general pure-JAX kernel.
        """
        mode = _mosaic_mode()
        data = np.asarray(data)
        lens = np.asarray(lengths)
        n, l = data.shape
        uniform = (l >= 32 and l % 32 == 0 and bool((lens == l).all()))
        if mode is not None and uniform and n > 0:
            from ..kernels.xxhash_pallas import (
                TILE, to_tile_layout_np, xxh32_words_pallas)
            n_pad = ((n + TILE - 1) // TILE) * TILE
            if n_pad != n:
                data = np.concatenate(
                    [data, np.zeros((n_pad - n, l), np.uint8)], axis=0)
            words = to_tile_layout_np(data)
            h = xxh32_words_pallas(words, l, int(seed) & 0xFFFFFFFF,
                                   interpret=(mode == "interpret"))
            return h[:n]
        return xxh32_batch(data, lens, int(seed) & 0xFFFFFFFF)


class XXH64(XXHash64):
    def hash(self, buf, off, length, seed):
        _check_range(buf, off, length)
        cap = max(8, (length + 7) & ~7)
        arr = np.zeros((1, cap), np.uint8)
        arr[0, :length] = np.frombuffer(bytes(buf[off:off + length]), np.uint8)
        h = xxh64_batch_py(arr, np.array([length], np.int32),
                           int(seed) & 0xFFFFFFFFFFFFFFFF)
        return _s64(h[0])

    def hash_batch(self, data, lengths, seed=0):
        """uint8[N, L], int32[N] -> (hi, lo) uint32[N] pair on device.

        Mirror of XXH32.hash_batch for the 64-bit hash (VERDICT r3 #4):
        uniform-length batches (L % 64 == 0, all lengths == L) route to the
        Mosaic tile kernel (kernels/xxhash64_pallas.py) on accelerator
        backends, padding N up to the kernel's 1024-block tile; ragged
        batches use the general pure-JAX kernel. 64-bit lanes are (hi, lo)
        uint32 pairs — TPUs have no native int64; combine host-side with
        ``(int(hi) << 32) | int(lo)``.
        """
        mode = _mosaic_mode()
        data = np.asarray(data)
        lens = np.asarray(lengths)
        n, l = data.shape
        uniform = (l >= 64 and l % 64 == 0 and bool((lens == l).all()))
        if mode is not None and uniform and n > 0:
            from ..kernels.xxhash64_pallas import xxh64_words_pallas
            from ..kernels.xxhash_pallas import TILE, to_tile_layout_np
            n_pad = ((n + TILE - 1) // TILE) * TILE
            if n_pad != n:
                data = np.concatenate(
                    [data, np.zeros((n_pad - n, l), np.uint8)], axis=0)
            words = to_tile_layout_np(data)
            hi, lo = xxh64_words_pallas(
                words, l, int(seed) & 0xFFFFFFFFFFFFFFFF,
                interpret=(mode == "interpret"))
            return hi[:n], lo[:n]
        from ..kernels.xxhash_jax import xxh64_batch
        return xxh64_batch(data, lens, int(seed) & 0xFFFFFFFFFFFFFFFF)


class StreamingXXH32(StreamingXXHash32):
    """Device-resident streaming hash.

    The state (v1..v4, <16B remainder, 64-bit total length) lives as device
    arrays; full chunks advance through ``lax.scan`` and ragged tails through
    a dynamic-trip stripe loop (kernels/xxhash_stream.py) — the TPU-native
    analog of the reference state machine
    (``xxhash32_streaming.template:26-139``). ``get_value`` is a
    non-destructive jitted digest.
    """

    def __init__(self, seed: int):
        super().__init__(seed)
        from ..kernels import xxhash_stream as _xs
        self._xs = _xs
        self._state = _xs.stream32_init(seed)

    def update(self, buf, off: int = 0, length: int | None = None):
        if length is None:
            length = len(buf) - off
        _check_range(buf, off, length)
        self._state = self._xs.absorb_bytes32(
            self._state, bytes(buf[off:off + length]))

    def get_value(self) -> int:
        return _s32(self._xs.digest32(self._state))

    def reset(self) -> None:
        self._state = self._xs.stream32_init(self.seed)


class StreamingXXH64(StreamingXXHash64):
    """Device-resident streaming hash; 64-bit lanes as (hi, lo) uint32 pairs
    (TPUs have no native int64). See StreamingXXH32."""

    def __init__(self, seed: int):
        super().__init__(seed)
        from ..kernels import xxhash_stream as _xs
        self._xs = _xs
        self._state = _xs.stream64_init(seed)

    def update(self, buf, off: int = 0, length: int | None = None):
        if length is None:
            length = len(buf) - off
        _check_range(buf, off, length)
        self._state = self._xs.absorb_bytes64(
            self._state, bytes(buf[off:off + length]))

    def get_value(self) -> int:
        return _s64(self._xs.digest64(self._state))

    def reset(self) -> None:
        self._state = self._xs.stream64_init(self.seed)
