"""The "native" tier: codec instances backed by the C++ shared library.

The counterpart of lz4-java's JNI implementation family
(``LZ4JNICompressor.java``, ``XXHash32JNI.java``,
``StreamingXXHash32JNI.java:40-89``): range checks in Python, hot loops in
C++, handle-based streaming state with an explicit close + use-after-free
guard.
"""

from __future__ import annotations

import ctypes
import threading

from ..core.constants import DEFAULT_COMPRESSION_LEVEL, max_compressed_length
from ..core.errors import Lz4Error
from ..native import bindings
from .abstract import (
    Lz4Compressor, Lz4FastDecompressor, Lz4SafeDecompressor,
    StreamingXXHash32, StreamingXXHash64, XXHash32, XXHash64,
)

_lib = bindings.load()

_U8P = ctypes.POINTER(ctypes.c_uint8)


def _base_addr(buf):
    """(address, keepalive) for a readable buffer; zero-copy where possible."""
    if isinstance(buf, bytes):
        keep = ctypes.c_char_p(buf)
        return ctypes.cast(keep, ctypes.c_void_p).value, (buf, keep)
    if isinstance(buf, memoryview):
        if not buf.contiguous:
            buf = memoryview(bytes(buf))
        if buf.readonly:
            # numpy's buffer view is zero-copy even for read-only sources
            import numpy as np
            arr = np.frombuffer(buf, np.uint8)
            return arr.ctypes.data, (buf, arr)
        arr = (ctypes.c_uint8 * buf.nbytes).from_buffer(buf)
        return ctypes.addressof(arr), (buf, arr)
    arr = (ctypes.c_uint8 * len(buf)).from_buffer(buf)
    return ctypes.addressof(arr), (buf, arr)


def _wbase_addr(buf):
    """(address, keepalive) for a writable buffer."""
    if isinstance(buf, memoryview):
        if buf.readonly:
            raise TypeError("dest buffer is read-only")
        buf = buf.obj if isinstance(buf.obj, bytearray) and buf.nbytes == len(buf.obj) else buf
    arr = (ctypes.c_uint8 * len(buf)).from_buffer(buf)
    return ctypes.addressof(arr), (buf, arr)


def _ptr(addr, off):
    return ctypes.cast(ctypes.c_void_p(addr + off), _U8P)


def _check_range(buf, off, length):
    if length < 0:
        raise ValueError("lengths must be >= 0")
    if length > 0 and (off < 0 or off + length > len(buf)):
        raise IndexError(f"range [{off}, {off + length}) out of bounds for length {len(buf)}")


def _raise_error(code: int, what: str):
    if code == bindings.E_DEST_TOO_SMALL:
        raise Lz4Error(f"maxDestLen is too small ({what})")
    if code == bindings.E_MALFORMED:
        raise Lz4Error(f"Malformed input ({what})")
    raise Lz4Error(f"native error {code} ({what})")


class FastCompressor(Lz4Compressor):
    def compress(self, src, src_off, src_len, dest, dest_off, max_dest_len):
        _check_range(src, src_off, src_len)
        _check_range(dest, dest_off, max_dest_len)
        s_addr, s_keep = _base_addr(src)
        d_addr, d_keep = _wbase_addr(dest)
        n = _lib.tpulz4_compress_fast(
            _ptr(s_addr, src_off), src_len, _ptr(d_addr, dest_off), max_dest_len)
        del s_keep, d_keep
        if n < 0:
            _raise_error(n, "compress_fast")
        return n


class TurboCompressor(Lz4Compressor):
    """Opt-in modern-heuristic fast compressor (native tier only).

    Valid LZ4 block output, decodable by every tier, but NOT byte-identical
    to the reference algorithm on inputs > 64KB: the general path uses a
    5-byte-hash match finder (``tpulz4.cpp compress_turbo_general``) that
    compresses smaller AND faster than the reference heuristic — the same
    freedom the reference's own JNI tier takes by calling modern
    ``LZ4_compress_default`` (``net_jpountz_lz4_LZ4JNI.c:75``), whose bytes
    also differ from its Java tiers. Inputs < 64KB route to the identical
    64k path (byte-equal to ``fast_compressor()``). Measured pareto vs
    liblz4 1.9.4 in docs/PERF.md.
    """

    def compress(self, src, src_off, src_len, dest, dest_off, max_dest_len):
        _check_range(src, src_off, src_len)
        _check_range(dest, dest_off, max_dest_len)
        s_addr, s_keep = _base_addr(src)
        d_addr, d_keep = _wbase_addr(dest)
        n = _lib.tpulz4_compress_turbo(
            _ptr(s_addr, src_off), src_len, _ptr(d_addr, dest_off), max_dest_len)
        del s_keep, d_keep
        if n < 0:
            _raise_error(n, "compress_turbo")
        return n


class HighCompressor(Lz4Compressor):
    def __init__(self, level: int = DEFAULT_COMPRESSION_LEVEL):
        self.level = level

    def compress(self, src, src_off, src_len, dest, dest_off, max_dest_len):
        _check_range(src, src_off, src_len)
        _check_range(dest, dest_off, max_dest_len)
        s_addr, s_keep = _base_addr(src)
        d_addr, d_keep = _wbase_addr(dest)
        n = _lib.tpulz4_compress_hc(
            _ptr(s_addr, src_off), src_len, _ptr(d_addr, dest_off), max_dest_len,
            self.level)
        del s_keep, d_keep
        if n < 0:
            _raise_error(n, "compress_hc")
        return n

    def __repr__(self):
        return f"{type(self).__name__}(level={self.level})"


class FastDecompressor(Lz4FastDecompressor):
    def decompress(self, src, src_off, dest, dest_off, dest_len):
        if src_off < 0 or src_off >= len(src):
            raise IndexError(f"src_off {src_off} out of bounds")
        _check_range(dest, dest_off, dest_len)
        s_addr, s_keep = _base_addr(src)
        d_addr, d_keep = _wbase_addr(dest)
        n = _lib.tpulz4_decompress_fast(
            _ptr(s_addr, src_off), len(src) - src_off, _ptr(d_addr, dest_off), dest_len)
        del s_keep, d_keep
        if n < 0:
            _raise_error(n, "decompress_fast")
        return n


class SafeDecompressor(Lz4SafeDecompressor):
    def decompress(self, src, src_off, src_len, dest, dest_off, max_dest_len):
        _check_range(src, src_off, src_len)
        _check_range(dest, dest_off, max_dest_len)
        s_addr, s_keep = _base_addr(src)
        d_addr, d_keep = _wbase_addr(dest)
        n = _lib.tpulz4_decompress_safe(
            _ptr(s_addr, src_off), src_len, _ptr(d_addr, dest_off), max_dest_len)
        del s_keep, d_keep
        if n < 0:
            _raise_error(n, "decompress_safe")
        return n


def compress_fast_packed(src, block_size, n_threads=None, dest=None,
                         turbo=False):
    """Compress a contiguous buffer split into fixed-size blocks, zero-copy.

    The throughput entry point: one ctypes call, no per-block Python objects.
    The last block may be short. Returns ``(comp, offsets, lens)`` where
    ``comp`` is a packed bytearray with each block's output at
    ``offsets[i] : offsets[i] + lens[i]`` (stride = maxCompressedLength).
    ``turbo=True`` opts in to the modern-heuristic compressor (see
    :class:`TurboCompressor`) — only differs for blocks > 64KB.
    """
    import os
    import numpy as np
    total = len(src)
    if total == 0:
        return bytearray(), np.zeros(0, np.int64), np.zeros(0, np.int32)
    n = (total + block_size - 1) // block_size
    n_threads = n_threads or min(os.cpu_count() or 1, n)
    src_offsets = np.arange(n, dtype=np.int64) * block_size
    src_lens = np.full(n, block_size, np.int32)
    src_lens[-1] = total - (n - 1) * block_size
    cap = max_compressed_length(block_size)
    if dest is None:
        dest = bytearray(n * cap)
    elif len(dest) < n * cap:
        raise ValueError(f"dest too small: need {n * cap}, got {len(dest)}")
    dest_offsets = np.arange(n, dtype=np.int64) * cap
    out_lens = np.zeros(n, np.int32)
    s_addr, s_keep = _base_addr(src)
    d_addr, d_keep = _wbase_addr(dest)
    _i64p = ctypes.POINTER(ctypes.c_int64)
    _i32p = ctypes.POINTER(ctypes.c_int32)
    batch_fn = (_lib.tpulz4_compress_turbo_batch if turbo
                else _lib.tpulz4_compress_fast_batch)
    batch_fn(
        _ptr(s_addr, 0), src_offsets.ctypes.data_as(_i64p),
        src_lens.ctypes.data_as(_i32p), _ptr(d_addr, 0),
        dest_offsets.ctypes.data_as(_i64p), cap,
        out_lens.ctypes.data_as(_i32p), n, n_threads)
    del s_keep, d_keep
    if (out_lens < 0).any():
        _raise_error(int(out_lens[out_lens < 0][0]), "compress_fast_packed")
    return dest, dest_offsets, out_lens


def compress_hc_packed(src, block_size, level=DEFAULT_COMPRESSION_LEVEL,
                       n_threads=None, dest=None):
    """HC variant of :func:`compress_fast_packed` (levels 1-17)."""
    import os
    import numpy as np
    total = len(src)
    if total == 0:
        return bytearray(), np.zeros(0, np.int64), np.zeros(0, np.int32)
    n = (total + block_size - 1) // block_size
    n_threads = n_threads or min(os.cpu_count() or 1, n)
    src_offsets = np.arange(n, dtype=np.int64) * block_size
    src_lens = np.full(n, block_size, np.int32)
    src_lens[-1] = total - (n - 1) * block_size
    cap = max_compressed_length(block_size)
    if dest is None:
        dest = bytearray(n * cap)
    elif len(dest) < n * cap:
        raise ValueError(f"dest too small: need {n * cap}, got {len(dest)}")
    dest_offsets = np.arange(n, dtype=np.int64) * cap
    out_lens = np.zeros(n, np.int32)
    s_addr, s_keep = _base_addr(src)
    d_addr, d_keep = _wbase_addr(dest)
    _i64p = ctypes.POINTER(ctypes.c_int64)
    _i32p = ctypes.POINTER(ctypes.c_int32)
    _lib.tpulz4_compress_hc_batch(
        _ptr(s_addr, 0), src_offsets.ctypes.data_as(_i64p),
        src_lens.ctypes.data_as(_i32p), _ptr(d_addr, 0),
        dest_offsets.ctypes.data_as(_i64p), cap,
        out_lens.ctypes.data_as(_i32p), n, n_threads, level)
    del s_keep, d_keep
    if (out_lens < 0).any():
        _raise_error(int(out_lens[out_lens < 0][0]), "compress_hc_packed")
    return dest, dest_offsets, out_lens


def decompress_safe_packed(comp, comp_offsets, comp_lens, out_max,
                           n_threads=None, dest=None):
    """Decompress packed blocks into one contiguous buffer, zero-copy.

    ``comp`` holds block i at ``comp_offsets[i] : + comp_lens[i]``; output
    block i lands at ``i * out_max``. Returns ``(dest, out_lens)``.
    """
    import os
    import numpy as np
    n = len(comp_lens)
    if n == 0:
        return bytearray(), np.zeros(0, np.int32)
    n_threads = n_threads or min(os.cpu_count() or 1, n)
    comp_offsets = np.ascontiguousarray(comp_offsets, np.int64)
    comp_lens = np.ascontiguousarray(comp_lens, np.int32)
    if dest is None:
        dest = bytearray(n * out_max)
    elif len(dest) < n * out_max:
        raise ValueError(f"dest too small: need {n * out_max}, got {len(dest)}")
    dest_offsets = np.arange(n, dtype=np.int64) * out_max
    out_lens = np.zeros(n, np.int32)
    s_addr, s_keep = _base_addr(comp)
    d_addr, d_keep = _wbase_addr(dest)
    _i64p = ctypes.POINTER(ctypes.c_int64)
    _i32p = ctypes.POINTER(ctypes.c_int32)
    _lib.tpulz4_decompress_safe_batch(
        _ptr(s_addr, 0), comp_offsets.ctypes.data_as(_i64p),
        comp_lens.ctypes.data_as(_i32p), _ptr(d_addr, 0),
        dest_offsets.ctypes.data_as(_i64p), out_max,
        out_lens.ctypes.data_as(_i32p), n, n_threads)
    del s_keep, d_keep
    if (out_lens < 0).any():
        _raise_error(int(out_lens[out_lens < 0][0]), "decompress_safe_packed")
    return dest, out_lens


def compress_fast_batch(blocks, n_threads=None):
    """Compress many blocks via the multithreaded C++ batch entry point.

    Host-side data-plane counterpart of the device batch API: one contiguous
    packed source buffer, per-block offsets, worker threads striding the
    block list (tpulz4_compress_fast_batch).
    """
    import os
    import numpy as np
    if not blocks:
        return []
    n = len(blocks)
    n_threads = n_threads or min(os.cpu_count() or 1, n)
    src = b"".join(blocks)
    src_offsets = np.zeros(n, np.int64)
    src_lens = np.zeros(n, np.int32)
    pos = 0
    for i, b in enumerate(blocks):
        src_offsets[i] = pos
        src_lens[i] = len(b)
        pos += len(b)
    cap = max_compressed_length(int(src_lens.max()) if n else 0)
    dest = bytearray(n * cap)
    dest_offsets = (np.arange(n, dtype=np.int64) * cap)
    out_lens = np.zeros(n, np.int32)
    s_addr, s_keep = _base_addr(src)
    d_addr, d_keep = _wbase_addr(dest)
    _i64p = ctypes.POINTER(ctypes.c_int64)
    _i32p = ctypes.POINTER(ctypes.c_int32)
    _lib.tpulz4_compress_fast_batch(
        _ptr(s_addr, 0), src_offsets.ctypes.data_as(_i64p),
        src_lens.ctypes.data_as(_i32p), _ptr(d_addr, 0),
        dest_offsets.ctypes.data_as(_i64p), cap,
        out_lens.ctypes.data_as(_i32p), n, n_threads)
    del s_keep, d_keep
    if (out_lens < 0).any():
        _raise_error(int(out_lens[out_lens < 0][0]), "compress_fast_batch")
    return [bytes(dest[i * cap:i * cap + int(out_lens[i])]) for i in range(n)]


def decompress_safe_batch(blocks, out_max, n_threads=None):
    """Decompress many blocks via the multithreaded C++ batch entry point."""
    import os
    import numpy as np
    if not blocks:
        return []
    n = len(blocks)
    n_threads = n_threads or min(os.cpu_count() or 1, n)
    src = b"".join(blocks)
    src_offsets = np.zeros(n, np.int64)
    src_lens = np.zeros(n, np.int32)
    pos = 0
    for i, b in enumerate(blocks):
        src_offsets[i] = pos
        src_lens[i] = len(b)
        pos += len(b)
    dest = bytearray(n * out_max)
    dest_offsets = (np.arange(n, dtype=np.int64) * out_max)
    out_lens = np.zeros(n, np.int32)
    s_addr, s_keep = _base_addr(src)
    d_addr, d_keep = _wbase_addr(dest)
    _i64p = ctypes.POINTER(ctypes.c_int64)
    _i32p = ctypes.POINTER(ctypes.c_int32)
    _lib.tpulz4_decompress_safe_batch(
        _ptr(s_addr, 0), src_offsets.ctypes.data_as(_i64p),
        src_lens.ctypes.data_as(_i32p), _ptr(d_addr, 0),
        dest_offsets.ctypes.data_as(_i64p), out_max,
        out_lens.ctypes.data_as(_i32p), n, n_threads)
    del s_keep, d_keep
    if (out_lens < 0).any():
        _raise_error(int(out_lens[out_lens < 0][0]), "decompress_safe_batch")
    return [bytes(dest[i * out_max:i * out_max + int(out_lens[i])])
            for i in range(n)]


def _s32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _s64(v: int) -> int:
    v &= 0xFFFFFFFFFFFFFFFF
    return v - (1 << 64) if v >= (1 << 63) else v


class XXH32(XXHash32):
    def hash(self, buf, off, length, seed):
        _check_range(buf, off, length)
        addr, keep = _base_addr(buf)
        h = _lib.tpulz4_xxh32(_ptr(addr, off), length, seed & 0xFFFFFFFF)
        del keep
        return _s32(h)


class XXH64(XXHash64):
    def hash(self, buf, off, length, seed):
        _check_range(buf, off, length)
        addr, keep = _base_addr(buf)
        h = _lib.tpulz4_xxh64(_ptr(addr, off), length, seed & 0xFFFFFFFFFFFFFFFF)
        del keep
        return _s64(h)


class StreamingXXH32(StreamingXXHash32):
    """Holds a native state handle; methods are serialized and guarded
    against use-after-close (StreamingXXHash32JNI.java:40-89)."""

    def __init__(self, seed: int):
        super().__init__(seed)
        self._lock = threading.Lock()
        self._handle = _lib.tpulz4_xxh32_create(seed & 0xFFFFFFFF)

    def _check_state(self):
        if self._handle is None:
            raise Lz4Error("Already finalized")

    def update(self, buf, off: int = 0, length: int | None = None):
        if length is None:
            length = len(buf) - off
        _check_range(buf, off, length)
        with self._lock:
            self._check_state()
            addr, keep = _base_addr(buf)
            _lib.tpulz4_xxh32_update(self._handle, _ptr(addr, off), length)
            del keep

    def get_value(self) -> int:
        with self._lock:
            self._check_state()
            return _s32(_lib.tpulz4_xxh32_digest(self._handle))

    def reset(self) -> None:
        with self._lock:
            self._check_state()
            _lib.tpulz4_xxh32_reset(self._handle)

    def close(self) -> None:
        with self._lock:
            if self._handle is not None:
                _lib.tpulz4_xxh32_free(self._handle)
                self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class StreamingXXH64(StreamingXXHash64):
    def __init__(self, seed: int):
        super().__init__(seed)
        self._lock = threading.Lock()
        self._handle = _lib.tpulz4_xxh64_create(seed & 0xFFFFFFFFFFFFFFFF)

    def _check_state(self):
        if self._handle is None:
            raise Lz4Error("Already finalized")

    def update(self, buf, off: int = 0, length: int | None = None):
        if length is None:
            length = len(buf) - off
        _check_range(buf, off, length)
        with self._lock:
            self._check_state()
            addr, keep = _base_addr(buf)
            _lib.tpulz4_xxh64_update(self._handle, _ptr(addr, off), length)
            del keep

    def get_value(self) -> int:
        with self._lock:
            self._check_state()
            return _s64(_lib.tpulz4_xxh64_digest(self._handle))

    def reset(self) -> None:
        with self._lock:
            self._check_state()
            _lib.tpulz4_xxh64_reset(self._handle)

    def close(self) -> None:
        with self._lock:
            if self._handle is not None:
                _lib.tpulz4_xxh64_free(self._handle)
                self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---- one-shot frame codec (native runtime) ----

F_CONTENT_CHECKSUM = 1
F_BLOCK_CHECKSUM = 2
F_CONTENT_SIZE = 4


def _raise_frame_error(code: int, what: str):
    # messages match the pure-Python frame reader (tests pin the phrasing,
    # which itself mirrors LZ4FrameInputStream's errors)
    from ..core.errors import Lz4FrameError
    if code == bindings.E_FRAME:
        raise Lz4FrameError(f"Malformed frame ({what})")
    if code == bindings.E_CHECKSUM:
        raise Lz4FrameError(f"Checksum mismatch ({what})")
    if code == bindings.E_FRAME_VERSION:
        raise Lz4FrameError("Frame version is unsupported")
    if code == bindings.E_FRAME_DEPENDENT:
        raise Lz4FrameError(
            "Dependent block stream is unsupported "
            "(BLOCK_INDEPENDENCE must be set)")
    if code == bindings.E_FRAME_RESERVED:
        raise Lz4FrameError("Reserved bits/fields must be 0")
    if code == bindings.E_FRAME_BLOCKSIZE:
        raise Lz4FrameError("Block size must be 4-7")
    if code == bindings.E_FRAME_BLOCK_TOO_BIG:
        raise Lz4FrameError("Block size exceeded max block size")
    if code == bindings.E_FRAME_DICTID:
        raise Lz4FrameError(
            "Reserved bits must be 0 (bit 0 is DictID in frame spec "
            "v1.6+ — pass dictionary= to read dictionary frames)")
    _raise_error(code, what)


def compress_frame_packed(data, block_size_id: int = 7, flags: int = 0,
                          level: int = 0, n_threads=None, dest=None):
    """One native call: block-split, compress (threaded), assemble frame.

    ``level`` 0 = fast scan, 1..17 = HC, -1 = opt-in turbo heuristic (valid
    frame, not byte-identical to the reference algorithm for blocks > 64KB;
    see :class:`TurboCompressor`). ``flags`` is a bitmask of
    F_CONTENT_CHECKSUM / F_BLOCK_CHECKSUM / F_CONTENT_SIZE. Byte-identical
    to the Python frame writer with the same options (levels >= 0).
    Pass ``dest`` (a reusable writable buffer of at least
    ``tpulz4_frame_compress_bound``) to skip the per-call allocation and
    copy; the return is then a memoryview of ``dest``.
    """
    import os
    n_threads = n_threads or (os.cpu_count() or 1)
    bound = _lib.tpulz4_frame_compress_bound(len(data), block_size_id)
    if bound < 0:
        _raise_frame_error(int(bound), "frame_compress_bound")
    if dest is not None:
        # reusable-buffer path: no per-call allocation, no bytes copy (the
        # page-zeroing of a fresh ~1.04x-input bytearray plus the final
        # copy cost ~8% of a whole container compress — measured r5)
        if len(dest) < bound:
            raise ValueError(f"dest too small: need {bound}, got {len(dest)}")
        s_addr, s_keep = _base_addr(data)
        d_addr, d_keep = _wbase_addr(dest)
        n = _lib.tpulz4_frame_compress(
            _ptr(s_addr, 0), len(data), block_size_id, flags, level,
            _ptr(d_addr, 0), len(dest), n_threads)
        del s_keep, d_keep
        if n < 0:
            _raise_frame_error(int(n), "frame_compress")
        return memoryview(dest)[:int(n)]
    dest = bytearray(int(bound))
    s_addr, s_keep = _base_addr(data)
    d_addr, d_keep = _wbase_addr(dest)
    n = _lib.tpulz4_frame_compress(
        _ptr(s_addr, 0), len(data), block_size_id, flags, level,
        _ptr(d_addr, 0), len(dest), n_threads)
    del s_keep, d_keep
    if n < 0:
        _raise_frame_error(int(n), "frame_compress")
    del dest[int(n):]
    return bytes(dest)


def decompress_frame_packed(data, dest_cap: int | None = None,
                            single_frame: bool = False,
                            n_threads=None, dest=None,
                            allow_dependent: bool = False):
    """One native call: parse frame(s), threaded block decode, verify.

    Handles concatenated and skippable frames. Returns
    ``(bytes, consumed)``. Grows the output buffer and retries if the
    initial capacity guess is short. Pass ``dest`` (a reusable writable
    buffer) to skip the per-call allocation and the bytes copy — the
    return then is ``(memoryview_of_dest, consumed)``.

    ``allow_dependent=True`` additionally reads linked-block frames (the
    lz4 CLI's ``-BD`` mode) via a serial history-extended decode; the
    default refuses them, matching the reference
    (LZ4FrameOutputStream.java:361-363).
    """
    import os
    n_threads = n_threads or (os.cpu_count() or 1)
    dep = 1 if allow_dependent else 0
    consumed = ctypes.c_int64(0)
    if dest is not None:
        s_addr, s_keep = _base_addr(data)
        d_addr, d_keep = _wbase_addr(dest)
        n = _lib.tpulz4_frame_decompress(
            _ptr(s_addr, 0), len(data), _ptr(d_addr, 0), len(dest),
            n_threads, 1 if single_frame else 0, dep,
            ctypes.byref(consumed))
        del s_keep, d_keep
        if n < 0:
            _raise_frame_error(int(n), "frame_decompress")
        return memoryview(dest)[:int(n)], int(consumed.value)
    cap = dest_cap or max(4 * len(data), 1 << 20)
    # hard ceiling for the grow-retry: LZ4 expands at most ~255x, so a
    # frame that still reports DEST_TOO_SMALL past that bound is
    # malformed, not under-capacitated (r5 review #1: without the bound,
    # crafted input could drive this loop to OOM)
    cap_limit = 256 * max(len(data), 1) + (4 << 20)
    while True:
        dest = bytearray(cap)
        s_addr, s_keep = _base_addr(data)
        d_addr, d_keep = _wbase_addr(dest)
        n = _lib.tpulz4_frame_decompress(
            _ptr(s_addr, 0), len(data), _ptr(d_addr, 0), cap,
            n_threads, 1 if single_frame else 0, dep,
            ctypes.byref(consumed))
        del s_keep, d_keep
        if n == bindings.E_DEST_TOO_SMALL and dest_cap is None:
            if cap >= cap_limit:
                _raise_frame_error(bindings.E_MALFORMED, "frame_decompress")
            cap = min(cap * 4, cap_limit)
            continue
        if n < 0:
            _raise_frame_error(int(n), "frame_decompress")
        del dest[int(n):]
        return bytes(dest), int(consumed.value)


def compress_block_with_dict(data, dictionary) -> bytes:
    """Compress one block whose matches may reference the (≤64KB tail of
    the) dictionary — the write-side counterpart of
    :func:`decompress_block_with_history`. Output is a valid LZ4 block
    decodable by the history-extended decoder and by upstream LZ4
    usingDict; there is no byte-identity contract (the reference has no
    dictionary support at all)."""
    hist = bytes(dictionary)[-65536:]
    h = len(hist)
    buf = bytearray(h + len(data))
    buf[:h] = hist
    buf[h:] = data
    cap = max_compressed_length(len(data))
    dest = bytearray(cap)
    s_addr, s_keep = _wbase_addr(buf)
    d_addr, d_keep = _wbase_addr(dest)
    n = _lib.tpulz4_compress_fast_ext(
        _ptr(s_addr, h), len(data), h, _ptr(d_addr, 0), cap)
    del s_keep, d_keep
    if n < 0:
        _raise_error(int(n), "compress_block_with_dict")
    return bytes(dest[:int(n)])


def decompress_block_with_history(comp, out_max: int, history) -> bytes:
    """Decode one linked-mode block: matches may reference up to
    ``len(history)`` bytes of previously decoded output (64KB window).

    Places ``history`` immediately before the output region in one
    contiguous buffer and calls the history-extended native decoder.
    """
    h = len(history)
    buf = bytearray(h + out_max)
    buf[:h] = history
    s_addr, s_keep = _base_addr(comp)
    d_addr, d_keep = _wbase_addr(buf)
    n = _lib.tpulz4_decompress_safe_ext(
        _ptr(s_addr, 0), len(comp), _ptr(d_addr, h), out_max, h)
    del s_keep, d_keep
    if n < 0:
        _raise_error(int(n), "decompress_block_with_history")
    return bytes(buf[h:h + int(n)])


def compress_block_stream_packed(data, block_size: int = 1 << 16,
                                 n_threads=None, dest=None):
    """One native call: complete LZ4Block stream (blocks + end marker).

    Byte-identical to ``Lz4BlockOutputStream`` with default compressor and
    checksum (fast scan; xxh32 seed 0x9747b28c masked to 28 bits).
    Pass ``dest`` (a reusable writable buffer of at least the bound) to
    skip the per-call allocation and copy; the return is then a memoryview
    of ``dest``.
    """
    import os
    n_threads = n_threads or (os.cpu_count() or 1)
    bound = _lib.tpulz4_blockstream_compress_bound(len(data), block_size)
    if bound < 0:
        _raise_error(int(bound), "blockstream_compress_bound")
    reuse = dest is not None
    if reuse and len(dest) < bound:
        raise ValueError(f"dest too small: need {bound}, got {len(dest)}")
    if not reuse:
        dest = bytearray(int(bound))
    s_addr, s_keep = _base_addr(data)
    d_addr, d_keep = _wbase_addr(dest)
    n = _lib.tpulz4_blockstream_compress(
        _ptr(s_addr, 0), len(data), block_size, _ptr(d_addr, 0), len(dest),
        n_threads)
    del s_keep, d_keep
    if n < 0:
        _raise_frame_error(int(n), "blockstream_compress")
    if reuse:
        return memoryview(dest)[:int(n)]
    del dest[int(n):]
    return bytes(dest)


def decompress_block_stream_packed(data, dest_cap: int | None = None,
                                   stop_on_empty_block: bool = True,
                                   n_threads=None, dest=None):
    """One native call: decode an LZ4Block stream (threaded blocks,
    checksum verification). Returns ``(bytes, consumed)``; with a caller
    ``dest`` buffer the first element is a memoryview of it instead."""
    import os
    n_threads = n_threads or (os.cpu_count() or 1)
    consumed = ctypes.c_int64(0)
    if dest is not None:
        s_addr, s_keep = _base_addr(data)
        d_addr, d_keep = _wbase_addr(dest)
        n = _lib.tpulz4_blockstream_decompress(
            _ptr(s_addr, 0), len(data), _ptr(d_addr, 0), len(dest),
            n_threads, 1 if stop_on_empty_block else 0,
            ctypes.byref(consumed))
        del s_keep, d_keep
        if n < 0:
            _raise_frame_error(int(n), "blockstream_decompress")
        return memoryview(dest)[:int(n)], int(consumed.value)
    cap = dest_cap or max(4 * len(data), 1 << 20)
    # same grow-retry ceiling as decompress_frame_packed (LZ4 expands at
    # most ~255x; a stream claiming more is malformed)
    cap_limit = 256 * max(len(data), 1) + (4 << 20)
    while True:
        dest = bytearray(cap)
        s_addr, s_keep = _base_addr(data)
        d_addr, d_keep = _wbase_addr(dest)
        n = _lib.tpulz4_blockstream_decompress(
            _ptr(s_addr, 0), len(data), _ptr(d_addr, 0), cap, n_threads,
            1 if stop_on_empty_block else 0, ctypes.byref(consumed))
        del s_keep, d_keep
        if n == bindings.E_DEST_TOO_SMALL and dest_cap is None:
            if cap >= cap_limit:
                _raise_frame_error(bindings.E_MALFORMED,
                                   "blockstream_decompress")
            cap = min(cap * 4, cap_limit)
            continue
        if n < 0:
            _raise_frame_error(int(n), "blockstream_decompress")
        del dest[int(n):]
        return bytes(dest), int(consumed.value)
