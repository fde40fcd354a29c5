"""ctypes bindings for the native C++ library.

The Python side of the native boundary — the counterpart of the reference's
JNI wrapper classes (``LZ4JNI.java:35-40``, ``XXHashJNI.java:31-44``).
"""

from __future__ import annotations

import ctypes
import threading

from .build import build

_lib = None
_lib_lock = threading.Lock()

_c_u8p = ctypes.POINTER(ctypes.c_uint8)

E_DEST_TOO_SMALL = -1
E_MALFORMED = -2
E_PARAM = -3
E_FRAME = -4
E_CHECKSUM = -5
E_FRAME_VERSION = -6
E_FRAME_DEPENDENT = -7
E_FRAME_RESERVED = -8
E_FRAME_BLOCKSIZE = -9
E_FRAME_BLOCK_TOO_BIG = -10
E_FRAME_DICTID = -11


def load():
    """Build (if needed) and load the shared library; cached singleton."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        path = build()
        lib = ctypes.CDLL(str(path))

        lib.tpulz4_compress_fast.restype = ctypes.c_int
        lib.tpulz4_compress_fast.argtypes = [_c_u8p, ctypes.c_int, _c_u8p, ctypes.c_int]
        lib.tpulz4_compress_turbo.restype = ctypes.c_int
        lib.tpulz4_compress_turbo.argtypes = [_c_u8p, ctypes.c_int, _c_u8p,
                                              ctypes.c_int]
        # dictionary-prefix compressor (hist bytes valid before src)
        lib.tpulz4_compress_fast_ext.restype = ctypes.c_int
        lib.tpulz4_compress_fast_ext.argtypes = [
            _c_u8p, ctypes.c_int, ctypes.c_int, _c_u8p, ctypes.c_int]
        lib.tpulz4_compress_turbo_probe.restype = ctypes.c_int
        lib.tpulz4_compress_turbo_probe.argtypes = [_c_u8p, ctypes.c_int,
                                                    _c_u8p, ctypes.c_int,
                                                    ctypes.c_int]
        lib.tpulz4_compress_hc.restype = ctypes.c_int
        lib.tpulz4_compress_hc.argtypes = [_c_u8p, ctypes.c_int, _c_u8p, ctypes.c_int,
                                           ctypes.c_int]
        lib.tpulz4_decompress_safe.restype = ctypes.c_int
        lib.tpulz4_decompress_safe.argtypes = [_c_u8p, ctypes.c_int, _c_u8p, ctypes.c_int]
        # history-extended decoder (linked-block frames, decode-only opt-in)
        lib.tpulz4_decompress_safe_ext.restype = ctypes.c_int
        lib.tpulz4_decompress_safe_ext.argtypes = [
            _c_u8p, ctypes.c_int, _c_u8p, ctypes.c_int, ctypes.c_int]
        lib.tpulz4_decompress_fast.restype = ctypes.c_int
        lib.tpulz4_decompress_fast.argtypes = [_c_u8p, ctypes.c_int, _c_u8p, ctypes.c_int]
        lib.tpulz4_max_compressed_length.restype = ctypes.c_int
        lib.tpulz4_max_compressed_length.argtypes = [ctypes.c_int]
        lib.tpulz4_release_scratch.restype = None
        lib.tpulz4_release_scratch.argtypes = []

        lib.tpulz4_xxh32.restype = ctypes.c_uint32
        lib.tpulz4_xxh32.argtypes = [_c_u8p, ctypes.c_int64, ctypes.c_uint32]
        lib.tpulz4_xxh64.restype = ctypes.c_uint64
        lib.tpulz4_xxh64.argtypes = [_c_u8p, ctypes.c_int64, ctypes.c_uint64]

        lib.tpulz4_xxh32_create.restype = ctypes.c_void_p
        lib.tpulz4_xxh32_create.argtypes = [ctypes.c_uint32]
        lib.tpulz4_xxh32_reset.argtypes = [ctypes.c_void_p]
        lib.tpulz4_xxh32_update.argtypes = [ctypes.c_void_p, _c_u8p, ctypes.c_int64]
        lib.tpulz4_xxh32_digest.restype = ctypes.c_uint32
        lib.tpulz4_xxh32_digest.argtypes = [ctypes.c_void_p]
        lib.tpulz4_xxh32_free.argtypes = [ctypes.c_void_p]

        lib.tpulz4_xxh64_create.restype = ctypes.c_void_p
        lib.tpulz4_xxh64_create.argtypes = [ctypes.c_uint64]
        lib.tpulz4_xxh64_reset.argtypes = [ctypes.c_void_p]
        lib.tpulz4_xxh64_update.argtypes = [ctypes.c_void_p, _c_u8p, ctypes.c_int64]
        lib.tpulz4_xxh64_digest.restype = ctypes.c_uint64
        lib.tpulz4_xxh64_digest.argtypes = [ctypes.c_void_p]
        lib.tpulz4_xxh64_free.argtypes = [ctypes.c_void_p]

        _i64p = ctypes.POINTER(ctypes.c_int64)
        _i32p = ctypes.POINTER(ctypes.c_int32)
        lib.tpulz4_compress_fast_batch.argtypes = [
            _c_u8p, _i64p, _i32p, _c_u8p, _i64p, ctypes.c_int32,
            _i32p, ctypes.c_int32, ctypes.c_int32]
        lib.tpulz4_compress_turbo_batch.argtypes = [
            _c_u8p, _i64p, _i32p, _c_u8p, _i64p, ctypes.c_int32,
            _i32p, ctypes.c_int32, ctypes.c_int32]
        lib.tpulz4_compress_hc_batch.argtypes = [
            _c_u8p, _i64p, _i32p, _c_u8p, _i64p, ctypes.c_int32,
            _i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]
        lib.tpulz4_decompress_safe_batch.argtypes = [
            _c_u8p, _i64p, _i32p, _c_u8p, _i64p, ctypes.c_int32,
            _i32p, ctypes.c_int32, ctypes.c_int32]

        lib.tpulz4_parse_sequences.restype = ctypes.c_int
        lib.tpulz4_parse_sequences.argtypes = [
            _c_u8p, ctypes.c_int, ctypes.c_int,
            _i32p, _i32p, _i32p, _i32p, _i32p, _i32p, _i32p]
        lib.tpulz4_parse_sequences_batch.argtypes = [
            _c_u8p, _i64p, _i32p, ctypes.c_int32,
            _i32p, _i32p, _i32p, _i32p, _i32p, _i32p,
            _i32p, _i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32]

        lib.tpulz4_frame_compress_bound.restype = ctypes.c_int64
        lib.tpulz4_frame_compress_bound.argtypes = [ctypes.c_int64,
                                                    ctypes.c_int32]
        lib.tpulz4_frame_compress.restype = ctypes.c_int64
        lib.tpulz4_frame_compress.argtypes = [
            _c_u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, _c_u8p, ctypes.c_int64, ctypes.c_int32]
        lib.tpulz4_frame_decompress.restype = ctypes.c_int64
        lib.tpulz4_frame_decompress.argtypes = [
            _c_u8p, ctypes.c_int64, _c_u8p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _i64p]

        lib.tpulz4_blockstream_compress_bound.restype = ctypes.c_int64
        lib.tpulz4_blockstream_compress_bound.argtypes = [ctypes.c_int64,
                                                          ctypes.c_int32]
        lib.tpulz4_blockstream_compress.restype = ctypes.c_int64
        lib.tpulz4_blockstream_compress.argtypes = [
            _c_u8p, ctypes.c_int64, ctypes.c_int32,
            _c_u8p, ctypes.c_int64, ctypes.c_int32]
        lib.tpulz4_blockstream_decompress.restype = ctypes.c_int64
        lib.tpulz4_blockstream_decompress.argtypes = [
            _c_u8p, ctypes.c_int64, _c_u8p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, _i64p]

        lib.tpulz4_version.restype = ctypes.c_char_p

        _lib = lib
        return lib


def is_loaded() -> bool:
    return _lib is not None


def as_u8p(buf) -> "_c_u8p":
    """View a readable buffer as uint8*, zero-copy."""
    c = (ctypes.c_uint8 * len(buf)).from_buffer_copy(buf) if isinstance(buf, bytes) \
        else (ctypes.c_uint8 * len(buf)).from_buffer(buf)
    return ctypes.cast(c, _c_u8p)


def readonly_u8p(buf):
    """uint8* view for read-only use. Zero-copy for bytes via cast."""
    if isinstance(buf, memoryview):
        buf = bytes(buf) if buf.readonly else buf
    if isinstance(buf, bytes):
        return ctypes.cast(ctypes.c_char_p(buf), _c_u8p)
    return as_u8p(buf)


def writable_u8p(buf):
    """uint8* view over a mutable buffer (bytearray / writable memoryview)."""
    c = (ctypes.c_uint8 * len(buf)).from_buffer(buf)
    return ctypes.cast(c, _c_u8p)
