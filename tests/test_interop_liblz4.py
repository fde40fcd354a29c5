"""Interoperability against the system liblz4 (upstream C implementation).

The reference gates interop tests on a system ``lz4`` CLI being present
(LZ4FrameIOStreamTest.java:428-523, hasNativeLz4CLI at :482-486). This image
has no CLI but ships ``liblz4.so.1`` (upstream 1.9.4); driving its block and
frame APIs through ctypes is the same cross-implementation contract: bytes
we produce must decode with upstream, and bytes upstream produces must
decode with us.
"""

import ctypes
import ctypes.util
import random

import pytest

from lz4_tpu import Lz4Factory
from lz4_tpu.core.constants import max_compressed_length
from lz4_tpu.formats import frame
from lz4_tpu.formats.frame import BlockSize, FrameFlag


def _load_liblz4():
    for name in ("liblz4.so.1", "liblz4.so",
                 ctypes.util.find_library("lz4") or ""):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


_LIB = _load_liblz4()
pytestmark = pytest.mark.skipif(_LIB is None, reason="system liblz4 absent")

if _LIB is not None:
    _LIB.LZ4_compress_default.restype = ctypes.c_int
    _LIB.LZ4_compress_default.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                          ctypes.c_int, ctypes.c_int]
    _LIB.LZ4_compress_HC.restype = ctypes.c_int
    _LIB.LZ4_compress_HC.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_int, ctypes.c_int, ctypes.c_int]
    _LIB.LZ4_decompress_safe.restype = ctypes.c_int
    _LIB.LZ4_decompress_safe.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                         ctypes.c_int, ctypes.c_int]
    _LIB.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    _LIB.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t, ctypes.c_void_p]
    _LIB.LZ4F_compressFrame.restype = ctypes.c_size_t
    _LIB.LZ4F_isError.restype = ctypes.c_uint
    _LIB.LZ4F_isError.argtypes = [ctypes.c_size_t]


class _FrameInfo(ctypes.Structure):
    _fields_ = [("blockSizeID", ctypes.c_int),
                ("blockMode", ctypes.c_int),
                ("contentChecksumFlag", ctypes.c_int),
                ("frameType", ctypes.c_int),
                ("contentSize", ctypes.c_ulonglong),
                ("dictID", ctypes.c_uint),
                ("blockChecksumFlag", ctypes.c_int)]


class _Preferences(ctypes.Structure):
    _fields_ = [("frameInfo", _FrameInfo),
                ("compressionLevel", ctypes.c_int),
                ("autoFlush", ctypes.c_uint),
                ("favorDecSpeed", ctypes.c_uint),
                ("reserved", ctypes.c_uint * 3)]


_LZ4F_VERSION = 100


def _ref_block_compress(data: bytes, hc: int | None = None) -> bytes:
    cap = max_compressed_length(len(data))
    dst = ctypes.create_string_buffer(cap)
    if hc is None:
        n = _LIB.LZ4_compress_default(data, dst, len(data), cap)
    else:
        n = _LIB.LZ4_compress_HC(data, dst, len(data), cap, hc)
    assert n > 0
    return dst.raw[:n]


def _ref_block_decompress(comp: bytes, out_len: int) -> bytes:
    dst = ctypes.create_string_buffer(max(out_len, 1))
    n = _LIB.LZ4_decompress_safe(comp, dst, len(comp), out_len)
    assert n >= 0, f"upstream decode error {n}"
    return dst.raw[:n]


def _ref_frame_compress(data: bytes, content_checksum=True,
                        block_size_id=4, block_checksum=False,
                        content_size=False) -> bytes:
    prefs = _Preferences()
    prefs.frameInfo.blockSizeID = block_size_id   # 4 = 64KB ... 7 = 4MB
    prefs.frameInfo.blockMode = 1                 # independent blocks
    prefs.frameInfo.contentChecksumFlag = 1 if content_checksum else 0
    prefs.frameInfo.blockChecksumFlag = 1 if block_checksum else 0
    if content_size:
        prefs.frameInfo.contentSize = len(data)
    bound = _LIB.LZ4F_compressFrameBound(len(data), ctypes.byref(prefs))
    dst = ctypes.create_string_buffer(bound)
    n = _LIB.LZ4F_compressFrame(dst, bound, data, len(data),
                                ctypes.byref(prefs))
    assert not _LIB.LZ4F_isError(n)
    return dst.raw[:n]


def _ref_frame_decompress(comp: bytes, expect_len: int) -> bytes:
    ctx = ctypes.c_void_p()
    err = _LIB.LZ4F_createDecompressionContext(ctypes.byref(ctx),
                                               _LZ4F_VERSION)
    assert not _LIB.LZ4F_isError(err)
    try:
        out = bytearray()
        dst_cap = max(expect_len + 64, 1 << 16)
        dst = ctypes.create_string_buffer(dst_cap)
        src_pos = 0
        while src_pos < len(comp):
            dst_size = ctypes.c_size_t(dst_cap)
            src_size = ctypes.c_size_t(len(comp) - src_pos)
            r = _LIB.LZ4F_decompress(ctx, dst, ctypes.byref(dst_size),
                                     comp[src_pos:], ctypes.byref(src_size),
                                     None)
            assert not _LIB.LZ4F_isError(r), f"LZ4F_decompress error {r}"
            out += dst.raw[:dst_size.value]
            src_pos += src_size.value
            if r == 0:
                break
        return bytes(out)
    finally:
        _LIB.LZ4F_freeDecompressionContext(ctx)


@pytest.fixture(scope="module")
def corpus(calgary):
    return calgary["book1"][:200000]


# ---- block-format interop ----

def test_upstream_decodes_our_blocks(corpus):
    f = Lz4Factory.fastest_instance()
    for data in (corpus[:65536], corpus[:300], b"", b"\x00" * 5000):
        comp = f.fast_compressor().compress_alloc(data)
        assert _ref_block_decompress(bytes(comp), len(data)) == data


def test_we_decode_upstream_blocks(corpus):
    f = Lz4Factory.fastest_instance()
    for data in (corpus[:65536], corpus[:300], b"\xffzz" * 7777):
        comp = _ref_block_compress(data)
        out = f.safe_decompressor().decompress_alloc(comp, 0, len(comp),
                                                     len(data) + 8)
        assert bytes(out) == data


def test_we_decode_upstream_hc_blocks(corpus):
    f = Lz4Factory.fastest_instance()
    for level in (1, 9, 12):
        comp = _ref_block_compress(corpus[:65536], hc=level)
        out = f.safe_decompressor().decompress_alloc(comp, 0, len(comp),
                                                     65536 + 8)
        assert bytes(out) == corpus[:65536]


def test_upstream_decodes_our_hc_blocks(corpus):
    f = Lz4Factory.fastest_instance()
    for level in (1, 9, 17):
        comp = f.high_compressor(level).compress_alloc(corpus[:65536])
        assert _ref_block_decompress(bytes(comp), 65536) == corpus[:65536]


def test_random_alphabet_cross(corpus):
    rng = random.Random(42)
    f = Lz4Factory.fastest_instance()
    for n_sym in (2, 16, 256):
        data = bytes(rng.randrange(n_sym) for _ in range(30000))
        ours = f.fast_compressor().compress_alloc(data)
        assert _ref_block_decompress(bytes(ours), len(data)) == data
        theirs = _ref_block_compress(data)
        out = f.safe_decompressor().decompress_alloc(theirs, 0, len(theirs),
                                                     len(data))
        assert bytes(out) == data


# ---- frame-format interop ----

def test_upstream_decodes_our_frames(corpus):
    for features in ((FrameFlag.BLOCK_INDEPENDENCE,),
                     (FrameFlag.BLOCK_INDEPENDENCE,
                      FrameFlag.CONTENT_CHECKSUM)):
        fr = frame.compress_frame(corpus, block_size=BlockSize.SIZE_64KB,
                                  features=tuple(features))
        assert _ref_frame_decompress(fr, len(corpus)) == corpus


def test_upstream_decodes_our_frames_sizes(corpus):
    for size in (0, 1, 65535, 65536, 65537, 100000):
        data = corpus[:size]
        fr = frame.compress_frame(data, block_size=BlockSize.SIZE_64KB)
        assert _ref_frame_decompress(fr, len(data)) == data


def test_we_decode_upstream_frames(corpus):
    for cc in (True, False):
        fr = _ref_frame_compress(corpus, content_checksum=cc)
        assert frame.decompress_frame(fr) == corpus


def test_we_decode_upstream_frames_block_sizes(corpus):
    for bsid in (4, 5, 6, 7):  # 64KB, 256KB, 1MB, 4MB
        fr = _ref_frame_compress(corpus, block_size_id=bsid)
        assert frame.decompress_frame(fr) == corpus


def test_flag_matrix_upstream_decodes_ours(corpus):
    """Every FLG combination (content checksum x block checksum x content
    size) we can write must decode with upstream LZ4F — the reference pins
    these bits at LZ4FrameOutputStream.java:308-376."""
    import itertools
    for cc, bc, cs in itertools.product((False, True), repeat=3):
        features = [FrameFlag.BLOCK_INDEPENDENCE]
        if cc:
            features.append(FrameFlag.CONTENT_CHECKSUM)
        if bc:
            features.append(FrameFlag.BLOCK_CHECKSUM)
        if cs:
            features.append(FrameFlag.CONTENT_SIZE)
        fr = frame.compress_frame(corpus, block_size=BlockSize.SIZE_64KB,
                                  features=tuple(features))
        assert _ref_frame_decompress(fr, len(corpus)) == corpus, (cc, bc, cs)


def test_flag_matrix_we_decode_upstream(corpus):
    """...and every combination upstream can write must decode with us,
    with the content-size accessor agreeing when present."""
    import itertools
    import io
    for cc, bc, cs in itertools.product((False, True), repeat=3):
        fr = _ref_frame_compress(corpus, content_checksum=cc,
                                 block_checksum=bc, content_size=cs)
        assert frame.decompress_frame(fr) == corpus, (cc, bc, cs)
        if cs:
            r = frame.Lz4FrameInputStream(io.BytesIO(fr))
            r.read(1)
            assert r.expected_content_size == len(corpus)


def test_stream_pipeline_interop(corpus):
    import io
    from lz4_tpu.streams import pipeline
    dst = io.BytesIO()
    pipeline.compress_stream(io.BytesIO(corpus), dst, engine="fastest")
    assert _ref_frame_decompress(dst.getvalue(), len(corpus)) == corpus
    fr = _ref_frame_compress(corpus)
    out = io.BytesIO()
    pipeline.decompress_stream(io.BytesIO(fr), out, engine="fastest")
    assert out.getvalue() == corpus


def _sweep_sizes(seed=0x5EED):
    """The reference frame tests are @Parameterized over
    {0, 1, 1KB+-1, 64KB, 128KB, 1MB, 10x random < 4MB}
    (LZ4FrameIOStreamTest.java:74-90)."""
    rng = random.Random(seed)
    fixed = [0, 1, 1023, 1024, 1025, 64 << 10, 128 << 10, 1 << 20]
    return fixed + [rng.randrange(1 << 22) for _ in range(10)]


def _sweep_data(size, seed):
    rng = random.Random(seed)
    # compressible alphabet with occasional runs, like the reference's
    # randomByteArray-with-alphabet corpus dial
    out = bytearray()
    while len(out) < size:
        if rng.random() < 0.2:
            out += bytes([rng.randrange(16)]) * rng.randrange(4, 600)
        else:
            out += bytes(rng.randrange(16) for _ in range(rng.randrange(1, 500)))
    return bytes(out[:size])


def test_frame_size_sweep_upstream_decodes_ours():
    for i, size in enumerate(_sweep_sizes()):
        data = _sweep_data(size, i)
        for bs in (BlockSize.SIZE_64KB, BlockSize.SIZE_4MB):
            fr = frame.compress_frame(
                data, block_size=bs,
                features=(FrameFlag.BLOCK_INDEPENDENCE,
                          FrameFlag.CONTENT_CHECKSUM))
            assert _ref_frame_decompress(fr, len(data)) == data, (size, bs)


def test_frame_size_sweep_we_decode_upstream():
    for i, size in enumerate(_sweep_sizes(0xCAFE)):
        data = _sweep_data(size, 100 + i)
        fr = _ref_frame_compress(data)
        assert frame.decompress_frame(fr) == data, size
