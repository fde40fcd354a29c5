"""Linked-block ("dependent", lz4 CLI -BD) frame decode — opt-in extension.

The reference refuses dependent frames on BOTH sides
(LZ4FrameOutputStream.java:361-363, LZ4FrameInputStream validates
BLOCK_INDEPENDENCE via the FLG byte); parity keeps that default here. The
lz4 CLI *produces* linked frames under ``-BD``, so the reader additionally
supports them behind ``allow_dependent_blocks=True`` (r4 verdict next #8):
matches may reference up to 64KB of the frame's previously decoded output,
decoded serially through the history-extended block decoder.

Differential oracle: frames are produced by system liblz4's LZ4F with
``blockMode=LZ4F_blockLinked`` — real upstream linked frames, not
self-made vectors.
"""

import ctypes
import io

import pytest

from lz4_tpu.core.errors import Lz4Error, Lz4FrameError
from lz4_tpu.formats import frame as frame_mod

from conftest import random_bytes  # noqa: E402

try:
    _LIB = ctypes.CDLL("liblz4.so.1")
    _LIB.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    _LIB.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t,
                                             ctypes.c_void_p]
    _LIB.LZ4F_compressFrame.restype = ctypes.c_size_t
    _LIB.LZ4F_isError.restype = ctypes.c_uint
    _LIB.LZ4F_isError.argtypes = [ctypes.c_size_t]
except OSError:  # pragma: no cover - liblz4 is present in this image
    _LIB = None

pytestmark = pytest.mark.skipif(_LIB is None, reason="liblz4 unavailable")


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


def _upstream_linked_frame(data: bytes, content_checksum=True,
                           block_size_id=4, block_checksum=False,
                           content_size=False) -> bytes:
    """A real linked-block frame from upstream LZ4F (blockMode=0)."""
    prefs = _Preferences()
    prefs.frameInfo.blockSizeID = block_size_id
    prefs.frameInfo.blockMode = 0  # LZ4F_blockLinked
    prefs.frameInfo.contentChecksumFlag = 1 if content_checksum else 0
    prefs.frameInfo.blockChecksumFlag = 1 if block_checksum else 0
    if content_size:
        prefs.frameInfo.contentSize = len(data)
    bound = _LIB.LZ4F_compressFrameBound(len(data), ctypes.byref(prefs))
    dst = ctypes.create_string_buffer(bound)
    n = _LIB.LZ4F_compressFrame(dst, bound, data, len(data),
                                ctypes.byref(prefs))
    assert not _LIB.LZ4F_isError(n)
    fr = dst.raw[:n]
    if len(data) > 65536:  # LZ4F emits an independent FLG when the
        # content fits a single block (linkage is irrelevant there)
        assert not (fr[4] & 0x20), "upstream produced an independent frame"
    return fr


def _linked_corpus(rng, n=300_000):
    """Data whose matches necessarily cross 64KB block boundaries: a long
    period-40000 repetition means every block after the first matches into
    the previous block's output."""
    pat = random_bytes(rng, 40_000, 32)
    return (pat * (n // len(pat) + 1))[:n]


def test_default_refuses_dependent(rng):
    fr = _upstream_linked_frame(_linked_corpus(rng))
    with pytest.raises((Lz4Error, Lz4FrameError), match="Dependent block"):
        frame_mod.decompress_frame(fr)
    with pytest.raises((Lz4Error, Lz4FrameError), match="Dependent block"):
        frame_mod.Lz4FrameInputStream(io.BytesIO(fr)).read()


@pytest.mark.parametrize("flags", [
    dict(content_checksum=True),
    dict(content_checksum=False),
    dict(content_checksum=True, block_checksum=True),
    dict(content_checksum=True, content_size=True),
])
def test_optin_decodes_upstream_linked_frames(rng, flags):
    data = _linked_corpus(rng)
    fr = _upstream_linked_frame(data, **flags)
    # one-shot (native path when available)
    assert frame_mod.decompress_frame(fr, allow_dependent_blocks=True) == data
    # streaming reader path
    got = frame_mod.Lz4FrameInputStream(
        io.BytesIO(fr), allow_dependent_blocks=True).read()
    assert got == data


@pytest.mark.parametrize("size", [0, 1, 100, 65536, 65537, 200_000])
def test_optin_size_sweep(rng, size):
    """The reference's frame test size sweep shape
    (LZ4FrameIOStreamTest.java:74-90) over linked frames."""
    data = _linked_corpus(rng, size) if size else b""
    fr = _upstream_linked_frame(data)
    assert frame_mod.decompress_frame(fr, allow_dependent_blocks=True) == data


def test_optin_incompressible_blocks(rng):
    """Random (stored-raw) blocks interleaved with compressible ones: the
    history window must advance across stored blocks too."""
    pat = random_bytes(rng, 30_000, 16)
    data = random_bytes(rng, 70_000, 256) + pat * 6 + \
        random_bytes(rng, 70_000, 256) + pat * 2
    fr = _upstream_linked_frame(data)
    assert frame_mod.decompress_frame(fr, allow_dependent_blocks=True) == data


def test_optin_concatenated_frames_reset_window(rng):
    """The 64KB match window resets at each frame boundary; two linked
    frames concatenated must decode to the two payloads joined."""
    a = _linked_corpus(rng, 150_000)
    b = _linked_corpus(rng, 90_000)
    fr = _upstream_linked_frame(a) + _upstream_linked_frame(b)
    assert frame_mod.decompress_frame(fr, allow_dependent_blocks=True) == a + b
    got = frame_mod.Lz4FrameInputStream(
        io.BytesIO(fr), allow_dependent_blocks=True).read()
    assert got == a + b


def test_optin_highly_compressible_grow_retry():
    """A linked frame whose content is far larger than 4x its compressed
    size drives the one-shot decoder's grow-retry loop through the serial
    dependent path (DEST_TOO_SMALL surfacing from a clamped slot)."""
    data = bytes(3 << 20)  # zeros: ratio >> 4x
    fr = _upstream_linked_frame(data)
    assert len(fr) * 4 < len(data)
    assert frame_mod.decompress_frame(fr, allow_dependent_blocks=True) == data


def test_optin_corruption_detected(rng):
    data = _linked_corpus(rng)
    fr = bytearray(_upstream_linked_frame(data, content_checksum=True))
    fr[len(fr) // 2] ^= 0x5A
    with pytest.raises((Lz4Error, Lz4FrameError)):
        frame_mod.decompress_frame(bytes(fr), allow_dependent_blocks=True)


def test_pure_python_dependent_tier_matches_native(rng):
    """The pure-Python history-extended decoder must agree with the native
    path on real upstream linked frames (cross-tier differential)."""
    data = _linked_corpus(rng, 200_000)
    fr = _upstream_linked_frame(data, content_checksum=False)
    # walk the frame by hand, decoding each block through BOTH tiers
    import struct
    s = 7  # magic(4) + FLG + BD + HC, no content size
    history_n = b""
    history_r = b""
    out_n = out_r = b""
    native_ok = True
    try:
        from lz4_tpu.api import native_instances  # noqa: F401
    except Exception:
        native_ok = False
    while True:
        word = struct.unpack_from("<I", fr, s)[0]
        s += 4
        if word == 0:
            break
        ln = word & 0x7FFFFFFF
        payload = fr[s:s + ln]
        s += ln
        if word & 0x80000000:
            raw_r = payload
        else:
            raw_r = frame_mod._decode_dependent_block_ref(
                payload, 65536, history_r)
        history_r = (history_r + raw_r)[-65536:]
        out_r += raw_r
        if native_ok:
            if word & 0x80000000:
                raw_n = payload
            else:
                from lz4_tpu.api.native_instances import (
                    decompress_block_with_history)
                raw_n = decompress_block_with_history(payload, 65536,
                                                      history_n)
            history_n = (history_n + raw_n)[-65536:]
            out_n += raw_n
            assert raw_n == raw_r
    assert out_r == data
    if native_ok:
        assert out_n == data


def test_large_skippable_frames_not_buffered(rng):
    """Skippable-frame payloads are discarded in chunks, never buffered
    whole (the claimed size is attacker-controlled up to 4GB-1). A 96MB
    skippable frame between two data frames must stream through both
    readers without memory ballooning (peak tracked via tracemalloc)."""
    import tracemalloc

    from lz4_tpu.streams import decompress_stream

    data = random_bytes(rng, 50_000, 16)
    body = frame_mod.compress_frame(data)
    skip = frame_mod.make_skippable_frame(b"")  # header only...
    big_skip = (b"\x50\x2a\x4d\x18" + (96 << 20).to_bytes(4, "little")
                + bytes(96 << 20))
    stream_bytes = body + big_skip + body
    del skip
    tracemalloc.start()
    got = frame_mod.Lz4FrameInputStream(io.BytesIO(stream_bytes)).read()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert got == data + data
    assert peak < 32 << 20, f"reader buffered the skippable frame: {peak}"
    tracemalloc.start()
    out = io.BytesIO()
    n = decompress_stream(io.BytesIO(stream_bytes), out)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 2 * len(data) and out.getvalue() == data + data
    assert peak < 32 << 20, f"pipeline buffered the skippable frame: {peak}"


def _oversized_block_frame(dependent: bool) -> bytes:
    """A spec-violating frame (64KB max block size) whose single block
    DECODES to 65542 bytes: 1 literal + a 65536-byte match + 5 trailing
    literals. Structurally valid until the decode overflows the block
    limit (r5 review #1 repro shape)."""
    import struct

    from lz4_tpu.core.xxhash_ref import xxh32

    ml = 65536 - 4 - 15
    block = (bytes([0x1F, ord("A"), 0x01, 0x00])
             + b"\xff" * (ml // 255) + bytes([ml % 255])
             + bytes([0x50]) + b"BBBBB")
    flg = 0x40 | (0 if dependent else 0x20)
    desc = bytes([flg, 0x40])
    hc = (xxh32(desc, 0, len(desc), 0) >> 8) & 0xFF
    return (struct.pack("<I", 0x184D2204) + desc + bytes([hc])
            + struct.pack("<I", len(block)) + block
            + struct.pack("<I", 0))


@pytest.mark.parametrize("dependent", [False, True])
def test_oversized_block_decode_rejected_fast(dependent):
    """A block decoding past the frame's max block size must raise, not
    drive the one-shot decoder's grow-retry loop to OOM (r5 review #1:
    the serial fallback and the new dependent path both reported the
    overflow as DEST_TOO_SMALL, which the auto-grow treated as 'needs a
    bigger buffer' forever)."""
    import time

    fr = _oversized_block_frame(dependent)
    t0 = time.perf_counter()
    with pytest.raises((Lz4Error, Lz4FrameError)):
        frame_mod.decompress_frame(fr, allow_dependent_blocks=dependent)
    assert time.perf_counter() - t0 < 10, "grow loop did not terminate fast"
    # the streaming reader path must reject it too
    with pytest.raises((Lz4Error, Lz4FrameError)):
        frame_mod.Lz4FrameInputStream(
            io.BytesIO(fr), allow_dependent_blocks=dependent).read()


def test_pipeline_and_cli_dependent_paths(rng, tmp_path):
    """The batch streaming pipeline and the CLI expose the opt-in too."""
    import subprocess
    import sys

    from lz4_tpu.streams import decompress_stream

    data = _linked_corpus(rng, 200_000)
    fr = _upstream_linked_frame(data, block_checksum=True)
    # pipeline: refused by default, serial decode with the opt-in
    with pytest.raises((Lz4Error, Lz4FrameError), match="Dependent block"):
        decompress_stream(io.BytesIO(fr), io.BytesIO())
    out = io.BytesIO()
    n = decompress_stream(io.BytesIO(fr), out, allow_dependent=True)
    assert n == len(data) and out.getvalue() == data

    # CLI: --allow-dependent
    src = tmp_path / "in.lz4"
    dst = tmp_path / "out.bin"
    src.write_bytes(fr)
    r = subprocess.run(
        [sys.executable, "-m", "lz4_tpu", "decompress", str(src), str(dst)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode != 0  # refused by default
    r = subprocess.run(
        [sys.executable, "-m", "lz4_tpu", "decompress", "--allow-dependent",
         str(src), str(dst)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert dst.read_bytes() == data


def _upstream_dict_frame(data: bytes, dictionary: bytes, block_mode: int,
                         dict_id: int = 0, block_size_id=4) -> bytes:
    """A frame compressed with a dictionary by upstream LZ4F (usingCDict)."""
    _LIB.LZ4F_createCDict.restype = ctypes.c_void_p
    _LIB.LZ4F_createCDict.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    _LIB.LZ4F_compressFrame_usingCDict.restype = ctypes.c_size_t
    cdict = _LIB.LZ4F_createCDict(dictionary, len(dictionary))
    assert cdict
    cctx = ctypes.c_void_p()
    err = _LIB.LZ4F_createCompressionContext(ctypes.byref(cctx), 100)
    assert not _LIB.LZ4F_isError(err)
    try:
        prefs = _Preferences()
        prefs.frameInfo.blockSizeID = block_size_id
        prefs.frameInfo.blockMode = block_mode
        prefs.frameInfo.contentChecksumFlag = 1
        prefs.frameInfo.dictID = dict_id
        bound = _LIB.LZ4F_compressFrameBound(len(data), ctypes.byref(prefs))
        dst = ctypes.create_string_buffer(bound)
        n = _LIB.LZ4F_compressFrame_usingCDict(
            cctx, dst, bound, data, len(data), ctypes.c_void_p(cdict),
            ctypes.byref(prefs))
        assert not _LIB.LZ4F_isError(n)
        return dst.raw[:n]
    finally:
        _LIB.LZ4F_freeCompressionContext(cctx)
        _LIB.LZ4F_freeCDict(ctypes.c_void_p(cdict))


@pytest.mark.parametrize("block_mode", [0, 1])  # linked, independent
def test_dictionary_frames_decode(rng, block_mode):
    """Dictionary decode (lz4 CLI -D / LZ4F usingDict) — a capability the
    reference lacks entirely. Data strongly overlapping the dictionary
    forces dict-window matches in every block."""
    dictionary = random_bytes(rng, 50_000, 64)
    data = dictionary[:30_000] + random_bytes(rng, 5_000, 64) + \
        dictionary[10_000:40_000] + dictionary[:20_000]
    fr = _upstream_dict_frame(data, dictionary, block_mode, dict_id=1234)
    assert fr[4] & 0x01, "expected a DictID header field"
    # compressed with dict-window matches? sanity: must be much smaller
    # than dict-less compression of the same first block
    got = frame_mod.decompress_frame(fr, dictionary=dictionary,
                                     allow_dependent_blocks=(block_mode == 0))
    assert got == data


def test_dictionary_frame_without_dict_refused(rng):
    dictionary = random_bytes(rng, 30_000, 64)
    data = dictionary + dictionary[:10_000]
    fr = _upstream_dict_frame(data, dictionary, 1, dict_id=7)
    with pytest.raises((Lz4Error, Lz4FrameError), match="DictID"):
        frame_mod.decompress_frame(fr)


def test_dictionary_dict_id_exposed(rng):
    dictionary = random_bytes(rng, 30_000, 64)
    data = dictionary + dictionary[:10_000]
    fr = _upstream_dict_frame(data, dictionary, 1, dict_id=0xDEADBEE)
    st = frame_mod.Lz4FrameInputStream(io.BytesIO(fr),
                                       dictionary=dictionary)
    out = st.read()
    assert out == data
    assert st.dict_id == 0xDEADBEE


def test_dictionary_wrong_dict_detected(rng):
    """A wrong dictionary produces wrong bytes; the content checksum must
    catch it (or the decode errors structurally)."""
    dictionary = random_bytes(rng, 30_000, 64)
    data = dictionary + dictionary[:10_000]
    fr = _upstream_dict_frame(data, dictionary, 1)
    wrong = random_bytes(rng, 30_000, 64)
    with pytest.raises((Lz4Error, Lz4FrameError)):
        frame_mod.decompress_frame(fr, dictionary=wrong)


def test_dictionary_cli(rng, tmp_path):
    """CLI -D decodes a dictionary frame; without -D it is refused."""
    import subprocess
    import sys

    dictionary = random_bytes(rng, 30_000, 64)
    data = dictionary + dictionary[:10_000]
    fr = _upstream_dict_frame(data, dictionary, 1, dict_id=3)
    src = tmp_path / "in.lz4"
    dfile = tmp_path / "dict.bin"
    dst = tmp_path / "out.bin"
    src.write_bytes(fr)
    dfile.write_bytes(dictionary)
    r = subprocess.run(
        [sys.executable, "-m", "lz4_tpu", "decompress", str(src), str(dst)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode != 0
    r = subprocess.run(
        [sys.executable, "-m", "lz4_tpu", "decompress", "-D", str(dfile),
         str(src), str(dst)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert dst.read_bytes() == data


def test_dictionary_writer_refuses_dict_id():
    """DICT_ID as a bare feature flag (no dictionary) stays refused —
    the parity writer never emits it on its own."""
    with pytest.raises(Lz4FrameError):
        frame_mod.Lz4FrameOutputStream(
            io.BytesIO(), features=(frame_mod.FrameFlag.DICT_ID,))
    with pytest.raises(Lz4FrameError):
        frame_mod.Lz4FrameOutputStream(io.BytesIO(), dict_id=7)


def test_dictionary_writer_refuses_custom_compressor(rng):
    """A caller-supplied compressor cannot search the dictionary window;
    the writer must refuse rather than silently substitute fast-scan
    (r5 review #3)."""
    from lz4_tpu.api.factory import Lz4Factory

    with pytest.raises(Lz4FrameError, match="custom compressor"):
        frame_mod.Lz4FrameOutputStream(
            io.BytesIO(), dictionary=b"x" * 100,
            compressor=Lz4Factory.safe_instance().high_compressor(9))


def test_dictionary_dict_id_feature_without_value(rng):
    """DICT_ID in features with a dictionary but no dict_id must be
    honored (field written, value 0), not silently stripped
    (r5 review #5)."""
    dictionary = random_bytes(rng, 20_000, 64)
    data = dictionary[:15_000]
    out = io.BytesIO()
    st = frame_mod.Lz4FrameOutputStream(
        out, features=(frame_mod.FrameFlag.BLOCK_INDEPENDENCE,
                       frame_mod.FrameFlag.DICT_ID),
        dictionary=dictionary)
    st.write(data)
    st.close_keep_underlying()
    fr = out.getvalue()
    assert fr[4] & 0x01
    rd = frame_mod.Lz4FrameInputStream(io.BytesIO(fr),
                                       dictionary=dictionary)
    assert rd.read() == data and rd.dict_id == 0


def test_cli_dict_id_without_dict_rejected(tmp_path):
    import subprocess
    import sys

    raw = tmp_path / "in.bin"
    raw.write_bytes(b"hello" * 100)
    r = subprocess.run(
        [sys.executable, "-m", "lz4_tpu", "compress", "--dict-id", "5",
         str(raw), str(tmp_path / "out.lz4")],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode != 0
    assert "--dict-id requires -D" in (r.stderr + r.stdout)


def _upstream_decompress_with_dict(comp: bytes, dictionary: bytes,
                                   expect_len: int) -> bytes:
    """Decode a frame with upstream LZ4F_decompress_usingDict."""
    _LIB.LZ4F_decompress_usingDict.restype = ctypes.c_size_t
    # full argtypes matter: dictSize is the 7th arg (stack-passed on
    # x86-64) and must be a size_t, not a 4-byte int with garbage above
    _LIB.LZ4F_decompress_usingDict.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p,
        ctypes.c_size_t, ctypes.c_void_p]
    ctx = ctypes.c_void_p()
    err = _LIB.LZ4F_createDecompressionContext(ctypes.byref(ctx), 100)
    assert not _LIB.LZ4F_isError(err)
    try:
        out = bytearray()
        dst_cap = max(expect_len + 64, 1 << 16)
        dst = ctypes.create_string_buffer(dst_cap)
        src_pos = 0
        while src_pos < len(comp):
            dst_size = ctypes.c_size_t(dst_cap)
            src_size = ctypes.c_size_t(len(comp) - src_pos)
            r = _LIB.LZ4F_decompress_usingDict(
                ctx, dst, ctypes.byref(dst_size), comp[src_pos:],
                ctypes.byref(src_size), dictionary, len(dictionary), None)
            assert not _LIB.LZ4F_isError(r), f"LZ4F error {r}"
            out += dst.raw[:dst_size.value]
            src_pos += src_size.value
            if r == 0 and src_pos >= len(comp):
                break
        return bytes(out)
    finally:
        _LIB.LZ4F_freeDecompressionContext(ctx)


def test_dictionary_write_side_upstream_interop(rng):
    """The write side: our dictionary frames decode with upstream
    LZ4F_decompress_usingDict (the strongest possible contract for an
    extension with no reference bytes to match) and with our own reader."""
    # window-aware construction: every dict reference stays within the
    # 64KB match distance (dict_len + data_pos - dict_pos <= 65535)
    dictionary = random_bytes(rng, 30_000, 256)
    data = dictionary + random_bytes(rng, 4_000, 256) + dictionary[:20_000]
    fr = frame_mod.compress_frame(data, block_size=frame_mod.BlockSize.SIZE_64KB,
                                  dictionary=dictionary, dict_id=99)
    assert fr[4] & 0x01  # DictID field present
    assert _upstream_decompress_with_dict(fr, dictionary, len(data)) == data
    assert frame_mod.decompress_frame(fr, dictionary=dictionary) == data
    st = frame_mod.Lz4FrameInputStream(io.BytesIO(fr), dictionary=dictionary)
    assert st.read() == data and st.dict_id == 99
    # dict-window matches must actually fire: overlapping random data is
    # incompressible without the dictionary
    plain = frame_mod.compress_frame(data,
                                     block_size=frame_mod.BlockSize.SIZE_64KB)
    assert len(fr) < len(plain) // 3


def test_dictionary_write_no_dict_id_field(rng):
    """dictionary= without dict_id writes dict-matched blocks but no
    DictID header field (LZ4F semantics); a reader without the dictionary
    must fail — structurally or via checksum — not emit wrong bytes."""
    dictionary = random_bytes(rng, 40_000, 256)
    data = dictionary[:35_000]
    fr = frame_mod.compress_frame(
        data, block_size=frame_mod.BlockSize.SIZE_64KB,
        features=(frame_mod.FrameFlag.BLOCK_INDEPENDENCE,
                  frame_mod.FrameFlag.CONTENT_CHECKSUM),
        dictionary=dictionary)
    assert not (fr[4] & 0x01)
    assert frame_mod.decompress_frame(fr, dictionary=dictionary) == data
    assert _upstream_decompress_with_dict(fr, dictionary, len(data)) == data
    with pytest.raises((Lz4Error, Lz4FrameError)):
        frame_mod.decompress_frame(fr)


def test_dictionary_write_block_checksums(rng):
    dictionary = random_bytes(rng, 30_000, 256)
    data = dictionary[:20_000] + dictionary[5_000:25_000]
    fr = frame_mod.compress_frame(
        data, block_size=frame_mod.BlockSize.SIZE_64KB,
        features=(frame_mod.FrameFlag.BLOCK_INDEPENDENCE,
                  frame_mod.FrameFlag.CONTENT_CHECKSUM,
                  frame_mod.FrameFlag.BLOCK_CHECKSUM),
        dictionary=dictionary, dict_id=1)
    assert frame_mod.decompress_frame(fr, dictionary=dictionary) == data


def test_dictionary_cli_roundtrip(rng, tmp_path):
    """CLI compress -D + decompress -D roundtrip."""
    import subprocess
    import sys

    dictionary = random_bytes(rng, 30_000, 256)
    data = dictionary[:25_000] + dictionary[5_000:25_000]
    raw = tmp_path / "in.bin"
    dfile = tmp_path / "dict.bin"
    comp = tmp_path / "out.lz4"
    back = tmp_path / "back.bin"
    raw.write_bytes(data)
    dfile.write_bytes(dictionary)
    r = subprocess.run(
        [sys.executable, "-m", "lz4_tpu", "compress", "-D", str(dfile),
         "--dict-id", "11", str(raw), str(comp)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert len(comp.read_bytes()) < len(data) // 3  # dict matches fired
    r = subprocess.run(
        [sys.executable, "-m", "lz4_tpu", "decompress", "-D", str(dfile),
         str(comp), str(back)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    assert back.read_bytes() == data


def test_pure_tier_fallbacks_no_native(rng, tmp_path):
    """With the native tier disabled, linked decode runs on the pure
    history decoder and dictionary WRITE degrades to valid dict frames
    without dict-referencing matches (documented graceful degradation)."""
    import os
    import subprocess
    import sys

    frfile = tmp_path / "linked.lz4"
    frfile.write_bytes(_upstream_linked_frame(_linked_corpus(rng, 150_000)))
    probe = (
        "import io, pathlib, random\n"
        "from lz4_tpu.formats import frame\n"
        "rng = random.Random(5)\n"
        "d = bytes(rng.randrange(64) for _ in range(20000))\n"
        "data = d[:15000]\n"
        "fr = frame.compress_frame(data,"
        " block_size=frame.BlockSize.SIZE_64KB, dictionary=d, dict_id=7)\n"
        "assert fr[4] & 0x01\n"
        "assert frame.decompress_frame(fr, dictionary=d) == data\n"
        "linked = pathlib.Path(%r).read_bytes()\n"
        "out = frame.decompress_frame(linked, allow_dependent_blocks=True)\n"
        "print('OK', len(out))\n" % str(frfile)
    )
    env = dict(os.environ, TPULZ4_NO_NATIVE="1",
               PYTHONPATH="/root/repo")
    r = subprocess.run([sys.executable, "-c", probe], env=env,
                       capture_output=True, text=True, timeout=240,
                       cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "OK 150000" in r.stdout


def test_writer_keeps_reference_parity():
    """Our writer never emits dependent frames: FLG bit 5 is always set
    (LZ4FrameOutputStream.java:58 sets BLOCK_INDEPENDENCE always)."""
    out = io.BytesIO()
    st = frame_mod.Lz4FrameOutputStream(out)
    st.write(b"hello world" * 100)
    st.close_keep_underlying()
    fr = out.getvalue()
    assert fr[4] & 0x20, "writer must set BLOCK_INDEPENDENCE"


def test_malformed_overlong_history_reference_rejected(rng):
    """A linked block whose match reaches beyond the available history must
    be rejected, not read out-of-window memory: hand-build a block whose
    first sequence references 1000 bytes back with only 10 bytes of
    history."""
    from lz4_tpu.formats.frame import _decode_dependent_block_ref
    # token: 4 literals, match len 4; offset 1000
    blk = bytes([0x40]) + b"abcd" + bytes([0xE8, 0x03]) + bytes([0]) + \
        b"endlit"  # trailing literals to satisfy end rules loosely
    with pytest.raises(Lz4Error):
        _decode_dependent_block_ref(blk, 65536, b"0123456789")
    try:
        from lz4_tpu.api.native_instances import (
            decompress_block_with_history)
    except Exception:
        return
    with pytest.raises(Lz4Error):
        decompress_block_with_history(blk, 65536, b"0123456789")
