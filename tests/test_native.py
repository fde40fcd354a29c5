"""Native (C++) tier tests: byte-parity with the safe oracle, error mapping,
streaming handle lifecycle (the differential matrix of LZ4Test.java:305-324
and the resource-lifecycle tests of XXHash32Test.java:167-191)."""

import pytest

from lz4_tpu.core.errors import Lz4Error

native = pytest.importorskip("lz4_tpu.api.native_instances")

from lz4_tpu.api.factory import Lz4Factory, XXHashFactory  # noqa: E402
from conftest import random_bytes  # noqa: E402


@pytest.fixture(scope="module")
def tiers():
    return Lz4Factory.safe_instance(), Lz4Factory.native_instance()


@pytest.mark.parametrize("length", [0, 1, 13, 100, 5000, 65535, 65547, 100000])
@pytest.mark.parametrize("alphabet", [1, 4, 256])
def test_fast_compress_byte_parity(length, alphabet, tiers, rng):
    safe, nat = tiers
    data = random_bytes(rng, length, alphabet)
    assert (nat.fast_compressor().compress_alloc(data)
            == safe.fast_compressor().compress_alloc(data))


@pytest.mark.parametrize("level", [1, 9, 17])
@pytest.mark.parametrize("length", [0, 100, 5000, 66000])
def test_hc_compress_byte_parity(level, length, tiers, rng):
    safe, nat = tiers
    data = random_bytes(rng, length, 16)
    assert (nat.high_compressor(level).compress_alloc(data)
            == safe.high_compressor(level).compress_alloc(data))


def test_calgary_byte_parity(tiers, calgary):
    safe, nat = tiers
    for name, data in calgary.items():
        assert (nat.fast_compressor().compress_alloc(data)
                == safe.fast_compressor().compress_alloc(data)), name


def test_cross_decompression(tiers, rng):
    safe, nat = tiers
    data = random_bytes(rng, 50000, 8)
    c = nat.fast_compressor().compress_alloc(data)
    assert safe.safe_decompressor().decompress_alloc(c, 0, len(c), len(data)) == data
    assert nat.safe_decompressor().decompress_alloc(c, 0, len(c), len(data)) == data
    assert nat.fast_decompressor().decompress_alloc(c, 0, len(data)) == data


def test_native_malformed_inputs_raise(tiers):
    _, nat = tiers
    # ends with match
    invalid = bytes([96, 42, 43, 44, 45, 46, 47, 5, 0])
    with pytest.raises(Lz4Error):
        nat.fast_decompressor().decompress(invalid, 0, bytearray(10), 0, 10)
    with pytest.raises(Lz4Error):
        nat.safe_decompressor().decompress(invalid, 0, len(invalid), bytearray(20), 0, 20)
    # null matchDec must not raise (LZ4Test.testNullMatchDec)
    ok = bytes([16, 42, 0, 0, 128, 42, 42, 42, 42, 42, 42, 42, 42])
    nat.fast_decompressor().decompress(ok, 0, bytearray(13), 0, 13)
    # truncated
    with pytest.raises(Lz4Error):
        nat.safe_decompressor().decompress(b"\xf0\x01", 0, 2, bytearray(100), 0, 100)


def _decode_with_canary(fn, src, dest_len, pad=64):
    """Decode into an exactly-sized dest with a guard region after it;
    fail if the decoder writes a single byte past dest_len (regression
    guard for the shortcut-path envelope, advisor r1 finding #1)."""
    import ctypes

    buf = ctypes.create_string_buffer(dest_len + pad)
    ctypes.memset(buf, 0xAB, dest_len + pad)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    srcbuf = ctypes.create_string_buffer(bytes(src), len(src)) if src else None
    rc = fn(ctypes.cast(srcbuf, u8p), len(src), ctypes.cast(buf, u8p), dest_len)
    assert buf.raw[dest_len:] == b"\xab" * pad, "decoder wrote past dest_len"
    return rc, buf.raw[:dest_len]


def test_decoder_shortcut_no_dest_overrun(tiers):
    """A fully valid block whose penultimate sequence (14 literals +
    dist=2/ml=18 match) starts with op == dest_len-37: inside the old
    (too-narrow) 34-byte shortcut envelope, where the dist<8 wild tail
    wrote 1 byte past dest. Must decode exactly, no writes past dest."""
    from lz4_tpu.core.lz4_block_ref import decompress_safe as ref_safe
    from lz4_tpu.native import bindings

    lib = bindings.load()
    n = 67
    lits1 = bytes(range(1, 27))
    lits2 = bytes(range(100, 114))
    block = (
        bytes([0xF0, 11]) + lits1 + bytes([1, 0])       # ll=26, ml=4, dist=1 -> op=30
        + bytes([0xEE]) + lits2 + bytes([2, 0])          # ll=14, ml=18, dist=2 -> op=62
        + bytes([0x50]) + b"ZZZZZ"                       # 5 trailing literals -> op=67
    )
    ref_out = bytearray(n)
    assert ref_safe(block, 0, len(block), ref_out, 0, n) == n
    expected = bytes(ref_out)

    rc, out = _decode_with_canary(lib.tpulz4_decompress_safe, block, n)
    assert rc == n and out == expected
    rc, out = _decode_with_canary(lib.tpulz4_decompress_fast, block, n)
    assert rc == len(block) and out == expected


def test_decoder_no_dest_overrun_random_sweep(tiers, rng):
    """Exact-size dest + canary over compressible random blocks at many
    lengths (stresses every shortcut-envelope boundary)."""
    from lz4_tpu.native import bindings

    lib = bindings.load()
    _, nat = tiers
    comp = nat.fast_compressor()
    for length in list(range(1, 96)) + [200, 1000, 65536]:
        data = random_bytes(rng, length, 3)
        c = comp.compress_alloc(data)
        rc, out = _decode_with_canary(lib.tpulz4_decompress_safe, c, length)
        assert rc == length and out == data
        rc, out = _decode_with_canary(lib.tpulz4_decompress_fast, c, length)
        assert rc == len(c) and out == data


def test_native_dest_too_small(tiers, rng):
    _, nat = tiers
    data = random_bytes(rng, 70000, 256)
    with pytest.raises(Lz4Error):
        nat.fast_compressor().compress(data, 0, len(data), bytearray(100), 0, 100)


def test_native_version_matches_package():
    """The ABI version surface must track the package version (r4 verdict
    weak #5: tpulz4_version() drifted to a stale string)."""
    import lz4_tpu
    from lz4_tpu.native import bindings

    lib = bindings.load()
    ver = lib.tpulz4_version().decode()
    assert ver == f"tpulz4-native {lz4_tpu.__version__}"


def _compress_with_canary(fn, src, cap, pad=64):
    """Compress into an exactly-`cap`-sized dest with a guard region after
    it; fail if the compressor writes a single byte past cap."""
    import ctypes

    buf = ctypes.create_string_buffer(cap + pad)
    ctypes.memset(buf, 0xAB, cap + pad)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    srcbuf = ctypes.create_string_buffer(bytes(src), len(src))
    rc = fn(ctypes.cast(srcbuf, u8p), len(src), ctypes.cast(buf, u8p), cap)
    assert buf.raw[cap:] == b"\xab" * pad, "compressor wrote past dest cap"
    return rc, buf.raw[:cap]


@pytest.mark.parametrize("level", [1, 9])
def test_hc_tight_dest_long_match_ext_bytes(level):
    """Regression for the encode_sequence (len >> 8) dest under-reserve
    (advisor r4 finding #1): a ~512KB period-64 input makes HC emit one
    match whose ~2000 length-extension bytes exceed the estimate by more
    than the fixed slack, so a tight caller-sized dest took a heap
    overflow instead of TPULZ4_E_DEST_TOO_SMALL. Sweep caps through the
    exact emission boundary with a canary after the dest.

    Reference surface: LZ4Compressor.compress(src, ..., dest, destOff,
    maxDestLen) accepts arbitrary user-sized dest (LZ4Compressor.java:59).
    """
    import ctypes

    from lz4_tpu.native import bindings

    lib = bindings.load()

    def hc(src, src_len, dst, cap):
        return lib.tpulz4_compress_hc(src, src_len, dst, cap, level)

    period = bytes(range(32, 96))                     # 64-byte period
    data = period * 8000                              # 512KB, one giant match
    need, exact = _compress_with_canary(hc, data, len(data))
    assert need > 0
    for cap in range(max(1, need - 48), need + 8):
        rc, out = _compress_with_canary(hc, data, cap)
        if cap < need:
            assert rc == bindings.E_DEST_TOO_SMALL
        else:
            assert rc == need and out[:need] == exact[:need]


def test_container_compress_dest_reuse(rng):
    """compress_frame_packed / compress_block_stream_packed with a caller
    buffer produce bytes identical to the allocating path (the zero-alloc
    data plane the bench measures), and reject undersized buffers."""
    from lz4_tpu.api import native_instances as ni
    from lz4_tpu.native import bindings

    data = random_bytes(rng, 300_000, 16)
    lib = bindings.load()
    for bsid in (4, 7):
        want = ni.compress_frame_packed(data, bsid, ni.F_CONTENT_CHECKSUM)
        buf = bytearray(int(lib.tpulz4_frame_compress_bound(len(data), bsid)))
        got = ni.compress_frame_packed(data, bsid, ni.F_CONTENT_CHECKSUM,
                                       dest=buf)
        assert bytes(got) == want
        with pytest.raises(ValueError):
            ni.compress_frame_packed(data, bsid, 0, dest=bytearray(10))
    want = ni.compress_block_stream_packed(data, 65536)
    buf = bytearray(int(
        lib.tpulz4_blockstream_compress_bound(len(data), 65536)))
    got = ni.compress_block_stream_packed(data, 65536, dest=buf)
    assert bytes(got) == want
    with pytest.raises(ValueError):
        ni.compress_block_stream_packed(data, 65536, dest=bytearray(10))


def test_native_xxhash_matches_safe(rng):
    sf = XXHashFactory.safe_instance()
    nf = XXHashFactory.native_instance()
    for length in (0, 1, 15, 16, 17, 1000):
        data = random_bytes(rng, length, 256)
        for seed in (0, 1, 0x9747B28C):
            assert (nf.hash32().hash(data, 0, length, seed)
                    == sf.hash32().hash(data, 0, length, seed))
            assert (nf.hash64().hash(data, 0, length, seed)
                    == sf.hash64().hash(data, 0, length, seed))


def test_native_streaming_lifecycle(rng):
    nf = XXHashFactory.native_instance()
    data = random_bytes(rng, 1000, 256)
    s = nf.new_streaming_hash32(42)
    s.update(data)
    v = s.get_value()
    s.reset()
    s.update(data)
    assert s.get_value() == v
    s.close()
    s.close()  # double close is fine
    with pytest.raises(Lz4Error):
        s.update(data)  # use after close raises
    with pytest.raises(Lz4Error):
        s.get_value()


def test_native_streaming_matches_oneshot(rng):
    nf = XXHashFactory.native_instance()
    data = random_bytes(rng, 10000, 256)
    with nf.new_streaming_hash64(7) as s:
        off = 0
        while off < len(data):
            take = min(rng.randrange(1, 97), len(data) - off)
            s.update(data, off, take)
            off += take
        assert s.get_value() == nf.hash64().hash(data, 0, len(data), 7)


def test_native_offsets(tiers, rng):
    _, nat = tiers
    data = random_bytes(rng, 5000, 8)
    src = bytes(31) + data
    dest = bytearray(11 + nat.fast_compressor().max_compressed_length(len(data)))
    n = nat.fast_compressor().compress(src, 31, len(data), dest, 11, len(dest) - 11)
    out = bytearray(len(data) + 3)
    written = nat.safe_decompressor().decompress(dest, 11, n, out, 3, len(data))
    assert written == len(data)
    assert bytes(out[3:3 + len(data)]) == data


class TestPackedBatchAPIs:
    """Zero-copy packed entry points (the bench/pipeline data plane)."""

    def test_packed_roundtrip(self, calgary):
        from lz4_tpu.api import native_instances as ni
        corpus = calgary["geo"] + calgary["book1"][:100000]
        comp, offs, lens = ni.compress_fast_packed(corpus, 8192)
        dec, dlens = ni.decompress_safe_packed(comp, offs, lens, 8192)
        assert int(dlens.sum()) == len(corpus)
        assert bytes(dec[:len(corpus)]) == corpus

    def test_packed_matches_list_api(self, calgary):
        from lz4_tpu.api import native_instances as ni
        corpus = calgary["geo"][:65536]
        bl = 8192
        blocks = [corpus[i:i + bl] for i in range(0, len(corpus), bl)]
        listed = ni.compress_fast_batch(blocks)
        comp, offs, lens = ni.compress_fast_packed(corpus, bl)
        got = [bytes(comp[int(offs[i]):int(offs[i]) + int(lens[i])])
               for i in range(len(lens))]
        assert got == listed

    def test_packed_dest_reuse(self, calgary):
        from lz4_tpu.api import native_instances as ni
        corpus = calgary["geo"][:32768]
        comp, offs, lens = ni.compress_fast_packed(corpus, 4096)
        dbuf = bytearray(len(lens) * 4096)
        dec, _ = ni.decompress_safe_packed(comp, offs, lens, 4096, dest=dbuf)
        assert dec is dbuf
        assert bytes(dbuf[:len(corpus)]) == corpus

    def test_packed_dest_too_small(self, calgary):
        import pytest
        from lz4_tpu.api import native_instances as ni
        with pytest.raises(ValueError):
            ni.compress_fast_packed(calgary["geo"][:8192], 4096,
                                    dest=bytearray(8))

    def test_packed_ragged_last_block(self):
        from lz4_tpu.api import native_instances as ni
        corpus = bytes(range(256)) * 33  # 8448 bytes: 2 full + 1 short @4096
        comp, offs, lens = ni.compress_fast_packed(corpus, 4096)
        assert len(lens) == 3
        dec, dlens = ni.decompress_safe_packed(comp, offs, lens, 4096)
        assert [int(x) for x in dlens] == [4096, 4096, 256]
        assert bytes(dec[:4096]) == corpus[:4096]
        assert bytes(dec[8192:8192 + 256]) == corpus[8192:]

    def test_packed_empty(self):
        from lz4_tpu.api import native_instances as ni
        comp, offs, lens = ni.compress_fast_packed(b"", 4096)
        assert len(lens) == 0
        dec, dlens = ni.decompress_safe_packed(b"", offs, lens, 4096)
        assert len(dlens) == 0

    def test_packed_malformed_raises(self):
        import numpy as np
        import pytest
        from lz4_tpu.api import native_instances as ni
        from lz4_tpu.core.errors import Lz4Error
        bad = b"\xff\x00\x00"
        with pytest.raises(Lz4Error):
            ni.decompress_safe_packed(bad, np.zeros(1, np.int64),
                                      np.array([len(bad)], np.int32), 4096)


class TestNativeFrameCodec:
    """One-call native frame codec vs the Python writer/reader."""

    def _corpus(self, calgary):
        return calgary["book1"][:200000]

    def test_byte_parity_with_python_writer(self, calgary):
        from lz4_tpu.api import native_instances as ni
        from lz4_tpu.formats import frame as fr
        from lz4_tpu.formats.frame import BlockSize, FrameFlag
        import io
        data = self._corpus(calgary)
        cases = [
            (7, 0, (FrameFlag.BLOCK_INDEPENDENCE,), False),
            (4, ni.F_CONTENT_CHECKSUM,
             (FrameFlag.BLOCK_INDEPENDENCE, FrameFlag.CONTENT_CHECKSUM), False),
            (5, ni.F_CONTENT_CHECKSUM | ni.F_BLOCK_CHECKSUM,
             (FrameFlag.BLOCK_INDEPENDENCE, FrameFlag.CONTENT_CHECKSUM,
              FrameFlag.BLOCK_CHECKSUM), False),
            (4, ni.F_CONTENT_SIZE,
             (FrameFlag.BLOCK_INDEPENDENCE,), True),
        ]
        for bsid, flags, feats, known in cases:
            nat = ni.compress_frame_packed(data, bsid, flags)
            out = io.BytesIO()
            s = fr.Lz4FrameOutputStream(out, block_size=BlockSize(bsid),
                                        known_size=len(data) if known else -1,
                                        features=feats)
            s.write(data)
            s.close_keep_underlying()
            assert nat == out.getvalue(), (bsid, flags)

    def test_roundtrip_and_python_reader(self, calgary):
        import io
        from lz4_tpu.api import native_instances as ni
        from lz4_tpu.formats import frame as fr
        data = self._corpus(calgary)
        nat = ni.compress_frame_packed(data, 4, ni.F_CONTENT_CHECKSUM)
        out, consumed = ni.decompress_frame_packed(nat)
        assert out == data and consumed == len(nat)
        # Python stream reader agrees
        assert fr.Lz4FrameInputStream(io.BytesIO(nat)).read() == data

    def test_concatenated_and_skippable(self, calgary):
        from lz4_tpu.api import native_instances as ni
        from lz4_tpu.formats.frame import make_skippable_frame
        a = ni.compress_frame_packed(b"first", 4, 0)
        sk = make_skippable_frame(b"ignored payload")
        b = ni.compress_frame_packed(b"second", 4, ni.F_CONTENT_CHECKSUM)
        out, consumed = ni.decompress_frame_packed(a + sk + b)
        assert out == b"firstsecond" and consumed == len(a + sk + b)
        out1, c1 = ni.decompress_frame_packed(a + sk + b, single_frame=True)
        assert out1 == b"first" and c1 == len(a)

    def test_empty_and_hc(self, calgary):
        from lz4_tpu.api import native_instances as ni
        data = self._corpus(calgary)
        e = ni.compress_frame_packed(b"", 4, ni.F_CONTENT_CHECKSUM)
        assert ni.decompress_frame_packed(e)[0] == b""
        hc = ni.compress_frame_packed(data, 4, 0, level=9)
        fast = ni.compress_frame_packed(data, 4, 0)
        assert len(hc) < len(fast)
        assert ni.decompress_frame_packed(hc)[0] == data

    def test_dest_growth_retry(self, calgary):
        # tiny initial guess must grow transparently
        from lz4_tpu.api import native_instances as ni
        data = bytes(1000000)  # ratio << 1 so 4x input guess is too small
        nat = ni.compress_frame_packed(data, 4, 0)
        out, _ = ni.decompress_frame_packed(nat)
        assert out == data

    def test_corruption_raises(self, calgary):
        import pytest
        from lz4_tpu.api import native_instances as ni
        from lz4_tpu.core.errors import Lz4FrameError
        data = self._corpus(calgary)
        good = bytearray(ni.compress_frame_packed(data, 4,
                                                  ni.F_CONTENT_CHECKSUM))
        bad = bytearray(good); bad[5] ^= 0x01  # descriptor bit
        with pytest.raises(Lz4FrameError):
            ni.decompress_frame_packed(bytes(bad))
        bad = bytearray(good); bad[200] ^= 0xFF  # payload byte
        with pytest.raises(Lz4FrameError):
            ni.decompress_frame_packed(bytes(bad))
        with pytest.raises(Lz4FrameError):
            ni.decompress_frame_packed(b"not a frame at all")

    def test_upstream_interop(self, calgary):
        import ctypes
        try:
            lib = ctypes.CDLL("liblz4.so.1")
        except OSError:
            import pytest
            pytest.skip("liblz4 absent")
        from lz4_tpu.api import native_instances as ni
        data = self._corpus(calgary)
        nat = ni.compress_frame_packed(data, 4, ni.F_CONTENT_CHECKSUM)
        # upstream decode via LZ4F
        ctx = ctypes.c_void_p()
        lib.LZ4F_createDecompressionContext(ctypes.byref(ctx), 100)
        dst = ctypes.create_string_buffer(len(data) + 64)
        out = bytearray(); pos = 0
        while pos < len(nat):
            ds = ctypes.c_size_t(len(dst)); ss = ctypes.c_size_t(len(nat) - pos)
            r = lib.LZ4F_decompress(ctx, dst, ctypes.byref(ds), nat[pos:],
                                    ctypes.byref(ss), None)
            assert not lib.LZ4F_isError(r)
            out += dst.raw[:ds.value]; pos += ss.value
            if r == 0:
                break
        lib.LZ4F_freeDecompressionContext(ctx)
        assert bytes(out) == data


class TestHcPackedBatch:
    def test_parity_with_instance_api(self, calgary):
        from lz4_tpu.api import native_instances as ni
        data = calgary["geo"][:65536]
        for level in (1, 9, 17):
            comp, offs, lens = ni.compress_hc_packed(data, 8192, level=level)
            hc = ni.HighCompressor(level)
            for i in range(len(lens)):
                o, l = int(offs[i]), int(lens[i])
                ref = hc.compress_alloc(data[i * 8192:(i + 1) * 8192])
                assert bytes(comp[o:o + l]) == bytes(ref)

    def test_stream_level(self, calgary):
        import io
        from lz4_tpu.streams import pipeline
        data = calgary["geo"]
        hc_dst = io.BytesIO()
        pipeline.compress_stream(io.BytesIO(data), hc_dst, level=9)
        fast_dst = io.BytesIO()
        pipeline.compress_stream(io.BytesIO(data), fast_dst)
        assert len(hc_dst.getvalue()) < len(fast_dst.getvalue())
        out = io.BytesIO()
        pipeline.decompress_stream(io.BytesIO(hc_dst.getvalue()), out)
        assert out.getvalue() == data


class TestOneShotDestReuse:
    def test_frame_dest_reuse(self, calgary):
        from lz4_tpu.api import native_instances as ni
        data = calgary["geo"]
        fr = ni.compress_frame_packed(data, 4, ni.F_CONTENT_CHECKSUM)
        buf = bytearray(len(data) + 100)
        dec, consumed = ni.decompress_frame_packed(fr, dest=buf)
        assert isinstance(dec, memoryview)
        assert bytes(dec) == data and consumed == len(fr)
        # too-small dest raises rather than retrying
        import pytest
        from lz4_tpu.core.errors import Lz4Error
        with pytest.raises(Lz4Error):
            ni.decompress_frame_packed(fr, dest=bytearray(100))

    def test_blockstream_dest_reuse(self, calgary):
        from lz4_tpu.api import native_instances as ni
        data = calgary["geo"]
        st = ni.compress_block_stream_packed(data, 8192)
        buf = bytearray(len(data))
        dec, consumed = ni.decompress_block_stream_packed(st, dest=buf)
        assert bytes(dec) == data and consumed == len(st)

    def test_frame_short_interior_blocks_content_sized_dest(self, calgary):
        """Spec-valid frames from flushing writers have short interior
        blocks; the stride layout must fall back to serial compaction and
        still fit a content-sized dest (advisor r1 finding #3)."""
        import io
        from lz4_tpu.api import native_instances as ni
        from lz4_tpu.formats import frame as fr
        from lz4_tpu.formats.frame import BlockSize, FrameFlag

        data = calgary["book1"][:200000]
        out = io.BytesIO()
        s = fr.Lz4FrameOutputStream(
            out, block_size=BlockSize.SIZE_64KB,
            features=(FrameFlag.BLOCK_INDEPENDENCE,
                      FrameFlag.CONTENT_CHECKSUM))
        # interleave writes and flushes -> short interior blocks
        for cut in (500, 1300, 70000, 70100, len(data)):
            s.write(data[(0 if cut == 500 else prev):cut])
            prev = cut
            s.flush()
        s.close_keep_underlying()
        framed = out.getvalue()

        # exact content-sized reusable dest must work
        buf = bytearray(len(data))
        dec, consumed = ni.decompress_frame_packed(framed, dest=buf)
        assert bytes(dec) == data and consumed == len(framed)
        # auto-alloc path as well, at several thread counts
        for t in (1, 2, 3):
            got, consumed = ni.decompress_frame_packed(framed, n_threads=t)
            assert got == data and consumed == len(framed)


def test_asan_fuzz_campaign(tmp_path):
    """Memory-safety fuzz of the native decoders under AddressSanitizer
    (subprocess: ASan must be preloaded at process start). Small iteration
    count here; tools/asan_fuzz.py documents the full campaign."""
    import os
    import pathlib
    import shutil
    import subprocess
    import sys

    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("g++ unavailable")
    asan = subprocess.run([gxx, "-print-file-name=libasan.so"],
                          capture_output=True, text=True).stdout.strip()
    if not asan or "/" not in asan:
        pytest.skip("libasan unavailable")
    root = pathlib.Path(__file__).resolve().parents[1]
    lib = tmp_path / "libtpulz4_asan.so"
    build = subprocess.run(
        [gxx, "-O1", "-g", "-fsanitize=address", "-fno-omit-frame-pointer",
         "-shared", "-fPIC", "-pthread",
         str(root / "lz4_tpu/native/src/tpulz4.cpp"), "-o", str(lib)],
        capture_output=True, text=True, timeout=300)
    assert build.returncode == 0, build.stderr[-2000:]
    env = dict(LD_PRELOAD=asan, ASAN_OPTIONS="detect_leaks=0",
               PATH=os.environ.get("PATH", ""))
    res = subprocess.run(
        [sys.executable, str(root / "tools/asan_fuzz.py"), str(lib), "8000"],
        capture_output=True, text=True, timeout=300, env=env)
    assert res.returncode == 0, (res.stdout[-1000:], res.stderr[-2000:])
    assert "clean" in res.stdout


def test_max_input_boundary_roundtrip():
    """One call at the reference's input-size cap (0x7E000000 ~ 2.1 GB,
    LZ4Utils.java:32,37-38): compress + decompress a maximally-compressible
    buffer just under the cap through the native entry points, and reject
    at the cap through the API bound."""
    import ctypes
    from lz4_tpu.core.constants import max_compressed_length
    from lz4_tpu.native import bindings

    lib = bindings.load()
    n_in = 0x7E000000 - 1
    src = bytearray(n_in)  # zeros
    cap = max_compressed_length(n_in)
    comp = bytearray(cap)
    n = lib.tpulz4_compress_fast(
        (ctypes.c_uint8 * n_in).from_buffer(src), n_in,
        (ctypes.c_uint8 * cap).from_buffer(comp), cap)
    assert 0 < n < 16 << 20
    dst = bytearray(n_in)
    r = lib.tpulz4_decompress_safe(
        (ctypes.c_uint8 * cap).from_buffer(comp), n,
        (ctypes.c_uint8 * n_in).from_buffer(dst), n_in)
    assert r == n_in
    assert dst[0] == 0 and dst[n_in - 1] == 0 and dst[n_in // 2] == 0
    with pytest.raises(ValueError):
        max_compressed_length(0x7E000000)  # at/over the cap: rejected


def test_batch_per_block_error_isolation(calgary, rng):
    """The work-stealing batch decode must report errors per block and leave
    valid blocks intact: corrupt every third block's length (undersized) in
    a packed batch and check codes land exactly where the corruption is."""
    import numpy as np
    from lz4_tpu.api import native_instances as ni
    from lz4_tpu.native import bindings
    import ctypes

    data = (calgary["book1"] * 2)[:16 * 65536]
    comp, offs, lens = ni.compress_fast_packed(data, 65536)
    lens = np.array(lens, np.int32)
    bad = np.arange(0, len(lens), 3)
    lens[bad] = lens[bad] // 2  # truncated compressed streams

    lib = bindings.load()
    n = len(lens)
    dest = bytearray(n * 65536)
    out_lens = np.zeros(n, np.int32)
    offs64 = np.ascontiguousarray(offs, np.int64)
    i64p, i32p = ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32)
    src_buf = (ctypes.c_uint8 * len(comp)).from_buffer(comp)
    dst_buf = (ctypes.c_uint8 * len(dest)).from_buffer(dest)
    lib.tpulz4_decompress_safe_batch(
        ctypes.cast(src_buf, ctypes.POINTER(ctypes.c_uint8)),
        offs64.ctypes.data_as(i64p), lens.ctypes.data_as(i32p),
        ctypes.cast(dst_buf, ctypes.POINTER(ctypes.c_uint8)),
        (np.arange(n, dtype=np.int64) * 65536).ctypes.data_as(i64p),
        65536, out_lens.ctypes.data_as(i32p), n, 2)
    for i in range(n):
        if i in bad:
            assert out_lens[i] < 0, i
        else:
            assert out_lens[i] == 65536, i
            assert (bytes(dest[i * 65536:(i + 1) * 65536])
                    == data[i * 65536:(i + 1) * 65536]), i


def test_frame_4mb_blocks_large_roundtrip(calgary):
    """Multi-block 4MB-block frame (BASELINE config #2 shape) through the
    native one-shots, with and without content checksum."""
    from lz4_tpu.api import native_instances as ni

    data = (b"".join(calgary.values()) * 24)[:3 * (4 << 20) + 12345]
    for flags in (0, ni.F_CONTENT_CHECKSUM):
        frm = ni.compress_frame_packed(data, 7, flags)
        out, consumed = ni.decompress_frame_packed(frm)
        assert out == data and consumed == len(frm)


def test_frame_auto_grow_highly_compressible(calgary):
    """Auto-alloc decompress starts from a 4x-compressed-size guess; on
    >4:1 frames the first pass runs with a clamped dest and can fail
    mid-match (which used to surface as Malformed instead of retrying).
    Regression: one 4MB-block frame of pic tiled >4MB must roundtrip."""
    from lz4_tpu.api import native_instances as ni
    data = calgary["pic"] * 8  # ~4.1 MB, ratio ~6:1
    for flags in (0, ni.F_CONTENT_CHECKSUM):
        frm = ni.compress_frame_packed(data, 7, flags)
        assert len(frm) * 4 < len(data)  # guess genuinely too small
        out, consumed = ni.decompress_frame_packed(frm)
        assert out == data and consumed == len(frm)


def test_frame_decompress_overlap_hash_threads(calgary):
    """>=3 threads route the content checksum through the trailer thread;
    results and error behavior must match the serial-hash path."""
    import pytest
    from lz4_tpu.api import native_instances as ni
    from lz4_tpu.core.errors import Lz4FrameError
    data = calgary["geo"]
    fr = ni.compress_frame_packed(data, 4, ni.F_CONTENT_CHECKSUM)
    for t in (1, 2, 3, 4):
        out, consumed = ni.decompress_frame_packed(fr, n_threads=t)
        assert out == data and consumed == len(fr)
    bad = bytearray(fr)
    bad[len(bad) // 2] ^= 0xFF
    for t in (2, 3):
        with pytest.raises(Lz4FrameError):
            ni.decompress_frame_packed(bytes(bad), n_threads=t)


class TestNativeBuildLifecycle:
    """Build/loader invariants on disk — the analog of the reference's JNI
    temp-lib and .lck tests (LZ4Test.java:40-78, Native.java:98-162)."""

    def test_cache_dir_override_and_lock_cleanup(self, tmp_path):
        import os
        import subprocess
        import sys
        env = dict(os.environ, TPULZ4_NATIVE_DIR=str(tmp_path),
                   PYTHONPATH="/root/repo")
        r = subprocess.run(
            [sys.executable, "-c",
             "from lz4_tpu.native import build;"
             "p = build.build(); print(p)"],
            capture_output=True, text=True, env=env, timeout=300)
        assert r.returncode == 0, r.stderr
        built = r.stdout.strip()
        assert built.startswith(str(tmp_path))
        assert os.path.exists(built)
        # lock file must not linger after a successful build
        leftovers = [p for p in os.listdir(tmp_path) if p.endswith(".lck")]
        assert leftovers == []

    def test_concurrent_builders_produce_one_library(self, tmp_path):
        import os
        import subprocess
        import sys
        env = dict(os.environ, TPULZ4_NATIVE_DIR=str(tmp_path),
                   PYTHONPATH="/root/repo")
        code = ("from lz4_tpu.native import build, bindings;"
                "build.build();"
                "lib = bindings.load();"
                "print(lib.tpulz4_max_compressed_length(100))")
        procs = [subprocess.Popen([sys.executable, "-c", code],
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.PIPE, env=env, text=True)
                 for _ in range(2)]
        outs = [p.communicate(timeout=300) for p in procs]
        for (out, err), p in zip(outs, procs):
            assert p.returncode == 0, err
            assert out.strip() == "116"  # 100 + 100/255 + 16
        sos = [p for p in os.listdir(tmp_path) if p.endswith(".so")]
        assert len(sos) == 1

    def test_no_native_env_refuses(self):
        import os
        import subprocess
        import sys
        env = dict(os.environ, TPULZ4_NO_NATIVE="1", PYTHONPATH="/root/repo")
        r = subprocess.run(
            [sys.executable, "-c",
             "from lz4_tpu.native import build\n"
             "try:\n"
             "    build.build()\n"
             "    print('BUILT')\n"
             "except build.NativeBuildError:\n"
             "    print('REFUSED')"],
            capture_output=True, text=True, env=env, timeout=120)
        assert r.returncode == 0, r.stderr
        assert r.stdout.strip() == "REFUSED"


@pytest.mark.slow
def test_wheel_build_fails_loud_without_compiler(tmp_path):
    """Advisor r4 #3: a wheel built on a host with a broken toolchain must
    fail, not silently ship platform-tagged without the native tier. With
    the explicit opt-out it succeeds and carries no .so."""
    import os
    import pathlib
    import subprocess
    import sys
    import zipfile

    root = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ, TPULZ4_CXX="/bin/false")
    env.pop("TPULZ4_ALLOW_MISSING_NATIVE", None)
    env.pop("TPULZ4_NO_NATIVE", None)
    broken = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", str(root), "--no-deps",
         "--no-build-isolation", "-w", str(tmp_path / "broken")],
        capture_output=True, text=True, timeout=600, env=env)
    if "native library build failed" not in (broken.stderr + broken.stdout):
        pytest.skip(f"pip wheel unavailable: {broken.stderr[-400:]}")
    assert broken.returncode != 0
    assert not list((tmp_path / "broken").glob("*.whl"))

    env["TPULZ4_ALLOW_MISSING_NATIVE"] = "1"
    ok = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", str(root), "--no-deps",
         "--no-build-isolation", "-w", str(tmp_path / "degraded")],
        capture_output=True, text=True, timeout=600, env=env)
    assert ok.returncode == 0, ok.stderr
    wheel = next((tmp_path / "degraded").glob("tpu_lz4-*.whl"))
    assert "any" in wheel.name, wheel.name  # not platform-tagged
    with zipfile.ZipFile(wheel) as zf:
        assert not [n for n in zf.namelist() if n.endswith(".so")]

    # with a WORKING toolchain the opt-out must still skip the build: an
    # any-tagged wheel must never carry a platform .so (r5 review #2)
    env.pop("TPULZ4_CXX", None)
    ok = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", str(root), "--no-deps",
         "--no-build-isolation", "-w", str(tmp_path / "degraded2")],
        capture_output=True, text=True, timeout=600, env=env)
    assert ok.returncode == 0, ok.stderr
    wheel = next((tmp_path / "degraded2").glob("tpu_lz4-*.whl"))
    assert "any" in wheel.name, wheel.name
    with zipfile.ZipFile(wheel) as zf:
        assert not [n for n in zf.namelist() if n.endswith(".so")]


@pytest.mark.slow
def test_prebuilt_wheel_ships_native_library(tmp_path):
    """VERDICT r3 #9: `pip wheel .` embeds a prebuilt libtpulz4 so
    compiler-less installs keep the native tier (the reference ships
    per-platform libs on the classpath, Native.java:60-65). The wheel is
    built, unpacked, and the factory is driven with the compiler disabled:
    the loader must pick the _prebuilt library."""
    import os
    import pathlib
    import subprocess
    import sys
    import zipfile

    root = pathlib.Path(__file__).resolve().parents[1]
    build = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", str(root), "--no-deps",
         "--no-build-isolation", "-w", str(tmp_path)],
        capture_output=True, text=True, timeout=600)
    if build.returncode != 0:
        pytest.skip(f"pip wheel unavailable: {build.stderr[-400:]}")
    wheel = next(tmp_path.glob("tpu_lz4-*.whl"))
    inst = tmp_path / "inst"
    with zipfile.ZipFile(wheel) as zf:
        zf.extractall(inst)
    assert list(inst.glob("lz4_tpu/native/_prebuilt/libtpulz4-*.so"))
    probe = (
        "import pathlib\n"
        "from lz4_tpu.native import build\n"
        "p = build.build()\n"
        "assert '_prebuilt' in str(p), p\n"
        "from lz4_tpu.api.factory import Lz4Factory\n"
        "f = Lz4Factory.native_instance()\n"
        "data = b'wheel native tier' * 500\n"
        "c = f.fast_compressor().compress_alloc(data)\n"
        "out = f.safe_decompressor().decompress_alloc(c, 0, len(c), len(data))\n"
        "assert bytes(out) == data\n"
        "print('OK', p.name)\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = str(inst)
    env["TPULZ4_CXX"] = "/bin/false"  # no compiler: prebuilt or bust
    run = subprocess.run([sys.executable, "-c", probe], env=env,
                         capture_output=True, text=True, timeout=300,
                         cwd=str(tmp_path))
    assert run.returncode == 0, run.stderr
    assert "OK libtpulz4-" in run.stdout
