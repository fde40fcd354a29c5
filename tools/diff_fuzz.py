"""Differential fuzz: our tiers vs each other vs upstream liblz4.

Oracles, per iteration:
  1. safe-tier and native-tier compressed bytes are identical (fast + HC);
  2. upstream liblz4 decodes our compressed bytes to the original;
  3. we decode upstream's compressed bytes to the original;
  4. on MUTATED compressed blocks: our native and safe tiers must agree
     exactly — same accept/reject decision, and byte-equal output when
     accepted (null-offset matches decode as zeros in every tier, so even
     malformed-input output is deterministic). Against upstream liblz4 the
     byte comparison additionally skips streams containing a null-offset
     match: the format leaves those bytes unspecified and upstream exposes
     its own buffer history there (this framework pins zeros instead —
     found by this very oracle, round 3).
  5. frame roundtrips at random flag combinations decode with upstream.

Usage:  python tools/diff_fuzz.py [iterations] [seed]
Exit code 0 and a "clean" line on success; prints a reproducer on the
first divergence. Run routinely (small count) by
tests/test_fuzz_differential.py-style suites; large campaigns by hand.
"""
import ctypes
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from lz4_tpu.core.constants import max_compressed_length
from lz4_tpu.core.errors import Lz4Error
from lz4_tpu.core.lz4_block_ref import compress_fast_alloc
from lz4_tpu.core.lz4_hc_ref import compress_hc_alloc
from lz4_tpu.api import native_instances as ni
from lz4_tpu.api.factory import Lz4Factory
from lz4_tpu.formats import frame
from lz4_tpu.formats.frame import BlockSize, FrameFlag

N_ITER = int(sys.argv[1]) if len(sys.argv) > 1 else 300
SEED = int(sys.argv[2], 0) if len(sys.argv) > 2 else 0xD1FF
rng = random.Random(SEED)

lib = ctypes.CDLL("liblz4.so.1")
lib.LZ4_compress_default.restype = ctypes.c_int
lib.LZ4_compress_default.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                     ctypes.c_int, ctypes.c_int]
lib.LZ4_decompress_safe.restype = ctypes.c_int
lib.LZ4_decompress_safe.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_int]

native = Lz4Factory.native_instance()


def gen_data():
    kind = rng.randrange(5)
    n = rng.randrange(0, 70000)
    if kind == 0:
        return bytes(rng.randrange(256) for _ in range(n))
    if kind == 1:
        a = rng.choice([2, 4, 16, 64])
        return bytes(rng.randrange(a) for _ in range(n))
    if kind == 2:  # runs
        out = bytearray()
        while len(out) < n:
            out += bytes([rng.randrange(8)]) * rng.randrange(1, 800)
        return bytes(out[:n])
    if kind == 3:  # self-similar (long-distance matches)
        seed_chunk = bytes(rng.randrange(32) for _ in range(rng.randrange(1, 900)))
        out = bytearray()
        while len(out) < n:
            out += seed_chunk[:rng.randrange(1, len(seed_chunk) + 1)]
        return bytes(out[:n])
    return b""


def upstream_decode(comp: bytes, out_len: int):
    dst = ctypes.create_string_buffer(max(out_len, 1))
    r = lib.LZ4_decompress_safe(comp, dst, len(comp), out_len)
    return dst.raw[:r] if r >= 0 else None


def our_decode(comp: bytes, out_len: int):
    try:
        return bytes(native.safe_decompressor().decompress_alloc(
            comp, 0, len(comp), out_len))
    except Lz4Error:
        return None


safe_tier = Lz4Factory.safe_instance()


def safe_decode(comp: bytes, out_len: int):
    try:
        return bytes(safe_tier.safe_decompressor().decompress_alloc(
            comp, 0, len(comp), out_len))
    except Lz4Error:
        return None


def has_null_match(comp: bytes) -> bool:
    """Token walk (no copying): does any sequence carry match offset 0?"""
    s, end = 0, len(comp)
    while s < end:
        token = comp[s]
        s += 1
        ll = token >> 4
        if ll == 15:
            while s < end:
                b = comp[s]
                s += 1
                ll += b
                if b != 255:
                    break
        s += ll
        if s + 2 > end:
            return False  # ends in literals (or malformed tail)
        dist = comp[s] | (comp[s + 1] << 8)
        s += 2
        if dist == 0:
            return True
        ml = token & 15
        if ml == 15:
            while s < end:
                b = comp[s]
                s += 1
                ml += b
                if b != 255:
                    break
    return False


fail = 0
for it in range(N_ITER):
    data = gen_data()
    # 1: cross-tier byte identity (keep the slow oracle on small inputs)
    ours = bytes(native.fast_compressor().compress_alloc(data))
    if len(data) <= 4096:
        assert ours == bytes(compress_fast_alloc(data)), ("tier mismatch", it)
        lvl = rng.choice([1, 9, 17])
        hc_n = bytes(native.high_compressor(lvl).compress_alloc(data))
        assert hc_n == bytes(compress_hc_alloc(data, lvl)), ("hc mismatch", it, lvl)
    # 2: upstream decodes ours
    assert upstream_decode(ours, len(data)) == data, ("upstream rejects ours", it)
    # 2b: turbo (opt-in heuristic, non-identical bytes): every decoder —
    # upstream, our native, our safe oracle — must accept and agree
    turbo = bytes(native.turbo_compressor().compress_alloc(data))
    assert upstream_decode(turbo, len(data)) == data, \
        ("upstream rejects turbo", it)
    assert our_decode(turbo, len(data)) == data, ("we reject turbo", it)
    if len(data) <= 4096:
        assert safe_decode(turbo, len(data)) == data, \
            ("safe tier rejects turbo", it)
    # 3: we decode upstream's
    cap = max_compressed_length(len(data))
    dst = ctypes.create_string_buffer(max(cap, 1))
    n = lib.LZ4_compress_default(data, dst, len(data), cap)
    theirs = dst.raw[:n]
    assert our_decode(theirs, len(data)) == data, ("we reject upstream", it)
    # 4: mutated blocks — our tiers must agree exactly; upstream must agree
    # on accepted bytes unless the stream has a null-offset match.
    # HC output mutates too: different token/offset distributions.
    base_stream = ours
    if ours and len(data) <= 20000 and rng.random() < 0.3:
        base_stream = bytes(native.high_compressor(
            rng.choice([1, 9, 17])).compress_alloc(data))
    if ours:
        for _ in range(4):
            m = bytearray(base_stream)
            for _ in range(rng.randrange(1, 6)):
                m[rng.randrange(len(m))] = rng.randrange(256)
            if rng.random() < 0.3:
                m = m[:rng.randrange(1, len(m) + 1)]
            m = bytes(m)
            a = our_decode(m, len(data))
            if len(data) <= 8192:  # safe tier is slow: bound the oracle
                c = safe_decode(m, len(data))
                if a != c:
                    print(f"TIER DIVERGENCE it={it} seed={SEED:#x} "
                          f"native={'reject' if a is None else len(a)} "
                          f"safe={'reject' if c is None else len(c)} "
                          f"mutated={m[:64].hex()}...")
                    fail += 1
            b = upstream_decode(m, len(data))
            if (a is not None and b is not None and a != b
                    and not has_null_match(m)):
                print(f"DIVERGENCE it={it} seed={SEED:#x} len={len(data)} "
                      f"mutated={m[:64].hex()}...")
                fail += 1
    # 5: random-flag frame roundtrip (library writer, library reader),
    # sometimes composed with skippable frames and frame concatenation
    if it % 10 == 0:
        feats = [FrameFlag.BLOCK_INDEPENDENCE]
        for fl in (FrameFlag.CONTENT_CHECKSUM, FrameFlag.BLOCK_CHECKSUM,
                   FrameFlag.CONTENT_SIZE):
            if rng.random() < 0.5:
                feats.append(fl)
        bs = rng.choice(list(BlockSize))
        fr = frame.compress_frame(data, block_size=bs, features=tuple(feats))
        assert frame.decompress_frame(fr) == data, ("frame roundtrip", it)
        if rng.random() < 0.4:
            head = data[:rng.randrange(0, min(len(data), 5000) + 1)]
            fr2 = frame.compress_frame(head, block_size=BlockSize.SIZE_64KB)
            sk = frame.make_skippable_frame(
                bytes(rng.randrange(256) for _ in range(rng.randrange(64))),
                subtype=rng.randrange(16))
            combo = sk + fr2 + sk + fr
            assert frame.decompress_frame(combo) == head + data, ("concat", it)
            assert frame.decompress_frame(
                combo, read_single_frame=True) == head, ("single", it)

if fail:
    sys.exit(f"{fail} divergences")
print(f"diff fuzz: {N_ITER} iterations clean (seed {SEED:#x})")
