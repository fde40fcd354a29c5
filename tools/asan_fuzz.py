"""ASan fuzz campaign for the native tier.

Drives every native decoder/parser entry point (block safe/fast, sequence
parser, frame and LZ4Block container decoders at 1-3 threads) with random
bytes, truncated-valid, and mutated-valid inputs (byte flips, insertions,
deletions, truncations of real compressed blocks/frames/streams) under
AddressSanitizer — any overrun, UAF, or invalid read aborts the process.
The decoder memory-safety surface is the classic LZ4 CVE shape; the
reference pins it with hand-written adversarial vectors
(LZ4Test.java:350-419) which tests/test_native.py mirrors; this campaign
searches beyond the hand-written set.

Usage:
    g++ -O1 -g -fsanitize=address -fno-omit-frame-pointer -shared -fPIC \
        -pthread lz4_tpu/native/src/tpulz4.cpp -o /tmp/libtpulz4_asan.so
    LD_PRELOAD=$(g++ -print-file-name=libasan.so) \
        ASAN_OPTIONS=detect_leaks=0 \
        python tools/asan_fuzz.py /tmp/libtpulz4_asan.so 300000

Run routinely by tests/test_native.py::test_asan_fuzz_campaign (slow,
small iteration count); 1.5M iterations measured clean.
"""
import ctypes, os, random, sys, time

LIB_PATH = sys.argv[1]
N_ITER = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
lib = ctypes.CDLL(LIB_PATH)
lib.tpulz4_decompress_safe.restype = ctypes.c_int
lib.tpulz4_decompress_fast.restype = ctypes.c_int
lib.tpulz4_compress_fast.restype = ctypes.c_int
lib.tpulz4_compress_turbo.restype = ctypes.c_int
lib.tpulz4_parse_sequences.restype = ctypes.c_int
lib.tpulz4_frame_decompress.restype = ctypes.c_int64
lib.tpulz4_blockstream_decompress.restype = ctypes.c_int64

rng = random.Random(0xF422)
u8p = ctypes.POINTER(ctypes.c_uint8)
i32p = ctypes.POINTER(ctypes.c_int32)

def buf(b: bytes):
    return (ctypes.c_uint8 * max(1, len(b))).from_buffer_copy(b or b"\x00")

# seed corpus: valid compressed blocks of varied content (generated
# fallback when the Calgary corpus is absent, mirroring bench.load_corpus)
import pathlib
_cal_path = pathlib.Path("/root/reference/src/test-resources/calgary/book1")
if _cal_path.exists():
    cal = _cal_path.read_bytes()
else:
    cal = bytes((i * 7 + (i >> 3)) & 0xFF for i in range(1 << 20))
valid = []
cap = 70000
out = (ctypes.c_uint8 * cap)()
for i in range(40):
    src = cal[i*3000:(i+1)*3000 + rng.randrange(2000)]
    n = lib.tpulz4_compress_fast(buf(src), len(src), out, cap)
    assert n > 0
    valid.append(bytes(out[:n]))

lib.tpulz4_frame_compress.restype = ctypes.c_int64
lib.tpulz4_blockstream_compress.restype = ctypes.c_int64
fcap = 800000
fout = (ctypes.c_uint8 * fcap)()
valid_frames, valid_streams = [], []
for i in range(8):
    src_data = cal[i*60000:(i+1)*60000]
    n = lib.tpulz4_frame_compress(buf(src_data), len(src_data), 4,
                                  rng.randrange(8), 0, fout, fcap, 2)
    assert n > 0, n
    valid_frames.append(bytes(fout[:n]))
    n = lib.tpulz4_blockstream_compress(buf(src_data), len(src_data),
                                        1 << 14, fout, fcap, 2)
    assert n > 0, n
    valid_streams.append(bytes(fout[:n]))

# valid LINKED-frame seeds: clear FLG bit 5 and recompute the descriptor
# hash so mutations reach the serial history-extended decoder instead of
# dying at the header-checksum gate (independent-frame block bodies are
# valid linked bodies — they just never reference history; what matters
# is that the dependent decode path runs on plausible and mutated input)
lib.tpulz4_xxh32.restype = ctypes.c_uint32
for fr in list(valid_frames):
    b = bytearray(fr)
    flg = b[4] & ~0x20
    desc_len = 2 + (8 if flg & 0x08 else 0)
    b[4] = flg
    b[4 + desc_len] = (lib.tpulz4_xxh32(buf(bytes(b[4:4 + desc_len])),
                                        desc_len, 0) >> 8) & 0xFF
    consumed0 = ctypes.c_int64(0)
    r = lib.tpulz4_frame_decompress(buf(bytes(b)), len(b), fout, fcap, 2,
                                    0, 1, ctypes.byref(consumed0))
    assert r > 0, r  # must decode as a linked frame
    valid_frames.append(bytes(b))

def mutate(b):
    b = bytearray(b)
    for _ in range(rng.randrange(1, 10)):
        op = rng.randrange(3)
        if op == 0 and len(b) > 1:
            b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1 and len(b) > 2:
            del b[rng.randrange(len(b))]
        else:
            b.insert(rng.randrange(len(b) + 1), rng.randrange(256))
    if rng.random() < 0.3:
        b = b[:rng.randrange(1, len(b) + 1)]
    return bytes(b)

cdest = (ctypes.c_uint8 * 700000)()
dest = (ctypes.c_uint8 * 70000)()

# libc-malloc'd exact-size buffers: ASan tracks them, so a single byte
# written past a tight compress dest cap aborts (pymalloc pools can mask
# small overruns in ctypes-allocated buffers)
libc = ctypes.CDLL(None)
libc.malloc.restype = ctypes.c_void_p
libc.malloc.argtypes = [ctypes.c_size_t]
libc.free.argtypes = [ctypes.c_void_p]

def compress_tight(data: bytes, cap: int, fn=None):
    # src ALSO lives in an exactly-sized malloc'd buffer: wild-stride
    # literal copies read the source in 8/16-byte strides, so a source-side
    # over-read past src_len is a real bug this must catch (round-4 review
    # found one in the turbo path's 16-byte strides)
    p = libc.malloc(max(cap, 1))
    s = libc.malloc(max(len(data), 1))
    try:
        ctypes.memmove(s, data, len(data))
        (fn or lib.tpulz4_compress_fast)(ctypes.cast(s, u8p), len(data),
                                         ctypes.cast(p, u8p), cap)
    finally:
        libc.free(p)
        libc.free(s)

# directed sweep: a long literal run + matches, dest caps walked through
# the exact emission boundary (the wild-literal-emission overflow shape)
_dir = bytes(rng.randrange(256) for _ in range(6000)) + b"ab" * 64
_need = lib.tpulz4_compress_fast(buf(_dir), len(_dir), cdest, 700000)
for cap in range(max(1, _need - 24), _need + 8):
    compress_tight(_dir, cap)

# same sweep through the turbo general path (>64KB input, 16-byte wild
# literal strides): caps walked through its exact emission boundary
_dirt = bytes(rng.randrange(256) for _ in range(68000)) + b"ab" * 64
_needt = lib.tpulz4_compress_turbo(buf(_dirt), len(_dirt), cdest, 700000)
assert _needt > 0
for cap in range(max(1, _needt - 40), _needt + 8):
    compress_tight(_dirt, cap, lib.tpulz4_compress_turbo)

# multi-hundred-KB single runs (the >>8 ext-byte reserve shape, caught by
# round-4 review): a ~800KB literal run ending in an in-window match, and
# all-zeros giving one ~800KB match — both sweep caps through the exact
# boundary where an under-reserved length-extension write lands past oend
cbig = (ctypes.c_uint8 * 1_000_000)()
_lit = rng.randbytes(800_000)
_lit = _lit + _lit[-60_000:-60_000 + 64]       # match at distance 60000
_zer = bytes(800_000)
def _hc(level):
    def fn(src, src_len, dst, cap):
        return lib.tpulz4_compress_hc(src, src_len, dst, cap, level)
    return fn

# HC rides the same sweep: its encode_sequence had the identical >>8
# under-reserve shape (round-5 fix) that fast/turbo got in round 4
for blob, fns in ((_lit, (lib.tpulz4_compress_fast,
                          lib.tpulz4_compress_turbo, _hc(1), _hc(9))),
                  (_zer, (lib.tpulz4_compress_fast,
                          lib.tpulz4_compress_turbo, _hc(1), _hc(9)))):
    for fn in fns:
        need = fn(buf(blob), len(blob), cbig, 1_000_000)
        assert need > 0
        for cap in range(max(1, need - 48), need + 8):
            compress_tight(blob, cap, fn)

# dictionary-prefix compressor (round 5): tight-cap sweeps with the dict
# contiguously before src in one exactly-sized malloc'd buffer, so both
# the hist-window reads and the dest emission boundaries are ASan-checked
lib.tpulz4_compress_fast_ext.restype = ctypes.c_int
def compress_ext_tight(data: bytes, hist: bytes, cap: int):
    whole = hist + data
    p = libc.malloc(max(cap, 1))
    s = libc.malloc(max(len(whole), 1))
    try:
        ctypes.memmove(s, whole, len(whole))
        lib.tpulz4_compress_fast_ext(
            ctypes.cast(s + len(hist), u8p), len(data),
            len(hist), ctypes.cast(p, u8p), cap)
    finally:
        libc.free(p)
        libc.free(s)

for hist_n, data_mk in ((3000, lambda r: r.randbytes(2000)),
                        (65536, lambda r: r.randbytes(70000)),
                        (500, lambda r: bytes(1500)),
                        (40000, None)):
    r5 = random.Random(hist_n)
    hist5 = r5.randbytes(hist_n)
    blob5 = (hist5[:1200] + r5.randbytes(300) + hist5[:2000]
             if data_mk is None else data_mk(r5))
    w5 = buf(hist5 + blob5)
    dst5 = (ctypes.c_uint8 * 700000)()
    need = lib.tpulz4_compress_fast_ext(
        ctypes.cast(ctypes.byref(w5, hist_n), u8p), len(blob5), hist_n,
        dst5, 700000)
    assert need > 0, need
    for cap in range(max(1, need - 48), need + 8):
        compress_ext_tight(blob5, hist5, cap)

# turbo wild_copy16 source-side boundary (round-4 review): a final match
# landing within 14 bytes of send with run_len % 16 == 1 makes the literal
# copy's 16-byte strides read past the source end. Alphabet-4 random data
# produces matches at every alignment; sweeping seed x length hits the
# residues (verified: this family aborts the pre-fix library in the first
# few seeds). compress_tight places src in an exactly-sized malloc'd
# buffer so ASan sees the over-read.
for seed in range(64):
    srng = random.Random(seed)
    L = 66_000 + seed % 64
    blob = bytes(srng.choice(b"abcd") for _ in range(L))
    compress_tight(blob, 1_000_000, lib.tpulz4_compress_turbo)

t0 = time.time()
for it in range(N_ITER):
    mode = rng.randrange(10)
    if mode < 4:  # mutated valid block
        b = bytearray(rng.choice(valid))
        for _ in range(rng.randrange(1, 8)):
            b[rng.randrange(len(b))] = rng.randrange(256)
        data = bytes(b)
    elif mode < 6:  # truncated valid
        v = rng.choice(valid)
        data = v[:rng.randrange(1, len(v) + 1)]
    elif mode < 8:  # pure random
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 600)))
    else:  # random with high-token bias (long runs/offsets)
        data = bytes(rng.choice([0xFF, 0xF0, 0x0F, 0x00, rng.randrange(256)])
                     for _ in range(rng.randrange(1, 300)))
    dcap = rng.choice([0, 1, 17, 300, 5000, 65536])
    lib.tpulz4_decompress_safe(buf(data), len(data), dest, dcap)
    lib.tpulz4_decompress_fast(buf(data), len(data), dest, dcap)
    # parser (gather pipeline front end)
    S = 4096
    tabs = [(ctypes.c_int32 * S)() for _ in range(6)]
    tot = ctypes.c_int32(0)
    lib.tpulz4_parse_sequences(buf(data), len(data), S, *tabs, ctypes.byref(tot))
    # container decoders on random/mutated container bytes
    consumed = ctypes.c_int64(0)
    nt = rng.choice([1, 2, 3])
    fr = mutate(rng.choice(valid_frames)) if rng.random() < 0.7 else data
    # allow_dependent alternates so mutated FLG bytes that clear the
    # independence bit exercise the linked-block serial decoder too
    lib.tpulz4_frame_decompress(buf(fr), len(fr), cdest, 700000, nt, 0,
                                rng.randrange(2), ctypes.byref(consumed))
    bs = mutate(rng.choice(valid_streams)) if rng.random() < 0.7 else data
    lib.tpulz4_blockstream_decompress(buf(bs), len(bs), cdest, 700000, nt,
                                      rng.randrange(2), ctypes.byref(consumed))
    # compress with a tight, exactly-sized dest every few iterations
    if it % 8 == 0:
        raw = cal[rng.randrange(len(cal) - 8000):][:rng.randrange(100, 8000)]
        need = lib.tpulz4_compress_fast(buf(raw), len(raw), cdest, 700000)
        compress_tight(raw, max(1, need - rng.randrange(0, 24)))
        compress_tight(raw, need)
print(f"ASan fuzz: {N_ITER} iterations clean in {time.time()-t0:.0f}s")
