"""Streaming frame pipeline: chunked file IO feeding batched codec engines.

The host side of the TPU data plane (SURVEY.md §7 T4): input streams are cut
into frame blocks, queued into large batches, compressed/decompressed by a
pluggable *batch engine* (multithreaded C++, device kernels, or the sharded
mesh pipeline), and re-emitted as standard LZ4 frames in order. The frame
bytes produced are identical to the one-block-at-a-time writer
(formats/frame.py) because blocks are independent (BLOCK_INDEPENDENCE,
``LZ4FrameOutputStream.java:58``).
"""

from __future__ import annotations

import io
import struct

from ..core.errors import Lz4FrameError
from ..formats.frame import (
    BlockSize, FrameFlag, INCOMPRESSIBLE_MASK, MAGIC, MAGIC_SKIPPABLE_BASE,
    _bd_from_byte, _flg_from_byte, _flg_to_byte,
)

_U32 = struct.Struct("<I")
_U64 = struct.Struct("<Q")


def _hash32(data) -> int:
    """One-shot xxh32 via the fastest tier (pure-Python would bottleneck)."""
    from ..api.factory import XXHashFactory
    f = XXHashFactory.fastest_instance()
    return f.hash32().hash(data, 0, len(data), 0) & 0xFFFFFFFF


def _new_streaming32():
    from ..api.factory import XXHashFactory
    return XXHashFactory.fastest_instance().new_streaming_hash32(0)


class BatchEngine:
    """Batched block codecs: list[bytes] -> list[bytes], plus optional
    packed entry points (one contiguous buffer each way — the zero-copy
    data plane the native tier exposes)."""

    def __init__(self, name, compress_batch, decompress_batch,
                 compress_packed=None, decompress_packed=None):
        self.name = name
        self.compress_batch = compress_batch
        self.decompress_batch = decompress_batch
        self.compress_packed = compress_packed
        self.decompress_packed = decompress_packed

    def __repr__(self):
        return f"BatchEngine({self.name})"


def get_engine(name: str = "fastest", level: int = 0) -> BatchEngine:
    """Engines: 'native' (C++ threads), 'pallas' (device kernels),
    'segment' (host parse + device segment-executor decode),
    'sharded' (device mesh), 'safe' (reference), 'fastest' (first working).

    ``level`` 0 builds the fast-scan compressor; 1..17 builds the engine's
    own HC compressor at that level — every family exposes HC, matching
    ``LZ4Factory.java:189-202``. ``level -1`` selects the opt-in turbo
    heuristic on the native engine (see api.factory.turbo_compressor);
    other engines fall back to their fast compressor, mirroring the
    factory's graceful tier fallback.
    """
    import functools
    if name == "fastest":
        for cand in ("native", "safe"):
            try:
                return get_engine(cand, level)
            except Exception:
                continue
        raise Lz4FrameError("no batch engine available")
    if level < 0 and name != "native":
        level = 0  # turbo is a native-tier heuristic; others use fast scan
    suffix = f"-hc{level}" if level > 0 else ("-turbo" if level < 0 else "")
    if name == "parallel":
        # device-parallel compressor (kernels/parallel_compress.py): valid
        # non-identical output; decode rides the native engine
        if level > 0:
            # no device-parallel HC exists — refusing beats silently
            # handing back fast-scan-quality output at a requested level
            raise Lz4FrameError(
                f"engine 'parallel' has no HC mode (level={level}); "
                "use engine 'native'/'pallas'/'sharded' for HC")
        from ..api import native_instances as ni
        from ..kernels import parallel_compress as pcomp

        return BatchEngine(
            "parallel",
            pcomp.compress_blocks,
            lambda blocks, out_max: ni.decompress_safe_batch(blocks, out_max),
            decompress_packed=ni.decompress_safe_packed)
    if name == "native":
        from ..api import native_instances as ni
        if level < 0:
            comp_packed = functools.partial(ni.compress_fast_packed,
                                            turbo=True)
            turbo = None

            def comp(blocks):
                nonlocal turbo
                if turbo is None:
                    from ..api.factory import Lz4Factory
                    turbo = Lz4Factory.native_instance().turbo_compressor()
                return [turbo.compress_alloc(b) for b in blocks]

            return BatchEngine(
                "native-turbo",
                comp,
                lambda blocks, out_max: ni.decompress_safe_batch(blocks,
                                                                 out_max),
                compress_packed=comp_packed,
                decompress_packed=ni.decompress_safe_packed)
        if level:
            comp_packed = functools.partial(ni.compress_hc_packed, level=level)
            hc = None

            def comp(blocks):
                nonlocal hc
                if hc is None:
                    from ..api.factory import Lz4Factory
                    hc = Lz4Factory.native_instance().high_compressor(level)
                return [hc.compress_alloc(b) for b in blocks]
        else:
            comp_packed = ni.compress_fast_packed
            comp = ni.compress_fast_batch
        return BatchEngine(
            "native" + suffix,
            comp,
            lambda blocks, out_max: ni.decompress_safe_batch(blocks, out_max),
            compress_packed=comp_packed,
            decompress_packed=ni.decompress_safe_packed)
    if name == "pallas":
        from ..api.factory import Lz4Factory
        f = Lz4Factory.pallas_instance()
        comp = (f.high_compressor(level) if level
                else f.fast_compressor()).compress_batch
        return BatchEngine(
            "pallas" + suffix,
            comp,
            f.safe_decompressor().decompress_batch)
    if name == "segment":
        # host parse (C++) + device segment-executor decode; compression
        # stays on the native tier (device compress is latency-bound)
        from ..api import native_instances as ni
        from ..kernels import segment_decode

        def decomp(blocks, out_max):
            return segment_decode.decompress_blocks(blocks, out_max)

        comp = get_engine("native", level).compress_batch
        return BatchEngine("segment" + suffix, comp, decomp)
    if name == "sharded":
        from ..dist import shard_compress_blocks, shard_decompress_blocks
        comp = (functools.partial(shard_compress_blocks, level=level)
                if level else shard_compress_blocks)
        return BatchEngine(
            "sharded" + suffix,
            comp,
            shard_decompress_blocks)
    if name == "safe":
        from ..api.factory import Lz4Factory
        f = Lz4Factory.safe_instance()
        c = f.high_compressor(level) if level else f.fast_compressor()

        def comp(blocks):
            return [c.compress_alloc(b) for b in blocks]

        def decomp(blocks, out_max):
            return [f.safe_decompressor().decompress_alloc(b, 0, len(b), out_max)
                    for b in blocks]

        return BatchEngine("safe" + suffix, comp, decomp)
    raise ValueError(f"unknown engine {name!r}")


def compress_stream(src, dst, block_size: BlockSize = BlockSize.SIZE_64KB,
                    engine: BatchEngine | str = "fastest",
                    content_checksum: bool = True,
                    batch_blocks: int = 256, level: int = 0) -> int:
    """Compress a binary stream into an LZ4 frame on ``dst``.

    Reads ``batch_blocks`` blocks at a time and compresses them as one batch
    through the engine. ``level`` 0 selects the fast-scan compressor;
    1-17 selects HC at that level (LZ4Factory.highCompressor semantics).
    Returns the number of compressed bytes written.
    """
    if isinstance(engine, str):
        engine = get_engine(engine, level)   # engine-native HC at level 1..17
    elif level > 0:
        # a prebuilt engine instance: wrap its compress side with HC, staying
        # in the same family where possible
        import functools
        from ..api.factory import Lz4Factory
        from ..native.build import NativeBuildError
        try:
            from ..api import native_instances as ni
            engine = BatchEngine(
                f"{engine.name}-hc{level}", engine.compress_batch,
                engine.decompress_batch,
                compress_packed=functools.partial(ni.compress_hc_packed,
                                                  level=level),
                decompress_packed=engine.decompress_packed)
        except (ImportError, NativeBuildError):
            hc_comp = Lz4Factory.fastest_instance().high_compressor(level)
            engine = BatchEngine(
                f"{engine.name}-hc{level}",
                lambda blocks: [hc_comp.compress_alloc(b) for b in blocks],
                engine.decompress_batch)
    bs = block_size.num_bytes
    flags = {FrameFlag.BLOCK_INDEPENDENCE}
    if content_checksum:
        flags.add(FrameFlag.CONTENT_CHECKSUM)

    desc = bytes([_flg_to_byte(frozenset(flags)),
                  (block_size.value & 7) << 4])
    hc = (_hash32(desc) >> 8) & 0xFF
    written = 0

    def w(data):
        nonlocal written
        dst.write(data)
        written += len(data)

    w(_U32.pack(MAGIC) + desc + bytes([hc]))
    content_hash = _new_streaming32() if content_checksum else None

    if engine.compress_packed is not None:
        # packed fast path: bulk reads, one native call per batch, one
        # content-hash update per batch, zero-copy payload emission
        while True:
            chunk = src.read(bs * batch_blocks)
            if not chunk:
                break
            while 0 < len(chunk) < bs * batch_blocks:
                more = src.read(bs * batch_blocks - len(chunk))
                if not more:
                    break
                chunk += more
            if content_hash is not None:
                content_hash.update(chunk)
            comp, offs, lens = engine.compress_packed(chunk, bs)
            cmv = memoryview(comp)
            rmv = memoryview(chunk)
            pos = 0
            for i in range(len(lens)):
                raw_len = min(bs, len(chunk) - pos)
                clen = int(lens[i])
                if clen >= raw_len:
                    w(_U32.pack(raw_len | INCOMPRESSIBLE_MASK))
                    w(rmv[pos:pos + raw_len])
                else:
                    o = int(offs[i])
                    w(_U32.pack(clen))
                    w(cmv[o:o + clen])
                pos += raw_len
            if len(chunk) < bs * batch_blocks:
                break
    else:
        while True:
            blocks = []
            while len(blocks) < batch_blocks:
                chunk = src.read(bs)
                if not chunk:
                    break
                while 0 < len(chunk) < bs:
                    more = src.read(bs - len(chunk))
                    if not more:
                        break
                    chunk += more
                blocks.append(chunk)
                if len(chunk) < bs:
                    break
            if not blocks:
                break
            compressed = engine.compress_batch(blocks)
            for raw, comp in zip(blocks, compressed):
                if content_hash is not None:
                    content_hash.update(raw)
                if len(comp) >= len(raw):
                    w(_U32.pack(len(raw) | INCOMPRESSIBLE_MASK))
                    w(raw)
                else:
                    w(_U32.pack(len(comp)))
                    w(comp)
            if len(blocks[-1]) < bs:
                break

    w(_U32.pack(0))
    if content_hash is not None:
        w(_U32.pack(content_hash.get_value() & 0xFFFFFFFF))
    return written


class _PrependStream(io.RawIOBase):
    """Replay ``head`` bytes, then delegate reads to ``tail`` (used to
    hand an already-parsed frame header back to the frame reader)."""

    def __init__(self, head: bytes, tail):
        self._head = memoryview(head)
        self._pos = 0
        self._tail = tail

    def readable(self) -> bool:
        return True

    def read(self, n: int = -1):
        if self._pos < len(self._head):
            if n is None or n < 0:
                out = bytes(self._head[self._pos:]) + (self._tail.read() or b"")
                self._pos = len(self._head)
                return out
            take = min(n, len(self._head) - self._pos)
            out = bytes(self._head[self._pos:self._pos + take])
            self._pos += take
            return out
        return self._tail.read(n)


def decompress_stream(src, dst, engine: BatchEngine | str = "fastest",
                      batch_blocks: int = 256,
                      allow_dependent: bool = False) -> int:
    """Decode LZ4 frames (concatenated, with skippables) from ``src`` into
    ``dst``; block payloads are decompressed in engine batches. Returns the
    number of decompressed bytes written.

    ``allow_dependent=True`` additionally reads linked-block frames (lz4
    CLI ``-BD``) — those decode serially (each block references up to 64KB
    of prior output, so there is no batch parallelism to exploit); the
    default refuses them like the reference.
    """
    if isinstance(engine, str):
        engine = get_engine(engine)
    written = 0

    def read_exact(n, eof_ok=False):
        data = src.read(n)
        while data is not None and 0 < len(data) < n:
            more = src.read(n - len(data))
            if not more:
                break
            data += more
        if not data and eof_ok:
            return None
        if data is None or len(data) < n:
            raise Lz4FrameError("Stream ended prematurely")
        return data

    first = True
    while True:
        word = read_exact(4, eof_ok=not first)
        if word is None:
            break
        magic = _U32.unpack(word)[0]
        if (magic >> 4) == (MAGIC_SKIPPABLE_BASE >> 4):
            skip = _U32.unpack(read_exact(4))[0]
            # discard in chunks (attacker-controlled size, don't buffer)
            while skip:
                skip -= len(read_exact(min(skip, 1 << 20)))
            first = False
            continue
        if magic != MAGIC:
            raise Lz4FrameError("Stream unsupported (not an LZ4 frame)")
        first = False

        desc = bytearray(read_exact(2))
        flags = _flg_from_byte(desc[0], allow_dependent)
        dependent = FrameFlag.BLOCK_INDEPENDENCE not in flags
        bsz = _bd_from_byte(desc[1])
        expected_size = -1
        if FrameFlag.CONTENT_SIZE in flags:
            raw8 = read_exact(8)
            desc += raw8
            expected_size = _U64.unpack(raw8)[0]
        hc = read_exact(1)[0]
        if ((_hash32(bytes(desc)) >> 8) & 0xFF) != hc:
            raise Lz4FrameError("Frame header checksum mismatch")

        content_hash = (_new_streaming32()
                        if FrameFlag.CONTENT_CHECKSUM in flags else None)
        bs = bsz.num_bytes
        total = 0

        if dependent:
            # linked-block frame body: no batch parallelism exists (block
            # i references block i-1), so delegate the whole frame —
            # header bytes replayed in front of the source — to the serial
            # frame reader instead of duplicating its block loop here
            from ..formats.frame import Lz4FrameInputStream
            header = word + bytes(desc) + bytes([hc])
            reader = Lz4FrameInputStream(
                _PrependStream(header, src), read_single_frame=True,
                allow_dependent_blocks=True)
            while True:
                chunk = reader.read(1 << 20)
                if not chunk:
                    break
                dst.write(chunk)
                written += len(chunk)
            continue

        pending: list[tuple[bool, bytes]] = []

        def flush_pending():
            nonlocal written, total
            if engine.decompress_packed is not None and pending:
                # packed fast path: join compressed payloads once, one
                # native call, zero-copy per-block emission
                import numpy as np
                comp_blocks = [p for is_c, p in pending if is_c]
                if comp_blocks:
                    packed = b"".join(comp_blocks)
                    offs = np.zeros(len(comp_blocks), np.int64)
                    lens = np.zeros(len(comp_blocks), np.int32)
                    pos = 0
                    for i, p in enumerate(comp_blocks):
                        offs[i] = pos
                        lens[i] = len(p)
                        pos += len(p)
                    dest, dlens = engine.decompress_packed(packed, offs,
                                                           lens, bs)
                    dmv = memoryview(dest)
                else:
                    dlens = []
                j = 0
                run_start = 0          # contiguous dest span pending hash
                run_end = 0
                for is_c, payload in pending:
                    if is_c:
                        raw = dmv[j * bs:j * bs + int(dlens[j])]
                        if content_hash is not None:
                            if run_end == j * bs:
                                run_end = j * bs + int(dlens[j])
                            else:
                                if run_end > run_start:
                                    content_hash.update(dmv[run_start:run_end])
                                run_start = j * bs
                                run_end = j * bs + int(dlens[j])
                        j += 1
                    else:
                        raw = payload
                        if content_hash is not None:
                            if run_end > run_start:
                                content_hash.update(dmv[run_start:run_end])
                            run_start = run_end = j * bs
                            content_hash.update(payload)
                    dst.write(raw)
                    written += len(raw)
                    total += len(raw)
                if content_hash is not None and run_end > run_start:
                    content_hash.update(dmv[run_start:run_end])
                pending.clear()
                return
            comp_blocks = [p for is_c, p in pending if is_c]
            decomp = iter(engine.decompress_batch(comp_blocks, bs)
                          if comp_blocks else [])
            for is_c, payload in pending:
                raw = next(decomp) if is_c else payload
                if content_hash is not None:
                    content_hash.update(raw)
                dst.write(raw)
                written += len(raw)
                total += len(raw)
            pending.clear()

        while True:
            size_word = _U32.unpack(read_exact(4))[0]
            compressed = (size_word & INCOMPRESSIBLE_MASK) == 0
            block_size = size_word & ~INCOMPRESSIBLE_MASK
            if block_size == 0:
                flush_pending()
                if content_hash is not None:
                    expect = _U32.unpack(read_exact(4))[0]
                    if expect != (content_hash.get_value() & 0xFFFFFFFF):
                        raise Lz4FrameError("Content checksum mismatch")
                if 0 <= expected_size != total:
                    raise Lz4FrameError("Size check mismatch")
                break
            if block_size > bs:
                raise Lz4FrameError(f"Block size {block_size} exceeded max: {bs}")
            payload = read_exact(block_size)
            if FrameFlag.BLOCK_CHECKSUM in flags:
                expect = _U32.unpack(read_exact(4))[0]
                if expect != _hash32(payload):
                    raise Lz4FrameError("Block checksum mismatch")
            pending.append((compressed, payload))
            if len(pending) >= batch_blocks:
                flush_pending()
    return written
