"""LZ4 Frame format v1.5.1 — interoperable writer and reader.

Byte-compatible with the `lz4` CLI and lz4-java's
``LZ4FrameOutputStream``/``LZ4FrameInputStream``
(``LZ4FrameOutputStream.java:50-120,177-306``,
``LZ4FrameInputStream.java:132-345``):

frame  = magic(4, LE 0x184D2204) FLG BD [content_size(8)] HC
         block* endmark(4 x 0) [content_checksum(4)]
block  = size(4 LE; high bit set => stored uncompressed) payload
         [block_checksum(4)]

- FLG bits: {content_checksum=2, content_size=3, block_checksum=4,
  block_independence=5}, version 1 in bits 6-7; dependent blocks are
  unsupported (reference behavior, LZ4FrameOutputStream.java:361-363).
- BD encodes max block size 2^(2n+8) for n in 4..7 (64KB..4MB).
- header checksum HC = (xxh32(FLG..end, seed=0) >> 8) & 0xFF.
- content checksum = streaming xxh32 of the uncompressed content, seed 0.
- skippable frames (magic 0x184D2A50..5F) and concatenated frames are
  handled by the reader.
"""

from __future__ import annotations

import enum
import io
import struct

from ..core.errors import Lz4FrameError
from ..api.factory import Lz4Factory, XXHashFactory
from ..native.build import NativeBuildError

MAGIC = 0x184D2204
MAGIC_SKIPPABLE_BASE = 0x184D2A50
INCOMPRESSIBLE_MASK = 0x80000000
_U32 = struct.Struct("<I")
_U64 = struct.Struct("<Q")


class FrameFlag(enum.IntEnum):
    """FLG bit positions (LZ4FrameOutputStream.java:313-321).

    DICT_ID (bit 0, frame spec v1.6+) is decode-side only: the reference
    treats it as reserved and so does this writer; readers accept it when
    a dictionary is supplied (see Lz4FrameInputStream).
    """
    DICT_ID = 0
    CONTENT_CHECKSUM = 2
    CONTENT_SIZE = 3
    BLOCK_CHECKSUM = 4
    BLOCK_INDEPENDENCE = 5


class BlockSize(enum.IntEnum):
    """BD block-maximum-size indicators (LZ4FrameOutputStream.java:62-80)."""
    SIZE_64KB = 4
    SIZE_256KB = 5
    SIZE_1MB = 6
    SIZE_4MB = 7

    @property
    def num_bytes(self) -> int:
        return 1 << (2 * self.value + 8)

    @classmethod
    def from_indicator(cls, indicator: int) -> "BlockSize":
        try:
            return cls(indicator)
        except ValueError:
            raise Lz4FrameError(
                f"Block size must be 4-7. Cannot use value of [{indicator}]")


DEFAULT_FEATURES = (FrameFlag.BLOCK_INDEPENDENCE,)
_VERSION = 1


def _flg_to_byte(flags: frozenset[FrameFlag]) -> int:
    b = (_VERSION & 3) << 6
    for f in flags:
        b |= 1 << f.value
    return b


def _flg_from_byte(b: int, allow_dependent: bool = False,
                   allow_dict_id: bool = False) -> frozenset[FrameFlag]:
    version = (b >> 6) & 3
    if version != _VERSION:
        raise Lz4FrameError(f"Version {version} is unsupported")
    if b & 0b10:
        raise Lz4FrameError("Reserved bits must be 0")
    if (b & 0b01) and not allow_dict_id:
        # bit 0 is DictID in frame spec v1.6+; the reference (v1.5.1)
        # treats it as reserved. Readers accept it when a dictionary is
        # supplied (decode-side extension).
        raise Lz4FrameError(
            "Reserved bits must be 0 (bit 0 is DictID in frame spec "
            "v1.6+ — pass dictionary= to read dictionary frames)")
    flags = frozenset(f for f in FrameFlag if b & (1 << f.value))
    if FrameFlag.BLOCK_INDEPENDENCE not in flags and not allow_dependent:
        # reference behavior (LZ4FrameOutputStream.java:361-363); readers
        # may opt into linked-block decode via allow_dependent_blocks
        raise Lz4FrameError(
            "Dependent block stream is unsupported (BLOCK_INDEPENDENCE must be set)")
    return flags


def _bd_from_byte(b: int) -> BlockSize:
    if b & 0x8F:
        raise Lz4FrameError("Reserved fields must be 0")
    return BlockSize.from_indicator((b >> 4) & 7)


class Lz4FrameOutputStream(io.RawIOBase):
    """File-like LZ4 Frame writer over an underlying binary stream.

    Flow mirrors LZ4FrameOutputStream.java:177-306: header on construction,
    buffered blocks with raw-store fallback for incompressible data, end mark
    (+ optional content checksum) on close.
    """

    def __init__(self, out, block_size: BlockSize = BlockSize.SIZE_4MB,
                 known_size: int = -1,
                 features: tuple[FrameFlag, ...] = DEFAULT_FEATURES,
                 compressor=None, checksum=None,
                 dictionary: bytes | None = None,
                 dict_id: int | None = None):
        """``dictionary`` opts into writing dictionary frames (the
        write-side of the round-5 reader extension; the reference has no
        dictionary support): every block's match window is seeded with the
        dictionary tail, and ``dict_id`` (optional) is recorded as the
        spec-v1.6 DictID header field. Blocks stay independent. Without
        the native tier, blocks are written WITHOUT dict-referencing
        matches (still a valid dictionary frame — ratio degrades, bytes
        decode identically). The default (no dictionary) keeps exact
        reference parity and refuses the DICT_ID feature flag."""
        super().__init__()
        self._out = out
        if FrameFlag.DICT_ID in frozenset(features) and dictionary is None:
            raise Lz4FrameError(
                "DICT_ID requires a dictionary (the parity writer never "
                "emits a dictID)")
        if dict_id is not None and dictionary is None:
            raise Lz4FrameError("dict_id requires a dictionary")
        if dictionary is not None and compressor is not None:
            # a custom compressor cannot search the dictionary window; a
            # silent fast-scan substitution would betray the caller's
            # choice (r5 review #3)
            raise Lz4FrameError(
                "dictionary frames use the built-in dictionary compressor; "
                "a custom compressor is not supported with dictionary=")
        self._dict_tail = bytes(dictionary)[-65536:] if dictionary else None
        self._dict_id = dict_id
        flags = frozenset(features) | {FrameFlag.BLOCK_INDEPENDENCE}
        if dict_id is not None or (dictionary is not None
                                   and FrameFlag.DICT_ID in frozenset(features)):
            if dict_id is None:
                # DICT_ID explicitly requested without an id value: honor
                # the flag rather than silently stripping it (r5 review
                # #5); 0 is a valid wire value meaning "unspecified id"
                self._dict_id = dict_id = 0
            flags = flags | {FrameFlag.DICT_ID}
        else:
            flags = flags - {FrameFlag.DICT_ID}
        if known_size >= 0:
            flags = flags | {FrameFlag.CONTENT_SIZE}
        self._flags = flags
        self._block_size = block_size
        self._max_block = block_size.num_bytes
        self._known_size = known_size
        factory = Lz4Factory.fastest_instance()
        self._compressor = compressor or factory.fast_compressor()
        self._checksum = checksum or XXHashFactory.fastest_instance().hash32()
        self._content_hash = (
            XXHashFactory.fastest_instance().new_streaming_hash32(0)
            if FrameFlag.CONTENT_CHECKSUM in flags else None)
        self._buffer = bytearray()
        self._compressed = bytearray(
            self._compressor.max_compressed_length(self._max_block))
        self._finished = False
        self._write_header()

    def writable(self) -> bool:
        return True

    def _write_header(self) -> None:
        desc = bytearray()
        desc.append(_flg_to_byte(self._flags))
        desc.append((self._block_size.value & 7) << 4)
        if FrameFlag.CONTENT_SIZE in self._flags:
            desc += _U64.pack(self._known_size)
        if FrameFlag.DICT_ID in self._flags:
            desc += _U32.pack(self._dict_id)
        hc = ((self._checksum.hash(bytes(desc), 0, len(desc), 0) & 0xFFFFFFFF) >> 8) & 0xFF
        self._out.write(_U32.pack(MAGIC) + bytes(desc) + bytes([hc]))

    def write(self, data) -> int:
        if self._finished:
            raise ValueError("The stream is already closed")
        data = memoryview(data)
        written = len(data)
        while len(data) > 0:
            room = self._max_block - len(self._buffer)
            take = min(room, len(data))
            self._buffer += data[:take]
            data = data[take:]
            if len(self._buffer) == self._max_block:
                self._write_block()
        return written

    def _write_block(self) -> None:
        if not self._buffer:
            return
        n = len(self._buffer)
        if self._content_hash is not None:
            self._content_hash.update(self._buffer, 0, n)
        if self._dict_tail is not None:
            try:
                from ..api import native_instances as ni
                comp = ni.compress_block_with_dict(bytes(self._buffer),
                                                   self._dict_tail)
            except (ImportError, NativeBuildError):
                # no native tier: a dict frame without dict-referencing
                # matches is still valid — ratio degrades, bytes decode
                # identically with or without the dictionary
                comp = None
            if comp is not None and len(comp) < n:
                self._out.write(_U32.pack(len(comp)))
                self._out.write(comp)
                if FrameFlag.BLOCK_CHECKSUM in self._flags:
                    h = self._checksum.hash(comp, 0, len(comp), 0) & 0xFFFFFFFF
                    self._out.write(_U32.pack(h))
                self._buffer.clear()
                return
        compressed_len = self._compressor.compress(
            self._buffer, 0, n, self._compressed, 0, len(self._compressed))
        if compressed_len >= n:
            # incompressible: store raw with the high-bit mask
            payload = bytes(self._buffer)
            size_word = n | INCOMPRESSIBLE_MASK
        else:
            payload = bytes(self._compressed[:compressed_len])
            size_word = compressed_len
        self._out.write(_U32.pack(size_word))
        self._out.write(payload)
        if FrameFlag.BLOCK_CHECKSUM in self._flags:
            h = self._checksum.hash(payload, 0, len(payload), 0) & 0xFFFFFFFF
            self._out.write(_U32.pack(h))
        self._buffer.clear()

    def flush(self) -> None:
        if not self._finished:
            self._write_block()
        if hasattr(self._out, "flush"):
            self._out.flush()

    def _write_end_mark(self) -> None:
        self._out.write(_U32.pack(0))
        if self._content_hash is not None:
            self._out.write(_U32.pack(self._content_hash.get_value() & 0xFFFFFFFF))
        self._finished = True

    def close(self) -> None:
        if not self.closed:
            if not self._finished:
                self.flush()
                self._write_end_mark()
            super().close()

    def close_keep_underlying(self) -> None:
        """Finish the frame without closing the wrapped stream."""
        if not self._finished:
            self.flush()
            self._write_end_mark()


class Lz4FrameInputStream(io.RawIOBase):
    """File-like LZ4 Frame reader: concatenated + skippable frames, checksum
    validation, lazy header read (LZ4FrameInputStream.java:132-345)."""

    def __init__(self, inp, read_single_frame: bool = False,
                 decompressor=None, checksum=None,
                 allow_dependent_blocks: bool = False,
                 dictionary: bytes | None = None):
        super().__init__()
        self._in = inp
        self._read_single_frame = read_single_frame
        factory = Lz4Factory.fastest_instance()
        self._decompressor = decompressor or factory.safe_decompressor()
        self._checksum = checksum or XXHashFactory.fastest_instance().hash32()
        # opt-in linked-block ("dependent", lz4 CLI -BD) frame reading; the
        # default refuses such frames like the reference does
        # (LZ4FrameOutputStream.java:361-363)
        self._allow_dependent = allow_dependent_blocks
        self._dependent = False
        # opt-in dictionary decode (lz4 CLI -D, LZ4F usingDict): the last
        # 64KB of the dictionary seeds the match window of every
        # independent block (and the initial window of a linked frame).
        # Supplying a dictionary also accepts the DictID header field
        # (spec v1.6+ bit 0, reserved in the reference's v1.5.1).
        self._dict_tail = bytes(dictionary)[-65536:] if dictionary else b""
        self._has_dict = dictionary is not None
        self._dict_id: int | None = None
        self._history = b""  # last 64KB of this frame's decoded output
        self._buffer = b""
        self._pos = 0
        self._first_header_read = False
        self._frame_finished = False
        self._flags: frozenset[FrameFlag] = frozenset()
        self._max_block = 0
        self._content_hash = None
        self._expected_content_size = -1
        self._total_content_size = 0
        self._eof = False

    def readable(self) -> bool:
        return True

    @property
    def expected_content_size(self) -> int:
        """Content size declared in the current frame header, or -1.

        Counterpart of ``getExpectedContentSize`` (LZ4FrameInputStream.java:416-445).
        """
        return self._expected_content_size

    @property
    def dict_id(self) -> int | None:
        """DictID declared in the current frame header (spec v1.6+ bit 0),
        or None. Only populated when a dictionary was supplied."""
        return self._dict_id

    def _read_exact(self, n: int, *, allow_eof_at_start: bool = False):
        data = b""
        while len(data) < n:
            chunk = self._in.read(n - len(data))
            if not chunk:
                if allow_eof_at_start and not data:
                    return None
                raise Lz4FrameError("Stream ended prematurely")
            data += chunk
        return data

    def _next_frame_info(self) -> bool:
        while True:
            word = self._read_exact(4, allow_eof_at_start=self._first_header_read)
            if word is None:
                return False
            magic = _U32.unpack(word)[0]
            if magic == MAGIC:
                self._read_header()
                return True
            if (magic >> 4) == (MAGIC_SKIPPABLE_BASE >> 4):
                skip_size = _U32.unpack(self._read_exact(4))[0]
                # discard in chunks: skip_size is attacker-controlled up
                # to 4GB-1 and must not be buffered whole
                remaining = skip_size
                while remaining:
                    chunk = self._read_exact(min(remaining, 1 << 20))
                    remaining -= len(chunk)
                self._first_header_read = True
                continue
            raise Lz4FrameError("Stream unsupported (not an LZ4 frame)")

    def _read_header(self) -> None:
        desc = bytearray(self._read_exact(2))
        self._flags = _flg_from_byte(desc[0], self._allow_dependent,
                                     self._has_dict)
        self._dependent = FrameFlag.BLOCK_INDEPENDENCE not in self._flags
        # the match window resets per frame; a dictionary seeds it
        self._history = self._dict_tail
        block_size = _bd_from_byte(desc[1])
        if FrameFlag.CONTENT_SIZE in self._flags:
            raw = self._read_exact(8)
            desc += raw
            self._expected_content_size = _U64.unpack(raw)[0]
        else:
            self._expected_content_size = -1
        if FrameFlag.DICT_ID in self._flags:
            raw = self._read_exact(4)
            desc += raw  # dictID is covered by the header checksum
            self._dict_id = _U32.unpack(raw)[0]
        else:
            self._dict_id = None
        self._total_content_size = 0
        expected_hc = self._read_exact(1)[0]
        hc = ((self._checksum.hash(bytes(desc), 0, len(desc), 0) & 0xFFFFFFFF) >> 8) & 0xFF
        if hc != expected_hc:
            raise Lz4FrameError("Frame header checksum mismatch")
        self._max_block = block_size.num_bytes
        self._content_hash = (
            XXHashFactory.fastest_instance().new_streaming_hash32(0)
            if FrameFlag.CONTENT_CHECKSUM in self._flags else None)
        self._first_header_read = True
        self._frame_finished = False

    def _read_block(self) -> None:
        size_word = _U32.unpack(self._read_exact(4))[0]
        compressed = (size_word & INCOMPRESSIBLE_MASK) == 0
        block_size = size_word & ~INCOMPRESSIBLE_MASK

        if block_size == 0:  # end mark
            if self._content_hash is not None:
                expect = _U32.unpack(self._read_exact(4))[0]
                if expect != (self._content_hash.get_value() & 0xFFFFFFFF):
                    raise Lz4FrameError("Content checksum mismatch")
            if (self._expected_content_size >= 0
                    and self._expected_content_size != self._total_content_size):
                raise Lz4FrameError("Size check mismatch")
            self._frame_finished = True
            return

        if block_size > self._max_block:
            raise Lz4FrameError(
                f"Block size {block_size} exceeded max: {self._max_block}")
        payload = self._read_exact(block_size)

        if FrameFlag.BLOCK_CHECKSUM in self._flags:
            expect = _U32.unpack(self._read_exact(4))[0]
            if expect != (self._checksum.hash(payload, 0, block_size, 0) & 0xFFFFFFFF):
                raise Lz4FrameError("Block checksum mismatch")

        if compressed and self._dependent:
            raw = _decode_dependent_block(payload, self._max_block,
                                          self._history)
        elif compressed and self._has_dict:
            # independent blocks with a dictionary: every block's window
            # is seeded with the dictionary tail (LZ4F usingDict
            # semantics), never with previous blocks' output
            raw = _decode_dependent_block(payload, self._max_block,
                                          self._dict_tail)
        elif compressed:
            raw = self._decompressor.decompress_alloc(
                payload, 0, block_size, self._max_block)
        else:
            raw = payload
        if self._dependent:
            self._history = (self._history + bytes(raw))[-65536:]
        if self._content_hash is not None:
            self._content_hash.update(raw, 0, len(raw))
        self._total_content_size += len(raw)
        self._buffer = raw
        self._pos = 0

    def _fill(self) -> bool:
        """Ensure at least one readable byte is buffered; False at EOF."""
        while self._pos >= len(self._buffer):
            if not self._first_header_read or self._frame_finished:
                if self._first_header_read and self._read_single_frame:
                    return False
                if not self._next_frame_info():
                    return False
            self._read_block()
        return True

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            chunks = []
            while self._fill():
                chunks.append(self._buffer[self._pos:])
                self._pos = len(self._buffer)
            return b"".join(chunks)
        if n == 0:
            return b""
        if not self._fill():
            return b""
        take = min(n, len(self._buffer) - self._pos)
        out = self._buffer[self._pos:self._pos + take]
        self._pos += take
        return out

    def readinto(self, b) -> int:
        data = self.read(len(b))
        b[:len(data)] = data
        return len(data)


def _decode_dependent_block_ref(payload, out_max: int, history) -> bytes:
    """Pure-Python linked-block decode: history is placed before the output
    region of one buffer and the reference decoder runs with the ``hist``
    window extension."""
    from ..core import lz4_block_ref
    h = len(history)
    buf = bytearray(h + out_max)
    buf[:h] = history
    n = lz4_block_ref.decompress_safe(payload, 0, len(payload),
                                      buf, h, out_max, hist=h)
    return bytes(buf[h:h + n])


def _decode_dependent_block(payload, out_max: int, history) -> bytes:
    """Decode one linked-mode block against up to 64KB of prior output.

    Native history-extended decoder when available; pure-Python reference
    decoder (``hist`` window extension) otherwise.
    """
    try:
        from ..api import native_instances as ni
        return ni.decompress_block_with_history(payload, out_max, history)
    except (ImportError, NativeBuildError):
        return _decode_dependent_block_ref(payload, out_max, history)


def compress_frame(data, block_size: BlockSize = BlockSize.SIZE_4MB,
                   features: tuple[FrameFlag, ...] = DEFAULT_FEATURES,
                   known_size: bool = False, compressor=None,
                   dictionary: bytes | None = None,
                   dict_id: int | None = None) -> bytes:
    """One-shot: wrap ``data`` in a complete LZ4 frame.

    Routed through the native one-call frame codec (threaded block compress
    + header assembly in C++, byte-identical output) when the native tier
    is available and no custom compressor was supplied.

    ``dictionary`` writes a dictionary frame (see Lz4FrameOutputStream):
    each block's match window is seeded with the dictionary tail and
    ``dict_id`` is recorded as the DictID header field when given.
    """
    if dictionary is not None:
        out = io.BytesIO()
        stream = Lz4FrameOutputStream(
            out, block_size=block_size,
            known_size=len(data) if known_size else -1,
            features=features, compressor=compressor,
            dictionary=dictionary, dict_id=dict_id)
        stream.write(data)
        stream.close_keep_underlying()
        return out.getvalue()
    if compressor is None:
        try:
            from ..api import native_instances as ni
            flags = 0
            fl = frozenset(features)
            if FrameFlag.CONTENT_CHECKSUM in fl:
                flags |= ni.F_CONTENT_CHECKSUM
            if FrameFlag.BLOCK_CHECKSUM in fl:
                flags |= ni.F_BLOCK_CHECKSUM
            if known_size or FrameFlag.CONTENT_SIZE in fl:
                flags |= ni.F_CONTENT_SIZE
            return ni.compress_frame_packed(data, int(block_size), flags)
        except (ImportError, NativeBuildError):
            pass
    out = io.BytesIO()
    stream = Lz4FrameOutputStream(
        out, block_size=block_size,
        known_size=len(data) if known_size else -1,
        features=features, compressor=compressor)
    stream.write(data)
    stream.close_keep_underlying()
    return out.getvalue()


def decompress_frame(data, read_single_frame: bool = False,
                     allow_dependent_blocks: bool = False,
                     dictionary: bytes | None = None) -> bytes:
    """One-shot: decode one or more concatenated LZ4 frames.

    Routed through the native one-call frame codec (parse + threaded block
    decode + checksum verification in C++) when available.
    ``allow_dependent_blocks=True`` additionally reads linked-block frames
    (lz4 CLI ``-BD``); the default refuses them like the reference.
    ``dictionary`` enables dictionary-frame decode (lz4 CLI ``-D``, LZ4F
    usingDict): the dictionary tail seeds each block's match window, and
    the DictID header field is accepted. Dictionary decode runs through
    the stream reader (per-block window seeding is serial by nature).
    """
    if dictionary is not None:
        stream = Lz4FrameInputStream(
            io.BytesIO(data), read_single_frame=read_single_frame,
            allow_dependent_blocks=allow_dependent_blocks,
            dictionary=dictionary)
        return stream.read()
    try:
        from ..api import native_instances as ni
        out, _ = ni.decompress_frame_packed(
            bytes(data), single_frame=read_single_frame,
            allow_dependent=allow_dependent_blocks)
        return out
    except (ImportError, NativeBuildError):
        pass
    stream = Lz4FrameInputStream(
        io.BytesIO(data), read_single_frame=read_single_frame,
        allow_dependent_blocks=allow_dependent_blocks)
    return stream.read()


def make_skippable_frame(payload: bytes, subtype: int = 0) -> bytes:
    """Build a skippable frame (magic 0x184D2A5x) wrapping arbitrary bytes."""
    if not 0 <= subtype <= 0xF:
        raise ValueError("subtype must be 0..15")
    return _U32.pack(MAGIC_SKIPPABLE_BASE + subtype) + _U32.pack(len(payload)) + payload
