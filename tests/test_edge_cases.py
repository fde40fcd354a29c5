"""Edge-case and lifecycle tests mirroring remaining reference behaviors:
frame descriptor validation, block-stream bounds, write-after-finish, and
tier fallback when the native library is disabled."""

import io
import struct
import subprocess
import sys

import pytest

from lz4_tpu.core.errors import Lz4FrameError
from lz4_tpu.formats.frame import compress_frame, decompress_frame
from lz4_tpu.formats.block_stream import Lz4BlockOutputStream

from conftest import random_bytes


def _patch_frame_byte(frame: bytes, idx: int, value: int) -> bytes:
    b = bytearray(frame)
    b[idx] = value
    # fix the header checksum so only the targeted validation fires
    from lz4_tpu.core.xxhash_ref import xxh32
    desc_len = 2  # FLG + BD (no content size in these tests)
    b[4 + desc_len] = (xxh32(bytes(b[4:4 + desc_len])) >> 8) & 0xFF
    return bytes(b)


def test_frame_version_must_be_1():
    frame = compress_frame(b"x" * 100)
    bad = _patch_frame_byte(frame, 4, (frame[4] & 0x3F) | (2 << 6))  # version 2
    with pytest.raises(Lz4FrameError, match="[Vv]ersion"):
        decompress_frame(bad)


def test_frame_block_independence_required():
    frame = compress_frame(b"x" * 100)
    bad = _patch_frame_byte(frame, 4, frame[4] & ~0x20)  # clear B.Indep
    with pytest.raises(Lz4FrameError, match="BLOCK_INDEPENDENCE"):
        decompress_frame(bad)


def test_frame_reserved_bits_must_be_zero():
    frame = compress_frame(b"x" * 100)
    bad = _patch_frame_byte(frame, 4, frame[4] | 0x02)  # set reserved bit 1
    with pytest.raises(Lz4FrameError, match="[Rr]eserved"):
        decompress_frame(bad)
    bad_bd = _patch_frame_byte(frame, 5, frame[5] | 0x80)  # BD reserved
    with pytest.raises(Lz4FrameError, match="[Rr]eserved"):
        decompress_frame(bad_bd)


def test_frame_bad_block_size_indicator():
    frame = compress_frame(b"x" * 100)
    bad = _patch_frame_byte(frame, 5, 0x30)  # indicator 3 < 4
    with pytest.raises(Lz4FrameError, match="[Bb]lock size"):
        decompress_frame(bad)


def test_frame_oversized_block_rejected(rng):
    # declare a 64KB frame, then claim a block bigger than the maximum
    data = random_bytes(rng, 100, 8)
    from lz4_tpu.formats.frame import BlockSize
    frame = bytearray(compress_frame(data, block_size=BlockSize.SIZE_64KB))
    struct.pack_into("<I", frame, 7, (1 << 20))  # block size 1MB > 64KB max
    with pytest.raises(Lz4FrameError, match="exceeded max"):
        decompress_frame(bytes(frame))


def test_block_stream_write_after_finish(rng):
    out = io.BytesIO()
    s = Lz4BlockOutputStream(out)
    s.write(b"abc")
    s.finish()
    with pytest.raises(ValueError):
        s.write(b"more")


def test_block_stream_block_size_bounds():
    with pytest.raises(ValueError):
        Lz4BlockOutputStream(io.BytesIO(), block_size=32)       # < 64
    with pytest.raises(ValueError):
        Lz4BlockOutputStream(io.BytesIO(), block_size=1 << 26)  # > 32MB


def test_native_disabled_falls_back():
    """TPULZ4_NO_NATIVE=1 must make fastest_instance() skip the C++ tier
    (the pure-java-artifact analog). Run in a subprocess: the library
    handle is cached per process."""
    code = (
        "import os; os.environ['TPULZ4_NO_NATIVE']='1';\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "from lz4_tpu.api.factory import Lz4Factory\n"
        "import pytest\n"
        "try:\n"
        "    Lz4Factory.native_instance(); print('NATIVE_OK')\n"
        "except Exception: print('NATIVE_BLOCKED')\n"
        "print('FASTEST', Lz4Factory.fastest_instance().impl)\n"
    )
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd="/root/repo", timeout=500)
    assert "NATIVE_BLOCKED" in res.stdout, res.stdout + res.stderr
    assert "FASTEST" in res.stdout
    assert "FASTEST native" not in res.stdout


def test_one_shot_routers_work_without_native():
    """The frame/blockstream one-shot convenience APIs must fall back to
    the pure-Python writers when the native tier is unavailable
    (NativeBuildError, not just ImportError — advisor r1 finding #2).
    Subprocess: the library handle is cached per process."""
    code = (
        "import os; os.environ['TPULZ4_NO_NATIVE']='1'\n"
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "from lz4_tpu.formats.frame import compress_frame, decompress_frame\n"
        "from lz4_tpu.formats.block_stream import (compress_block_stream,"
        " decompress_block_stream)\n"
        "import io\n"
        "from lz4_tpu.streams.pipeline import compress_stream\n"
        "data = bytes(range(256)) * 40\n"
        "assert decompress_frame(compress_frame(data)) == data\n"
        "assert decompress_block_stream(compress_block_stream(data)) == data\n"
        "out = io.BytesIO()\n"
        "compress_stream(io.BytesIO(data), out, engine='safe', level=9)\n"
        "assert decompress_frame(out.getvalue()) == data\n"
        "print('ROUTERS_OK')\n"
    )
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd="/root/repo", timeout=500)
    assert "ROUTERS_OK" in res.stdout, res.stdout + res.stderr


def test_pallas_engine_stream_roundtrip(rng):
    from lz4_tpu.streams import compress_stream, decompress_stream, get_engine
    eng = get_engine("pallas")
    data = random_bytes(rng, 3000, 8)
    out = io.BytesIO()
    compress_stream(io.BytesIO(data), out, engine=eng)
    restored = io.BytesIO()
    decompress_stream(io.BytesIO(out.getvalue()), restored, engine=eng)
    assert restored.getvalue() == data
