"""CLI surface tests: ``python -m lz4_tpu`` (the expanded analog of the
reference's ``main()`` entries, LZ4Factory.java:318-321, and the lz4-CLI
interop workflow, LZ4FrameIOStreamTest.java:428-523).

In-process through ``lz4_tpu.__main__.main(argv)`` where possible (fast:
no interpreter/jax startup per case); one subprocess smoke test pins the
actual ``python -m`` entry point.
"""

import pathlib
import subprocess
import sys

import pytest

from lz4_tpu.__main__ import main
from lz4_tpu.core.xxhash_ref import xxh32, xxh64
from lz4_tpu.formats.frame import decompress_frame

from conftest import random_bytes

PKG_ROOT = str(pathlib.Path(__file__).resolve().parents[1])


@pytest.fixture
def sample(tmp_path, rng):
    p = tmp_path / "in.bin"
    p.write_bytes(random_bytes(rng, 150000, 16))
    return p


def test_cli_compress_decompress_roundtrip(tmp_path, sample, capsys):
    out = tmp_path / "out.lz4"
    back = tmp_path / "back.bin"
    main(["compress", str(sample), str(out), "--engine", "native",
          "-B", "64KB"])
    assert "->" in capsys.readouterr().out
    # the output is a standard frame readable by the library reader
    assert decompress_frame(out.read_bytes()) == sample.read_bytes()
    main(["decompress", str(out), str(back)])
    assert back.read_bytes() == sample.read_bytes()


def test_cli_hc_level_and_no_crc(tmp_path, sample):
    fast = tmp_path / "fast.lz4"
    hc = tmp_path / "hc.lz4"
    main(["compress", str(sample), str(fast), "--no-frame-crc"])
    main(["compress", str(sample), str(hc), "-l", "9"])
    assert decompress_frame(hc.read_bytes()) == sample.read_bytes()
    assert hc.stat().st_size < fast.stat().st_size  # HC compresses tighter


def test_cli_hashes_match_reference(sample, capsys):
    data = sample.read_bytes()
    main(["xxh32", str(sample)])
    got32 = capsys.readouterr().out.split()[0]
    assert got32 == f"{xxh32(data, 0, len(data), 0) & 0xFFFFFFFF:08x}"
    main(["xxh64", str(sample), "--seed", "0x123"])
    got64 = capsys.readouterr().out.split()[0]
    assert got64 == f"{xxh64(data, 0, len(data), 0x123):016x}"


def test_cli_rejects_bad_block_size(tmp_path, sample):
    with pytest.raises(SystemExit):
        main(["compress", str(sample), str(tmp_path / "x"), "-B", "13KB"])


def test_cli_module_entry_smoke(tmp_path, sample):
    """`python -m lz4_tpu` end to end in a real subprocess."""
    out = tmp_path / "o.lz4"
    res = subprocess.run(
        [sys.executable, "-m", "lz4_tpu", "compress", str(sample), str(out),
         "--engine", "safe", "-B", "256KB"],
        capture_output=True, text=True, timeout=300,
        cwd=PKG_ROOT)
    assert res.returncode == 0, res.stderr
    assert decompress_frame(out.read_bytes()) == sample.read_bytes()
