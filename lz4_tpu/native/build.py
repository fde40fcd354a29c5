"""Build + cache the native shared library.

The analog of the reference's ``Native.load()`` pipeline
(``util/Native.java:98-162``): locate-or-build ``libtpulz4.so``, with a
lock file guarding concurrent builds from multiple processes (the reference's
``.lck`` protocol, Native.java:122-125).

Override knobs (env):
- ``TPULZ4_NATIVE_DIR``: cache directory (default: alongside this package)
- ``TPULZ4_CXX``: compiler (default ``g++``)
- ``TPULZ4_NO_NATIVE=1``: refuse to build/load (forces pure-Python tiers)
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import subprocess
import tempfile

_SRC = pathlib.Path(__file__).parent / "src" / "tpulz4.cpp"
_CXXFLAGS = ["-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-fvisibility=hidden", "-pthread"]


class NativeBuildError(RuntimeError):
    pass


def _cache_dir() -> pathlib.Path:
    override = os.environ.get("TPULZ4_NATIVE_DIR")
    if override:
        return pathlib.Path(override)
    pkg_dir = pathlib.Path(__file__).parent / "_build"
    try:
        pkg_dir.mkdir(exist_ok=True)
        probe = pkg_dir / ".probe"
        probe.touch()
        probe.unlink()
        return pkg_dir
    except OSError:
        return pathlib.Path(tempfile.gettempdir()) / "tpulz4_build"


def lib_path() -> pathlib.Path:
    src = _SRC.read_bytes()
    digest = hashlib.sha256(src).hexdigest()[:16]
    return _cache_dir() / f"libtpulz4-{digest}.so"


def build(force: bool = False) -> pathlib.Path:
    """Compile the shared library if not cached; returns its path."""
    if os.environ.get("TPULZ4_NO_NATIVE") == "1":
        raise NativeBuildError("native tier disabled via TPULZ4_NO_NATIVE=1")
    out = lib_path()
    if out.exists() and not force:
        return out
    out.parent.mkdir(parents=True, exist_ok=True)
    cxx = os.environ.get("TPULZ4_CXX", "g++")
    lock = out.with_suffix(".lck")
    # lock-file protocol against concurrent builders (Native.java:122-125)
    try:
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
        holder = True
    except FileExistsError:
        holder = False
    if not holder:
        import time
        for _ in range(600):  # wait up to 60s for the other builder
            if out.exists():
                return out
            time.sleep(0.1)
        raise NativeBuildError("timed out waiting for concurrent native build")
    try:
        tmp = out.with_suffix(".tmp.so")
        cmd = [cxx, *_CXXFLAGS, str(_SRC), "-o", str(tmp)]
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            raise NativeBuildError(
                f"native build failed ({' '.join(cmd)}):\n{proc.stderr}")
        os.replace(tmp, out)
        return out
    finally:
        try:
            os.unlink(lock)
        except OSError:
            pass
