"""Wheel build with an embedded prebuilt native library (VERDICT r3 #9).

The reference ships per-platform ``liblz4-java.*`` binaries on the classpath
(``src/resources/net/jpountz/util/...``, loaded by ``Native.java:60-65``) so
users never need a toolchain. The wheel analog: ``python -m pip wheel .``
compiles ``lz4_tpu/native/src/tpulz4.cpp`` once at build time and embeds it
as ``lz4_tpu/native/_prebuilt/libtpulz4-<source-digest>.so``; the runtime
loader (``native/build.py:prebuilt_path``) prefers it whenever the digest
matches the installed source, falling back to the locate-or-build path
otherwise. Source installs keep working without this step.

Flags are portable by default (no ``-march=native`` — wheels move between
machines); set ``TPULZ4_WHEEL_CXXFLAGS`` to override.
"""

import hashlib
import os
import pathlib
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py
from setuptools.dist import Distribution

ROOT = pathlib.Path(__file__).parent
SRC = ROOT / "lz4_tpu" / "native" / "src" / "tpulz4.cpp"


class BuildPyWithNative(build_py):
    def run(self):
        super().run()
        if os.environ.get("TPULZ4_NO_NATIVE") == "1":
            return
        if os.environ.get("TPULZ4_ALLOW_MISSING_NATIVE") == "1":
            # the degraded-artifact opt-in skips the build entirely: the
            # wheel is tagged py3-any (has_ext_modules below), so it must
            # not carry a platform .so even when a toolchain works here
            # (r5 review #2)
            print("TPULZ4_ALLOW_MISSING_NATIVE=1: skipping the native "
                  "build; the runtime compiles on first use or falls "
                  "back to pure tiers")
            return
        digest = hashlib.sha256(SRC.read_bytes()).hexdigest()[:16]
        dest_dir = (pathlib.Path(self.build_lib) / "lz4_tpu" / "native"
                    / "_prebuilt")
        dest_dir.mkdir(parents=True, exist_ok=True)
        out = dest_dir / f"libtpulz4-{digest}.so"
        cxx = os.environ.get("TPULZ4_CXX", "g++")
        flags = os.environ.get(
            "TPULZ4_WHEEL_CXXFLAGS",
            "-O3 -fPIC -shared -std=c++17 -fvisibility=hidden -pthread",
        ).split()
        cmd = [cxx, *flags, str(SRC), "-o", str(out)]
        print(f"building prebuilt native library: {' '.join(cmd)}")
        try:
            subprocess.run(cmd, check=True)
        except (OSError, subprocess.CalledProcessError) as e:
            # fail loud by default: every build_py here feeds a wheel (pip
            # builds installs via wheels too), and a wheel silently missing
            # its .so would be tagged platform-specific yet ship without
            # the native tier (advisor r4 #3). A compiler-less user can
            # still opt into a degraded artifact explicitly.
            raise RuntimeError(
                f"native library build failed ({e}). Install a C++ "
                "toolchain, or set TPULZ4_ALLOW_MISSING_NATIVE=1 to build "
                "an artifact without the embedded native tier (the runtime "
                "then compiles on first use or falls back to pure tiers), "
                "or TPULZ4_NO_NATIVE=1 for a pure-Python artifact."
            ) from e


class BinaryDistribution(Distribution):
    """Mark the wheel platform-specific (it carries a compiled .so).

    A pure-Python artifact (TPULZ4_NO_NATIVE=1) or an explicitly degraded
    one (TPULZ4_ALLOW_MISSING_NATIVE=1) carries no .so and stays py3-any.
    """

    def has_ext_modules(self):
        return (os.environ.get("TPULZ4_NO_NATIVE") != "1"
                and os.environ.get("TPULZ4_ALLOW_MISSING_NATIVE") != "1")


setup(
    cmdclass={"build_py": BuildPyWithNative},
    distclass=BinaryDistribution,
)
