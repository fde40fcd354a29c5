"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on ``--xla_force_host_platform_device_count=8`` CPU devices, which
exercises the same GSPMD partitioning paths XLA uses on a real pod slice.
"""

import os

# must run before any backend initializes; the axon TPU plugin ignores the
# JAX_PLATFORMS env var, so force the platform through the config API too
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: XLA:CPU compiles of the heavier kernels (the
# parallel compressor's sort/scan graph) intermittently take minutes under
# this host's shared-vCPU contention; caching makes them one-time
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("TPULZ4_JAX_CACHE", "/tmp/tpulz4_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import pathlib
import random

import pytest

CALGARY_DIR = pathlib.Path("/root/reference/src/test-resources/calgary")


@pytest.fixture(scope="session")
def calgary():
    """Calgary corpus files (same golden corpus the reference tests use)."""
    out = {}
    for name in ("book1", "geo", "pic"):
        p = CALGARY_DIR / name
        if p.exists():
            out[name] = p.read_bytes()
    if not out:
        pytest.skip("calgary corpus unavailable")
    return out


@pytest.fixture
def rng():
    return random.Random(0xDEADBEEF)


def random_bytes(rng, length, alphabet_size=256):
    """Random data with a compressibility dial (AbstractLZ4Test.java:334-341)."""
    if alphabet_size == 1:
        return bytes(length)
    return bytes(rng.randrange(alphabet_size) for _ in range(length))
