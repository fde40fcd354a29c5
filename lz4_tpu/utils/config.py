"""Environment-variable configuration knobs.

The counterpart of the reference's system-property/env configuration
(``Native.java:105-158``, ant property ``lz4-pure-java``). All knobs, in one
place:

=======================  ====================================================
``TPULZ4_DEFAULT_TIER``  force the tier returned by ``fastest_instance()``
                         (``safe`` | ``native`` | ``pallas``)
``TPULZ4_NO_NATIVE=1``   refuse to build/load the C++ library
                         (the analog of lz4-java's pure-java artifact)
``TPULZ4_CXX``           compiler for the native build (default ``g++``)
``TPULZ4_NATIVE_DIR``    cache directory for the built shared library
``TPULZ4_NO_JAX_CACHE``  disable the persistent XLA compilation cache
``TPULZ4_JAX_CACHE_DIR`` override its location (default
                         ``~/.cache/lz4_tpu/jax``)
``GRAFT_DRYRUN_REAL``    run dryrun_multichip on real devices, not virtual CPU
=======================  ====================================================
"""

from __future__ import annotations

import os

VALID_TIERS = ("safe", "native", "pallas")


def default_tier() -> str | None:
    """The forced tier, or None for automatic native→pallas→safe fallback."""
    v = os.environ.get("TPULZ4_DEFAULT_TIER")
    if v is None:
        return None
    v = v.strip().lower()
    if v not in VALID_TIERS:
        raise ValueError(
            f"TPULZ4_DEFAULT_TIER must be one of {VALID_TIERS}, got {v!r}")
    return v


_jax_cache_configured = False


def configure_jax_cache() -> None:
    """Point JAX at a persistent on-disk XLA compilation cache.

    Device-kernel compiles through a remote-dispatch tunnel cost tens of
    seconds each, and the factory's construction-time self-test plus the
    HC level prebuild (LZ4Factory.java:189-202 semantics) trigger several.
    A persistent cache makes every process after the first pay none of it.
    Idempotent; called before the first device-kernel trace. No-op once any
    computation has already been cached under a different explicit setting,
    if the user disabled it (``TPULZ4_NO_JAX_CACHE=1``), or if this JAX
    version rejects the options.
    """
    global _jax_cache_configured
    if _jax_cache_configured or os.environ.get("TPULZ4_NO_JAX_CACHE") == "1":
        return
    _jax_cache_configured = True
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get(
                    "TPULZ4_JAX_CACHE_DIR",
                    os.path.expanduser("~/.cache/lz4_tpu/jax")))
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.5)
    except Exception:
        pass  # never make the device tier unavailable over a cache
