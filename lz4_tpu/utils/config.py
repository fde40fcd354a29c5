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
