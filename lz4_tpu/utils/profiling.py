"""Profiling hooks: jax.profiler traces around codec pipelines.

The reference has no tracing (SURVEY.md §5); the TPU-native plan is XLA's
own profiler. ``trace()`` wraps a region in a TensorBoard-compatible trace;
``annotate()`` names sub-regions so kernel time is attributable per stage.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region into ``log_dir``."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region visible in the trace viewer."""
    import jax
    return jax.profiler.TraceAnnotation(name)
