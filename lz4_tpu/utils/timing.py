"""Measurement protocol helpers.

Two hazards were established empirically on the axon TPU tunnel and are
baked into this module's API:

1. the relay memoizes identical (computation, arguments) executions, so a
   timed loop MUST feed a distinct input buffer to every call;
2. single-shot timings on the 2-vCPU host vary ~3x, so throughput is
   reported as the median over several trials.
"""

from __future__ import annotations

import statistics
import time


def median_throughput(fn, inputs, bytes_per_call: int, warmup=None):
    """Median GB/s over ``fn(x)`` for each distinct x in ``inputs``.

    ``fn`` must block until its result is ready (e.g. wrap with
    ``jax.block_until_ready``). ``warmup`` (default: first input) triggers
    compilation outside the timed region.
    """
    if len(inputs) < 2:
        raise ValueError("need >= 2 distinct inputs (relay memoization)")
    fn(warmup if warmup is not None else inputs[0])
    times = []
    for x in inputs[1:]:
        t0 = time.perf_counter()
        fn(x)
        times.append(time.perf_counter() - t0)
    return bytes_per_call / statistics.median(times) / 1e9


class DeviceTimer:
    """Wall-clock section timer accumulating named spans (host-side)."""

    def __init__(self):
        self.spans: dict[str, float] = {}

    def section(self, name: str):
        timer = self

        class _Span:
            def __enter__(self):
                self._t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                timer.spans[name] = (timer.spans.get(name, 0.0)
                                     + time.perf_counter() - self._t0)
                return False

        return _Span()

    def report(self) -> str:
        return ", ".join(f"{k}={v * 1e3:.1f}ms" for k, v in self.spans.items())
