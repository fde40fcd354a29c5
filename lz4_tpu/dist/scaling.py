"""Scaling surrogate: fixed-work sharded compress at 1/2/4/8 devices.

Real pod-slice scaling cannot be measured in this environment (one physical
chip); this module provides the measured proxy the ≥80% scaling-efficiency
target (BASELINE.md) is tracked against: the same total block workload is
jitted over 1/2/4/8-device meshes (virtual CPU devices off-TPU) and the
execute-only step time is reported per mesh size. On virtual devices sharing
2 physical cores the curve flattens at the core count — the point of the
surrogate is that work division and collective placement compile and execute
at every mesh width, and that per-device work (time x devices / blocks)
stays flat, which is the property that transfers to real chips (blocks are
independent; the only collectives are the length all-gather and offset scan).

Run as a module for one JSON line:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m lz4_tpu.dist.scaling
"""

from __future__ import annotations

import json
import time


def measure(total_blocks: int = 32, block_len: int = 4096,
            widths=(1, 2, 4, 8), trials: int = 3) -> dict:
    """Execute-only timings of the jitted sharded compress at each mesh
    width, same total workload. Returns {width: seconds} plus metadata."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.constants import max_compressed_length
    from ..kernels import jax_codec
    from .mesh import BLOCK_AXIS, block_mesh
    from .sharded import _compress_sharded

    n_dev_avail = len(jax.devices())
    widths = [w for w in widths if w <= n_dev_avail]
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4, (total_blocks, block_len), dtype=np.uint8)
    blocks = [base[i].tobytes() for i in range(total_blocks)]
    arr_host, lens_host = jax_codec.to_device_layout(blocks, block_len)
    dest_cap = max_compressed_length(block_len)

    out = {"total_blocks": total_blocks, "block_len": block_len,
           "times_s": {}, "per_device_work_s": {}}
    for w in widths:
        mesh = block_mesh(w)
        arr = jax.device_put(arr_host, NamedSharding(mesh, P(BLOCK_AXIS, None)))
        lens = jax.device_put(lens_host, NamedSharding(mesh, P(BLOCK_AXIS)))
        comp, comp_lens, err = _compress_sharded(arr, lens, dest_cap, mesh)
        jax.block_until_ready(comp)  # compile + warm
        assert not np.asarray(err).any()
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            comp, comp_lens, err = _compress_sharded(arr, lens, dest_cap, mesh)
            jax.block_until_ready(comp)
            best = min(best, time.perf_counter() - t0)
        out["times_s"][str(w)] = round(best, 4)
        out["per_device_work_s"][str(w)] = round(best * w / total_blocks, 5)
    return out


if __name__ == "__main__":
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    print(json.dumps(measure()))
