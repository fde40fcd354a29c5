"""Device mesh construction for the block-parallel data plane.

LZ4's only parallelism axis is data parallelism over independent blocks
(frame blocks are independent by format: BLOCK_INDEPENDENCE is always set,
``LZ4FrameOutputStream.java:58``), so the mesh is 1-D: axis ``"blocks"``
spanning every chip. Multi-host runs extend the same axis over DCN via
``jax.distributed`` — ordering of the global block axis gives the ordered
frame reassembly for free.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

BLOCK_AXIS = "blocks"


def device_count() -> int:
    return len(jax.devices())


def block_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} available")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (BLOCK_AXIS,))


def local_block_mesh() -> Mesh:
    """1-D mesh over this process's local devices only.

    In a multi-process (DCN) run each process shards its owned block range
    over its own chips; the cross-host exchange happens above the mesh in
    ``dist/multihost.py``, so the per-process data plane stays addressable.
    """
    return Mesh(np.array(jax.local_devices()), (BLOCK_AXIS,))
