"""True process-parallel scaling through the multi-host DCN path.

The virtual-device surrogate (``dist/scaling.py``) is bounded by XLA:CPU's
in-process replica executor (~0.62–0.68 overlap at width 2 on this host even
for a zero-communication control). Real pod scaling is process-per-host, so
the honest proxy for the ≥80% multi-host target (BASELINE.md) is OS-process
parallelism: this module spawns P local worker processes, each pinned to its
own core, brings up the real ``jax.distributed`` process group, and times
``compress_blocks_multihost`` — the full DCN path including the allgather
exchange of compressed payloads (``multihost.py:83-111``).

Efficiency definition (same normalization idea as ``dist/scaling.py``): a
reference process, pinned to one core with NO process group, compresses one
process's share of the workload; ``efficiency = t_ref / t_multi`` where
``t_multi`` is the max over workers of their timed step. 1.0 means the P
processes ran fully overlapped and the DCN exchange cost nothing. Raw
2-process OS scaling on this host measures ~0.92, so that — not 1.0 — is
the achievable ceiling here.

Run as a module for one JSON line:
    python -m lz4_tpu.dist.multihost_scaling
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import tempfile

_WORKER = r"""
import json, os, sys, time
pid, nproc, port, out_path, blocks_n, block_len = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    int(sys.argv[5]), int(sys.argv[6]))
try:
    cores = sorted(os.sched_getaffinity(0))
    os.sched_setaffinity(0, {cores[pid % len(cores)]})
except (AttributeError, OSError):
    pass
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")
from lz4_tpu.dist import multihost
if nproc > 1:
    multihost.initialize("localhost:" + port, nproc, pid)
    assert jax.process_count() == nproc
import numpy as np
rng = np.random.default_rng(3)
base = rng.integers(0, 4, (blocks_n, block_len), dtype=np.uint8)
blocks = [base[i].tobytes() for i in range(blocks_n)]
run = lambda: multihost.compress_blocks_multihost(blocks)
run()  # compile + warm (both the codec and the exchange)
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    out = run()
    best = min(best, time.perf_counter() - t0)
assert len(out) == blocks_n and all(len(c) > 0 for c in out)
with open(out_path, "w") as f:
    json.dump({"pid": pid, "best_s": best}, f)
"""


def _spawn(nproc: int, port: int, blocks_n: int, block_len: int,
           timeout: float) -> float:
    """Run the workload at ``nproc`` processes; return max worker time."""
    pkg_root = str(pathlib.Path(__file__).resolve().parents[2])
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    with tempfile.TemporaryDirectory() as td:
        outs = [str(pathlib.Path(td) / f"t_{p}.json") for p in range(nproc)]
        procs = [subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(p), str(nproc), str(port),
             outs[p], str(blocks_n), str(block_len)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env) for p in range(nproc)]
        try:
            for pr in procs:
                _, err = pr.communicate(timeout=timeout)
                if pr.returncode != 0:
                    raise RuntimeError(
                        f"multihost scaling worker failed:\n{err}")
        finally:
            # a failed/timed-out worker must not strand its siblings inside
            # the jax.distributed barrier holding the coordinator port
            for pr in procs:
                if pr.poll() is None:
                    pr.kill()
                    pr.wait()
        return max(json.load(open(o))["best_s"] for o in outs)


def measure(total_blocks: int = 32, block_len: int = 4096,
            nproc: int = 2, port: int = 12391,
            timeout: float = 420.0, trials: int = 3) -> dict:
    """Time the fixed workload at ``nproc`` DCN processes vs one pinned
    process running one share (``total_blocks // nproc``) of it.

    Single multi/ref pairs swing ~±15% on this host's shared vCPUs (the
    workload is ~1 s/worker and the statistic is a max over workers), so
    each trial is one interleaved multi/ref pair and the reported
    efficiency is the median over ``trials`` pairs; the per-trial values
    are returned alongside.
    """
    import statistics

    effs, multis, refs = [], [], []
    for t in range(trials):
        t_multi = _spawn(nproc, port + 2 * t, total_blocks, block_len,
                         timeout)
        t_ref = _spawn(1, port + 2 * t + 1, total_blocks // nproc,
                       block_len, timeout)
        multis.append(round(t_multi, 4))
        refs.append(round(t_ref, 4))
        effs.append(t_ref / t_multi)
    return {
        "total_blocks": total_blocks,
        "block_len": block_len,
        "processes": nproc,
        "t_multi_s": statistics.median(multis),
        "t_ref_s": statistics.median(refs),
        "trial_efficiencies": [round(e, 3) for e in effs],
        "multihost_efficiency": round(statistics.median(effs), 3),
    }


if __name__ == "__main__":
    print(json.dumps(measure()))
