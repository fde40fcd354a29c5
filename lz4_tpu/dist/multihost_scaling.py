"""True process-parallel scaling through the multi-host DCN path.

The virtual-device surrogate (``dist/scaling.py``) is bounded by XLA:CPU's
in-process replica executor (~0.62–0.68 overlap at width 2 on this host even
for a zero-communication control). Real pod scaling is process-per-host, so
the honest proxy for the ≥80% multi-host target (BASELINE.md) is OS-process
parallelism: this module spawns P local worker processes, each pinned to its
own core, brings up the real ``jax.distributed`` process group, and times
``compress_blocks_multihost`` — the full DCN path including the allgather
exchange of compressed payloads (``multihost.py:83-111``).

Efficiency definitions (r4 verdict next #5 widens this to widths 2..4, each
against its own same-width ceiling):

- ``efficiency``: ``t_ref / t_multi`` where ``t_ref`` is a single pinned
  process with NO process group compressing one process's share and
  ``t_multi`` is the max over the P DCN workers. 1.0 means the exchange
  cost nothing AND the OS overlapped the processes perfectly.
- ``os_ceiling``: ``t_ref / t_os`` where ``t_os`` is the max over P
  *independent* processes (no process group, no exchange) each running the
  same share concurrently. This is what raw OS-process parallelism delivers
  at that width on this host — on 2 physical cores it degrades fast past
  width 2, by construction.
- ``vs_ceiling``: ``t_os / t_multi`` — the design claim: how close the DCN
  path runs to the same-width raw-OS-process ceiling. This is the
  number comparable to the ≥80% multi-host target when the host has fewer
  cores than processes.

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
pid, nproc, use_group, port, out_path, blocks_n, block_len = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    sys.argv[5], int(sys.argv[6]), int(sys.argv[7]))
try:
    cores = sorted(os.sched_getaffinity(0))
    os.sched_setaffinity(0, {cores[pid % len(cores)]})
except (AttributeError, OSError):
    pass
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax
jax.config.update("jax_platforms", "cpu")
from lz4_tpu.dist import multihost
if use_group and nproc > 1:
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
           timeout: float, use_group: bool = True) -> float:
    """Run the workload at ``nproc`` processes; return max worker time.

    ``use_group=False`` launches ``nproc`` *independent* workers (no
    jax.distributed group, no exchange) each compressing ``blocks_n``
    blocks concurrently — the raw OS-process ceiling at that width.
    """
    pkg_root = str(pathlib.Path(__file__).resolve().parents[2])
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    with tempfile.TemporaryDirectory() as td:
        outs = [str(pathlib.Path(td) / f"t_{p}.json") for p in range(nproc)]
        procs = [subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(p), str(nproc),
             "1" if use_group else "0", str(port),
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
    process running one share (``total_blocks // nproc``) of it, and vs
    ``nproc`` independent OS processes running the same shares (the
    same-width ceiling).

    Single multi/ref pairs swing ~±15% on this host's shared vCPUs (the
    workload is ~1 s/worker and the statistic is a max over workers), so
    each trial is one interleaved multi/os/ref triple and the reported
    numbers are medians over ``trials``; per-trial values are returned
    alongside.
    """
    import statistics

    # keep shares exactly even: at widths that do not divide total_blocks
    # the DCN run's max-over-workers would carry one extra block while the
    # os/ref runs use the floor share, biasing efficiency low by ~1/share
    # (r5 review #4)
    total_blocks -= total_blocks % nproc
    share = total_blocks // nproc
    effs, ceils, vs_ceils, multis, oss, refs = [], [], [], [], [], []
    for t in range(trials):
        t_multi = _spawn(nproc, port + 3 * t, total_blocks, block_len,
                         timeout)
        t_os = _spawn(nproc, port + 3 * t + 1, share, block_len,
                      timeout, use_group=False)
        t_ref = _spawn(1, port + 3 * t + 2, share, block_len, timeout)
        multis.append(round(t_multi, 4))
        oss.append(round(t_os, 4))
        refs.append(round(t_ref, 4))
        effs.append(t_ref / t_multi)
        ceils.append(t_ref / t_os)
        vs_ceils.append(t_os / t_multi)
    return {
        "total_blocks": total_blocks,
        "block_len": block_len,
        "processes": nproc,
        "t_multi_s": statistics.median(multis),
        "t_os_s": statistics.median(oss),
        "t_ref_s": statistics.median(refs),
        "trial_efficiencies": [round(e, 3) for e in effs],
        "multihost_efficiency": round(statistics.median(effs), 3),
        "os_ceiling_efficiency": round(statistics.median(ceils), 3),
        "multihost_vs_os_ceiling": round(statistics.median(vs_ceils), 3),
    }


def measure_widths(widths=(2, 3, 4), total_blocks: int = 32,
                   block_len: int = 4096, port: int = 12391,
                   timeout: float = 420.0) -> dict:
    """Widths 2..4 of :func:`measure`, one dict keyed per width.

    The headline width (2 = this host's core count) gets 3 trials; wider
    widths (oversubscribed on 2 cores — their absolute efficiency drops by
    construction, the claim is ``vs_ceiling``) get 2.
    """
    out = {}
    p = port
    for w in widths:
        trials = 3 if w == min(widths) else 2
        out[str(w)] = measure(total_blocks=total_blocks,
                              block_len=block_len, nproc=w, port=p,
                              timeout=timeout, trials=trials)
        p += 3 * trials + 1
    return out


if __name__ == "__main__":
    print(json.dumps(measure_widths()))
