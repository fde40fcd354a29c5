"""Measure the device-parallel compressor (kernels/parallel_compress.py) on
the real TPU with the amortized in-graph protocol (VERDICT r3 #1).

Protocol (docs/PERF.md "Methodology"): loop the kernel R times inside one
jit with per-iteration data dependence (a 1-byte perturbation derived from
the previous pass's output lengths — defeats CSE/relay memoization without
changing the corpus statistics), fetch a few result bytes to force
completion, take the slope between two R values.

Also reports, single-pass: compressed ratio on the Calgary mix vs the
byte-identical reference fast-scan ratio, and a host-side decode
verification that the emitted blocks are valid LZ4.
"""
from __future__ import annotations

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(block_len=65536, n_blocks=64):
    import jax
    import jax.numpy as jnp
    from bench import load_corpus
    from lz4_tpu.kernels import parallel_compress as pc
    from lz4_tpu.core.constants import max_compressed_length

    print(f"device: {jax.devices()[0]}", flush=True)
    corpus = load_corpus(block_len * n_blocks)
    data = corpus[: block_len * n_blocks]
    blocks = [data[o:o + block_len] for o in range(0, len(data), block_len)]
    arr, lens = pc.to_layout(blocks, block_len)
    cap = max_compressed_length(block_len)
    arr_d = jax.device_put(jnp.asarray(arr))
    lens_d = jax.device_put(jnp.asarray(lens))

    # --- single pass: ratio + validity ---
    t0 = time.time()
    out, out_lens = pc.compress_parallel_batch(arr_d, lens_d, cap)
    out_lens_h = np.asarray(out_lens)
    print(f"compile+first pass: {time.time()-t0:.1f}s", flush=True)
    assert (out_lens_h >= 0).all()
    ratio = int(out_lens_h.sum()) / len(data)
    print(f"parallel ratio: {ratio:.4f}", flush=True)

    # validity: host-decode every block
    from lz4_tpu.api import native_instances as ni
    out_h = np.asarray(out)
    sd = ni.SafeDecompressor()
    for k in range(n_blocks):
        cb = out_h[k, : out_lens_h[k]].astype(np.uint8).tobytes()
        dec = sd.decompress_alloc(cb, 0, len(cb), block_len)
        assert bytes(dec) == blocks[k], f"block {k} decode mismatch"
    print("all blocks decode bit-exact", flush=True)

    # reference ratio on same data
    comp, offs, clens = ni.compress_fast_packed(data, block_len)
    ref_ratio = int(clens.sum()) / len(data)
    print(f"reference fast-scan ratio: {ref_ratio:.4f} "
          f"(parallel/ref = {ratio/ref_ratio:.4f})", flush=True)

    # --- amortized throughput ---
    @functools.partial(jax.jit, static_argnames=("reps",))
    def many(arr, lens, reps):
        def body(i, carry):
            acc, a = carry
            # 1-byte data-dependent perturbation per block
            pert = ((acc + i) % 251).astype(jnp.int32)
            a2 = a.at[:, 1].set((a[:, 1] + pert) % 256)
            o, ol = pc.compress_parallel_batch(a2, lens, cap)
            return (acc + jnp.sum(ol), a)
        acc, _ = jax.lax.fori_loop(0, reps, body,
                                   (jnp.int32(0), arr))
        return acc

    def run(reps):
        r = many(arr_d, lens_d, reps)
        _ = int(r)

    t0 = time.time(); run(1); print(f"loop compile: {time.time()-t0:.1f}s",
                                    flush=True)

    def timed(reps, trials=3):
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            run(reps)
            best = min(best, time.time() - t0)
        return best

    r_lo, r_hi = 2, 10
    t_lo, t_hi = timed(r_lo), timed(r_hi)
    per_pass = (t_hi - t_lo) / (r_hi - r_lo)
    gbps = len(data) / per_pass / 1e9
    print(f"t({r_lo})={t_lo:.3f}s t({r_hi})={t_hi:.3f}s "
          f"per-pass={per_pass*1e3:.1f}ms", flush=True)
    print(f"parallel compress: {gbps:.3f} GB/s "
          f"({len(data)>>20} MB per pass)", flush=True)


if __name__ == "__main__":
    bl = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    main(bl, nb)
