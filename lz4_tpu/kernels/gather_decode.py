"""Gather-decode: LZ4 decompression re-expressed as batched gathers.

The serial token scan is the only part of LZ4 decoding that resists
vectorization — the byte movement itself is expressible as gathers. The
pipeline splits:

1. **Host parse** (C++ ``tpulz4_parse_sequences``): walk the token stream
   without copying, emitting per-sequence records (absolute literal
   source/dest offsets + lengths, match dest/distance/length). Touches only
   header bytes — GB/s-scale on one core.
2. **Device resolve + gather** (this module, jit/vmap):
   - per-byte segment lookup via ``searchsorted`` over the sequence tables;
   - literal bytes map directly to compressed-buffer indices;
   - match bytes get a *parent pointer* ``q(j) = (m-d) + ((j-(m-d)) mod d)``
     (the periodic fold of overlap matches) into earlier output;
   - parent chains collapse by pointer doubling — log2(chain depth)
     gather rounds — leaving every byte with a compressed-buffer origin;
   - one final gather materializes the output.

This is the encode-time/absolute-offset-resolution idea (cf. ACEAPEX,
PAPERS.md) executed at decode time with the resolution on device. Unlike
the sequential decoders it scales with batch size and gather bandwidth.
Bit-exactness is asserted against the reference oracle, including the
null-match-offset quirk (uncovered bytes decode as zeros, matching
fresh-buffer serial decoders).

**Measured ceiling (TPU v5e, see docs/ROADMAP.md §1):** XLA's 1-D gather on
this chip executes at ~0.11 Gelem/s when actually forced to run (chained
in-graph loop; single-dispatch timings sit at the ~0.1 ms dispatch floor
and report fantasy rates). At ~one gather per output byte minimum, ANY
gather-based decode formulation therefore caps near 0.1 GB/s — far below
the host tier — so this module's value is algorithmic validation (the
pointer-doubling resolution is exercised by tests on the CPU backend),
not device throughput.
"""

from __future__ import annotations

import ctypes
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_BIG = 1 << 30


def parse_packed(comp, comp_offsets, comp_lens, max_seq: int,
                 n_threads: int | None = None, sentinel_tails: bool = True,
                 out: dict | None = None):
    """Parse packed compressed blocks into per-sequence tables (host, C++).

    One multithreaded native call over the whole batch
    (``tpulz4_parse_sequences_batch``). ``comp`` holds block i at
    ``comp_offsets[i] : + comp_lens[i]``. Returns dict of int32 arrays
    [N, max_seq] + n_seq [N] + out_total [N]. Raises Lz4Error on malformed
    input. Table tails are handled inside the native call (cache-warm,
    threaded): with ``sentinel_tails`` the unused ``lit_out`` / ``m_out``
    tail entries are set past any real offset so ``searchsorted`` never
    selects them (gather pipeline); either way length tails are zeroed,
    which the segment executor treats as no-ops. Pass ``out`` (a dict from
    a previous call with the same shape) to reuse table storage.
    """
    import os
    from ..native import bindings
    from ..core.errors import Lz4Error
    lib = bindings.load()
    n = len(comp_lens)
    n_threads = n_threads or min(os.cpu_count() or 1, max(n, 1))
    shape = (n, max_seq)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    keys = ("lit_out", "lit_src", "lit_len", "m_out", "m_dist", "m_len")
    if out is not None and all(out.get(k) is not None
                               and out[k].shape == shape for k in keys):
        arrs = out
    else:
        arrs = {k: np.empty(shape, np.int32) for k in keys}
    n_seq = np.zeros(n, np.int32)
    out_total = np.zeros(n, np.int32)
    if n == 0:
        return arrs, n_seq, out_total
    comp_offsets = np.ascontiguousarray(comp_offsets, np.int64)
    comp_lens_a = np.ascontiguousarray(comp_lens, np.int32)
    if isinstance(comp, bytes):
        src = ctypes.cast(ctypes.c_char_p(comp),
                          ctypes.POINTER(ctypes.c_uint8))
    else:
        buf = (ctypes.c_uint8 * len(comp)).from_buffer(comp)
        src = ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8))
    lib.tpulz4_parse_sequences_batch(
        src, comp_offsets.ctypes.data_as(i64p),
        comp_lens_a.ctypes.data_as(i32p), max_seq,
        *(arrs[k].ctypes.data_as(i32p) for k in keys),
        n_seq.ctypes.data_as(i32p), out_total.ctypes.data_as(i32p),
        n, n_threads, 2 if sentinel_tails else 1)
    bad = np.nonzero(n_seq < 0)[0]
    if bad.size:
        i = int(bad[0])
        raise Lz4Error(f"Malformed input in block {i} (parse code {int(n_seq[i])})")
    return arrs, n_seq, out_total


def parse_blocks(blocks: list[bytes], max_seq: int | None = None):
    """Parse compressed blocks into per-sequence tables (host, C++).

    List-of-bytes convenience over ``parse_packed``. Returns dict of int32
    arrays [N, S] + n_seq [N] + out_total [N]. Raises Lz4Error on malformed
    input.
    """
    n = len(blocks)
    if max_seq is None:
        # every sequence consumes >= 3 compressed bytes except the last
        max_seq = max(2, max(len(b) for b in blocks) // 3 + 2)
    offsets = np.zeros(n, np.int64)
    lens = np.zeros(n, np.int32)
    pos = 0
    for i, b in enumerate(blocks):
        offsets[i] = pos
        lens[i] = len(b)
        pos += len(b)
    return parse_packed(b"".join(blocks), offsets, lens, max_seq)


def _decode_one(comp, lit_out, lit_src, lit_len, m_out, m_dist, m_len,
                out_len: int, max_depth: int):
    j = jnp.arange(out_len, dtype=jnp.int32)

    k = jnp.searchsorted(lit_out, j, side="right") - 1
    k = jnp.clip(k, 0, lit_out.shape[0] - 1)
    lbo = lit_out[k]
    in_lit = (j - lbo) < lit_len[k]
    idx = jnp.where(in_lit, lit_src[k] + (j - lbo), -1)

    q = jnp.searchsorted(m_out, j, side="right") - 1
    q = jnp.clip(q, 0, m_out.shape[0] - 1)
    mo = m_out[q]
    md = m_dist[q]
    in_match = jnp.logical_not(in_lit) & ((j - mo) < m_len[q]) & (md > 0)
    base = mo - md
    parent = jnp.where(in_match,
                       base + ((j - base) % jnp.maximum(md, 1)),
                       j)

    # pointer doubling: collapse match->match chains to literal origins.
    # a byte is resolved when it has a literal origin (idx >= 0) or is a
    # self-parent (uncovered: null-match bytes, which decode as zeros)
    def cond(st):
        idx, parent, depth = st
        unresolved = (idx < 0) & (parent != jnp.arange(idx.shape[0]))
        return (depth < max_depth) & jnp.any(unresolved)

    def body(st):
        idx, parent, depth = st
        idx = jnp.where(idx >= 0, idx, idx[parent])
        parent = parent[parent]
        return idx, parent, depth + 1

    idx, parent, _ = lax.while_loop(cond, body, (idx, parent, jnp.int32(0)))

    # uncovered bytes (null match offsets) decode as zeros
    return jnp.where(idx >= 0, comp[jnp.maximum(idx, 0)], 0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_len", "max_depth"))
def gather_decompress_batch(comp, lit_out, lit_src, lit_len,
                            m_out, m_dist, m_len,
                            out_len: int, max_depth: int = 32):
    """Batched gather decode.

    Args:
      comp: uint8[N, CMAX] compressed bytes (natural byte layout).
      lit_*/m_*: int32[N, S] sequence tables from ``parse_blocks``.
      out_len: static decompressed size cap per block.

    Returns: uint8[N, out_len].
    """
    return jax.vmap(
        lambda *a: _decode_one(*a, out_len, max_depth))(
        comp, lit_out, lit_src, lit_len, m_out, m_dist, m_len)


def decompress_blocks(blocks: list[bytes], out_len: int):
    """Host convenience: parse + device decode; returns list[bytes]."""
    arrs, n_seq, out_total = parse_blocks(blocks)
    cmax = max(len(b) for b in blocks)
    comp = np.zeros((len(blocks), cmax), np.uint8)
    for i, b in enumerate(blocks):
        comp[i, :len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(gather_decompress_batch(
        comp, arrs["lit_out"], arrs["lit_src"], arrs["lit_len"],
        arrs["m_out"], arrs["m_dist"], arrs["m_len"], out_len))
    return [out[i, :out_total[i]].tobytes() for i in range(len(blocks))]
