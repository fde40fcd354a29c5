"""Pallas TPU segment executor: LZ4 decode from pre-parsed sequence tables.

The serial Pallas decoder (lz4_pallas.py) spends most of its time extracting
token/length bytes from VMEM one scalar at a time (each read is an aligned
128-load + select/reduce). This kernel removes all of that: the host parser
(``tpulz4_parse_sequences_batch``) has already turned the token stream into
per-sequence records with *absolute* offsets —

    literal run:  out[lit_out : +lit_len] = comp[lit_src : +lit_len]
    match run:    out[m_out : +m_len]     = out[m_out - m_dist : ...]

so every sequence is self-contained (no carried cursor state) and the kernel
body is nothing but aligned-window copies driven by cheap SMEM scalar reads.
Sequences are streamed through SMEM in chunks of ``seq_chunk`` along a
second grid dimension while the output block stays resident in VMEM
(revisited across chunk steps).

The division of labor mirrors the reference's JNI split (lz4-java keeps the
token walk in C and the API in Java — src/jni/net_jpountz_lz4_LZ4JNI.c): the
irreducibly serial byte-parse runs on the host CPU at GB/s, the byte
movement runs on the TPU at vector width. Trust boundary: the parser has
validated structure (offsets in range, coverage) — the kernel assumes valid
tables, which is why it needs none of the malformed-input machinery of
``decompress.template:17-128``; feeding it tables from any other source is
outside its contract.

Bytes are carried one-per-int32 (no sub-word vector addressing in Mosaic);
null-match holes decode as zeros, matching fresh-buffer serial decoders.

Measured (single chip, axon tunnel, 64KB blocks): ~0.03 GB/s on Calgary
text, ~0.05 GB/s on high-ratio `pic` — ~300 core cycles per sequence. The
floor is structural: sequences average ~10 output bytes, each needs a
serial chain of scalar reads + window ops, and Mosaic exposes no per-lane
gather that would let lanes process different sequences. This kernel is
the fastest of the three device decode formulations (vs. the token-parsing
serial kernel and the XLA-gather pipeline); the host C++ tier remains the
decode throughput path, and the device path exists for device-resident
data and block-parallel scaling across chips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lz4_pallas import CHUNK, PAD, _iota, _load_unaligned, _roll2, _store_unaligned


def _copy_span(src_ref, dst_ref, s, d, n):
    """dst_ref[0,0,d:d+n] = src_ref[0,0,s:s+n] via CHUNK windows (n >= 1)."""
    def body(i, _):
        off = i * CHUNK
        w = _load_unaligned(src_ref, s + off)
        _store_unaligned(dst_ref, d + off, w, jnp.minimum(CHUNK, n - off))
        return 0
    lax.fori_loop(0, (n + CHUNK - 1) // CHUNK, body, 0)


def _copy_match(out_ref, d, dist, n):
    """out_ref[0,0,d:d+n] = out_ref[0,0,d-dist:...] with overlap semantics."""
    def far(_):
        # windows are written in order; reads trail writes by dist >= CHUNK
        _copy_span(out_ref, out_ref, d - dist, d, n)
        return 0

    def near(_):
        # periodic pattern: fill one CHUNK with out[d-dist : d] repeated via
        # log-doubling, then store in chunks that are a multiple of dist so
        # every chunk starts at phase 0
        pw = _load_unaligned(out_ref, d - dist)   # first `dist` lanes valid
        io = _iota(CHUNK)
        p = jnp.where(io < dist, pw, 0)
        width = dist
        for _step in range(7):  # dist * 2^7 >= 128 for any dist >= 1
            p = jnp.where(io < width, p, _roll2(p, width))
            width = width * 2

        chunk_eff = (CHUNK // dist) * dist

        def body(i, _):
            off = i * chunk_eff
            _store_unaligned(out_ref, d + off, p,
                             jnp.minimum(chunk_eff, n - off))
            return 0
        lax.fori_loop(0, (n + chunk_eff - 1) // chunk_eff, body, 0)
        return 0

    lax.cond(dist >= CHUNK, far, near, 0)


def _segment_kernel(nseq_ref, comp_ref,
                    lit_out_ref, lit_src_ref, lit_len_ref,
                    m_out_ref, m_dist_ref, m_len_ref,
                    out_ref, *, seq_chunk: int):
    # sequence tables arrive as (1, seq_chunk // 128, 128) SMEM blocks
    # (Mosaic's (8, 128) block-shape rule); entry k sits at [0, k>>7, k&127]
    i = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        # fresh-buffer semantics: uncovered bytes (null-match holes, tail
        # past out_total) must read as zeros
        out_ref[...] = jnp.zeros_like(out_ref)

    base = c * seq_chunk
    nseq = nseq_ref[i]

    @pl.when(base < nseq)
    def _():
        def body(k, _):
            r = k >> 7
            l = k & 127
            ll = lit_len_ref[0, r, l]
            ml = m_len_ref[0, r, l]
            dist = m_dist_ref[0, r, l]

            # fast path: short literal + short far match — two single-window
            # copies, no loops (the common shape: mean literal ~2 B, mean
            # match ~8 B, dist >= 128 for most matches on real data).
            # Measured note: a fully branchless variant (unconditional
            # masked copies) is ~30% *slower* — the cost floor here is the
            # serial latency of the dependent vector-op chain per sequence,
            # not branching.
            fast = (ll > 0) & (ll <= CHUNK) & (ml > 0) & (ml <= CHUNK) & \
                   (dist >= CHUNK)

            @pl.when(fast)
            def _():
                w = _load_unaligned(comp_ref, lit_src_ref[0, r, l])
                _store_unaligned(out_ref, lit_out_ref[0, r, l], w, ll)
                mo = m_out_ref[0, r, l]
                wm = _load_unaligned(out_ref, mo - dist)
                _store_unaligned(out_ref, mo, wm, ml)

            @pl.when(jnp.logical_not(fast))
            def _():
                @pl.when(ll > 0)
                def _():
                    _copy_span(comp_ref, out_ref,
                               lit_src_ref[0, r, l], lit_out_ref[0, r, l], ll)

                @pl.when(ml > 0)
                def _():
                    _copy_match(out_ref, m_out_ref[0, r, l], dist, ml)
            return 0

        lax.fori_loop(0, jnp.minimum(nseq - base, seq_chunk), body, 0)


@functools.partial(jax.jit, static_argnames=("out_max", "seq_chunk",
                                             "interpret"))
def decompress_segments_pallas(comp, n_seq,
                               lit_out, lit_src, lit_len,
                               m_out, m_dist, m_len,
                               out_max: int, seq_chunk: int = 1024,
                               interpret: bool = False):
    """Batched on-device decode from parsed sequence tables.

    Args:
      comp: int32[N, CW] compressed bytes one-per-element, CW includes PAD
        slack columns (see lz4_pallas.PAD).
      n_seq: int32[N] sequence counts from the parser.
      lit_out/lit_src/lit_len/m_out/m_dist/m_len: int32[N, S] tables from
        ``gather_decode.parse_packed`` (zero tails; sentinels not required).
      out_max: static decompressed size cap per block.

    Returns: out int32[N, out_max + PAD] (byte values, one per element).
    """
    if seq_chunk % 1024:
        raise ValueError("seq_chunk must be a multiple of 1024 (8 x 128)")
    n, cw = comp.shape
    s = lit_out.shape[1]
    if s % seq_chunk:
        pad = seq_chunk - s % seq_chunk
        z = ((0, 0), (0, pad))
        lit_out, lit_src, lit_len, m_out, m_dist, m_len = (
            jnp.pad(a, z) for a in
            (lit_out, lit_src, lit_len, m_out, m_dist, m_len))
        s += pad
    n_chunks = s // seq_chunk
    # (8, 128)-tiled SMEM layout: entry k of chunk c at [c*8 + (k>>7), k&127]
    lit_out, lit_src, lit_len, m_out, m_dist, m_len = (
        a.reshape(n, s // 128, 128) for a in
        (lit_out, lit_src, lit_len, m_out, m_dist, m_len))

    def r128(x):
        return (x + 127) & ~127

    cwr = r128(cw)
    ow = r128(out_max + PAD)
    if cwr != cw:
        comp = jnp.pad(comp, ((0, 0), (0, cwr - cw)))
    comp3 = comp.reshape(n, 1, cwr)

    seq_spec = pl.BlockSpec((1, seq_chunk // 128, 128),
                            lambda i, c, nseq: (i, c, 0),
                            memory_space=pltpu.SMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, cwr), lambda i, c, nseq: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            seq_spec, seq_spec, seq_spec, seq_spec, seq_spec, seq_spec,
        ],
        out_specs=pl.BlockSpec((1, 1, ow), lambda i, c, nseq: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_segment_kernel, seq_chunk=seq_chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 1, ow), jnp.int32),
        interpret=interpret,
    )(n_seq, comp3, lit_out, lit_src, lit_len, m_out, m_dist, m_len)
    return out.reshape(n, ow)[:, :out_max + PAD]


def decompress_blocks(blocks, out_len: int, seq_chunk: int = 1024,
                      interpret: bool | None = None):
    """Host convenience: parse on CPU + segment-execute on device.

    ``interpret=None`` auto-selects: compiled on TPU backends, interpreter
    elsewhere (Mosaic kernels only lower for TPU).
    """
    import numpy as np
    from .gather_decode import parse_blocks

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    arrs, n_seq, out_total = parse_blocks(blocks)
    cmax = max(len(b) for b in blocks)
    comp = np.zeros((len(blocks), cmax + PAD), np.int32)
    for i, b in enumerate(blocks):
        comp[i, :len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(decompress_segments_pallas(
        jnp.asarray(comp), jnp.asarray(n_seq),
        *(jnp.asarray(arrs[k]) for k in
          ("lit_out", "lit_src", "lit_len", "m_out", "m_dist", "m_len")),
        out_max=out_len, seq_chunk=seq_chunk, interpret=interpret))
    return [out[i, :out_total[i]].astype(np.uint8).tobytes()
            for i in range(len(blocks))]
