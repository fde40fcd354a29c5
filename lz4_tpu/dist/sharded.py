"""Data-parallel sharded codec: blocks over chips via ``shard_map``.

The TPU-native equivalent of the parallelism the reference never needed
(SURVEY.md §2.6): independent LZ4 blocks are sharded along the 1-D
``"blocks"`` mesh axis, every device runs the batched device codec on its
shard (no cross-device traffic in the hot loop), and the only collectives
are an ``all_gather`` of per-block compressed lengths for exclusive-scan
output packing and the implicit ordered gather when results are pulled into
the frame assembler. Shardings are expressed with ``NamedSharding`` +
``shard_map`` so XLA places the collectives on ICI.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.constants import max_compressed_length
from ..kernels import jax_codec
from ..kernels.xxhash_jax import xxh32_batch
from .mesh import BLOCK_AXIS, block_mesh


def _pad_blocks(n: int, n_dev: int) -> int:
    return ((n + n_dev - 1) // n_dev) * n_dev


def _use_mosaic(mesh) -> bool:
    """Per-shard kernel choice: the Mosaic kernels (kernels/lz4_pallas.py)
    on accelerator meshes, the pure-JAX lockstep kernels on CPU meshes
    (byte-identical output either way). ``TPULZ4_SHARDED_MOSAIC=0`` forces
    the pure-JAX path, ``=1`` forces Mosaic (interpret mode off-TPU is not
    supported under shard_map; use only on hardware)."""
    forced = os.environ.get("TPULZ4_SHARDED_MOSAIC")
    if forced is not None:
        return forced == "1"
    return mesh.devices.flat[0].platform != "cpu"


def _mosaic_repad(arr):
    """jax_codec layout (PAD=64 slack) -> lz4_pallas layout (PAD=256)."""
    from ..kernels import lz4_pallas as lp
    return jnp.pad(arr, ((0, 0), (0, lp.PAD - jax_codec.PAD)))


@functools.partial(jax.jit, static_argnames=("dest_cap", "mesh", "mosaic"))
def _compress_sharded(data, lens, dest_cap: int, mesh, mosaic: bool = False):
    if mosaic:
        from ..kernels import lz4_pallas as lp
        inner = lambda d, l: lp.compress_fast_pallas(
            _mosaic_repad(d), l, dest_cap)
    else:
        inner = lambda d, l: jax_codec.compress_fast_batch(d, l, dest_cap)
    fn = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return fn(data, lens)


@functools.partial(jax.jit, static_argnames=("dest_cap", "mesh", "level"))
def _compress_hc_sharded(data, lens, dest_cap: int, mesh, level: int):
    """Sharded HC (LZ4Factory.java:189-202 exposes HC through every family;
    the mesh path is no exception). The phase-machine kernel (jax_hc) runs
    per shard; output is byte-identical to the host HC tiers."""
    from ..kernels import jax_hc
    fn = shard_map(
        lambda d, l: jax_hc.compress_hc_batch(d, l, dest_cap, level),
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return fn(data, lens)


@functools.partial(jax.jit, static_argnames=("out_max", "mesh", "mosaic"))
def _decompress_sharded(comp, comp_lens, out_max: int, mesh,
                        mosaic: bool = False):
    if mosaic:
        from ..kernels import lz4_pallas as lp
        inner = lambda c, l: lp.decompress_safe_pallas(
            _mosaic_repad(c), l, out_max)
    else:
        inner = lambda c, l: jax_codec.decompress_safe_batch(c, l, out_max)
    fn = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return fn(comp, comp_lens)


@functools.partial(jax.jit, static_argnames=("seed", "mesh"))
def _xxh32_sharded(data, lens, seed: int, mesh):
    fn = shard_map(
        lambda d, l: xxh32_batch(d, l, seed),
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        out_specs=P(BLOCK_AXIS),
        check_vma=False,
    )
    return fn(data, lens)


@functools.partial(jax.jit, static_argnames=("seed", "mesh"))
def _xxh64_sharded(data, lens, seed: int, mesh):
    from ..kernels.xxhash_jax import xxh64_batch
    fn = shard_map(
        lambda d, l: xxh64_batch(d, l, seed),
        mesh=mesh,
        in_specs=(P(BLOCK_AXIS, None), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        check_vma=False,
    )
    return fn(data, lens)


def pack_offsets(comp_lens):
    """Exclusive prefix sum of per-block compressed lengths.

    Device-side scan giving each block its byte offset in the packed output;
    under a sharded ``jit`` XLA lowers the cumsum to an ICI collective scan.
    """
    return jnp.cumsum(comp_lens) - comp_lens


def shard_compress_blocks(blocks: list[bytes], mesh=None,
                          level: int | None = None):
    """Compress independent blocks data-parallel over the mesh.

    ``level=None`` runs the fast-scan codec; an integer 1..17 runs the HC
    phase-machine kernel at that level. Returns list[bytes] in original
    order (ordered gather).
    """
    if not blocks:
        return []
    mesh = mesh or block_mesh()
    n_dev = mesh.devices.size
    cap = max(4, (max(len(b) for b in blocks) + 3) & ~3)
    n_padded = _pad_blocks(len(blocks), n_dev)
    padded = blocks + [b""] * (n_padded - len(blocks))
    arr, lens = jax_codec.to_device_layout(padded, cap)
    sharding = NamedSharding(mesh, P(BLOCK_AXIS, None))
    arr = jax.device_put(arr, sharding)
    lens = jax.device_put(lens, NamedSharding(mesh, P(BLOCK_AXIS)))
    dest_cap = max_compressed_length(cap)
    if level is None:
        out, out_lens, err = _compress_sharded(arr, lens, dest_cap, mesh,
                                               mosaic=_use_mosaic(mesh))
    else:
        out, out_lens, err = _compress_hc_sharded(arr, lens, dest_cap, mesh,
                                                  int(level))
    if np.asarray(err).any():
        from ..core.errors import Lz4Error
        raise Lz4Error("sharded compression failed")
    return jax_codec.from_device_layout(out, out_lens)[:len(blocks)]


def shard_decompress_blocks(blocks: list[bytes], out_max: int, mesh=None):
    """Decompress independent blocks data-parallel over the mesh."""
    if not blocks:
        return []
    mesh = mesh or block_mesh()
    n_dev = mesh.devices.size
    cap = max(4, (max(len(b) for b in blocks) + 3) & ~3)
    n_padded = _pad_blocks(len(blocks), n_dev)
    padded = blocks + [b"\x00"] * (n_padded - len(blocks))
    arr, lens = jax_codec.to_device_layout(padded, cap)
    arr = jax.device_put(arr, NamedSharding(mesh, P(BLOCK_AXIS, None)))
    lens = jax.device_put(lens, NamedSharding(mesh, P(BLOCK_AXIS)))
    out, out_lens, err = _decompress_sharded(arr, lens, out_max, mesh,
                                             mosaic=_use_mosaic(mesh))
    if np.asarray(err)[:len(blocks)].any():
        from ..core.errors import Lz4Error
        raise Lz4Error("sharded decompression failed")
    return jax_codec.from_device_layout(out, out_lens)[:len(blocks)]


def shard_xxh32(data, lens, seed: int = 0, mesh=None):
    """Sharded batched xxh32 (uint8[N, L] + lengths -> uint32[N])."""
    mesh = mesh or block_mesh()
    data = jax.device_put(data, NamedSharding(mesh, P(BLOCK_AXIS, None)))
    lens = jax.device_put(lens, NamedSharding(mesh, P(BLOCK_AXIS)))
    return _xxh32_sharded(data, lens, seed, mesh)


def shard_xxh64(data, lens, seed: int = 0, mesh=None):
    """Sharded batched xxh64 (uint8[N, L] + lengths -> (hi, lo) uint32[N]).

    64-bit lanes travel as (hi, lo) uint32 pairs (TPUs have no native
    int64); combine host-side with ``(int(hi) << 32) | int(lo)``.
    """
    mesh = mesh or block_mesh()
    data = jax.device_put(data, NamedSharding(mesh, P(BLOCK_AXIS, None)))
    lens = jax.device_put(lens, NamedSharding(mesh, P(BLOCK_AXIS)))
    return _xxh64_sharded(data, lens, seed, mesh)


def split_frame_blocks(data: bytes, block_size: int) -> list[bytes]:
    """Chunk ``data`` into frame blocks, validating the frame block size."""
    from ..formats.frame import BlockSize

    if block_size not in {int(b.num_bytes) for b in BlockSize}:
        raise ValueError("block_size must be one of 64KB/256KB/1MB/4MB")
    return [data[i:i + block_size] for i in range(0, len(data), block_size)]


def assemble_frame(data: bytes, blocks: list[bytes], compressed: list[bytes],
                   block_size: int, content_checksum: bool = True) -> bytes:
    """Host-ordered assembly of per-block compressed payloads into one
    byte-exact LZ4 frame (incompressible mask, end mark, content hash) —
    shared by the single-process sharded path and the multi-host path."""
    import struct
    from ..formats.frame import (
        BlockSize, FrameFlag, INCOMPRESSIBLE_MASK, MAGIC, _flg_to_byte)
    from ..api.factory import XXHashFactory

    size_enum = {b.num_bytes: b for b in BlockSize}
    flags = {FrameFlag.BLOCK_INDEPENDENCE}
    if content_checksum:
        flags.add(FrameFlag.CONTENT_CHECKSUM)
    out = bytearray()
    desc = bytes([_flg_to_byte(frozenset(flags)),
                  (size_enum[block_size].value & 7) << 4])
    xf = XXHashFactory.fastest_instance()
    hc = ((xf.hash32().hash(desc, 0, len(desc), 0) & 0xFFFFFFFF) >> 8) & 0xFF
    out += struct.pack("<I", MAGIC) + desc + bytes([hc])

    for raw, comp in zip(blocks, compressed):
        if len(comp) >= len(raw):
            out += struct.pack("<I", len(raw) | INCOMPRESSIBLE_MASK) + raw
        else:
            out += struct.pack("<I", len(comp)) + comp
    out += struct.pack("<I", 0)
    if content_checksum:
        s = xf.new_streaming_hash32(0)
        s.update(data)
        out += struct.pack("<I", s.get_value() & 0xFFFFFFFF)
    return bytes(out)


def compress_frame_sharded(data: bytes, block_size: int = 1 << 16,
                           mesh=None, content_checksum: bool = True,
                           level: int | None = None) -> bytes:
    """Compress a byte string into a standard LZ4 frame, blocks sharded
    over the mesh: device compress + device block prep, host-ordered
    assembly into a byte-exact frame readable by any LZ4 frame reader.
    ``level`` selects the HC kernel (1..17) instead of fast-scan."""
    blocks = split_frame_blocks(data, block_size)
    compressed = shard_compress_blocks(blocks, mesh, level) if blocks else []
    return assemble_frame(data, blocks, compressed, block_size,
                          content_checksum)


# ---------------------------------------------------------------------------
# device-side packed output assembly (SURVEY.md §2.6 ICI plan)
# ---------------------------------------------------------------------------

def _frame_body_packed(arr, lens, comp, comp_lens, block_cap: int):
    """Compact per-block compressed payloads into one contiguous frame body
    on device: exclusive-scan offsets (``pack_offsets``), then a vectorized
    gather that materializes, for every output byte, either a little-endian
    size-word byte (with the incompressible mask when the block stored raw,
    ``LZ4FrameOutputStream.java:215-222``) or the payload byte. Runs inside
    the same jit as the sharded compress — the host receives ONE array.

    Returns (body uint8[n * (block_cap + 4)], total int32).
    """
    from ..formats.frame import INCOMPRESSIBLE_MASK
    n = lens.shape[0]
    u32 = jnp.uint32
    use_raw = comp_lens >= lens          # store-raw rule (frame.py:199-235 analog)
    payload = jnp.where(use_raw, lens, comp_lens)
    emit = jnp.where(lens > 0, payload + 4, 0)   # padding blocks emit nothing
    ends = jnp.cumsum(emit)
    offs = ends - emit                   # pack_offsets over emit lengths
    total = ends[-1]
    cap_total = n * (block_cap + 4)

    j = jnp.arange(cap_total, dtype=jnp.int32)
    blk = jnp.minimum(jnp.searchsorted(ends, j, side="right"), n - 1)
    rel = j - offs[blk]
    size_word = jnp.where(use_raw,
                          lens.astype(u32) | u32(INCOMPRESSIBLE_MASK),
                          comp_lens.astype(u32))
    shift = jnp.minimum(rel, 3).astype(u32) * 8
    size_byte = ((size_word[blk] >> shift) & 0xFF).astype(jnp.int32)
    k = jnp.maximum(rel - 4, 0)
    raw_b = arr[blk, jnp.minimum(k, arr.shape[1] - 1)]
    comp_b = comp[blk, jnp.minimum(k, comp.shape[1] - 1)]
    byte = jnp.where(rel < 4, size_byte,
                     jnp.where(use_raw[blk], raw_b, comp_b))
    byte = jnp.where(j < total, byte, 0)
    return byte.astype(jnp.uint8), total


@functools.partial(jax.jit, static_argnames=("block_cap", "dest_cap", "mesh",
                                             "mosaic", "level"))
def _compress_frame_body_sharded(arr, lens, block_cap: int, dest_cap: int,
                                 mesh, mosaic: bool, level):
    """Sharded compress + on-device packed frame-body assembly, one jit."""
    if level is None:
        comp, comp_lens, err = _compress_sharded(arr, lens, dest_cap, mesh,
                                                 mosaic=mosaic)
    else:
        comp, comp_lens, err = _compress_hc_sharded(arr, lens, dest_cap,
                                                    mesh, level)
    body, total = _frame_body_packed(arr, lens, comp, comp_lens, block_cap)
    return body, total, err


def compress_frame_sharded_packed(data: bytes, block_size: int = 1 << 16,
                                  mesh=None, content_checksum: bool = True,
                                  level: int | None = None) -> bytes:
    """Like :func:`compress_frame_sharded`, but the per-block payloads are
    compacted into one contiguous buffer ON DEVICE (size words included)
    under the same jit as the compression; the host receives a single
    array plus a length scalar, prepends the 7-byte header, and appends the
    end mark + content checksum. Output is byte-exact vs formats/frame.py."""
    import struct
    from ..formats.frame import BlockSize, FrameFlag, MAGIC, _flg_to_byte
    from ..api.factory import XXHashFactory

    blocks = split_frame_blocks(data, block_size)
    if not blocks:   # empty input: header + end mark only
        return assemble_frame(data, [], [], block_size, content_checksum)
    mesh = mesh or block_mesh()
    n_dev = mesh.devices.size
    n_padded = _pad_blocks(len(blocks), n_dev)
    padded = blocks + [b""] * (n_padded - len(blocks))
    arr, lens = jax_codec.to_device_layout(padded, block_size)
    arr = jax.device_put(arr, NamedSharding(mesh, P(BLOCK_AXIS, None)))
    lens = jax.device_put(lens, NamedSharding(mesh, P(BLOCK_AXIS)))
    body, total, err = _compress_frame_body_sharded(
        arr, lens, block_size, max_compressed_length(block_size), mesh,
        _use_mosaic(mesh) and level is None, level)
    if np.asarray(err)[:len(blocks)].any():
        from ..core.errors import Lz4Error
        raise Lz4Error("sharded compression failed")
    body_np = np.asarray(body)[:int(total)]

    size_enum = {b.num_bytes: b for b in BlockSize}
    flags = {FrameFlag.BLOCK_INDEPENDENCE}
    if content_checksum:
        flags.add(FrameFlag.CONTENT_CHECKSUM)
    desc = bytes([_flg_to_byte(frozenset(flags)),
                  (size_enum[block_size].value & 7) << 4])
    xf = XXHashFactory.fastest_instance()
    hc = ((xf.hash32().hash(desc, 0, len(desc), 0) & 0xFFFFFFFF) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", MAGIC) + desc + bytes([hc]))
    out += body_np.tobytes()
    out += struct.pack("<I", 0)
    if content_checksum:
        s = xf.new_streaming_hash32(0)
        s.update(data)
        out += struct.pack("<I", s.get_value() & 0xFFFFFFFF)
    return bytes(out)


def sharded_roundtrip_step(mesh, n_blocks_per_dev: int = 2, block_len: int = 256):
    """One full sharded step — compress, hash, pack-scan, decompress, verify —
    jitted over the mesh. Used by ``dryrun_multichip`` to validate that the
    multi-chip program compiles and runs.

    Returns (ok: bool array, compressed_total: int) after device execution.
    """
    n_dev = mesh.devices.size
    n = n_dev * n_blocks_per_dev
    rng = np.random.default_rng(0)
    # compressible blocks
    base = rng.integers(0, 4, (n, block_len), dtype=np.uint8)
    blocks = [base[i].tobytes() for i in range(n)]
    arr, lens = jax_codec.to_device_layout(blocks, block_len)
    arr = jax.device_put(arr, NamedSharding(mesh, P(BLOCK_AXIS, None)))
    lens = jax.device_put(lens, NamedSharding(mesh, P(BLOCK_AXIS)))
    dest_cap = max_compressed_length(block_len)

    mosaic = _use_mosaic(mesh)

    @functools.partial(jax.jit, static_argnames=())
    def step(arr, lens):
        comp, comp_lens, cerr = _compress_sharded(arr, lens, dest_cap, mesh,
                                                  mosaic=mosaic)
        offsets = pack_offsets(comp_lens)          # global exclusive scan
        hashes = _xxh32_sharded(
            arr.astype(jnp.uint8), lens, 0, mesh)  # device checksums
        out, out_lens, derr = _decompress_sharded(comp, comp_lens, block_len,
                                                  mesh, mosaic=mosaic)
        # on-device packed frame-body assembly (one contiguous buffer)
        body, body_total = _frame_body_packed(arr, lens, comp, comp_lens,
                                              block_len)
        ok = ((cerr == 0) & (derr == 0) & (out_lens == lens)
              & jnp.all(out[:, :block_len] == arr[:, :block_len], axis=1))
        return ok, comp_lens.sum(), offsets, hashes, body, body_total

    ok, total, offsets, hashes, body, body_total = step(arr, lens)
    # validate the packed body against the host frame assembler's body bytes
    import struct
    body_np = np.asarray(body)[:int(body_total)].tobytes()
    expect = bytearray()
    comp_host = shard_compress_blocks(blocks, mesh)
    for raw, comp_b in zip(blocks, comp_host):
        from ..formats.frame import INCOMPRESSIBLE_MASK
        if len(comp_b) >= len(raw):
            expect += struct.pack("<I", len(raw) | INCOMPRESSIBLE_MASK) + raw
        else:
            expect += struct.pack("<I", len(comp_b)) + comp_b
    if body_np != bytes(expect):
        raise AssertionError("device-packed frame body mismatch")
    return np.asarray(ok), int(total)
