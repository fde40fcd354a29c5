"""T5 distributed runtime: data-parallel block sharding over a device mesh."""

from .mesh import block_mesh, device_count
from .sharded import (
    shard_compress_blocks, shard_decompress_blocks, shard_xxh32,
    sharded_roundtrip_step, compress_frame_sharded, pack_offsets,
)

__all__ = [
    "block_mesh", "device_count",
    "shard_compress_blocks", "shard_decompress_blocks", "shard_xxh32",
    "sharded_roundtrip_step", "compress_frame_sharded", "pack_offsets",
]
