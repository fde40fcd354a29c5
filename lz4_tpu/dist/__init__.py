"""T5 distributed runtime: data-parallel block sharding over a device mesh."""

from ..utils.config import configure_jax_cache

configure_jax_cache()

from .mesh import block_mesh, device_count
from .sharded import (
    shard_compress_blocks, shard_decompress_blocks, shard_xxh32,
    sharded_roundtrip_step, compress_frame_sharded,
    compress_frame_sharded_packed, pack_offsets,
)
from .multihost import (
    compress_blocks_multihost, initialize as initialize_multihost,
    process_block_range,
)
from .recovery import BlockVerificationError, compress_blocks_verified

__all__ = [
    "block_mesh", "device_count",
    "shard_compress_blocks", "shard_decompress_blocks", "shard_xxh32",
    "sharded_roundtrip_step", "compress_frame_sharded",
    "compress_frame_sharded_packed", "pack_offsets",
    "compress_blocks_multihost", "initialize_multihost", "process_block_range",
    "BlockVerificationError", "compress_blocks_verified",
]
