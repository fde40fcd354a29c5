"""Self-verification + elastic recovery for sharded runs.

The reference's failure story (SURVEY.md §5) is graceful tier fallback and
checksum-guarded streams; the sharded analog is: because blocks are
independent and checksummed, any block whose compressed output fails
verification can be re-run in isolation — a failed chip/host costs one shard
re-run, not the job.

``compress_blocks_verified`` compresses a batch through any engine,
immediately verifies every block by decompress-and-compare (bit-exact, the
strongest check) or xxh32-of-roundtrip, and transparently retries failed
blocks through the always-correct safe tier.
"""

from __future__ import annotations

from ..core.errors import Lz4Error


class BlockVerificationError(Lz4Error):
    def __init__(self, indices):
        super().__init__(f"blocks failed verification after retry: {indices}")
        self.indices = indices


def compress_blocks_verified(blocks: list[bytes], engine=None,
                             max_retries: int = 1):
    """Compress + verify each block; re-run failures on the safe tier.

    Returns (compressed: list[bytes], retried: list[int]).
    """
    from ..streams.pipeline import get_engine
    from ..api.factory import Lz4Factory

    engine = engine or get_engine("fastest")
    compressed = engine.compress_batch(blocks)

    safe = Lz4Factory.safe_instance()

    def ok(raw, comp):
        try:
            return safe.safe_decompressor().decompress_alloc(
                comp, 0, len(comp), len(raw)) == raw
        except Lz4Error:
            return False

    failed = [i for i, (raw, comp) in enumerate(zip(blocks, compressed))
              if not ok(raw, comp)]
    retried = list(failed)
    for _ in range(max_retries):
        if not failed:
            break
        for i in failed:
            compressed[i] = safe.fast_compressor().compress_alloc(blocks[i])
        failed = [i for i in failed if not ok(blocks[i], compressed[i])]
    if failed:
        raise BlockVerificationError(failed)
    return compressed, retried
