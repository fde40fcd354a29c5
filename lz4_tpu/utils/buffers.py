"""Buffer helpers shared by the host data plane."""

from __future__ import annotations


def as_bytes(buf) -> bytes:
    """View any bytes-like object as bytes (zero-copy when already bytes)."""
    if isinstance(buf, bytes):
        return buf
    if isinstance(buf, (bytearray, memoryview)):
        return bytes(buf)
    raise TypeError(f"expected bytes-like, got {type(buf).__name__}")


def chunk_bytes(data: bytes, chunk_size: int) -> list[bytes]:
    """Split into chunk_size pieces (last may be short; empty input -> [])."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    return [data[i:i + chunk_size] for i in range(0, len(data), chunk_size)]
