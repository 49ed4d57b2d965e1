"""Vectorized bit-packing kernels (pure numpy).

The primitive every lightweight codec builds on: pack an array of
non-negative integers into ceil(n*width/8) bytes using `width` bits per
value, and the exact inverse.

Reference parity: the reference delegates DELTA_BINARY_PACKED /
RLE-bitpacked-hybrid page encodings to Parquet.Net
(/root/reference/Parquet/ParquetResultListener.cs:47-50,
/root/reference/README.md:18-20); here the packing itself is
implemented from scratch, vectorized (no per-row Python).
"""

from __future__ import annotations

import numpy as np


def bit_width(max_value: int) -> int:
    """Bits needed to represent max_value (0 -> 0 bits)."""
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into `width` bits each (big-endian bit order).

    width == 0 means all values are zero and nothing is stored.
    """
    if width == 0 or len(values) == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    # view each value as the fewest big-endian bytes covering `width`
    # bits, unpack those bits, keep the low `width` — identical bit
    # stream to the all-64-bit path but 2-8x less memory traffic.
    nbits = 8 if width <= 8 else 16 if width <= 16 else 32 if width <= 32 else 64
    b = v.astype(f">u{nbits // 8}").reshape(-1, 1).view(np.uint8)
    bits = np.unpackbits(b, axis=1)[:, nbits - width:]
    return np.packbits(bits.ravel()).tobytes()


def unpack_bits(buf: bytes, width: int, count: int) -> np.ndarray:
    """Inverse of pack_bits -> uint64 array of length `count`."""
    if width == 0 or count == 0:
        return np.zeros(count, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8),
                         count=count * width).reshape(count, width)
    nbits = 8 if width <= 8 else 16 if width <= 16 else 32 if width <= 32 else 64
    full = np.zeros((count, nbits), dtype=np.uint8)
    full[:, nbits - width:] = bits
    return (np.ascontiguousarray(np.packbits(full, axis=1))
            .view(f">u{nbits // 8}").ravel().astype(np.uint64))


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """Map signed int64 -> uint64 so small magnitudes get small codes."""
    v = v.astype(np.int64, copy=False)
    return ((v.astype(np.uint64) << np.uint64(1)) ^
            (v >> np.int64(63)).astype(np.uint64))


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)) ^ (np.uint64(0) - (u & np.uint64(1)))).astype(np.int64)
