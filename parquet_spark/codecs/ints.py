"""Self-describing integer-stream codec: FOR / DELTA+FOR / RLE, auto-picked.

Every composite codec (dictionary indexes, run lengths, string offsets,
timestamp columns) funnels its integers through here. Logical values are
uint64; signed callers zigzag first (kernels.zigzag_encode).

Wire format (little-endian):
  byte 0: mode (0=FOR, 1=DELTA+FOR, 2=RLE)
  FOR:   <Q ref> <Q n> <B width> packed-bits(values - ref)
  DELTA: <Q first> <Q zref> <Q n> <B width> packed-bits(zigzag(diff) - zref)
  RLE:   <Q n> <I nruns> int_stream(run_values) ... int_stream(run_lengths)
         (each nested stream is length-prefixed with <I>)

Reference parity: generalizes the delta-binary-packed / RLE hybrid the
reference turns on via Parquet.Net
(/root/reference/ParquetResultListener.cs:47-50, Options.cs:12).
"""

from __future__ import annotations

import struct

import numpy as np

from .kernels import bit_width, pack_bits, unpack_bits, zigzag_decode, zigzag_encode

MODE_FOR = 0
MODE_DELTA = 1
MODE_RLE = 2


def _for_body(u: np.ndarray) -> bytes:
    ref = int(u.min()) if len(u) else 0
    resid = u - np.uint64(ref)
    width = bit_width(int(resid.max())) if len(u) else 0
    return struct.pack("<QQB", ref, len(u), width) + pack_bits(resid, width)


def _for_size(u: np.ndarray) -> int:
    if len(u) == 0:
        return 17
    resid_max = int(u.max()) - int(u.min())
    return 17 + (len(u) * bit_width(resid_max) + 7) // 8


def _runs(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    change = np.flatnonzero(u[1:] != u[:-1])
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [len(u)]))
    return u[starts], (ends - starts).astype(np.uint64)


def encode_uint64(u: np.ndarray, allow_rle: bool = True) -> bytes:
    """Encode a uint64 array, picking the smallest of FOR/DELTA/RLE."""
    u = np.ascontiguousarray(u, dtype=np.uint64)
    n = len(u)
    candidates: list[tuple[int, int]] = [(_for_size(u), MODE_FOR)]

    zz = None
    if n > 1:
        d = np.diff(u.view(np.int64).astype(np.int64))
        zz = zigzag_encode(d)
        zsize = 25 + (len(zz) * bit_width(int(zz.max()) - int(zz.min())) + 7) // 8
        candidates.append((zsize, MODE_DELTA))

    run_vals = run_lens = None
    if allow_rle and n > 1:
        run_vals, run_lens = _runs(u)
        if len(run_vals) * 3 < n:  # only worth trying when runs are real
            rsize = 12 + 8 + _for_size(run_vals) + _for_size(run_lens)
            candidates.append((rsize, MODE_RLE))

    mode = min(candidates)[1]
    if mode == MODE_FOR:
        return bytes([MODE_FOR]) + _for_body(u)
    if mode == MODE_DELTA:
        zref = int(zz.min())
        resid = zz - np.uint64(zref)
        width = bit_width(int(resid.max()))
        return (bytes([MODE_DELTA]) +
                struct.pack("<QQQB", int(u[0]), zref, n, width) +
                pack_bits(resid, width))
    vals_b = bytes([MODE_FOR]) + _for_body(run_vals)
    lens_b = bytes([MODE_FOR]) + _for_body(run_lens)
    return (bytes([MODE_RLE]) + struct.pack("<QI", n, len(vals_b)) +
            vals_b + lens_b)


def decode_uint64(buf: bytes) -> np.ndarray:
    mode = buf[0]
    if mode == MODE_FOR:
        ref, n, width = struct.unpack_from("<QQB", buf, 1)
        vals = unpack_bits(buf[18:], width, n)
        return vals + np.uint64(ref)
    if mode == MODE_DELTA:
        first, zref, n, width = struct.unpack_from("<QQQB", buf, 1)
        resid = unpack_bits(buf[26:], width, n - 1) if n > 1 else np.zeros(0, np.uint64)
        d = zigzag_decode(resid + np.uint64(zref))
        out = np.empty(n, dtype=np.uint64)
        out[0] = first
        if n > 1:
            np.cumsum(d.astype(np.uint64), out=out[1:])
            out[1:] += np.uint64(first)
        return out
    if mode == MODE_RLE:
        n, vlen = struct.unpack_from("<QI", buf, 1)
        off = 1 + 12
        run_vals = decode_uint64(buf[off:off + vlen])
        run_lens = decode_uint64(buf[off + vlen:])
        return np.repeat(run_vals, run_lens.astype(np.int64))[:n]
    raise ValueError(f"unknown int-stream mode {mode}")


def encode_int64(v: np.ndarray, allow_rle: bool = True) -> bytes:
    """Signed int64 entry point (bit-faithful via uint64 reinterpret)."""
    return encode_uint64(np.ascontiguousarray(v, dtype=np.int64).view(np.uint64),
                         allow_rle=allow_rle)


def decode_int64(buf: bytes) -> np.ndarray:
    return decode_uint64(buf).view(np.int64)
