"""FSST-style symbol-table string compression, built from scratch.

Boncz/Neumann/Leis-style idea (VLDB'20 "FSST: Fast Random Access String
Compression"): replace frequent substrings (symbols, 2..8 bytes) with
1-byte codes. This implementation keeps the symbol-table idea but picks
its 1-byte codes from byte values that do NOT occur anywhere in the
input buffer, which makes every substitution context-free and exactly
invertible with plain `bytes.replace` (C-speed, no per-row Python):

  * codes never collide with data bytes,
  * symbols consist only of data bytes, so later passes can never match
    across an inserted code,
  * decode = replace(code -> symbol) in any order.

If the input uses all 256 byte values, encoding is not applicable and
the caller falls back to PLAIN (the auto-selector compares sizes anyway).

Reference parity: the reference has no string codec of its own (it
delegates to Parquet.Net, /root/reference/Parquet.Core/Fragment.cs:307);
this codec is the engine's answer for `url`/`text` columns per the
north rule (BASELINE.json:6).
"""

from __future__ import annotations

import struct

import numpy as np

MAX_SYMBOLS = 64          # replace passes are O(passes * buf); cap them
SAMPLE_BYTES = 1 << 16    # train on at most 64 KiB
_SYM_LENGTHS = (8, 6, 4, 3, 2)
MIN_GAIN_RATIO = 0.002    # skip symbols saving <0.2% of the sample


def _window_codes(s: np.ndarray, length: int) -> np.ndarray:
    """Exact big-endian uint64 code of every `length`-byte window (1-D)."""
    n = len(s) - length + 1
    c = np.zeros(n, dtype=np.uint64)
    for j in range(length):
        c |= s[j:j + n].astype(np.uint64) << np.uint64(8 * (length - 1 - j))
    return c


def train(buf: bytes, max_symbols: int = MAX_SYMBOLS) -> list[tuple[int, bytes]]:
    """Pick (code_byte, symbol) pairs by estimated gain on a sample.

    Window counting is exact-code based: each <=8-byte window maps to one
    uint64, so frequency counting is a single 1-D np.unique per length.
    Returns [] when no unused byte values exist or the buffer is tiny.
    """
    if len(buf) < 64:
        return []
    arr = np.frombuffer(buf, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256)
    free_codes = np.flatnonzero(hist == 0)
    if len(free_codes) == 0:
        return []
    sample = arr[:SAMPLE_BYTES]
    min_gain = max(16, int(len(sample) * MIN_GAIN_RATIO))

    candidates: list[tuple[int, int, bytes]] = []  # (gain, length, symbol)
    for length in _SYM_LENGTHS:
        if len(sample) <= length:
            continue
        codes = _window_codes(sample, length)
        uniq, counts = np.unique(codes, return_counts=True)
        gains = counts * (length - 1)
        keep = gains >= min_gain
        uniq, gains = uniq[keep], gains[keep]
        order = np.argsort(gains)[::-1][:max_symbols]
        for i in order:
            candidates.append((int(gains[i]), length,
                               int(uniq[i]).to_bytes(length, "big")))

    candidates.sort(key=lambda t: (-t[0], -t[1]))
    chosen: list[bytes] = []
    seen: set[bytes] = set()
    for _, _, sym in candidates:
        if sym in seen:
            continue
        seen.add(sym)
        chosen.append(sym)
        if len(chosen) >= min(max_symbols, len(free_codes)):
            break
    # longer symbols must be replaced first
    chosen.sort(key=len, reverse=True)
    return [(int(free_codes[i]), sym) for i, sym in enumerate(chosen)]


def encode(buf: bytes, table: list[tuple[int, bytes]]) -> bytes:
    """Apply the symbol table. Self-describing payload."""
    out = buf
    used: list[tuple[int, bytes]] = []
    for code, sym in table:
        replaced = out.replace(sym, bytes([code]))
        if len(replaced) < len(out):
            used.append((code, sym))
            out = replaced
    head = struct.pack("<HQ", len(used), len(buf))
    parts = [head]
    for code, sym in used:
        parts.append(struct.pack("<BB", code, len(sym)))
        parts.append(sym)
    parts.append(out)
    return b"".join(parts)


def decode(payload: bytes) -> bytes:
    n_sym, orig_len = struct.unpack_from("<HQ", payload, 0)
    off = 10
    table: list[tuple[int, bytes]] = []
    for _ in range(n_sym):
        code, slen = struct.unpack_from("<BB", payload, off)
        off += 2
        table.append((code, payload[off:off + slen]))
        off += slen
    out = payload[off:]
    for code, sym in table:
        out = out.replace(bytes([code]), sym)
    if len(out) != orig_len:
        raise ValueError(f"fsst decode length mismatch: {len(out)} != {orig_len}")
    return out
