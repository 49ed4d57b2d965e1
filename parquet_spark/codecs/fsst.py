"""FSST-style symbol-table string compression, built from scratch.

Boncz/Neumann/Leis-style idea (VLDB'20 "FSST: Fast Random Access String
Compression"): replace frequent substrings (symbols of 2..8 bytes) with
short codes.  This implementation builds the symbol table by iterated
pair merging (2 -> 4 -> 8 byte symbols over three rounds), so both
training and encoding are a BOUNDED number of numpy passes over the
buffer — independent of the symbol count.  An earlier design applied
one `bytes.replace` pass per symbol (O(symbols x buffer) memory
traffic), which saturated DRAM bandwidth and destroyed multi-core
scaling; this one is compute-light and cache-friendly.

  * code space: 0..255 are literal bytes; 256..510 are symbols, each
    defined as a pair (left_code, right_code) of earlier codes,
    expanding to at most 8 bytes;
  * pair matching is a single gather through a 2 MiB lookup table
    (key = left << 10 | right, codes < 1024 always);
  * selection is exact greedy left-to-right, vectorized over matched
    positions only (within each maximal run of consecutive matchable
    positions, greedy picks offsets 0, 2, 4, ...);
  * the final code stream is bit-packed to ceil(log2(n_codes)) bits.

Payload layout (self-describing):
    <H n_symbols> <Q n_codes>
    n_symbols x (<H left> <H right>)          merge rules, in code order
    bit-packed code stream (width = bit_width(255 + n_symbols))

Reference parity: the reference has no string codec of its own (it
delegates to Parquet.Net, /root/reference/Parquet.Core/Fragment.cs:307);
this codec is the engine's answer for `url`/`text` columns per the
north rule (BASELINE.json:6).
"""

from __future__ import annotations

import struct

import numpy as np


MAX_SYMBOLS = 255          # new codes 256..510 -> 9-bit packed stream
ROUNDS = 3                 # pair merges: symbol lengths 2, 4, 8
SAMPLE_BYTES = 1 << 18     # train on at most 256 KiB
_ROUND_BUDGET = (96, 80, 79)   # symbols admitted per round (sums to 255)
MIN_PAIR_COUNT = 16        # a pair must appear this often in the sample
_KEY_BITS = 10             # codes < 1024 -> pair key fits 20 bits
_LUT_SIZE = 1 << (2 * _KEY_BITS)


def _build_lut(rules: list[tuple[int, int]]) -> np.ndarray:
    """code = lut[left << 10 | right]; -1 means no rule."""
    lut = np.full(_LUT_SIZE, -1, dtype=np.int16)
    for i, (left, right) in enumerate(rules):
        lut[(left << _KEY_BITS) | right] = 256 + i
    return lut


_EVEN_MASK_CACHE: dict[int, np.ndarray] = {}


def _parity_masks(n: int) -> tuple[np.ndarray, np.ndarray]:
    even = _EVEN_MASK_CACHE.get(n)
    if even is None:
        even = np.zeros(n, dtype=bool)
        even[::2] = True
        if len(_EVEN_MASK_CACHE) > 8:
            _EVEN_MASK_CACHE.clear()
        _EVEN_MASK_CACHE[n] = even
    return even, ~even


def _choose_matches(m: np.ndarray) -> np.ndarray:
    """Maximal non-overlapping match selection, pure boolean passes.

    Two-coloring of the conflict path graph: take all matches at even
    positions first, then odd-position matches not adjacent to a taken
    even match.  No index arrays are materialized (important: large
    int64 index temporaries dominate memory traffic otherwise), and the
    result is a maximal independent set, so match density is close to
    greedy's while every pass stays O(n) boolean work.
    """
    n = len(m)
    even, odd = _parity_masks(n)
    ce = m & even
    blocked = np.zeros(n, dtype=bool)
    blocked[1:] = ce[:-1]          # position after a taken even match
    blocked[:-1] |= ce[1:]         # position before a taken even match
    return ce | (m & odd & ~blocked)


def _substitute(a: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """One merge pass: replace matched pairs with symbol codes.

    `a` is a uint16 code array; returns the (shorter) substituted array.
    """
    if len(a) < 2:
        return a
    key = a[:-1].astype(np.uint32)
    key <<= _KEY_BITS
    key |= a[1:]
    code = lut[key]
    m = code >= 0
    if not m.any():
        return a
    chosen = _choose_matches(m)
    vals = np.where(chosen, code.view(np.uint16), a[:-1])
    out = np.empty(len(a), dtype=np.uint16)
    out[:-1] = vals
    out[-1] = a[-1]
    keep = np.empty(len(a), dtype=bool)
    keep[0] = True
    keep[1:] = ~chosen
    return out[keep]


def train(buf: bytes, max_symbols: int = MAX_SYMBOLS) -> list[tuple[int, int]]:
    """Learn merge rules on a sample. Returns [(left, right), ...] where
    rule i defines code 256+i; later rules may reference earlier codes."""
    if len(buf) < 64:
        return []
    sample = np.frombuffer(buf[:SAMPLE_BYTES], dtype=np.uint8).astype(np.uint16)
    min_count = max(MIN_PAIR_COUNT, len(sample) >> 14)
    rules: list[tuple[int, int]] = []
    for rnd in range(ROUNDS):
        if len(sample) < 2 or len(rules) >= max_symbols:
            break
        budget = min(_ROUND_BUDGET[rnd], max_symbols - len(rules))
        key = (sample[:-1].astype(np.int32) << _KEY_BITS) | sample[1:]
        counts = np.bincount(key, minlength=_LUT_SIZE)
        cand = np.flatnonzero(counts >= min_count)
        if len(cand) == 0:
            break
        order = np.argsort(counts[cand])[::-1][:budget]
        new_rules = [(int(k) >> _KEY_BITS, int(k) & ((1 << _KEY_BITS) - 1))
                     for k in cand[order]]
        rules.extend(new_rules)
        sample = _substitute(sample, _build_lut(rules))
    return rules


def _expand_rules(rules: list[tuple[int, int]]) -> list[bytes]:
    """Byte expansion of every code (0..255 literals, then symbols)."""
    exp = [bytes([i]) for i in range(256)]
    for left, right in rules:
        exp.append(exp[left] + exp[right])
    return exp


_TILE = 1 << 18  # codes per tile; all merge rounds run tile-resident (L2)


def encode(buf: bytes, table: list[tuple[int, int]]) -> bytes:
    """Apply merge rules (<= ROUNDS fixpoint passes), then plane-split.

    The buffer is processed in L2-sized tiles, each tile running ALL
    merge rounds while resident in cache — DRAM traffic is one read of
    the input plus one write of the output instead of one read+write
    per round, which is what lets 32 concurrent workers scale on a
    bandwidth-limited socket.  (A pair match spanning a tile boundary
    is missed; with 256 Ki-code tiles that is <0.01% of matches.)

    Codes < 512 are stored as a low-byte plane plus a bit-packed
    high-bit plane — 2 cheap passes instead of a 9-bit shuffle, and the
    byte plane compresses better under the zstd block wrap."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    lut = _build_lut(table) if table else None
    outs = []
    for lo in range(0, max(len(raw), 1), _TILE):
        a = raw[lo:lo + _TILE].astype(np.uint16)
        if lut is not None:
            for _ in range(ROUNDS):
                b = _substitute(a, lut)
                if len(b) == len(a):
                    break
                a = b
        outs.append(a)
    a = outs[0] if len(outs) == 1 else np.concatenate(outs)
    head = struct.pack("<HQ", len(table), len(a))
    rules_b = b"".join(struct.pack("<HH", l, r) for l, r in table)
    low = a.astype(np.uint8).tobytes()
    high = np.packbits(a >= 256).tobytes() if table else b""
    return head + rules_b + low + high


def decode(payload: bytes) -> bytes:
    n_sym, n_codes = struct.unpack_from("<HQ", payload, 0)
    off = 10
    rules = [struct.unpack_from("<HH", payload, off + 4 * i)
             for i in range(n_sym)]
    off += 4 * n_sym
    if n_codes == 0:
        return b""
    a = np.frombuffer(payload, np.uint8, n_codes, off).astype(np.int32)
    if n_sym:
        high = np.unpackbits(
            np.frombuffer(payload, np.uint8, (n_codes + 7) // 8,
                          off + n_codes), count=n_codes)
        a += high.astype(np.int32) << 8
    exp = _expand_rules(rules)
    lengths = np.array([len(e) for e in exp], dtype=np.int32)
    starts = np.zeros(len(exp) + 1, dtype=np.int32)
    np.cumsum(lengths, out=starts[1:])
    flat = np.frombuffer(b"".join(exp), dtype=np.uint8)
    # tile the gather so its index temporaries stay cache-resident
    parts = []
    for lo in range(0, len(a), _TILE):
        t = a[lo:lo + _TILE]
        out_lens = lengths[t]
        total = int(out_lens.sum(dtype=np.int64))
        # vectorized variable-length gather: per code, copy its slice
        out_starts = np.zeros(len(t), dtype=np.int32)
        np.cumsum(out_lens[:-1], out=out_starts[1:])
        pos = np.arange(total, dtype=np.int32)
        pos -= np.repeat(out_starts, out_lens)
        idx = np.repeat(starts[t], out_lens)
        idx += pos
        parts.append(flat[idx])
    return b"".join(memoryview(p) for p in parts)
