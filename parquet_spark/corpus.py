"""Deterministic Common-Crawl-style webpages corpus (FIXTURES.md F1).

gen_corpus(spark, n_docs, seed) -> DataFrame(url, warc_ts, html, text, lang)

Every value is a pure function of (row id, seed) via a vectorized
splitmix64 hash, so the corpus is bit-identical regardless of
partitioning, parallelism level, or re-runs — the property the
round-trip verifier and the N-vs-4N scaling benchmark both rely on
(BASELINE.json:6 "byte-identical extracted text per url").

No external data; no per-row Python in the hash path (numpy only); the
sentence-bank join is the one small Python loop and is generation-only
(never in the encode hot path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

U64 = np.uint64
_BASE_US = 1_735_689_600_000_000  # 2025-01-01 UTC in epoch-us

LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "pt", "it", "nl",
         "pl", "tr", "ar", "ko", "sv", "cs", "fi", "hu", "da", "no",
         "ro", "el", "th", "vi", "id", "uk", "he", "fa", "hi", "bg"]

_WORDS = [
    "the", "of", "and", "to", "in", "is", "for", "that", "with", "on",
    "data", "web", "page", "site", "content", "information", "service",
    "system", "network", "search", "index", "crawl", "archive", "text",
    "language", "model", "training", "corpus", "document", "quality",
    "open", "source", "project", "software", "release", "version",
    "university", "research", "science", "analysis", "report", "news",
    "world", "time", "year", "people", "government", "market", "value",
]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + U64(0x9E3779B97F4A7C15)).astype(U64)
    x = (x ^ (x >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> U64(27))) * U64(0x94D049BB133111EB)
    return x ^ (x >> U64(31))


def _stream(ids: np.ndarray, seed: int, k: int) -> np.ndarray:
    return _splitmix64(ids * U64(0x100000001B3) + U64(seed * 1315423911 + k))


def _sentence_bank(seed: int, size: int = 4096) -> list[bytes]:
    rng = np.random.default_rng(seed ^ 0x5EED)
    bank = []
    for _ in range(size):
        n = int(rng.integers(6, 14))
        idx = rng.integers(0, len(_WORDS), n)
        bank.append((" ".join(_WORDS[i] for i in idx) + ".").encode())
    return bank


# Zipf-ish lang CDF: en ~60%, long tail over 30 codes
_w = 1.0 / (np.arange(1, len(LANGS) + 1) ** 1.6)
_w[0] *= 25
_LANG_CDF = np.cumsum(_w / _w.sum())

CORPUS_PA_SCHEMA = pa.schema([
    pa.field("url", pa.string(), nullable=False),
    pa.field("warc_ts", pa.timestamp("us"), nullable=False),
    pa.field("html", pa.binary(), nullable=True),
    pa.field("text", pa.string(), nullable=False),
    pa.field("lang", pa.string(), nullable=True),
])

CORPUS_DDL = ("url string, warc_ts timestamp, html binary, "
              "text string, lang string")


_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
_DEC = np.frombuffer(b"0123456789", dtype=np.uint8)


def _hex_cols(v: np.ndarray, digits: int) -> np.ndarray:
    """(n, digits) ASCII hex matrix of uint64 values, vectorized."""
    out = np.empty((len(v), digits), dtype=np.uint8)
    for d in range(digits):
        out[:, digits - 1 - d] = _HEX[((v >> U64(4 * d)) & U64(0xF)).astype(np.int64)]
    return out


def _large_binary(n: int, offs: np.ndarray, data: bytes,
                  null_mask: np.ndarray | None = None) -> pa.Array:
    bufs = [None if null_mask is None
            else pa.py_buffer(np.packbits(~null_mask, bitorder="little").tobytes()),
            pa.py_buffer(np.ascontiguousarray(offs, dtype=np.int64).tobytes()),
            pa.py_buffer(data)]
    return pa.Array.from_buffers(
        pa.large_binary(), n, bufs,
        null_count=-1 if null_mask is None else int(null_mask.sum()))


def _concat_segments(flat: np.ndarray, starts: np.ndarray,
                     lens: np.ndarray) -> bytes:
    """Concatenate flat[starts[i] : starts[i]+lens[i]] for all i.

    Vectorized gather, tiled so the per-byte int32 index temporaries
    stay cache-resident instead of first-touch-faulting hundreds of MB."""
    out = []
    if len(lens) == 0:
        return b""
    # ~2 MiB of output bytes per tile
    tile = max(1024, int((2 << 20) / max(1.0, float(lens.mean()))))
    for lo in range(0, len(lens), tile):
        ls = lens[lo:lo + tile]
        ss = starts[lo:lo + tile].astype(np.int64)
        total = int(ls.sum())
        out_starts = np.zeros(len(ls), dtype=np.int64)
        np.cumsum(ls[:-1], out=out_starts[1:])
        pos = np.arange(total, dtype=np.int64)
        pos -= np.repeat(out_starts, ls)
        idx = np.repeat(ss, ls)
        idx += pos
        out.append(flat[idx])
    return b"".join(memoryview(o) for o in out)


def gen_batch(ids: np.ndarray, seed: int = 42,
              avg_text_sentences: int = 24, avg_html_bytes: int = 2048,
              bank: list[bytes] | None = None) -> pa.RecordBatch:
    """Generate one Arrow batch of webpages for the given row ids.

    Fully vectorized (no per-row Python): urls are a fixed-width ASCII
    matrix, text is a variable-length gather over the sentence bank,
    html is built straight from buffers with a validity bitmap."""
    ids = ids.astype(U64)
    n = len(ids)
    bank = bank if bank is not None else _sentence_bank(seed)
    h1, h2, h3, h4, h5 = (_stream(ids, seed, k) for k in range(1, 6))

    # url: Zipf-skewed hosts (hot-key skew for salting tests) + unique
    # path; fixed-width layout so the whole column is one uint8 matrix
    u = h1.astype(np.float64) / 2 ** 64
    host = (u ** 3 * 1000).astype(np.int64)  # heavy mass near host 0
    parts = [np.broadcast_to(np.frombuffer(b"https://host", np.uint8), (n, 12))]
    hd = np.empty((n, 3), dtype=np.uint8)
    for d in range(3):
        hd[:, 2 - d] = _DEC[(host // 10 ** d) % 10]
    parts += [hd,
              np.broadcast_to(np.frombuffer(b".example.com/", np.uint8), (n, 13)),
              _hex_cols(ids, 12),
              np.broadcast_to(np.frombuffer(b"/", np.uint8), (n, 1)),
              _hex_cols(h2 & U64(0xFFFFFFFF), 8)]
    url_mat = np.concatenate(parts, axis=1)
    url_w = url_mat.shape[1]
    url_offs = np.arange(n + 1, dtype=np.int64) * url_w
    urls = _large_binary(n, url_offs, url_mat.tobytes()).cast(pa.string())

    # warc_ts: near-sorted in id with +/-2s local jitter
    ts = (_BASE_US + ids * U64(2_000_000) +
          (h3 % U64(4_000_000))).astype(np.int64).view("datetime64[us]")

    # lang: Zipf over 30 codes, 1% null
    lang_idx = np.searchsorted(_LANG_CDF, h4.astype(np.float64) / 2 ** 64)
    lang_idx = np.minimum(lang_idx, len(LANGS) - 1)
    lang_null = (h4 % U64(100)) == U64(0)
    langs = pa.array(np.array(LANGS, dtype=object)[lang_idx],
                     type=pa.string(), mask=lang_null)

    # text: k sentences from the deterministic bank (~50% redundancy),
    # space-joined; built as one variable-length gather over the bank
    n_sent = (h5 % U64(2 * avg_text_sentences) + U64(1)).astype(np.int64)
    total_sent = int(n_sent.sum())
    sent_row_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_sent, out=sent_row_offs[1:])
    ctr = np.arange(total_sent, dtype=np.int64)
    ctr -= np.repeat(sent_row_offs[:-1], n_sent)
    rep_ids = np.repeat(ids * U64(131), n_sent)
    sid = (_stream(rep_ids + ctr.astype(U64), seed, 7)
           % U64(len(bank))).astype(np.int64)
    bank_sp = [s + b" " for s in bank]            # sentence + separator
    bank_lens = np.array([len(s) for s in bank_sp], dtype=np.int64)
    bank_starts = np.zeros(len(bank_sp) + 1, dtype=np.int64)
    np.cumsum(bank_lens, out=bank_starts[1:])
    bank_flat = np.frombuffer(b"".join(bank_sp), dtype=np.uint8)
    is_last = ctr == np.repeat(n_sent - 1, n_sent)
    out_lens = bank_lens[sid] - is_last          # drop trailing space
    text_data = _concat_segments(bank_flat, bank_starts[sid], out_lens)
    cs = np.zeros(total_sent + 1, dtype=np.int64)
    np.cumsum(out_lens, out=cs[1:])
    text_offs = cs[sent_row_offs]  # per-row byte offsets
    texts = _large_binary(n, text_offs, text_data).cast(pa.string())

    # html: incompressible pseudo-random bytes, ~uniform lengths, 5% null
    hlen = (avg_html_bytes // 2 +
            (h2 % U64(avg_html_bytes))).astype(np.int64)
    html_null = (h5 % U64(20)) == U64(0)
    hlen[html_null] = 0
    words_per = (hlen + 7) // 8
    rep_hids = np.repeat(ids * U64(1 << 20), words_per)
    woffs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(words_per, out=woffs[1:])
    total_words = len(rep_hids)
    wbase = np.repeat(woffs[:-1], words_per)
    words = np.empty(total_words, dtype=U64)
    wt = 1 << 19  # ~4 MiB of uint64 per tile keeps stream temporaries cached
    for lo in range(0, total_words, wt):
        hi = min(lo + wt, total_words)
        hctr = np.arange(lo, hi, dtype=np.int64) - wbase[lo:hi]
        words[lo:hi] = _stream(rep_hids[lo:hi] + hctr.astype(U64), seed, 9)
    blob = words.view(np.uint8)
    html_data = _concat_segments(blob, woffs[:-1] * 8, hlen)
    html_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(hlen, out=html_offs[1:])
    htmls = _large_binary(n, html_offs, html_data, html_null).cast(pa.binary())

    return pa.RecordBatch.from_arrays(
        [urls,
         pa.array(ts, type=pa.timestamp("us")),
         htmls,
         texts,
         langs],
        schema=CORPUS_PA_SCHEMA)


def gen_corpus(spark: SparkSession, n_docs: int, seed: int = 42,
               parts: int | None = None, avg_text_sentences: int = 24,
               avg_html_bytes: int = 2048) -> DataFrame:
    """Distributed deterministic corpus as a DataFrame."""
    parts = parts or spark.sparkContext.defaultParallelism

    def gen(batches):
        bank = _sentence_bank(seed)
        for batch in batches:
            ids = batch.column(0).to_numpy()
            yield gen_batch(ids, seed, avg_text_sentences, avg_html_bytes, bank)

    return (spark.range(0, n_docs, numPartitions=parts)
            .mapInArrow(gen, CORPUS_DDL))
