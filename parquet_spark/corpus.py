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


def gen_batch(ids: np.ndarray, seed: int = 42,
              avg_text_sentences: int = 24, avg_html_bytes: int = 2048,
              bank: list[bytes] | None = None) -> pa.RecordBatch:
    """Generate one Arrow batch of webpages for the given row ids."""
    ids = ids.astype(U64)
    n = len(ids)
    bank = bank if bank is not None else _sentence_bank(seed)
    h1, h2, h3, h4, h5 = (_stream(ids, seed, k) for k in range(1, 6))

    # url: Zipf-skewed hosts (hot-key skew for salting tests) + unique path
    u = h1.astype(np.float64) / 2 ** 64
    host = (u ** 3 * 1000).astype(np.int64)  # heavy mass near host 0
    urls = [f"https://host{host[i]}.example.com/{int(ids[i]):012x}/{int(h2[i] & U64(0xffffffff)):08x}"
            for i in range(n)]

    # warc_ts: near-sorted in id with +/-2s local jitter
    ts = (_BASE_US + ids * U64(2_000_000) +
          (h3 % U64(4_000_000))).astype(np.int64).view("datetime64[us]")

    # lang: Zipf over 30 codes, 1% null
    lang_idx = np.searchsorted(_LANG_CDF, h4.astype(np.float64) / 2 ** 64)
    lang_idx = np.minimum(lang_idx, len(LANGS) - 1)
    lang_null = (h4 % U64(100)) == U64(0)
    langs = pa.array(np.array(LANGS, dtype=object)[lang_idx],
                     type=pa.string(), mask=lang_null)

    # text: k sentences from the deterministic bank (~50% redundancy)
    n_sent = (h5 % U64(2 * avg_text_sentences) + U64(1)).astype(np.int64)
    texts = []
    for i in range(n):
        sid = _stream(ids[i] * U64(131) + np.arange(n_sent[i], dtype=U64),
                      seed, 7) % U64(len(bank))
        texts.append(b" ".join(bank[int(s)] for s in sid).decode())

    # html: incompressible pseudo-random bytes, ~lognormal lengths, 5% null
    hlen = (avg_html_bytes // 2 +
            (h2 % U64(avg_html_bytes))).astype(np.int64)
    html_null = (h5 % U64(20)) == U64(0)
    hlen[html_null] = 0
    words_per = (hlen + 7) // 8
    rep_ids = np.repeat(ids * U64(1 << 20), words_per)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(words_per, out=offs[1:])
    ctr = np.arange(len(rep_ids), dtype=np.int64) - np.repeat(offs[:-1], words_per)
    blob = _stream(rep_ids + ctr.astype(U64), seed, 9).tobytes()
    htmls = [None if html_null[i] else
             blob[offs[i] * 8: offs[i] * 8 + hlen[i]] for i in range(n)]

    return pa.RecordBatch.from_arrays(
        [pa.array(urls, type=pa.string()),
         pa.array(ts, type=pa.timestamp("us")),
         pa.array(htmls, type=pa.binary()),
         pa.array(texts, type=pa.string()),
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
