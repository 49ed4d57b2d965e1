"""Training-corpus curation operators: benchmark decontamination,
PII scrubbing, and GPT-style sequence packing.

All three are the "last mile" between a deduplicated web corpus and a
training run, and all three are expressed as pure built-in expressions
(whole-stage codegen, no Python UDFs) so they run at scan speed and a
second engine (DuckDB) can recompute every row's fate exactly:

- `ngram_contamination`: flag corpus documents that share any word
  n-gram with an evaluation-benchmark set (the standard train/test
  decontamination pass).  The benchmark gram set is assumed small
  (benchmarks are 10^3-10^6 rows vs the 10^12-doc corpus) and is
  broadcast; the corpus side is a scan-stage explode whose only shuffle
  is the per-doc aggregation of MATCHING grams — rows that hit the
  broadcast filter — so shuffle volume is bounded by contamination, not
  corpus size.
- `pii_scrub`: regex redaction (emails, IPv4s, SSN-shaped ids) with
  per-kind match counts for redaction-rate monitoring.  Zero-shuffle
  scan stage.  Patterns are alternation-free so Java's backtracking
  regex and RE2-family engines (DuckDB, Go) agree on every match.
- `pack_sequences`: concat-and-chop packing of documents into
  fixed-token-budget context windows (what an LLM pretraining loader
  does).  Document order is a pure function of (seed, id) via md5 — the
  same engine-portable determinism as textops.sampling — so the packing
  is reproducible across runs, engines, and partitionings.  One hash
  exchange on the md5-prefix shard + a per-shard window sort; shards
  (16^shard_chars of them) bound each sort's width, so at 10^12 docs
  you raise shard_chars, not executor memory.

Reference parity note: the reference C# library has no curation layer
(it stops at encode/decode, Parquet/ParquetResultListener.cs); these
operators extend the engine toward its stated 100 TB training-data
mission (BASELINE.json north_star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# Alternation-free, backtracking-safe patterns that parse identically
# under java.util.regex and RE2 (DuckDB/Go/Rust regex): no lookaround,
# no alternation, ASCII classes only.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def _word_grams(text_col: str, n: int) -> Column:
    """Array of word n-grams of `text_col` (space-split, order
    preserved).  Guarded so documents with < n words yield an empty
    array — Spark's sequence(1, m) would otherwise DESCEND for m < 1."""
    w = F.split(F.col(text_col), " ")
    m = F.size(w) - F.lit(n - 1)
    gen = F.transform(F.sequence(F.lit(1), m),
                      lambda i: F.array_join(F.slice(w, i, n), " "))
    return F.when(m >= 1, gen).otherwise(
        F.array().cast("array<string>"))


def ngram_contamination(docs: DataFrame, bench: DataFrame, n: int = 3,
                        id_col: str = "doc_id", text_col: str = "text",
                        bench_text_col: str | None = None,
                        out_col: str = "bad_grams") -> DataFrame:
    """Benchmark decontamination: annotate every corpus document with
    the number of DISTINCT word n-grams it shares with the benchmark
    set (`out_col`, 0 for clean docs).  Callers drop or downweight
    rows with out_col > 0.

    Scale shape (10^12 docs): the benchmark gram set is distinct'd and
    broadcast (benchmarks are tiny relative to the corpus); the corpus
    explode happens scan-side and the broadcast hash join filters it to
    matching grams BEFORE the only shuffle (groupBy id over hits), so
    shuffle bytes are O(contaminated grams), not O(corpus grams).  The
    final annotate is a left broadcast-back of the per-doc hit counts
    when they fit, else a keyed join — here expressed as a plain left
    join and left to AQE.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bench_text_col = bench_text_col or text_col
    bench_grams = (bench
                   .select(F.explode(_word_grams(bench_text_col, n))
                           .alias("_gram"))
                   .distinct())
    hits = (docs
            .select(F.col(id_col), F.explode(_word_grams(text_col, n))
                    .alias("_gram"))
            .join(F.broadcast(bench_grams), "_gram")
            .groupBy(id_col)
            .agg(F.count_distinct(F.col("_gram")).alias(out_col)))
    return (docs.join(hits, id_col, "left")
            .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0))))


def pii_scrub(df: DataFrame, text_col: str = "text",
              patterns: dict[str, str] | None = None,
              token_fmt: str = "<{kind}>",
              out_col: str | None = None,
              counts: bool = True) -> DataFrame:
    """Redact PII-shaped spans and (optionally) count matches per kind.

    Replacement is applied sequentially in `patterns` iteration order
    (default: email, then ipv4, then ssn) over a single expression
    chain; counts are measured on the ORIGINAL text so they are
    independent of replacement order.  Zero-shuffle scan stage.
    """
    patterns = patterns or PII_PATTERNS
    out_col = out_col or f"{text_col}_clean"
    cleaned = F.col(text_col)
    out = df
    for kind, pat in patterns.items():
        if counts:
            out = out.withColumn(
                f"n_{kind}",
                F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat),
                                            F.lit(0))))
        cleaned = F.regexp_replace(cleaned, pat,
                                   token_fmt.format(kind=kind))
    return out.withColumn(out_col, cleaned)


_PACK_COLS = ("shard", "n_tokens", "seq_id", "seq_off", "_h", "_start")


def pack_sequences(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", token_col: str | None = None,
                   budget: int = 2048, seed: int = 42,
                   shard_chars: int = 1) -> DataFrame:
    """Concat-and-chop sequence packing: documents are laid out in a
    deterministic md5(seed:id) order and chopped into consecutive
    context windows of `budget` tokens; each document is assigned the
    window index (`seq_id`) and offset (`seq_off`) where its first
    token lands — exactly what a pretraining data loader materializes.

    Determinism story: the order key is the md5 hex draw (engine-
    portable, append-stable), NOT partition order, so the packing is a
    pure function of (seed, ids, token counts) and an external engine
    reproduces every assignment with the same window algebra.

    Scale story: `shard` = the first `shard_chars` hex chars of the
    draw → 16^shard_chars independent streams packed in parallel; one
    hash exchange + per-shard window sort.  At 10^12 docs raise
    shard_chars (3 → 4096 streams) so each sort stays executor-sized;
    window indexes are per-shard, so (shard, seq_id) is the global
    sequence key.  Token counts default to whitespace tokens; pass
    `token_col` for real tokenizer counts.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if not 1 <= shard_chars <= 8:
        raise ValueError(f"shard_chars must be in [1, 8], got {shard_chars}")
    clash = [c for c in _PACK_COLS if c in df.columns]
    if clash:
        raise ValueError(f"pack_sequences reserves columns {clash}; "
                         "rename them first")
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    tok = (F.col(token_col) if token_col
           else F.size(F.split(F.col(text_col), " ")))
    d = (df.withColumn("_h", h)
           .withColumn("n_tokens", tok.cast("long"))
           .withColumn("shard", F.substring("_h", 1, shard_chars)))
    w = (Window.partitionBy("shard").orderBy("_h")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = F.col("_start")
    return (d.withColumn("_start",
                         F.sum("n_tokens").over(w) - F.col("n_tokens"))
             .withColumn("seq_id",
                         F.floor(start / F.lit(float(budget))).cast("long"))
             .withColumn("seq_off", (start % F.lit(budget)).cast("long"))
             .drop("_h", "_start"))


# -------------------------------------------------------------- mojibake

def fix_mojibake_str(s: str, max_depth: int = 3) -> tuple[str, int]:
    """Repair the dominant crawl mojibake: UTF-8 bytes mis-decoded as
    latin-1/cp1252 ("caf\\u00e9" -> "caf\\u00c3\\u00a9"), possibly
    stacked (ftfy's core heuristic, Speer 2019 — the full confusable
    table is out of scope).  Applied only when (a) the string contains
    a char in U+0080..U+00FF (plain ASCII cannot be this mojibake),
    (b) the byte round-trip succeeds, and (c) the result is strictly
    shorter (genuine double-encoding always shrinks: every non-ASCII
    char came from >= 2 mis-decoded bytes) — legitimate accented text
    fails (b) or (c) and passes through untouched.  Returns
    (fixed, n_layers unwound)."""
    fixed = 0
    for _ in range(max_depth):
        if not any(0x80 <= ord(ch) <= 0xFF for ch in s):
            break
        try:
            b = s.encode("latin-1")
        except UnicodeEncodeError:
            try:
                b = s.encode("cp1252")
            except UnicodeEncodeError:
                break
        try:
            t = b.decode("utf-8")
        except UnicodeDecodeError:
            break
        if len(t) >= len(s):
            break
        s = t
        fixed += 1
    return s, fixed


def fix_mojibake(df: DataFrame, text_col: str = "text",
                 out_col: str = "text_fixed") -> DataFrame:
    """DataFrame op over an Arrow batch kernel (narrow, zero shuffle —
    the htmlops/warc execution shape): adds `out_col` (repaired text)
    and `n_mojibake_layers` (encoding layers unwound; 0 = untouched).
    Null text passes through null."""
    import pyarrow as pa

    passthrough = list(df.columns)
    out_ddl = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in df.schema.fields]
        + [f"`{out_col}` string", "`n_mojibake_layers` int"])
    ti = passthrough.index(text_col)

    def run(batches):
        for batch in batches:
            texts = batch.column(ti).to_pylist()
            fixed, layers = [], []
            for s in texts:
                if s is None:
                    fixed.append(None)
                    layers.append(0)
                else:
                    t, n = fix_mojibake_str(s)
                    fixed.append(t)
                    layers.append(n)
            cols = [batch.column(i) for i in range(len(passthrough))]
            cols.append(pa.array(fixed, type=pa.string()))
            cols.append(pa.array(layers, type=pa.int32()))
            yield pa.RecordBatch.from_arrays(
                cols, names=passthrough + [out_col,
                                           "n_mojibake_layers"])

    return df.mapInArrow(run, out_ddl)


def synth_mojibake(df: DataFrame, text_col: str = "text",
                   out_col: str = "text_garbled",
                   layers: int = 1) -> DataFrame:
    """Test fixture: garble a text column by the exact process real
    mojibake comes from — encode UTF-8, mis-decode latin-1 — `layers`
    times (Arrow batch kernel; pure-ASCII text is a fixed point, as in
    reality).  fix_mojibake(synth_mojibake(t)) == t whenever t
    contains non-ASCII."""
    import pyarrow as pa

    passthrough = list(df.columns)
    out_ddl = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in df.schema.fields] + [f"`{out_col}` string"])
    ti = passthrough.index(text_col)

    def run(batches):
        for batch in batches:
            texts = batch.column(ti).to_pylist()
            out = []
            for s in texts:
                if s is None:
                    out.append(None)
                    continue
                for _ in range(layers):
                    s = s.encode("utf-8").decode("latin-1")
                out.append(s)
            cols = [batch.column(i) for i in range(len(passthrough))]
            cols.append(pa.array(out, type=pa.string()))
            yield pa.RecordBatch.from_arrays(
                cols, names=passthrough + [out_col])

    return df.mapInArrow(run, out_ddl)
