"""Inverted token index over a document corpus + pruned token search.

A training-data pipeline hits "which documents contain these terms?"
constantly — decontamination probes, keyword quality audits, targeted
corpus slicing.  Scanning 10^12 documents per probe is a non-starter;
the classic answer is an inverted file: token -> sorted posting list of
doc ids, stored once, probed in O(tokens) chunk reads.

Scale design (the 100 TB story):
  * tokenization is scan-stage codegen (`lower`/`split`/`array_distinct`
    — JVM, no Python) and the only wide exchange is (token, doc_id)
    pairs into a HashAggregate; partial aggregation combines map-side.
  * stopword skew is handled by construction: document frequencies are
    counted first (counts combine map-side, so a hot token costs one
    long per partition, not a giant group), and tokens with df >
    `max_df` are dropped via a BROADCAST anti-join — the broadcast side
    is the over-cap token list, small by Zipf's law precisely because
    its members are frequent.  With a cutoff in place every posting
    list is bounded, so no collect_list group can blow a task.
  * the index itself is an encoded table RANGE-partitioned on token:
    manifest-level file pruning + zone maps route a probe to the one
    chunk owning each token; sorted doc_ids delta/FOR-pack inside the
    list codec.
  * search explodes only the probed posting rows (|tokens| rows in,
    Σ df out) — corpus size never appears in the plan.

The reference has no search operator; this extends the encoded format
the same way its typed columnar cache extends result storage
(/root/reference/Parquet.Core/Fragment.cs:129-168 stores, never
queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# lowercase alnum runs; mirrored verbatim by the DuckDB oracle's
# string_split_regex — keep the two in sync
TOKEN_PATTERN = "[^a-z0-9]+"


def tokens_col(col):
    """Distinct tokens of a text column as array<string> (codegen)."""
    return F.array_distinct(
        F.filter(F.split(F.lower(col), TOKEN_PATTERN),
                 lambda t: t != F.lit("")))


def build_token_index(df: DataFrame, index_path: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      max_df: int | None = None,
                      n_parts: int = 8,
                      block_codec: str = "auto") -> dict:
    """Build the inverted index as an encoded table at ``index_path``.

    Index schema: (token string, df bigint, doc_ids array<bigint>,
    tfs array<bigint>), range-layout on token; ``tfs`` is the term
    frequency aligned element-wise with the doc_ids posting list, so
    ranked retrieval (`rank_tokens`) needs no second corpus pass.
    ``max_df`` drops tokens appearing in more than that many documents
    (selectivity-free stopwords — the rows that would otherwise skew
    the build and bloat the index); the df column is kept for IDF
    scoring.  Returns the commit snapshot.

    The first aggregate groups by (token, doc) — hot tokens spread
    over their documents, so term-frequency counting is skew-free by
    construction; only the posting-collect group concentrates a token,
    and max_df bounds that."""
    from ..manifest import write_encoded
    occurrences = df.select(
        F.explode(F.filter(F.split(F.lower(F.col(text_col)),
                                   TOKEN_PATTERN),
                           lambda t: t != F.lit(""))).alias("token"),
        F.col(id_col).cast("long").alias("_doc"))
    pairs = (occurrences.groupBy("token", "_doc")
             .agg(F.count(F.lit(1)).alias("_tf")))
    if max_df is not None:
        hot = (pairs.groupBy("token")
               .agg(F.count(F.lit(1)).alias("_df"))
               .where(F.col("_df") > max_df)
               .select("token"))
        # broadcast ANTI-join: the over-cap set is the small one
        pairs = pairs.join(F.broadcast(hot), "token", "left_anti")
    postings = (pairs.groupBy("token")
                .agg(F.count(F.lit(1)).alias("df"),
                     F.sort_array(F.collect_list(
                         F.struct("_doc", "_tf"))).alias("_p"))
                .select("token", "df",
                        F.transform("_p", lambda s: s["_doc"])
                        .alias("doc_ids"),
                        F.transform("_p", lambda s: s["_tf"])
                        .alias("tfs")))
    return write_encoded(postings, index_path, key=["token"],
                         n_parts=n_parts, mode="range",
                         block_codec=block_codec)


def search_tokens(spark: SparkSession, index_path: str,
                  tokens: list[str], mode: str = "all",
                  backend=None) -> DataFrame:
    """doc_ids matching the probe tokens, via the pruned index.

    ``mode="all"`` (AND): documents containing every probe token;
    ``mode="any"`` (OR): documents containing at least one.  Tokens are
    lowercased to match the index's tokenizer.  A token absent from the
    index (never seen, or dropped by the build's max_df cutoff)
    contributes no postings — under "all" that makes the result empty,
    which is the honest answer only if the token truly never occurs;
    callers that built with max_df are responsible for keeping probes
    under the cutoff.  Returns a single-column (doc_id) DataFrame."""
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    probes = sorted({t.lower() for t in tokens})
    if not probes:
        raise ValueError("tokens must name at least one probe token")
    from ..manifest import EncodedTable, scan_table
    if EncodedTable(index_path, backend=backend).schema() is None:
        # index built over an empty corpus: committed, but schema-less
        return spark.createDataFrame([], "doc_id bigint")
    dec = scan_table(spark, index_path, [("token", "in", probes)],
                     columns=["token", "doc_ids"], backend=backend)
    hits = dec.select("token", F.explode("doc_ids").alias("doc_id"))
    if mode == "any":
        return hits.select("doc_id").distinct()
    return (hits.groupBy("doc_id")
            .agg(F.count_distinct("token").alias("_nt"))
            .where(F.col("_nt") == len(probes))
            .select("doc_id"))


def search_prefix(spark: SparkSession, index_path: str,
                  prefix: str, backend=None) -> DataFrame:
    """doc_ids of documents containing ANY token starting with
    ``prefix`` (wildcard probe, e.g. "vect" -> vector/vectors/...).
    Rides the engine's LIKE-prefix pushdown: the [prefix,
    prefix_upper) zone range prunes index files/chunks driver-side,
    so the probe touches only the token range's chunks — same plan
    shape as an exact-token probe.  Returns (doc_id) distinct."""
    if not prefix:
        raise ValueError("prefix must be non-empty (an empty prefix "
                         "matches the whole index — scan it directly)")
    from ..manifest import EncodedTable, scan_table
    if EncodedTable(index_path, backend=backend).schema() is None:
        return spark.createDataFrame([], "doc_id bigint")
    dec = scan_table(spark, index_path,
                     [("token", "prefix", prefix.lower())],
                     columns=["token", "doc_ids"], backend=backend)
    return (dec.select(F.explode("doc_ids").alias("doc_id"))
            .distinct())


IDF_SCALE = 1_000_000


def rank_tokens(spark: SparkSession, index_path: str,
                tokens: list[str], n_docs: int, k: int = 10,
                backend=None) -> DataFrame:
    """Top-k ranked retrieval over the index: tf·idf with an INTEGER-
    quantized linear idf — ``weight = tf · (n_docs·IDF_SCALE div df)``,
    summed per document over the probe tokens.

    Integer quantization is deliberate: scores are order-independent
    exact BIGINT sums, so rankings reproduce bit-identically across
    engines and runs (a float ln-idf varies in the last ulp between
    libm implementations and between summation orders).  ``n_docs`` is
    the corpus size the caller indexed (idf needs it; the index table
    stores per-token df only).  Ties rank by doc_id ascending.

    Exactness envelope: a per-token weight is tf · (n_docs·10^6 div
    df), so the int64 sum stays exact while max_tf · (n_docs·10^6) <
    2^63 — comfortably true per shard (n_docs ≤ 10^9 allows tf up to
    ~9·10^3 even for df=1 singletons); at 10^12 docs rank per shard
    and merge, or lower IDF_SCALE.

    Scale shape: the probe explodes Σ df posting rows, one
    HashAggregate sums per-doc scores, and the final
    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — each
    task keeps a local top-k and the driver merges k·n_parts rows, so
    no task ever holds more than its own partition's candidates.
    Returns (rank, doc_id, score)."""
    if n_docs < 1:
        raise ValueError("n_docs must be the positive corpus size")
    if k < 1:
        raise ValueError("k must be >= 1")
    probes = sorted({t.lower() for t in tokens})
    if not probes:
        raise ValueError("tokens must name at least one probe token")
    from ..manifest import EncodedTable, scan_table
    if EncodedTable(index_path, backend=backend).schema() is None:
        return spark.createDataFrame(
            [], "rank int, doc_id bigint, score bigint")
    dec = scan_table(spark, index_path, [("token", "in", probes)],
                     columns=["token", "df", "doc_ids", "tfs"],
                     backend=backend)
    idf = F.expr(f"CAST({n_docs} AS BIGINT) * {IDF_SCALE} div df")
    hits = (dec.select(idf.alias("_idf"),
                       F.explode(F.arrays_zip("doc_ids", "tfs"))
                       .alias("_h"))
            .select(F.col("_h.doc_ids").alias("doc_id"),
                    (F.col("_h.tfs") * F.col("_idf")).alias("_w")))
    scored = (hits.groupBy("doc_id")
              .agg(F.sum("_w").alias("score"))
              .orderBy(F.desc("score"), F.asc("doc_id"))
              .limit(k))
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.select(F.row_number().over(w).alias("rank"),
                         "doc_id", "score")
