"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)       -> flagship encode->decode->verify on sf0.001 documents
queries()/oracle_sql() -> SQL-checkable facets of the engine's operators
(SURVEY.md §2) plus the training-data pipeline ops (dedup, similarity,
text analysis), each checked against DuckDB at sf0.01.

Cross-engine determinism rules used throughout:
  * hashing: md5 only (identical hex in Spark and DuckDB);
  * float aggregation: values are rounded then cast to DECIMAL before
    SUM so results are order-independent; the DECIMAL sum is then cast
    to DOUBLE on BOTH sides (Spark widens decimal sums to a different
    precision than DuckDB, so the decimal types would hash-differ);
  * integer SUMs: always CAST(SUM(x) AS BIGINT) in the DuckDB oracle —
    DuckDB returns HUGEINT (decimal128 in Arrow) for SUM(BIGINT), which
    hash-mismatches Spark's BIGINT even when values are equal;
  * ratios: computed from integer sums, divided once, rounded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

TESTDATA_SMOKE = "/root/testdata/sf0.001"

STOP_EN = ("the", "and", "of", "to", "in", "is", "that", "for")
STOP_DE = ("der", "die", "und", "das", "ist", "nicht", "ein", "zu")
STOP_FR = ("le", "la", "et", "les", "des", "est", "une", "dans")
STOP_ES = ("el", "los", "que", "de", "es", "una", "por", "con")
_LANGS = {"en": STOP_EN, "de": STOP_DE, "fr": STOP_FR, "es": STOP_ES}

SHINGLE_SPARK = ("transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)),"
                 " i -> array_join(slice(split(text, ' '), i, 3), ' '))")
SHINGLE_DUCK = ("list_transform(range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),"
                " i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------- flagship

def entry(spark: SparkSession) -> DataFrame:
    """Encode sf0.001 documents, decode, verify bit-identity, return the
    per-column codec/size lineage facet (O1/O2/O12-O16 end-to-end)."""
    from parquet_spark.engine import decode_table, encode_table, encoding_stats
    from parquet_spark.verify import verify_roundtrip

    df = _t(spark, TESTDATA_SMOKE, "documents")
    enc = encode_table(df, key=["doc_id"], n_parts=4).cache()
    dec = decode_table(enc)
    verify_roundtrip(df, dec, key=["doc_id"], digest_col="text")
    out = encoding_stats(enc).orderBy("column")
    return out


# ---------------------------------------------------------------- queries

def q_dict_gate(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")

    def one(col):
        return d.agg(
            F.lit(col).alias("col_name"),
            F.countDistinct(col).alias("n_distinct"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.countDistinct(col) / F.count(F.lit(1)), 6).alias("distinct_ratio"),
            (F.countDistinct(col) / F.count(F.lit(1)) <= 0.8).alias("dict_eligible"))
    return one("lang").unionByName(one("source")).orderBy("col_name")


def q_run_length_lang(spark, sf_dir):
    from pyspark.sql import Window
    d = _t(spark, sf_dir, "documents").withColumn(
        "chunk", F.floor(F.col("doc_id") / 1000))
    w = Window.partitionBy("chunk").orderBy("doc_id")
    runs = d.withColumn("prev", F.lag("lang").over(w)).withColumn(
        "is_start", F.when(~F.col("prev").eqNullSafe(F.col("lang")), 1).otherwise(0))
    return runs.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("is_start").alias("n_runs")).withColumn(
        "mean_run_len", F.round(F.col("n_rows") / F.col("n_runs"), 4)).orderBy("chunk")


def q_for_bitpack_width(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        F.floor(F.col("event_id") / 250).alias("chunk"),
        F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
        .alias("us"))  # tz-proof epoch-us on TIMESTAMP_NTZ (= DuckDB epoch_us)
    g = e.groupBy("chunk").agg(F.min("us").alias("min_us"),
                               F.max("us").alias("max_us"))
    width = F.when(F.col("max_us") == F.col("min_us"), F.lit(0)).otherwise(
        (F.floor(F.log2(F.col("max_us") - F.col("min_us"))) + 1))
    return g.withColumn("bit_width", width.cast("bigint")).orderBy("chunk")


def q_merge_union_nullfill(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.select("o_orderkey", "o_totalprice")
    b = o.select("o_orderkey", "o_orderpriority")
    u = a.unionByName(b, allowMissingColumns=True)
    return u.agg(F.count(F.lit(1)).alias("n_rows"),
                 F.count("o_totalprice").alias("n_price"),
                 F.count("o_orderpriority").alias("n_priority"))


def q_explode_pad(spark, sf_dir):
    em = _t(spark, sf_dir, "embeddings")
    ex = em.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
    return ex.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("pos").alias("sum_pos"),
        # FLOOR of the identical IEEE product is bit-portable across
        # Spark/DuckDB; ROUND(double,3)->DECIMAL is not (representation
        # ties — see tests/test_oracle_portability.py)
        F.sum(F.floor(F.col("val").cast("double") * 1000)
              .cast("long")).cast("long").alias("sum_val"))


def q_scalar_broadcast(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy(F.col("r_name").alias("region_name"))
            .agg(F.count(F.lit(1)).alias("n_nations"))
            .orderBy("region_name"))


def q_chunk_partition_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (d.groupBy(F.pmod(F.col("doc_id"), F.lit(8)).alias("part_id"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.sum("n_chars").alias("sum_chars"))
            .orderBy("part_id"))


def q_global_dict_lang(spark, sf_dir):
    from parquet_spark.dictionary import apply_global_dict, build_global_dict
    d = _t(spark, sf_dir, "documents")
    gd = build_global_dict(d, "lang")
    enc = apply_global_dict(d.select("doc_id", "lang"), "lang", gd)
    return (enc.where(F.col("lang_id").isNotNull())
            .groupBy("lang_id").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("lang_id"))


def q_salted_counts_source(spark, sf_dir):
    from parquet_spark.dictionary import salted_key_counts
    d = _t(spark, sf_dir, "documents")
    return salted_key_counts(d.select("doc_id", "source"), "source") \
        .orderBy("source")


def q_exact_dedup(spark, sf_dir):
    from parquet_spark.textops.dedup import exact_dedup
    g = exact_dedup(_t(spark, sf_dir, "documents"))
    return g.agg(F.count(F.lit(1)).alias("n_groups"),
                 F.sum("n_dups").alias("n_docs"),
                 F.sum(F.when(F.col("n_dups") > 1, 1).otherwise(0))
                 .alias("n_dup_groups"))


def q_minhash_signatures(spark, sf_dir):
    from parquet_spark.textops.dedup import minhash_signatures
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 32)
    # md5 mode: DuckDB reproduces the exact hex signatures (the engine
    # default is xxhash64 int64 — HashAggregate + 8-byte wire keys)
    return minhash_signatures(d, n_hashes=4, hash_fn="md5").orderBy("doc_id")


def q_lsh_pairs(spark, sf_dir):
    """Returns the actual candidate (doc_a, doc_b) pairs — the full
    output of the band-bucket self-join, not just a count."""
    from parquet_spark.textops.dedup import (lsh_candidate_pairs,
                                             minhash_signatures)
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    sig = minhash_signatures(d, n_hashes=4, hash_fn="md5")
    pairs = lsh_candidate_pairs(sig, n_hashes=4, band_size=2)
    return pairs.orderBy("doc_a", "doc_b")


def q_dedup_components(spark, sf_dir):
    """The dedup endgame oracled: LSH candidate pairs clustered into
    connected components (comp = min doc id — the canonical keeper).
    Spark runs min-label propagation to convergence; DuckDB computes
    the same labeling with a recursive reachability CTE — two utterly
    different algorithms agreeing on every (node, comp) row."""
    from parquet_spark.textops.dedup import (connected_components,
                                             lsh_candidate_pairs,
                                             minhash_signatures)
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    pairs = lsh_candidate_pairs(
        minhash_signatures(d, n_hashes=4, hash_fn="md5"),
        n_hashes=4, band_size=2)
    return (connected_components(pairs)
            .select(F.col("node").alias("doc_id"), "comp")
            .orderBy("doc_id"))


def q_ngram_jaccard(spark, sf_dir):
    from parquet_spark.textops.dedup import (lsh_candidate_pairs,
                                             minhash_signatures, ngram_jaccard)
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    pairs = lsh_candidate_pairs(minhash_signatures(d, n_hashes=4,
                                                   hash_fn="md5"),
                                n_hashes=4, band_size=2)
    j = ngram_jaccard(d, pairs)
    return j.agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(F.col("jaccard").cast("decimal(10,4)"))
                 .cast("double").alias("sum_jaccard"),
                 F.sum(F.when(F.col("jaccard") >= 0.8, 1).otherwise(0))
                 .alias("n_near_dups"))


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (brute-force correctness
    baseline of the LSH-bucketed scale path): cos rounded to 4dp before
    the threshold so both engines make identical keep decisions.

    Threshold 0.32 is calibrated to the synthetic embeddings (max
    pairwise cos ~0.40 at every sf) so ~30 pairs actually flow through
    the dot/norm/round/threshold path — a 0.9 threshold would certify
    only the empty set."""
    from parquet_spark.textops.dedup import embedding_near_dups
    em = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 120) \
        .withColumn("embedding",
                    F.expr("transform(embedding, x -> cast(x as double))"))
    return embedding_near_dups(em, threshold=0.32).orderBy("id_a", "id_b")


def q_embedding_near_dups_lsh(spark, sf_dir):
    """The SCALE path for embedding near-dups: sign-LSH bucketing turns
    the all-pairs problem into bucket-local self-joins (O(sum b_i^2)).
    DuckDB recomputes the buckets from the same deterministic
    hyperplanes and the same 4dp cosine threshold, certifying both the
    bucketing and the in-bucket cosine math."""
    from parquet_spark.textops.dedup import embedding_near_dups_lsh
    from parquet_spark.textops.similarity import hyperplanes
    em = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 120) \
        .withColumn("embedding",
                    F.expr("transform(embedding, x -> cast(x as double))"))
    planes = hyperplanes(64, n_planes=4, seed=42)
    return embedding_near_dups_lsh(em, planes, threshold=0.32) \
        .orderBy("id_a", "id_b")


def q_simhash(spark, sf_dir):
    from parquet_spark.textops.dedup import simhash
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 64)
    return simhash(d, n_bits=16).orderBy("doc_id")


def q_cosine_topk(spark, sf_dir):
    from parquet_spark.textops.similarity import cosine_topk
    em = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))"))
    queries = em.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding")
    corpus = em.where(F.col("vec_id") >= 3)
    return cosine_topk(corpus, queries, k=3).orderBy("q_id", "rank")


def q_ann_buckets(spark, sf_dir):
    from parquet_spark.textops.similarity import hyperplanes, lsh_bucket
    em = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))"))
    planes = hyperplanes(64, n_planes=4, seed=42)
    return (lsh_bucket(em, planes).groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_vecs")).orderBy("bucket"))


def q_ivf_clusters(spark, sf_dir):
    """IVF coarse quantizer, oracle-checkable: seeds are the 8 vectors
    with the smallest md5(vec_id) (SQL-expressible, unlike xxhash
    seeding), assignment is argmin of 6dp-rounded L2 distance with
    cluster-id tie-break — DuckDB reproduces the exact partition."""
    from parquet_spark.textops.similarity import ivf_assign, ivf_seeds_md5
    em = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))"))
    cents = ivf_seeds_md5(em, n_clusters=8)
    return (ivf_assign(em, cents, round_dp=6).groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n_vecs")).orderBy("cluster"))


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) oracled END-TO-END: md5-seeded
    clusters → intra-cluster 4dp-cosine pairs at τ=0.30 →
    recursive-CC min-id keepers (textops/dedup.py `semdedup`).
    DuckDB recomputes the whole pipeline — seed ranking, 6dp-rounded
    argmin assignment, pair cosines, reachability closure — and both
    engines keep the identical 254-of-500 sf0.01 vector set."""
    from parquet_spark.textops.dedup import semdedup
    em = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))"))
    return (semdedup(em, n_clusters=8, threshold=0.30)
            .select("vec_id", F.col("cluster").cast("int").alias("cluster"))
            .orderBy("vec_id"))


def q_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training (textops/bpe.py `train_bpe`,
    Sennrich et al. 2016) oracled END-TO-END: 3 merge rounds over the
    doc_id<80 lowercase-alpha word vocabulary.  DuckDB replays the
    whole learner — word counts, weighted adjacent-pair counts, argmax
    with the (cnt DESC, pair ASC) tie-break, and each greedy
    left-to-right merge fold as a recursive CTE — and both engines
    learn the identical ranked merge table.  The '^[a-z]+$' word
    filter keeps the comparison off astral-plane text, where Spark
    (UTF-16 units) and DuckDB (codepoints) split chars differently."""
    from parquet_spark.textops.bpe import train_bpe
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 80)
    merges = train_bpe(d, n_merges=3, lowercase=True,
                       word_filter="^[a-z]+$")
    return spark.createDataFrame(
        [(m["rank"], m["left"], m["right"], m["cnt"]) for m in merges],
        "rank int, left string, right string, cnt bigint").orderBy("rank")


def q_dsir_select(spark, sf_dir):
    """DSIR data selection (sampling.dsir_select, Xie et al. 2023)
    oracled end-to-end: hashed uni+bigram bucket counts (md5 % 256),
    integer milli-nat λ table with add-one smoothing, exact BIGINT
    per-doc scores, top-20 most-en-like non-en documents.  DuckDB
    replays the full estimator; the only non-IEEE-exact op (one ln
    per bucket) is scaled and rounded to an integer before any
    summation — the gap_fill portability rule."""
    from parquet_spark.textops.sampling import dsir_select
    d = _t(spark, sf_dir, "documents")
    return (dsir_select(d, F.col("lang") == "en", k=20)
            .select("doc_id", "dsir_score"))


def q_ivf_topk(spark, sf_dir):
    """IVF approximate top-k search (the inverted-file read path):
    md5-seeded centroids, 6dp-rounded assignment with cluster-id
    tie-break, queries probe their nprobe=2 nearest lists.  DuckDB
    reproduces the seeds, both assignments, the probe fan-out, and the
    in-list cosine ranking — certifying the whole ANN search, not just
    the coarse quantizer."""
    from parquet_spark.textops.similarity import ivf_seeds_md5, ivf_topk
    em = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))"))
    cents = ivf_seeds_md5(em, n_clusters=8)
    corpus = em.where(F.col("vec_id") >= 4)
    queries = em.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), "embedding")
    return ivf_topk(corpus, queries, cents, k=3, nprobe=2,
                    round_dp=6).orderBy("q_id", "rank")


def q_ivf_recall(spark, sf_dir):
    """Recall@k of the IVF search vs the exact scan (the ANN-tuning
    metric): same md5-seeded centroids, 6dp-rounded assignment, and
    probe fan-out as the ivf_topk facet; DuckDB recomputes BOTH
    rankings and the per-query intersection — certifying not just that
    each search runs, but that the quality measurement itself is
    reproducible outside Spark."""
    from parquet_spark.textops.similarity import ivf_recall, ivf_seeds_md5
    em = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))"))
    cents = ivf_seeds_md5(em, n_clusters=8)
    corpus = em.where(F.col("vec_id") >= 4)
    queries = em.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), "embedding")
    return ivf_recall(corpus, queries, cents, k=3, nprobe=2,
                      round_dp=6).orderBy("q_id")


def q_pq_topk(spark, sf_dir):
    """IVF-PQ-style compressed search oracled end-to-end: md5-seeded
    product-quantization codebooks (4 subspaces x 8 centroids over the
    64-dim embeddings), 6dp-rounded per-subspace code assignment,
    asymmetric-distance candidate generation (k*rerank=6 per query),
    and the exact-cosine residual re-rank.  DuckDB rebuilds the
    codebooks from the raw vectors, re-derives every code, the ordered
    ADC fold, and both rankings — certifying the full compressed-search
    pipeline, not just the quantizer."""
    from parquet_spark.textops.similarity import pq_codebooks_md5, pq_topk
    em = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))"))
    cbs = pq_codebooks_md5(em, m=4, k=8)
    corpus = em.where(F.col("vec_id") >= 4)
    queries = em.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), "embedding")
    return pq_topk(corpus, queries, cbs, k=3, rerank=2,
                   round_dp=6).orderBy("q_id", "rank")


def q_pq_recall(spark, sf_dir):
    """Recall@k of the PQ compressed search vs the exact scan via the
    composable topk_recall metric — DuckDB recomputes the codebooks,
    codes, ADC candidates, re-rank, the exact ranking, AND the
    per-query intersection."""
    from parquet_spark.textops.similarity import (cosine_topk,
                                                  pq_codebooks_md5,
                                                  pq_topk, topk_recall)
    em = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))"))
    cbs = pq_codebooks_md5(em, m=4, k=8)
    corpus = em.where(F.col("vec_id") >= 4)
    queries = em.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("q_id"), "embedding")
    exact = cosine_topk(corpus, queries, k=3)
    approx = pq_topk(corpus, queries, cbs, k=3, rerank=2, round_dp=6)
    return topk_recall(exact, approx, 3).orderBy("q_id")


def q_streaming_window_stats(spark, sf_dir):
    """Watermarked event-time windowed aggregation as a STREAM over a
    multi-file copy of the derived corpus (>=2 micro-batches, one file
    per trigger): per (hour-window, lang) doc counts and text bytes,
    emitted in complete mode so every window is visible.  DuckDB
    recomputes the same windows with date_trunc — the streaming window
    assignment, watermark plumbing, and incremental aggregation must
    converge to the batch answer."""
    import tempfile
    import uuid

    from parquet_spark.streaming import file_stream, windowed_ingest_stats
    src = tempfile.mkdtemp(prefix="swin_src_")
    # tz-proofing: event time travels as epoch-us BIGINT and becomes an
    # LTZ timestamp via timestamp_micros (watermarks require LTZ; the
    # construction and the unix_micros readback below are both
    # session-timezone-free)
    (_derived_corpus(spark, sf_dir)
     .select("url", F.expr(_EPOCH_US.format(col="warc_ts")).alias("ts_us"),
             "text", "lang")
     .repartition(3).write.mode("overwrite").parquet(src))
    stream = file_stream(
        spark, src,
        "url string, ts_us bigint, text string, lang string") \
        .withColumn("warc_ts", F.timestamp_micros(F.col("ts_us")))
    name = "swin_" + uuid.uuid4().hex[:8]
    q = (windowed_ingest_stats(stream, ts_col="warc_ts", window="1 hour",
                               watermark="2 hours").writeStream
         .format("memory").queryName(name).outputMode("complete")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="swinck_"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress
                     if p["numInputRows"] and p["numInputRows"] > 0])
    assert n_batches >= 2, f"stream ran in {n_batches} micro-batch(es)"
    return spark.sql(
        f"SELECT unix_micros(window_start) AS window_us, lang, n_docs, "
        f"text_bytes FROM {name} ORDER BY window_us, lang")


def q_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " "))).alias("ws_tokens"),
        F.sum(F.size(F.regexp_extract_all(
            F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0))))
        .alias("re_tokens"))


def q_quality_by_source(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*STOP_EN)))
    punct = F.length(F.regexp_replace(F.col("text"), "[a-z0-9 ]", ""))
    per = d.select("source",
                   F.size(words).alias("n_words"),
                   stop_hits.alias("stop_hits"),
                   punct.alias("n_punct"),
                   F.length("text").alias("n_chars"))
    return (per.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").alias("sum_words"),
                 F.sum("stop_hits").alias("sum_stop_hits"),
                 F.sum("n_punct").alias("sum_punct"),
                 F.sum("n_chars").alias("sum_chars"))
            .withColumn("stopword_ratio",
                        F.round(F.col("sum_stop_hits") / F.col("sum_words"), 6))
            .orderBy("source"))


def q_quality_filter(spark, sf_dir):
    """C4-style prose gate over documents: per-rule rejection counts +
    kept-set aggregates, all recomputed by DuckDB under the identical
    thresholds (ratios rounded to 4dp before comparison on both
    engines so the keep decisions are bit-identical)."""
    from parquet_spark.textops.textstats import quality_filter
    d = quality_filter(_t(spark, sf_dir, "documents"))
    as_int = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0))  # noqa: E731
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        as_int("ok_words").alias("n_ok_words"),
        as_int("ok_punct").alias("n_ok_punct"),
        as_int("ok_stopwords").alias("n_ok_stopwords"),
        as_int("ok_word_len").alias("n_ok_word_len"),
        as_int("keep").alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_words"))
              .otherwise(0)).alias("kept_words"))


def q_top_vocabulary(spark, sf_dir):
    """Corpus top-k vocabulary with a deterministic (count desc, word
    asc) tie-break — DuckDB recomputes the exact ranked list."""
    from parquet_spark.textops.textstats import top_vocabulary
    return top_vocabulary(_t(spark, sf_dir, "documents"), k=50) \
        .orderBy("rank")


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals (duplicate-line fraction, top-
    word fraction, duplicate-word fraction) — DuckDB recomputes all
    three from the same split/distinct/count algebra, 4dp-rounded
    before aggregation so the sums are bit-identical."""
    from parquet_spark.textops.textstats import repetition_stats
    d = repetition_stats(_t(spark, sf_dir, "documents")
                         .where(F.col("doc_id") < 500))
    dec = lambda c: F.sum(F.col(c).cast("decimal(12,4)")) \
        .cast("double").alias("sum_" + c)  # noqa: E731
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        dec("dup_line_frac"), dec("top_word_frac"), dec("dup_word_frac"),
        F.sum(F.when(F.col("top_word_frac") > 0.1, 1).otherwise(0))
        .alias("n_degenerate"))


def q_frame_sample(spark, sf_dir):
    """Video-blob frame-sampling plumbing (fixed-size frames, every
    k-th kept): deterministic text-derived blobs make every frame
    boundary and byte count closed-form, so DuckDB recomputes the
    sampled frame set exactly — certifying the fan-out arithmetic of
    the mapInPandas sampler."""
    from parquet_spark.textops.multimodal import sample_frames
    d = (_t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
         .select("doc_id", F.encode("text", "utf-8").alias("blob")))
    fr = sample_frames(d, "doc_id", "blob", frame_bytes=64, every_k=3)
    return fr.agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("media_id").alias("n_media"),
        F.sum(F.octet_length("frame")).alias("frame_bytes"),
        F.sum("frame_idx").alias("sum_idx"))


def q_lang_id(spark, sf_dir):
    from pyspark.sql import Window
    d = _t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    scored = None
    for lang, sw in _LANGS.items():
        hits = F.size(F.filter(words, lambda w: w.isin(*sw)))
        one = d.select("doc_id", F.lit(lang).alias("cand"),
                       hits.alias("hits"))
        scored = one if scored is None else scored.unionByName(one)
    w = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(),
                                             F.col("cand").desc())
    best = (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1))
    return (best.groupBy(F.col("cand").alias("lang_guess"))
            .agg(F.count(F.lit(1)).alias("n_docs")).orderBy("lang_guess"))


def q_rolling_fp(spark, sf_dir):
    from parquet_spark.textops.textstats import rolling_fingerprint
    d = rolling_fingerprint(_t(spark, sf_dir, "documents"))
    return d.agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("rolling_fp").alias("n_distinct"),
                 F.sum("rolling_fp").alias("sum_fp"))


def q_fingerprint(spark, sf_dir):
    from parquet_spark.textops.textstats import fingerprint
    d = fingerprint(_t(spark, sf_dir, "documents"))
    return d.agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("fp").alias("n_fingerprints"))


def q_media_metadata(spark, sf_dir):
    from parquet_spark.textops.multimodal import media_metadata
    d = _t(spark, sf_dir, "documents").withColumn(
        "blob", F.col("text").cast("binary"))
    m = media_metadata(d, "doc_id", "blob")
    return m.agg(F.count(F.lit(1)).alias("n_media"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.countDistinct("sha256").alias("n_unique"))


# ------------------------------------- engine facets with DuckDB oracles
#
# The encode->decode path itself gets SQL oracles by decoding back into
# aggregates DuckDB can recompute from the raw parquet: if any byte of
# any column were lost or altered, the digests/sums below would differ.

_EPOCH_US = ("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
             "{col})")

# Common-Crawl-style corpus derived deterministically from `documents`
# (north-rule input shape: url, warc_ts, html, text, lang) — expressible
# identically in Spark and DuckDB so the oracle can reproduce it.
_CORPUS_SQL = """
    SELECT 'https://host' || CAST(doc_id % 50 AS VARCHAR) || '.example.com/'
               || md5(CAST(doc_id AS VARCHAR)) AS url,
           TIMESTAMP '2013-07-01 00:00:00' + to_seconds(doc_id % 86400) AS warc_ts,
           encode('<html>' || text || '</html>') AS html,
           text, lang, doc_id, n_chars
    FROM documents"""

# PQ pipeline CTEs shared by the pq_topk and pq_recall oracles: rebuild
# the md5-seeded codebooks (4 subspaces x 8 centroids over 64 dims),
# every 6dp-rounded code, the ordered ADC fold, the candidate window
# (crank <= k*rerank = 6), and the exact-cosine re-rank `r`.
_PQ_CORE_SQL = """
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    seeds AS (SELECT v AS sv,
                     ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                        vec_id) - 1 AS cid
              FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
              LIMIT 8),
    cd AS (SELECT e.vec_id, j.j, s.cid,
                  ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                      list_transform(range(1, 17),
                          i -> (e.v[j.j * 16 + i] - s.sv[j.j * 16 + i])
                             * (e.v[j.j * 16 + i] - s.sv[j.j * 16 + i]))),
                      (a, b) -> a + b), 6) AS dist
           FROM e CROSS JOIN range(0, 4) j(j) CROSS JOIN seeds s
           WHERE e.vec_id >= 4),
    codes AS (SELECT vec_id, j, cid FROM (
                SELECT vec_id, j, cid,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, j
                                          ORDER BY dist, cid) AS rn
                FROM cd) WHERE rn = 1),
    term AS (SELECT q.vec_id AS q_id, c.vec_id, c.j,
                    list_reduce(list_prepend(CAST(0 AS DOUBLE),
                        list_transform(range(1, 17),
                            i -> (q.v[c.j * 16 + i] - s.sv[c.j * 16 + i])
                               * (q.v[c.j * 16 + i] - s.sv[c.j * 16 + i]))),
                        (a, b) -> a + b) AS t
             FROM codes c JOIN seeds s ON s.cid = c.cid
             CROSS JOIN e q WHERE q.vec_id < 4),
    adc AS (SELECT q_id, vec_id,
                   ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                       list(t ORDER BY j)), (a, b) -> a + b), 6) AS adc
            FROM term GROUP BY q_id, vec_id),
    cand AS (SELECT q_id, vec_id FROM (
               SELECT q_id, vec_id,
                      ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY adc, vec_id) AS crank
               FROM adc) WHERE crank <= 6),
    s2 AS (SELECT cand.q_id, cand.vec_id,
                  ROUND(list_dot_product(qe.v, ce.v) /
                        (sqrt(list_dot_product(qe.v, qe.v)) *
                         sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos
           FROM cand JOIN e qe ON qe.vec_id = cand.q_id
                     JOIN e ce ON ce.vec_id = cand.vec_id),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                       ORDER BY cos DESC,
                                                vec_id ASC) AS rank
          FROM s2)"""


def _derived_corpus(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        F.concat(F.lit("https://host"), F.pmod("doc_id", F.lit(50)).cast("string"),
                 F.lit(".example.com/"),
                 F.md5(F.col("doc_id").cast("string"))).alias("url"),
        F.expr("timestampadd(SECOND, cast(doc_id % 86400 as int), "
               "TIMESTAMP_NTZ'2013-07-01 00:00:00')").alias("warc_ts"),
        F.encode(F.concat(F.lit("<html>"), F.col("text"), F.lit("</html>")),
                 "utf-8").alias("html"),
        "text", "lang", "doc_id", "n_chars")


def q_schema_evolution(spark, sf_dir):
    """O6/O7/O8/O10: union frames with a type collision; return the final
    physical schema + Mappings entries.  Oracle: golden VALUES rows (the
    reference pins schema/Mappings with inline goldens the same way,
    Parquet.Tests/FragmentTests.cs:254-313)."""
    from parquet_spark.merge import merge_tables
    o = _t(spark, sf_dir, "orders")
    a = o.select("o_orderkey", F.col("o_totalprice").alias("price"))
    b = o.select("o_orderkey", F.col("o_orderpriority").alias("price"),
                 F.lit("frag2").alias("origin"))  # price: double vs string
    merged, mappings = merge_tables([a, b], order_key=["o_orderkey"])
    rows = [(f.name, f.dataType.simpleString(),
             mappings.get(f.name, "")) for f in merged.schema.fields]
    return spark.createDataFrame(
        sorted(rows), "column string, type string, logical_name string")


def q_splits_lineage(spark, sf_dir):
    """Scan-stage encode -> commit -> cold re-open -> decode (O1/O11/O19,
    splits mode).  The returned aggregates are recomputed by DuckDB over
    the raw parquet: equality proves the splits-written table decodes to
    exactly the input."""
    import tempfile

    from parquet_spark.manifest import read_decoded
    from parquet_spark.splits import write_encoded_splits
    path = tempfile.mkdtemp(prefix="entry_splits_")
    snap = write_encoded_splits(spark, f"{sf_dir}/documents.parquet", path)
    for p in snap["parts"].values():
        assert p["n_chunks"] >= 1 and p["bytes_out"] > 0, p  # lineage sanity
    dec = read_decoded(spark, path)
    return dec.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct(F.md5("text")).alias("n_texts"),
        F.countDistinct("lang").alias("n_langs"))


def q_zone_prune(spark, sf_dir):
    """String zone maps (O16 scan-side predicate pushdown): encode the
    derived web corpus range-keyed by url, prune a url range, decode only
    surviving chunks, apply the residual filter.  Oracle: the same
    aggregates over the same predicate computed by DuckDB on raw data —
    equality proves pruning dropped no matching rows."""
    from parquet_spark.engine import decode_table, encode_table, prune_chunks
    df = _derived_corpus(spark, sf_dir).select("url", "doc_id", "text")
    enc = encode_table(df, key=["url"], n_parts=4, rows_per_chunk=50).cache()
    lo, hi = "https://host1", "https://host3"
    pruned = prune_chunks(enc, lo, hi, column="url")
    n_all, n_kept = enc.count(), pruned.count()
    assert 0 < n_kept < n_all, (n_kept, n_all)  # pruning actually bites
    out = (decode_table(pruned)
           .where((F.col("url") >= lo) & (F.col("url") <= hi))
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(F.md5("url")).alias("n_urls"),
                F.sum("doc_id").alias("sum_ids"),
                F.countDistinct(F.md5("text")).alias("n_texts")))
    out = out.cache()
    out.count()
    enc.unpersist()
    return out


def q_zone_prune_ts(spark, sf_dir):
    """Numeric zone maps: encode events ts-keyed, prune an epoch-us range
    derived from the data bounds (same arithmetic in the oracle), decode
    survivors, residual-filter, aggregate."""
    from parquet_spark.engine import decode_table, encode_table, prune_chunks
    ev = _t(spark, sf_dir, "events")
    enc = encode_table(ev, key=["ts"], n_parts=4, rows_per_chunk=500).cache()
    b = enc.agg(F.min("key_min_num"), F.max("key_max_num")).head()
    lo = b[0] + int((b[1] - b[0]) * 0.4)
    hi = b[0] + int((b[1] - b[0]) * 0.6)
    pruned = prune_chunks(enc, lo, hi, column="ts")
    n_all, n_kept = enc.count(), pruned.count()
    assert 0 < n_kept < n_all, (n_kept, n_all)
    us = F.expr(_EPOCH_US.format(col="ts"))
    out = (decode_table(pruned).where(us.between(lo, hi))
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum("event_id").alias("sum_ids"),
                F.countDistinct("user_id").alias("n_users"),
                F.min(us).alias("min_us"), F.max(us).alias("max_us")))
    out = out.cache()
    out.count()
    enc.unpersist()
    return out


def q_zone_prune_multi(spark, sf_dir):
    """Composite-predicate pruning (multi-column zone maps): a url-range
    AND doc_id-range predicate must prune at least as hard as either
    single bound, and the pruned decode must equal the full filter —
    verified by DuckDB recomputing the aggregates under the same
    two-column predicate."""
    from parquet_spark.engine import (decode_table, encode_table,
                                      prune_chunks_pred)
    df = _derived_corpus(spark, sf_dir).select("url", "doc_id", "text")
    enc = encode_table(df, key=["url"], n_parts=4, rows_per_chunk=50).cache()
    lo, hi = "https://host1", "https://host3"
    id_lo, id_hi = 100, 400
    n_all = enc.count()
    n_url = prune_chunks_pred(enc, [("url", lo, hi)]).count()
    n_id = prune_chunks_pred(enc, [("doc_id", id_lo, id_hi)]).count()
    both = prune_chunks_pred(enc, [("url", lo, hi), ("doc_id", id_lo, id_hi)])
    assert 0 < both.count() <= min(n_url, n_id) < n_all, \
        (both.count(), n_url, n_id, n_all)
    out = (decode_table(both)
           .where((F.col("url") >= lo) & (F.col("url") <= hi)
                  & F.col("doc_id").between(id_lo, id_hi))
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(F.md5("url")).alias("n_urls"),
                F.sum("doc_id").alias("sum_ids"),
                F.countDistinct(F.md5("text")).alias("n_texts")))
    out = out.cache()
    out.count()
    enc.unpersist()
    return out


def q_global_dict_roundtrip(spark, sf_dir):
    """Global dictionary wired through the ENCODED FORMAT (O12 at table
    scope): write documents with lang as global-dict int ids, prove the
    stored schema really is int, decode back (ids -> strings restored
    from the snapshot-persisted dictionary), and return per-id counts —
    DuckDB recomputes the dense-rank dictionary and the same counts
    from raw data, so id assignment, persistence, and restoration are
    all certified."""
    import tempfile

    import pyarrow as pa

    from parquet_spark.manifest import (EncodedTable, read_decoded,
                                        write_encoded)
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    path = tempfile.mkdtemp(prefix="entry_gdict_")
    write_encoded(d, path, key=["doc_id"], n_parts=4,
                  global_dict_cols=["lang"])
    t = EncodedTable(path)
    assert pa.types.is_integer(t.schema().field("lang").type), \
        "lang must be STORED as global-dict int ids"
    vals = t.meta()["global_dicts"]["lang"]
    dec = read_decoded(spark, path)
    assert dec.exceptAll(d).count() == 0 and dec.count() == d.count()
    mapping = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "lang_id int, lang string")
    return (dec.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
            .join(mapping, "lang").select("lang_id", "lang", "n")
            .orderBy("lang_id"))


def q_in_prune(spark, sf_dir):
    """IN-list predicate pushdown (O16 breadth): a sparse doc_id
    IN-list over a doc_id-keyed table must prune per VALUE (each id
    keeps at most one chunk per part — a min/max span of the list would
    keep every chunk between the ids), and the pruned scan + residual
    must return exactly the rows DuckDB finds with WHERE doc_id IN."""
    from parquet_spark.engine import (encode_table, prune_chunks_pred,
                                      scan_filtered)
    d = _t(spark, sf_dir, "documents")
    enc = encode_table(d, key=["doc_id"], n_parts=4,
                       rows_per_chunk=125).cache()
    ids = [3, 250, 444]
    n_all = enc.count()
    n_kept = prune_chunks_pred(enc, [("doc_id", "in", ids)]).count()
    assert 0 < n_kept < n_all, (n_kept, n_all)  # pruning actually bites
    out = (scan_filtered(enc, [("doc_id", "in", ids)])
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum("doc_id").alias("sum_ids"),
                F.sum("n_chars").alias("sum_chars"),
                F.countDistinct(F.md5("text")).alias("n_texts")))
    out = out.cache()
    out.count()
    enc.unpersist()
    return out


def q_dict_pruned_scan(spark, sf_dir):
    """Value-space predicates pushed THROUGH the global dictionary
    (O12 x O16): lang is STORED as dict int ids, so scan_table must
    translate the value IN-list to the id set for zone pruning (ids
    are not value-contiguous in general — the set, never a span) and
    run the exact residual on the restored strings.  The table is
    keyed on lang so id zone maps actually bite (asserted); DuckDB
    recomputes the same per-lang aggregate from raw values."""
    import tempfile

    from parquet_spark.engine import prune_chunks_pred
    from parquet_spark.manifest import (EncodedTable, read_encoded,
                                        scan_table, write_encoded)
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = tempfile.mkdtemp(prefix="entry_dscan_")
    write_encoded(d, path, key=["lang", "doc_id"], n_parts=2,
                  rows_per_chunk=64, global_dict_cols=["lang"])
    want = ["de", "fr"]
    vals = EncodedTable(path).meta()["global_dicts"]["lang"]
    ids = [i for i, v in enumerate(vals) if v in want]
    enc = read_encoded(spark, path).cache()
    n_all = enc.count()
    n_kept = prune_chunks_pred(enc, [("lang", "in", ids)]).count()
    assert 0 < n_kept < n_all, (n_kept, n_all)  # id-space pruning bites
    enc.unpersist()
    return (scan_table(spark, path, [("lang", "in", want)])
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("doc_id").alias("sum_ids"),
                 F.sum("n_chars").alias("sum_chars"))
            .orderBy("lang"))


def q_auto_tuned_write(spark, sf_dir):
    """Stats-driven auto-tuned write (write_encoded(auto_tune=True)
    consuming stats.suggest_write_options): one bounded analyze_df
    sampling pass picks the layout key (highest-ndv int column ->
    doc_id) and the global-dict columns (strings clearing the ndv
    gate -> lang, source) with no caller hints.  The facet asserts the
    suggestions reached the FORMAT (dict ids stored as ints, doc_id
    key), then answers a value-space dict-pruned scan whose aggregate
    DuckDB recomputes from raw data — proof the tuned table both
    round-trips and prunes."""
    import tempfile

    import pyarrow as pa

    from parquet_spark.manifest import (EncodedTable, scan_table,
                                        write_encoded)
    d = _t(spark, sf_dir, "documents") \
        .select("doc_id", "lang", "source", "n_chars")
    path = tempfile.mkdtemp(prefix="entry_autotune_")
    write_encoded(d, path, n_parts=4, auto_tune=True)
    t = EncodedTable(path)
    lay = t.meta()["layout"]
    assert lay["key"] == ["doc_id"], lay
    assert "lang" in (lay.get("global_dict_cols") or []), lay
    assert pa.types.is_integer(t.schema().field("lang").type)
    out = (scan_table(spark, path, [("lang", "in", ["de", "en"]),
                                    ("doc_id", None, 3999)])
           .groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum("doc_id").alias("sum_ids"),
                F.sum("n_chars").alias("sum_chars"))
           .orderBy("lang"))
    out = out.cache()
    out.count()
    return out


def q_alter_widen(spark, sf_dir):
    """Metadata-only type widening (alter_table `widen`, Iceberg's
    int->long / float->double promotion matrix): a column written as
    int32 widens to int64 without touching a data file, an append then
    stores values only the wide type can hold (2^35+), and a pushed
    scan over the mixed-width table decodes each chunk at its OWN
    encoded width (width-sensitive codecs like BSS would corrupt
    otherwise) before the exact upcast.  DuckDB rebuilds the same
    two-generation union from raw data.  Reference analog: the C#
    library rewrites the whole file on ANY schema change
    (ParquetFile.cs:120-124)."""
    import tempfile

    import pyarrow as pa

    from parquet_spark.manifest import (EncodedTable, alter_table,
                                        scan_table, write_encoded)
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    gen1 = d.withColumn("v", F.col("n_chars").cast("int"))
    path = tempfile.mkdtemp(prefix="entry_widen_")
    write_encoded(gen1, path, key=["doc_id"], n_parts=2,
                  rows_per_chunk=256)
    t = EncodedTable(path)
    assert t.schema().field("v").type == pa.int32()
    alter_table(path, widen={"v": "int64"})
    assert EncodedTable(path).schema().field("v").type == pa.int64()
    big = 2 ** 35
    gen2 = (d.withColumn("doc_id", F.col("doc_id") + 100_000)
            .withColumn("v", (F.col("n_chars") + F.lit(big))
                        .cast("bigint")))
    write_encoded(gen2, path, key=["doc_id"], n_parts=2,
                  rows_per_chunk=256, part_offset=2)
    out = (scan_table(spark, path, [("v", 100, None)])
           .groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum("v").alias("sum_v"),
                F.sum("doc_id").alias("sum_ids"))
           .orderBy("lang"))
    out = out.cache()
    out.count()
    return out


def q_datasource_read(spark, sf_dir):
    """Catalyst-visible read surface (datasource.py): the encoded table
    is read back through `spark.read.format("parquet_spark")` — the
    Python DataSource V2 API — with a `columns` projection option, a
    Catalyst-pushed filter driving driver-side FILE pruning (asserted
    to bite: the filtered scan plans fewer input partitions than the
    full scan), worker-side chunk zone pruning, and executor-side
    global-dict restore.  DuckDB recomputes the aggregate from the raw
    parquet — certifying the whole SQL-visible read path end to end.
    This closes the read-side gap the reference left open
    (/root/reference/README.md:29-30 'Reading Parquet files ... is yet
    to be implemented'; its only reader is the test-scoped
    Parquet.Tests/Reader.cs:6-66)."""
    import tempfile

    from parquet_spark.datasource import register
    from parquet_spark.manifest import write_encoded
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_dsv2_")
    write_encoded(d, path, key=["doc_id"], n_parts=4, mode="range",
                  global_dict_cols=["lang"])
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled",
                         "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        register(spark)
        reader = (spark.read.format("parquet_spark")
                  .option("columns", "doc_id,lang,n_chars"))
        full = reader.load(path)
        filt = reader.load(path).where(F.col("doc_id") <= 149)
        # Catalyst -> pushFilters -> partitions(): file-level pruning
        # must actually bite on the range layout
        n_full = full.rdd.getNumPartitions()
        n_filt = filt.rdd.getNumPartitions()
        assert 0 < n_filt < n_full, (n_filt, n_full)
        out = (filt.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("doc_id").alias("sum_ids"),
                    F.sum("n_chars").alias("sum_chars"))
               .orderBy("lang"))
        out = out.cache()
        out.count()
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", old)
    return out


def q_datasource_write(spark, sf_dir):
    """Catalyst-visible WRITE surface (datasource.py
    _EncodedTableWriter): documents are committed through
    `df.write.format("parquet_spark")` — each input partition encodes
    one part via the same chunk kernels as write_encoded, the driver
    performs the manifest's single CAS snapshot commit — then APPENDED
    to (second epoch, disjoint part ids) and read back through BOTH
    read paths.  Zone summaries from DS-written parts must prune
    (asserted: the pushed filter plans fewer input partitions), and
    the decoded aggregate must match DuckDB on the raw parquet.
    Together with q_datasource_read this certifies the full
    read+write SQL surface the reference never had (its C# library is
    write-only, /root/reference/README.md:29-30)."""
    import tempfile

    from parquet_spark.datasource import register
    register(spark)
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_dsw_")
    half1 = d.where(F.col("doc_id") % 2 == 0)
    half2 = d.where(F.col("doc_id") % 2 == 1)
    (half1.repartitionByRange(3, "doc_id")
     .sortWithinPartitions("doc_id")
     .write.format("parquet_spark").option("key", "doc_id")
     .mode("append").save(path))
    (half2.repartitionByRange(2, "doc_id")
     .sortWithinPartitions("doc_id")
     .write.format("parquet_spark").option("key", "doc_id")
     .mode("append").save(path))
    from parquet_spark.manifest import EncodedTable
    snap = EncodedTable(path).current_snapshot()
    assert snap["meta"]["layout"]["mode"] == "external"
    assert sorted(map(int, snap["parts"])) == [0, 1, 2, 3, 4]
    assert snap["meta"]["new_parts"] == [3, 4]
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled",
                         "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        register(spark)
        full = spark.read.format("parquet_spark").load(path)
        filt = full.where(F.col("doc_id") <= 149)
        n_full = full.rdd.getNumPartitions()
        n_filt = filt.select("doc_id").rdd.getNumPartitions()
        assert 0 < n_filt < n_full, (n_filt, n_full)
        out = (filt.groupBy("lang")
               .agg(F.count(F.lit(1)).alias("n_rows"),
                    F.sum("doc_id").alias("sum_ids"),
                    F.sum("n_chars").alias("sum_chars"))
               .orderBy("lang"))
        out = out.cache()
        out.count()
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", old)
    return out


def q_datasource_stream(spark, sf_dir):
    """Structured Streaming through the DataSource in BOTH directions
    (datasource.py _EncodedTableStreamWriter/_EncodedTableStreamReader):
    documents flow through a genuinely multi-batch file stream into
    `writeStream.format("parquet_spark")` (one manifest CAS per
    microbatch, stream_last_batch exactly-once fence), are replayed in
    full by `readStream.format("parquet_spark")` (snapshot-id offsets
    = incremental append scans), and the final batch read aggregates
    match DuckDB on the raw parquet — certifying the sink committed
    exactly the input, no loss, no double-append."""
    import tempfile
    import uuid

    from parquet_spark.datasource import register
    from parquet_spark.manifest import EncodedTable
    from parquet_spark.streaming import file_stream
    register(spark)
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", "lang", "source", "n_chars"))
    src = tempfile.mkdtemp(prefix="entry_dstr_src_")
    d.repartition(3).write.mode("overwrite").parquet(src)
    tbl = tempfile.mkdtemp(prefix="entry_dstr_tbl_")
    q = (file_stream(
            spark, src,
            "doc_id long, lang string, source string, n_chars long")
         .writeStream.format("parquet_spark")
         .option("key", "doc_id")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="dstrck_"))
         .trigger(availableNow=True).start(tbl))
    q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress
                     if p["numInputRows"] and p["numInputRows"] > 0])
    assert n_batches >= 2, f"sink ran in {n_batches} micro-batch(es)"
    snap = EncodedTable(tbl).current_snapshot()
    assert snap["meta"]["layout"]["mode"] == "external"
    assert int(snap["meta"]["stream_last_batch"]) >= 1
    # source half: a full earliest replay re-emits every committed row
    nm = "dstr_" + uuid.uuid4().hex[:8]
    q2 = (spark.readStream.format("parquet_spark").load(tbl)
          .writeStream.format("memory").queryName(nm)
          .option("checkpointLocation", tempfile.mkdtemp(prefix="dstrck2_"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(180)
    n_src = spark.table(nm).count()
    n_tbl = spark.read.format("parquet_spark").load(tbl).count()
    assert n_src == n_tbl, (n_src, n_tbl)
    out = (spark.read.format("parquet_spark").load(tbl)
           .groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum("doc_id").alias("sum_ids"),
                F.sum("n_chars").alias("sum_chars"))
           .orderBy("lang"))
    out = out.cache()
    out.count()
    return out


def q_lm_fluency(spark, sf_dir):
    """CCNet-style bigram-LM fluency scoring (textstats.train_bigram_lm
    + score_bigram_lm): the model trains distributively (explode ->
    map-side-combined count shuffles, deterministic capped tables back
    to the driver), scoring is two BROADCAST joins + one hash-agg back
    to documents (the minhash execution shape).  Caps are deliberately
    tiny (vocab 16 of the corpus's 31 distinct words, bigrams 64) so
    every branch of the stupid-backoff — bigram hit, vocab backoff,
    OOV floor — carries rows at sf0.01.  The oracle hash-checks the
    exact-integer half (pair/OOV/hit counts per language); the float
    log-prob is unit-tested, not hashed (libm ln is not bit-portable
    across engines — the r04 gap_fill lesson)."""
    from parquet_spark.textops.textstats import (score_bigram_lm,
                                                 train_bigram_lm)
    d = _t(spark, sf_dir, "documents")
    lm = train_bigram_lm(d, vocab_size=16, bigram_cap=64)
    scored = score_bigram_lm(d, lm)
    out = (scored.join(d.select("doc_id", "lang"), "doc_id")
           .groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("lm_pairs").alias("sum_pairs"),
                F.sum("lm_oov").alias("sum_oov"),
                F.sum("lm_hits").alias("sum_hits"))
           .orderBy("lang"))
    return out


def q_count_pushdown(spark, sf_dir):
    """COUNT(*) aggregate pushdown (manifest.count_where): chunks the
    zone metadata PROVES fully inside the predicate contribute their
    stored n_rows with zero decompression; only boundary chunks decode.
    The metadata path is asserted to actually fire (interior chunks
    proven full on the range layout); DuckDB recomputes all three
    counts — a range, a dict-column equality, and an OR-of-ANDs —
    exactly."""
    import tempfile

    from parquet_spark.engine import _pred_zone_conds
    from parquet_spark.manifest import (count_where, read_encoded,
                                        write_encoded)
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_count_")
    write_encoded(d, path, key=["doc_id"], n_parts=4, mode="range",
                  rows_per_chunk=64, global_dict_cols=["lang"])
    enc = read_encoded(spark, path)
    _, full = _pred_zone_conds([("doc_id", 60, 440)])
    assert enc.where(full).count() > 0  # metadata shortcut fires
    n_range = count_where(spark, path, [("doc_id", 60, 440)])
    n_lang = count_where(spark, path, [("lang", "=", "de")])
    n_any = count_where(spark, path, {"any": [
        [("doc_id", None, 99)],
        [("lang", "=", "fr"), ("doc_id", 300, None)]]})
    return spark.createDataFrame(
        [(n_range, n_lang, n_any)],
        "n_range long, n_lang long, n_any long")


def q_sum_pushdown(spark, sf_dir):
    """SUM/AVG aggregate pushdown (manifest.sum_where/avg_where):
    provably-full chunks contribute their stored exact per-chunk sums
    (`zone_sum_num`, overflow-guarded int64) plus non-null tallies
    with zero decompression; boundary chunks decode exactly;
    cross-chunk accumulation is decimal(38,0) so the total is exact at
    any magnitude.  The metadata path is asserted to fire.  AVG is the
    one float division of two exact integers — IEEE-portable, so
    DuckDB's SUM()/COUNT() division hash-matches bit-for-bit.  The
    all-null edge (SUM over no non-null rows = SQL NULL) rides in
    n_empty."""
    import tempfile

    from parquet_spark.engine import _pred_zone_conds
    from parquet_spark.manifest import (avg_where, read_encoded,
                                        sum_where, write_encoded)
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_sum_")
    write_encoded(d, path, key=["doc_id"], n_parts=4, mode="range",
                  rows_per_chunk=64, global_dict_cols=["lang"])
    enc = read_encoded(spark, path)
    _, full = _pred_zone_conds([("doc_id", 60, 440)])
    assert enc.where(
        full & F.try_element_at(
            F.col("zone_sum_num"),
            F.when(F.array_position(F.col("zone_cols"),
                                    "n_chars").cast("int") >= 1,
                   F.array_position(F.col("zone_cols"),
                                    "n_chars").cast("int"))).isNotNull()
    ).count() > 0, "metadata sum path never fires"
    s_all = sum_where(spark, path, "n_chars")
    s_range = sum_where(spark, path, "n_chars", [("doc_id", 60, 440)])
    s_lang = sum_where(spark, path, "n_chars", [("lang", "=", "de")])
    s_any = sum_where(spark, path, "n_chars", {"any": [
        [("doc_id", None, 99)],
        [("lang", "=", "fr"), ("doc_id", 300, None)]]})
    a_range = avg_where(spark, path, "n_chars", [("doc_id", 60, 440)])
    s_empty = sum_where(spark, path, "n_chars",
                        [("doc_id", 10 ** 12, None)])
    return spark.createDataFrame(
        [(s_all, s_range, s_lang, s_any, float(a_range),
          1 if s_empty is None else 0)],
        "s_all long, s_range long, s_lang long, s_any long, "
        "a_range double, n_empty int")


def q_cdc_changelog(spark, sf_dir):
    """CDC changelog read (manifest.read_changelog, the Iceberg
    changelog-scan analog): encode documents, MERGE INTO (upsert:
    modify every doc_id%10==0 row, insert 5 new docs), then
    delete_rows three ids — the changelog must render the upsert as
    delete-pre-images + replacement-inserts and the later delete with
    its CURRENT values, never re-reporting an already-dead row.
    DuckDB recomputes every step's expected row set from the raw
    documents table; the per-(change,step) measure hashes
    md5(doc_id:n_chars) so the PRE-IMAGE VALUES (original n_chars, not
    the upserted ones) are certified, not just counts."""
    import tempfile

    from parquet_spark.manifest import (EncodedTable, delete_rows,
                                        read_changelog, upsert_rows,
                                        write_encoded)
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_cdc_")
    write_encoded(d, path, key=["doc_id"], n_parts=2, rows_per_chunk=64)
    s1 = EncodedTable(path).current_snapshot()["snapshot_id"]
    up = (d.where(F.col("doc_id") % 10 == 0)
          .withColumn("n_chars", F.col("n_chars") + 1000))
    new = spark.createDataFrame(
        [(1_000_000 + i, f"new doc {i}", "xx", "srcX", 9 + i)
         for i in range(5)], d.schema)
    upsert_rows(spark, path, up.unionByName(new))
    delete_rows(spark, path, [("doc_id", "in", [1, 11, 21])])
    cl = read_changelog(spark, path, s1)
    fp = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                        F.col("n_chars").cast("string")))
    out = (cl.withColumn("change_type", F.col("_change_type"))
           .withColumn("step",
                       (F.col("_commit_snapshot_id") - s1).cast("int"))
           .groupBy("change_type", "step")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("n_chars").alias("sum_chars"),
                F.min(fp).alias("min_fp"),
                F.max(fp).alias("max_fp"))
           .orderBy("step", "change_type"))
    out = out.cache()
    out.count()
    return out


def q_head_pushdown(spark, sf_dir):
    """ORDER BY key LIMIT k pushdown (manifest.read_head): the driver
    picks a provably-sufficient minimal file set from per-part key
    bounds (prefix-by-key_min until the row target, tau = that
    prefix's max key_max, keep only parts whose key_min <= tau), the
    same argument re-derived at chunk granularity prunes chunks, and
    only those decode — a head over a clustered 10^12-row table costs
    ~k rows of decode.  The facet asserts the file prune actually
    bites (>= 4 of 6 range parts skipped) and returns the 75 rows
    themselves; DuckDB recomputes ORDER BY doc_id LIMIT 75 (doc_id
    unique, so the cut is tie-free and deterministic)."""
    import tempfile

    from parquet_spark.manifest import (EncodedTable, _head_files,
                                        read_head, write_encoded)
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_head_")
    write_encoded(d, path, key=["doc_id"], n_parts=6, mode="range",
                  rows_per_chunk=32)
    t = EncodedTable(path)
    files, skipped, _tau = _head_files(t.committed_parts(), "doc_id", 75)
    assert skipped >= 4, f"file prune never bit ({skipped} skipped)"
    out = read_head(spark, path, 75,
                    columns=["doc_id", "lang", "n_chars"])
    out = out.cache()
    assert out.count() == 75
    return out


def q_gopher_rules(spark, sf_dir):
    """Gopher document-quality rules (textops/textstats.py
    `gopher_filter`, Rae et al. 2021 Table A1 — the filter set
    RefinedWeb/Dolma/FineWeb inherit): word-count bounds, mean word
    length, symbol-to-word ratio, alphabetic-word fraction, stop-word
    presence.  Every per-row ratio is ONE IEEE division of two exact
    integers, so the rule booleans are bit-portable; the per-lang
    measure sums only exact integers (counts, rule tallies, word/stop
    totals) while DuckDB recomputes every rule from scratch.
    Thresholds chosen so the corpus splits (keep and reject both
    non-empty — asserted)."""
    from parquet_spark.textops.textstats import gopher_filter
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    r = gopher_filter(d, min_words=30, min_stop_hits=1).cache()
    kept = r.where(F.col("keep")).count()
    total = r.count()
    assert 0 < kept < total, f"vacuous split: {kept}/{total}"
    out = (r.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.col("keep").cast("long")).alias("n_keep"),
                F.sum(F.col("ok_words").cast("long")).alias("n_ok_words"),
                F.sum(F.col("ok_word_len").cast("long"))
                .alias("n_ok_wlen"),
                F.sum(F.col("ok_symbols").cast("long"))
                .alias("n_ok_sym"),
                F.sum(F.col("ok_alpha").cast("long")).alias("n_ok_alpha"),
                F.sum(F.col("ok_stopwords").cast("long"))
                .alias("n_ok_stop"),
                F.sum("n_words").alias("sum_words"),
                F.sum("stop_hits").alias("sum_stophits"))
           .orderBy("lang"))
    out = out.cache()
    out.count()
    r.unpersist()
    return out


def q_mojibake_fix(spark, sf_dir):
    """Mojibake repair (textops/curation.py `fix_mojibake`, the
    ftfy-core UTF-8-mis-decoded-as-latin-1 heuristic): both engines
    derive the same accented text (replace a->á, e->ę on the clean
    corpus), Spark garbles it through the REAL corruption process
    (synth_mojibake: encode utf-8, mis-decode latin-1) and repairs it
    with the real operator — the per-lang measure hashes the REPAIRED
    strings while DuckDB hashes the pre-corruption accented text, so a
    green row certifies byte-exact recovery.  Docs without a/e stay
    pure ASCII (mojibake fixed point) and must come through with zero
    layers unwound — counted in n_fixed on both sides."""
    from parquet_spark.textops.curation import (fix_mojibake,
                                                synth_mojibake)
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    t2 = d.withColumn(
        "text2", F.replace(F.replace(F.col("text"), F.lit("a"),
                                     F.lit("á")),
                           F.lit("e"), F.lit("ę")))
    g = synth_mojibake(t2, text_col="text2", out_col="garbled")
    r = fix_mojibake(g, text_col="garbled", out_col="fixed").cache()
    n_changed = r.where(F.col("n_mojibake_layers") >= 1).count()
    assert n_changed > 0, "vacuous: nothing was garbled"
    fp = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                        F.col("fixed")))
    out = (r.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum((F.col("n_mojibake_layers") >= 1).cast("long"))
                .alias("n_fixed"),
                F.min(fp).alias("min_fp"),
                F.max(fp).alias("max_fp"))
           .orderBy("lang"))
    out = out.cache()
    out.count()
    r.unpersist()
    return out


def q_minmax_pushdown(spark, sf_dir):
    """Predicate-scoped MIN/MAX/COUNT pushdown (manifest.minmax_where):
    provably-full chunks contribute stored zone bounds and n_rows with
    zero decompression; boundary chunks decode exactly.  Timestamps
    come back in the zone domain (epoch-us int64) — DuckDB recomputes
    all five values from raw rows with epoch_us()."""
    import tempfile

    from parquet_spark.manifest import minmax_where, write_encoded
    ev = _t(spark, sf_dir, "events")
    path = tempfile.mkdtemp(prefix="entry_mm_")
    write_encoded(ev, path, key=["event_id"], n_parts=4, mode="range",
                  rows_per_chunk=512)
    b = ev.agg(F.min("event_id"), F.max("event_id")).head()
    lo = int(b[0] + (b[1] - b[0]) * 0.1)
    hi = int(b[0] + (b[1] - b[0]) * 0.8)
    r = minmax_where(spark, path, [("event_id", lo, hi)],
                     ["event_id", "ts", "user_id"])
    return spark.createDataFrame(
        [(r["n_rows"],
          r["cols"]["event_id"]["min"], r["cols"]["event_id"]["max"],
          r["cols"]["ts"]["min"], r["cols"]["ts"]["max"],
          r["cols"]["user_id"]["min"], r["cols"]["user_id"]["max"])],
        "n_rows long, min_id long, max_id long, min_ts long, "
        "max_ts long, min_user long, max_user long")


def q_exact_quantiles(spark, sf_dir):
    """Exact distributed quantiles (stats.exact_quantiles): multi-pass
    histogram narrowing over the encoded table — pass 0 is the
    metadata-only minmax/notnull count, every later pass scans only
    the zone-pruned active ranges and shuffles bucket-count rows, so
    the column decodes once and no sort ever runs.  Ranks are
    IEEE-double ceil(q*n) (percentile_disc); DuckDB recomputes each
    value as the rank-th row of the sorted column.  doc_id runs the
    default 1024 buckets, n_chars runs buckets=16 to force genuinely
    multi-pass narrowing."""
    import tempfile

    from parquet_spark.manifest import write_encoded
    from parquet_spark.stats import exact_quantiles
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_quant_")
    write_encoded(d, path, key=["doc_id"], n_parts=4, mode="range",
                  rows_per_chunk=64)
    qs = [0.05, 0.25, 0.5, 0.75, 0.9, 1.0]
    rid = exact_quantiles(spark, path, "doc_id", qs)
    rch = exact_quantiles(spark, path, "n_chars", qs, buckets=16)
    return spark.createDataFrame(
        [(float(q), rid[q], rch[q]) for q in qs],
        "q double, doc_id_q long, n_chars_q long")


def q_heavy_hitters(spark, sf_dir):
    """Exact heavy hitters (sketch.heavy_hitters): partition-local
    Misra-Gries summaries (bounded counters; by pigeonhole their union
    is a SUPERSET of every value with global freq > n/k) generate the
    candidates, then ONE broadcast-join aggregation counts candidates
    exactly and totals n, so the final integer cnt*k > n filter is
    exact and partitioning-independent.  The token stream is the
    whitespace-split document text plus a per-doc unique tail token —
    ~5k-value vocabulary, so the MG decrement path genuinely fires
    (counters=2k << vocab) and the threshold excludes most values.
    DuckDB brute-force recomputes the full frequency table and
    filter."""
    from parquet_spark.sketch import heavy_hitters
    d = _t(spark, sf_dir, "documents")
    toks = (d.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
            .where(F.col("tok") != "")
            .unionAll(d.select(
                F.concat(F.lit("u"), F.col("doc_id")).alias("tok"))))
    hh = heavy_hitters(toks, "tok", 40)
    n_hh = hh.count()
    assert 0 < n_hh < 40, n_hh  # non-vacuous: some in, most out
    return hh.orderBy("tok")


def q_analyze_stats(spark, sf_dir):
    """ANALYZE sidecar (stats.analyze_table / table_stats): one agg
    pass for counts/bounds, one KMV bottom-k pass per column for ndv,
    exact-quantile narrowing for int columns; persisted as an
    Iceberg-Puffin-style snapshot-keyed sidecar and read back (the
    roundtrip is asserted).  Emits one row per column; ndv is reported
    only where the sketch is EXACT (true ndv < k) — DuckDB recomputes
    that with CASE WHEN COUNT(DISTINCT) < k, the quantiles as
    sorted-row ranks, and the dict-suggestion rule from exact ndv
    (the KMV estimate sits far from the threshold, and is
    deterministic regardless)."""
    import json
    import tempfile

    from parquet_spark.manifest import write_encoded
    from parquet_spark.stats import analyze_table, table_stats
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_an_")
    write_encoded(d, path, key=["doc_id"], n_parts=4, mode="range",
                  rows_per_chunk=64)
    st = analyze_table(spark, path, quantile_qs=(0.25, 0.5, 0.75))
    assert table_stats(path) == json.loads(json.dumps(st))  # sidecar
    return _stats_facet_df(spark, st)


def _stats_facet_df(spark, st):
    """Shared rendering of an analyze dict as the oracle-compared
    frame (one row per column; ndv only where the sketch is exact)."""
    rows = []
    for c, e in st["cols"].items():
        is_num = isinstance(e["min"], int) and not isinstance(e["min"], bool)
        qs = e["quantiles"] or {}
        rows.append((
            c, e["n"], e["nulls"],
            e["min"] if is_num else None, e["max"] if is_num else None,
            None if is_num else e["min"], None if is_num else e["max"],
            int(e["ndv_est"]) if e["ndv_exact"] else None,
            qs.get(0.25), qs.get(0.5), qs.get(0.75),
            e["dict_suggested"]))
    return spark.createDataFrame(
        rows, "col string, n_nonnull long, n_nulls long, "
              "min_num long, max_num long, min_str string, "
              "max_str string, ndv long, q25 long, q50 long, "
              "q75 long, dict_sugg boolean").orderBy("col")


def q_analyze_incremental(spark, sf_dir):
    """Incremental ANALYZE (stats.analyze_incremental): stats refresh
    that scans ONLY the appended parts (read_increment's manifest
    diff) and merges — counts/nulls/bounds add, ndv merges via the
    KMV union algebra, the dict rule recomputes, quantiles re-narrow
    exactly.  The facet splits documents into two appends, ANALYZEs
    the first, refreshes after the second, and asserts the merge path
    actually ran (incremental_from set); DuckDB recomputes every
    emitted stat over the FULL table — merged must equal recomputed."""
    import tempfile

    from parquet_spark.manifest import write_encoded
    from parquet_spark.stats import analyze_incremental, analyze_table
    d = _t(spark, sf_dir, "documents")
    mid = d.approxQuantile("doc_id", [0.5], 0.0)[0]
    path = tempfile.mkdtemp(prefix="entry_aninc_")
    write_encoded(d.where(F.col("doc_id") < mid), path, key=["doc_id"],
                  n_parts=2, mode="range", rows_per_chunk=64)
    analyze_table(spark, path, quantile_qs=())
    write_encoded(d.where(F.col("doc_id") >= mid), path, key=["doc_id"],
                  n_parts=2, mode="range", rows_per_chunk=64,
                  part_offset=2)
    st = analyze_incremental(spark, path, quantile_qs=(0.25, 0.5, 0.75))
    assert st["incremental_from"] is not None  # merge path, not fallback
    return _stats_facet_df(spark, st)


def q_warc_roundtrip(spark, sf_dir):
    """WARC source (warc.read_warc, ISO 28500): documents rows are
    written as REAL WARC archives — one plain, one with Common Crawl's
    record-per-gzip-member framing — then re-ingested by the
    distributed binaryFile + mapInArrow reader (HTTP envelope
    unwrapped).  DuckDB recomputes every field from the documents
    table via the same deterministic construction (url format, date
    arithmetic, utf-8 byte length, md5 of the body bytes), so the
    parser is checked against an independent derivation, not against
    its own writer."""
    import datetime
    import tempfile

    from parquet_spark.warc import read_warc, write_warc_bytes
    d = _t(spark, sf_dir, "documents")
    rows = d.select("doc_id", "source", "text").collect()
    t0 = datetime.datetime(2020, 1, 1)

    def rec(r):
        return {"url": f"https://{r.source}.example/{r.doc_id}",
                "ts": t0 + datetime.timedelta(seconds=r.doc_id),
                "body": r.text.encode("utf-8")}
    plain = [rec(r) for r in rows if r.doc_id % 2 == 0]
    gzed = [rec(r) for r in rows if r.doc_id % 2 == 1]
    assert plain and gzed
    dirp = tempfile.mkdtemp(prefix="entry_warc_")
    with open(f"{dirp}/a.warc", "wb") as f:
        f.write(write_warc_bytes(plain))
    with open(f"{dirp}/b.warc.gz", "wb") as f:
        f.write(write_warc_bytes(gzed, per_record_gzip=True))
    w = read_warc(spark, dirp + "/*.warc*")
    return (w.select(
        "url", F.unix_micros("warc_ts").alias("ts_us"),
        F.col("body_length").alias("body_len"),
        F.md5("html").alias("body_md5")).orderBy("url"))


def q_domain_mixture(spark, sf_dir):
    """Target-mixture downsampling (textops/sampling.py `mix_domains`,
    redistribute=False — the one-pass closed form a second engine can
    recompute): per-domain keep rate = min(1, budget*w_d/(Σw·n_d)),
    membership via the module's md5 draw.  DuckDB recomputes the
    counts, the EXACT double rate arithmetic (same operation order),
    and every row's draw-vs-rate comparison — row-exact agreement, not
    a statistical check.  One domain is asserted rate-capped so the
    LEAST branch is actually exercised."""
    from parquet_spark.textops.sampling import mix_domains
    d = _t(spark, sf_dir, "documents")
    w = {"src0": 10.0, "src1": 2.0, "src2": 1.0}
    out, plan = mix_domains(d, "doc_id", "source", w, budget_rows=60,
                            redistribute=False)
    assert plan["src0"]["rate"] == 1.0, plan          # capped
    assert 0.0 < plan["src2"]["rate"] < 1.0, plan     # fractional
    return (out.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("doc_id").alias("sum_ids"),
                 F.countDistinct(F.md5("text")).alias("n_texts"))
            .orderBy("source"))


def q_domain_mixture_tokens(spark, sf_dir):
    """Token-budget mixture (mix_domains size_col=...): the budget and
    availability are SUM(n_chars) per domain, rates
    min(1, B*w/(Σw·Σchars)); DuckDB recomputes the sums, the exact
    double rate arithmetic, and every row's draw — row-exact.  One
    domain asserted rate-capped."""
    from parquet_spark.textops.sampling import mix_domains
    d = _t(spark, sf_dir, "documents")
    w = {"src0": 10.0, "src1": 2.0, "src2": 1.0}
    out, plan = mix_domains(d, "doc_id", "source", w,
                            budget_rows=20000, redistribute=False,
                            size_col="n_chars")
    assert plan["src0"]["rate"] == 1.0, plan          # capped
    assert 0.0 < plan["src2"]["rate"] < 1.0, plan     # fractional
    return (out.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("doc_id").alias("sum_ids"),
                 F.sum("n_chars").alias("sum_chars"))
            .orderBy("source"))


def q_wap_publish(spark, sf_dir):
    """Write-audit-publish (manifest.write_encoded(branch=...) +
    publish_branch): generation 2 is STAGED on a branch — asserted
    invisible to published readers while a ref-addressed audit read
    sees it — then fast-forward-published atomically.  DuckDB
    recomputes the post-publish table (both generations) from raw
    data; the pre-publish isolation is asserted inline (a leak of
    staged rows into the published read fails the facet before the
    oracle ever runs)."""
    import tempfile

    from parquet_spark.manifest import (publish_branch, read_decoded,
                                        write_encoded)
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    gen1 = d.where(F.col("doc_id") % 2 == 0)
    gen2 = d.where(F.col("doc_id") % 2 == 1)
    path = tempfile.mkdtemp(prefix="entry_wap_")
    write_encoded(gen1, path, key=["doc_id"], n_parts=2,
                  rows_per_chunk=256)
    write_encoded(gen2, path, key=["doc_id"], n_parts=2, part_offset=2,
                  rows_per_chunk=256, branch="audit")
    n_pub = read_decoded(spark, path).count()
    n_stage = read_decoded(spark, path, ref="audit").count()
    assert n_pub == gen1.count() and n_stage == d.count(), \
        (n_pub, n_stage)  # staged rows must not leak pre-publish
    publish_branch(path, "audit")
    return (read_decoded(spark, path)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("doc_id").alias("sum_ids"),
                 F.sum("n_chars").alias("sum_chars"))
            .orderBy("lang"))


def q_token_search(spark, sf_dir):
    """Inverted token index (textops/textindex.py): token -> sorted
    posting list as a range-partitioned encoded table, probed with
    manifest/zone pruning.  Facet builds the index over documents,
    searches two probe tokens under AND and OR semantics, and reports
    vocabulary size + match aggregates — DuckDB recomputes all four by
    brute-force regex tokenization of the raw text, so the index's
    build shuffle, posting encoding, pruned probe, and AND/OR algebra
    must together reproduce exact per-document membership."""
    import tempfile

    from parquet_spark.manifest import read_decoded
    from parquet_spark.textops.textindex import (build_token_index,
                                                 search_tokens)
    d = _t(spark, sf_dir, "documents")
    idx = tempfile.mkdtemp(prefix="entry_tokidx_")
    build_token_index(d, idx, n_parts=4)
    n_tokens = read_decoded(spark, idx).count()
    all_df = search_tokens(spark, idx, ["vector", "stream"], mode="all")
    any_df = search_tokens(spark, idx, ["vector", "stream"], mode="any")
    a = all_df.agg(F.count(F.lit(1)).alias("n_docs_all"),
                   F.sum("doc_id").alias("sum_ids_all"))
    b = any_df.agg(F.count(F.lit(1)).alias("n_docs_any"))
    out = a.crossJoin(b).select(
        F.lit(n_tokens).cast("long").alias("n_tokens"),
        "n_docs_all", "sum_ids_all", "n_docs_any")
    out = out.cache()
    out.count()
    return out


def q_token_rank(spark, sf_dir):
    """Ranked retrieval over the inverted index (textindex.rank_tokens):
    tf·idf with INTEGER-quantized linear idf, so scores are exact
    BIGINT sums and the ranking reproduces bit-identically across
    engines.  DuckDB recomputes term frequencies, document frequencies,
    the quantized idf (integer //), the per-doc score sums, AND the
    row_number ranking from the raw text — the index build, posting
    alignment (doc_ids ∥ tfs), pruned probe, and TakeOrdered top-k
    must all agree with brute force."""
    import tempfile

    from parquet_spark.textops.textindex import (build_token_index,
                                                 rank_tokens)
    d = _t(spark, sf_dir, "documents")
    idx = tempfile.mkdtemp(prefix="entry_tokrank_")
    build_token_index(d, idx, n_parts=4)
    out = rank_tokens(spark, idx, ["vector", "stream", "window"],
                      n_docs=d.count(), k=15)
    out = out.cache()
    out.count()
    return out


def q_dup_spans(spark, sf_dir):
    """Exact SUBSTRING-level duplication stats (textops/dedup.py
    `dup_span_stats` — the window-granular ExactSubstr of Lee et al.
    2021): any 5-token window shared by >= 2 distinct docs marks its
    positions as duplicated; per doc we count windows, duplicated
    windows, and the UNION of covered token positions (overlaps do
    not double-count).  DuckDB recomputes the whole vote ->
    semi-join -> coverage pipeline from the raw text.  All measures
    are exact integers (per-lang sums plus a dup-doc id checksum),
    so the hash check is unconditionally bit-portable.  Non-vacuity
    asserted (some span must repeat across docs at sf0.01: ~2.3k
    duplicated windows over ~71 docs)."""
    from parquet_spark.textops.dedup import dup_span_stats
    d = _t(spark, sf_dir, "documents")
    s = dup_span_stats(d, k=5)
    joined = s.join(d.select("doc_id", "lang"), "doc_id").cache()
    n_hit = joined.where(F.col("n_dup_windows") > 0).count()
    assert n_hit > 0, "vacuous: no cross-doc duplicated spans"
    out = (joined.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("sum_tokens"),
                F.sum("n_windows").alias("sum_windows"),
                F.sum("n_dup_windows").alias("sum_dup_windows"),
                F.sum("n_dup_tokens").alias("sum_dup_tokens"),
                F.sum(F.when(F.col("n_dup_windows") > 0,
                             F.col("doc_id")).otherwise(0))
                .alias("sum_dup_ids"))
           .orderBy("lang"))
    out = out.cache()
    out.count()
    joined.unpersist()
    return out


def q_dup_span_removal(spark, sf_dir):
    """ExactSubstr REMOVAL (textops/dedup.py `remove_dup_spans` — the
    action half of Lee et al. 2021): every 5-token span shared by
    >= 2 distinct docs is cut from all docs except the min-doc_id
    owner's copy, overlaps unioned, text rebuilt from kept tokens.
    DuckDB recomputes ownership, coverage, and the REBUILT TEXT from
    scratch; the per-lang measure hashes the rebuilt strings
    themselves (min/max of md5(doc_id:clean_text)) plus exact-integer
    token/removal sums — so the facet certifies the rewritten bytes,
    not just the counts.  md5-of-UTF-8 and integer sums are
    unconditionally bit-portable.  Non-vacuity asserted (some doc
    must actually lose tokens at sf0.01)."""
    from parquet_spark.textops.dedup import remove_dup_spans
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    r = remove_dup_spans(d, k=5).cache()
    n_cut = r.where(F.col("n_removed") > 0).count()
    assert n_cut > 0, "vacuous: no doc lost any span"
    fp = F.md5(F.concat(F.col("doc_id").cast("string"),
                        F.lit(":"), F.col("text")))
    out = (r.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("sum_tokens"),
                F.sum("n_removed").alias("sum_removed"),
                F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0))
                .cast("long").alias("n_cut_docs"),
                F.min(fp).alias("min_fp"),
                F.max(fp).alias("max_fp"))
           .orderBy("lang"))
    out = out.cache()
    out.count()
    r.unpersist()
    return out


def q_html_extract(spark, sf_dir):
    """HTML -> text extraction (textops/htmlops.py), the WARC-to-corpus
    step whose output the north rule pins ("byte-identical extracted
    text per url").  Each document's text is rendered to realistic
    HTML by the pure-codegen `synth_html` fixture (head/title/script/
    style/comment noise, per-paragraph tags + attributes, an inline
    anchor, and a literal `&#32;` charref per paragraph), then
    `extract_text`'s stdlib-parser Arrow kernel recovers the visible
    text.  The per-lang measure hashes the EXTRACTED strings
    (min/max md5(doc_id:text)) while DuckDB computes the identical
    measure from the ORIGINAL text column (whitespace-normalized) —
    so a green row certifies extraction is byte-exact on every row,
    through tags, entities, and skip containers.  Non-vacuity: the
    rendered html must be strictly larger than the text it wraps."""
    from parquet_spark.textops.htmlops import extract_text, synth_html
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    # precondition the measure depends on: the source text must be
    # whitespace-CLEAN (single ASCII spaces), since synth_html's
    # anchor condition splits the RAW text while the oracle splits
    # the normalized text, and Python's extractor collapses ALL
    # Unicode whitespace while the SQL mirror handles [ \\t\\n\\r]
    # only — on clean text every reading coincides; assert it so a
    # future testdata change fails loudly here, not as a hash
    # mismatch downstream
    dirty = d.where(F.col("text").isNotNull() & (
        F.col("text") != F.trim(F.regexp_replace("text", r"\s+", " "))
    )).count()
    assert dirty == 0, f"{dirty} docs have non-clean whitespace"
    h = synth_html(d).select("doc_id", "lang", "html")
    blo = h.agg(F.min(F.length("html")).alias("lo")).head()["lo"]
    assert blo is not None and blo > 300, "vacuous: boilerplate missing"
    e = extract_text(h, html_col="html")
    fp = F.md5(F.concat(F.col("doc_id").cast("string"),
                        F.lit(":"), F.col("text")))
    out = (e.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.length("text")).alias("sum_chars"),
                F.sum("n_links").alias("sum_links"),
                F.min(fp).alias("min_fp"),
                F.max(fp).alias("max_fp"))
           .orderBy("lang"))
    out = out.cache()
    out.count()
    return out


def q_url_parse(spark, sf_dir):
    """URL structure + canonicalization (textops/urlops.py).  The
    documents table has no url column, so both engines derive the SAME
    deterministic URL per doc_id (md5-hex hosts over a mix of
    single-/multi-label public suffixes, default and explicit ports,
    userinfo, nested paths, unsorted query params, fragments) — Spark
    then runs the real operators (`url_features`,
    `canonicalize_url`: pure-codegen regexp/array expressions) while
    DuckDB re-derives every structural part from scratch.  The
    per-tld measure includes min/max md5(doc_id:canonical_url), so a
    green row certifies the canonical STRINGS byte-for-byte —
    default-port stripping, fragment drop, and query-param sorting
    included."""
    from parquet_spark.textops.urlops import canonicalize_url, url_features
    d = _t(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    h = F.md5(i.cast("string"))
    host = F.concat(
        F.when(i % 4 == 0, F.lit("a.b.")).otherwise(F.lit("www.")),
        F.substring(h, 1, 6),
        F.when(i % 3 == 0, F.lit(".co.uk"))
         .when(i % 3 == 1, F.lit(".com")).otherwise(F.lit(".org")))
    url = F.concat(
        F.when(i % 2 == 0, F.lit("https")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(i % 8 == 3, F.lit("u:p@")).otherwise(F.lit("")),
        host,
        F.when(i % 5 == 0, F.lit(":443"))
         .when(i % 5 == 1, F.lit(":8080")).otherwise(F.lit("")),
        F.when(i % 8 == 5, F.lit("")).otherwise(
            F.concat(F.lit("/"), F.substring(h, 7, 3),
                     F.when(i % 4 == 0,
                            F.concat(F.lit("/x/"),
                                     (i % 7).cast("string")))
                     .otherwise(F.lit("")))),
        F.when(i % 3 == 0, F.lit("?z=9&a=1"))
         .when(i % 3 == 1, F.concat(F.lit("?m="), (i % 5).cast("string")))
         .otherwise(F.lit("")),
        F.when(i % 6 == 1, F.lit("#s2")).otherwise(F.lit("")))
    src = d.withColumn("url", url)
    r = canonicalize_url(url_features(src))
    fp = F.md5(F.concat(i.cast("string"), F.lit(":"), F.col("url_canon")))
    out = (r.groupBy("tld")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("host").alias("n_hosts"),
                F.countDistinct("registered_domain").alias("n_regdoms"),
                F.sum("path_depth").alias("sum_depth"),
                F.sum("n_params").alias("sum_params"),
                F.sum(F.col("port").isNotNull().cast("long"))
                .alias("n_explicit_port"),
                F.sum(F.col("has_fragment").cast("long")).alias("n_frag"),
                F.min(fp).alias("min_fp"),
                F.max(fp).alias("max_fp"))
           .orderBy("tld"))
    out = out.cache()
    out.count()
    return out


def q_line_dedup(spark, sf_dir):
    """Corpus-level duplicate-line removal (textops/dedup.py
    `dedup_lines`, the C4/CCNet boilerplate pass).  The flat corpus
    text has no newlines, so both engines derive the same multi-line
    documents (lines = consecutive 2-word groups joined with \\n) and
    DuckDB recomputes the full vote -> anti-join -> ordered-rebuild
    pipeline; the facet returns the n_removed histogram with per-bucket
    id checksums and cleaned-text digests, so one wrongly kept or
    dropped line mismatches.  Non-vacuity asserted (some line must
    actually repeat across >= 2 docs)."""
    from parquet_spark.textops.dedup import dedup_lines
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    w = F.split(F.col("text"), " ")
    m = F.ceil(F.size(w) / F.lit(2.0)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.array_join(F.slice(w, (i - 1) * 2 + 1, 2), " "))
    docs = d.select("doc_id", F.array_join(lines, "\n").alias("text"))
    out = dedup_lines(docs, min_docs=2).cache()
    n_hit = out.where(F.col("n_removed") > 0).count()
    assert n_hit > 0, "vacuous: no cross-doc duplicate lines"
    res = (out.groupBy("n_removed")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("doc_id").alias("sum_ids"),
                F.countDistinct(F.md5("text_clean")).alias("n_cleans"))
           .orderBy("n_removed"))
    res = res.cache()
    res.count()
    out.unpersist()
    return res


def q_alter_columns(spark, sf_dir):
    """Metadata-only schema evolution (manifest.alter_table): add a
    nullable column, rename one, drop one — zero data files touched —
    then append a second generation that stores the new shape
    physically, and read the mixed generations back.  DuckDB rebuilds
    both generations (gen1 with NULL score, no n_chars, source renamed)
    and must agree on per-origin aggregates including the null-fill
    count — a wrong translation or fill mismatches immediately."""
    import tempfile

    from parquet_spark.manifest import (alter_table, read_decoded,
                                        write_encoded)
    d = _t(spark, sf_dir, "documents")
    gen1 = d.where(F.col("doc_id") % 2 == 0)
    path = tempfile.mkdtemp(prefix="entry_alter_")
    write_encoded(gen1, path, key=["doc_id"], n_parts=2,
                  rows_per_chunk=256)
    alter_table(path, add=[("score", "double")],
                rename={"source": "origin"}, drop=["n_chars"])
    gen2 = (d.where(F.col("doc_id") % 2 == 1)
            .withColumnRenamed("source", "origin").drop("n_chars")
            .withColumn("score",
                        (F.col("doc_id") % 100).cast("double")))
    write_encoded(gen2, path, key=["doc_id"], n_parts=2, part_offset=2,
                  rows_per_chunk=256)
    return (read_decoded(spark, path)
            .groupBy("origin")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("doc_id").alias("sum_ids"),
                 F.count(F.when(F.col("score").isNull(), 1))
                 .alias("n_null_score"),
                 F.sum(F.coalesce(F.col("score"), F.lit(0.0)))
                 .alias("sum_score"),
                 F.countDistinct(F.md5("text")).alias("n_texts"))
            .orderBy("origin"))


def q_like_prune(spark, sf_dir):
    """LIKE-'p%' predicate pushdown ((col, "prefix", p) terms): on a
    range-keyed url layout the prefix prunes whole FILES from the
    manifest's per-part zone summaries before any Spark job, then
    chunks via the string zone maps, and a prefix on the global-dict
    lang column translates to the matching id set.  The residual is an
    exact startswith on restored values; DuckDB recomputes the same
    aggregates with LIKE over raw data (prefixes contain no wildcard
    chars, so LIKE == starts_with)."""
    import tempfile

    from parquet_spark.manifest import (EncodedTable, _prune_parts,
                                        scan_table, write_encoded)
    d = _derived_corpus(spark, sf_dir).select(
        "url", "lang", "doc_id", "text")
    path = tempfile.mkdtemp(prefix="entry_like_")
    write_encoded(d, path, key=["url"], n_parts=4, mode="range",
                  rows_per_chunk=256, global_dict_cols=["lang"])
    parts = EncodedTable(path).committed_parts()
    kept = _prune_parts(parts, [("url", "prefix", "https://host1")])
    assert 0 < len(kept) < len(parts), (len(kept), len(parts))
    return (scan_table(spark, path, [("url", "prefix", "https://host1"),
                                     ("lang", "prefix", "d")])
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct(F.md5("url")).alias("n_urls"),
                 F.sum("doc_id").alias("sum_ids"),
                 F.countDistinct(F.md5("text")).alias("n_texts")))


def q_route_partitioned(spark, sf_dir):
    """Single-pass high-cardinality routing (the scale path the
    route_encoded guard points at): ONE encode keyed on the route
    column, then per-route access as a zone-pruned scan.  Pruning is
    asserted to bite (chunks of other routes never reach the decoder);
    DuckDB recomputes the routed aggregate from raw data, certifying
    the layout+prune+decode path end-to-end."""
    import tempfile

    from parquet_spark.engine import prune_chunks_pred
    from parquet_spark.manifest import (read_encoded, read_route,
                                        route_encoded_partitioned)
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    path = tempfile.mkdtemp(prefix="entry_route1p_")
    route_encoded_partitioned(d, "source", path, key=["doc_id"],
                              n_parts=2, rows_per_chunk=64)
    enc = read_encoded(spark, path).cache()
    n_all = enc.count()
    n_kept = prune_chunks_pred(
        enc, [("source", "src3", "src3")]).count()
    assert 0 < n_kept < n_all, (n_kept, n_all)  # route pruning bites
    enc.unpersist()
    return (read_route(spark, path, "source", "src3")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum("doc_id").alias("sum_ids"),
                 F.sum("n_chars").alias("sum_chars"))
            .orderBy("source"))


def _md5_frac_hex(frac: float) -> str:
    """Largest 8-hex md5 prefix satisfying u < frac, where
    u = int(prefix, 16) / 2^32 — the sampling ops' draw.  frac * 2^32
    is an EXACT float (power-of-two scaling), so intval < frac*2^32
    iff intval <= this bound; fixed-width lowercase hex compares
    lexicographically like the integer, letting DuckDB reproduce the
    double comparison with a plain string <=."""
    import math
    x = frac * (2 ** 32)
    bound = (math.ceil(x) - 1) if float(x).is_integer() else math.floor(x)
    return format(int(bound), "08x")


def _split_case_sql() -> str:
    """CASE expression reproducing assign_splits' default boundaries:
    cumulative thresholds computed with EXACTLY its float arithmetic
    (0.9+0.05+0.05 sums to 1.0000000000000002 in doubles — recomputing
    naively would shift a boundary), rendered as hex-prefix compares."""
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(w.values()))
    acc1 = w["train"] / total
    acc2 = acc1 + w["val"] / total
    h = "substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8)"
    return (f"CASE WHEN {h} <= '{_md5_frac_hex(acc1)}' THEN 'train' "
            f"WHEN {h} <= '{_md5_frac_hex(acc2)}' THEN 'val' "
            f"ELSE 'test' END")


def _split_assign_sql() -> str:
    return f"""
        SELECT split, COUNT(*) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids FROM (
          SELECT doc_id, {_split_case_sql()} AS split
          FROM documents)
        GROUP BY split ORDER BY split"""


def q_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment: membership is a pure
    function of (seed, doc_id) via an md5 draw, so DuckDB reproduces
    the exact split of every row (hex-prefix compare ≡ the engine's
    double compare — see _md5_frac_hex).  The property under test is
    the reproducibility story itself: a second engine agrees on which
    rows are train."""
    from parquet_spark.textops.sampling import assign_splits
    d = _t(spark, sf_dir, "documents")
    return (assign_splits(d, "doc_id")  # default 0.9/0.05/0.05, seed 42
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("doc_id").alias("sum_ids"))
            .orderBy("split"))


def q_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic downsampling (the 'cap the dominant
    language' pipeline op): per-lang md5 thresholds, verified row-exact
    by DuckDB via the hex-compare equivalence."""
    from parquet_spark.textops.sampling import stratified_hash_sample
    d = _t(spark, sf_dir, "documents")
    kept = stratified_hash_sample(d, "doc_id", "lang",
                                  {"de": 0.5, "fr": 1.0},
                                  default=0.1, seed=11)
    return (kept.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("doc_id").alias("sum_ids"))
            .orderBy("lang"))


def q_domain_stats(spark, sf_dir):
    """Per-domain crawl accounting over the derived corpus: host from
    one regexp, map-side-combined counts/chars per host."""
    from parquet_spark.textops.textstats import domain_stats
    corpus = _derived_corpus(spark, sf_dir)
    return (domain_stats(corpus).where(F.col("host") != "")
            .orderBy("host"))


def q_asof_join(spark, sf_dir):
    """As-of join — an operator Spark's DataFrame API lacks as a
    primitive, rendered as one union + ordered-window fill (no join
    node at all).  DuckDB checks it with its NATIVE ASOF LEFT JOIN:
    two completely different implementations must agree on every
    click's most recent preceding error."""
    from parquet_spark.temporal import asof_join
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click")
    errors = ev.where(F.col("event_type") == "error")
    j = asof_join(clicks, errors, "ts", by=["user_id"],
                  right_cols=["event_id"])
    return (j.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_clicks"),
                 F.count("event_id_r").alias("n_matched"),
                 F.sum("event_id_r").alias("sum_err_ids"))
            .orderBy("user_id"))


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (1-day gap): lag + running-sum window,
    deterministic tie-break on event_id; DuckDB recomputes sessions
    with the identical window algebra on exact interval compares."""
    from parquet_spark.temporal import sessionize
    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, "ts", "user_id", gap=86400.0,
                   order_cols=["event_id"])
    return (s.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.max("session") + 1).alias("n_sessions"))
            .orderBy("user_id"))


def q_gap_fill(spark, sf_dir):
    """Gap-filled bucketed aggregation with LOCF (temporal.gap_fill,
    the TimescaleDB time_bucket_gapfill idiom): 6-hour buckets per
    event_type, missing buckets materialized between each type's first
    and last observation, counts and integer-exact value sums carried
    forward.  DuckDB rebuilds the bucket aggregate, the
    generate_series grid, the gap join, AND the IGNORE NULLS
    carry-forward window — the whole operator, not just totals.

    Measure portability (round-4 driver hash fail): the old measure
    ROUND(value,3)→DECIMAL stacked two representation-tie conversions
    (HALF_UP over the double's exact binary expansion in Spark vs
    scaled-double rounding in DuckDB 1.0.0 — ~29% of .xxx5-adjacent
    doubles disagree, see tests/test_oracle_portability.py).  FLOOR of
    the identical IEEE product is bit-portable, so the measure is now
    FLOOR(value*1000) summed as BIGINT — engine-exact, tie-free."""
    from parquet_spark.temporal import gap_fill
    ev = _t(spark, sf_dir, "events").withColumn(
        "valq", F.floor(F.col("value") * 1000).cast("long"))
    g = gap_fill(ev, "ts", 21600, by=["event_type"],
                 aggs={"n": ("*", "count"),
                       "sum_value": ("valq", "sum")},
                 fill="locf")
    bucket_s = (F.expr(_EPOCH_US.format(col="bucket")) /
                F.lit(1_000_000)).cast("long")
    return (g.select("event_type", bucket_s.alias("bucket_s"),
                     "is_gap", "n",
                     F.col("sum_value").cast("long").alias("sum_value"))
            .orderBy("event_type", "bucket_s"))


def q_kmv_ndv(spark, sf_dir):
    """KMV bottom-k distinct-count sketch (sketch.py): exact below k,
    ~1/sqrt(k) error above, mergeable (union = merge + re-truncate).
    The facet asserts the sketch algebra in-line — sub-k columns
    estimate EXACTLY, the high-cardinality estimate lands within 25%,
    and sketching two disjoint halves then merging yields the
    byte-identical sketch of the whole — and returns the exact
    distinct counts for DuckDB to recompute (the estimates' ground
    truth is what the oracle certifies)."""
    from parquet_spark.sketch import kmv_estimate, kmv_merge, kmv_sketch
    d = _t(spark, sf_dir, "documents")
    out = d.agg(F.countDistinct("lang").alias("ndv_lang"),
                F.countDistinct("source").alias("ndv_source"),
                F.countDistinct("doc_id").alias("ndv_doc"))
    out = out.cache()
    row = out.collect()[0]
    s_lang = kmv_sketch(d, "lang")
    assert s_lang["exact"] and kmv_estimate(s_lang) == row.ndv_lang
    s_src = kmv_sketch(d, "source")
    assert s_src["exact"] and kmv_estimate(s_src) == row.ndv_source
    k = 128
    whole = kmv_sketch(d, "doc_id", k=k)
    est = kmv_estimate(whole)
    assert abs(est / row.ndv_doc - 1) < 0.25, (est, row.ndv_doc)
    halves = [kmv_sketch(d.where(F.col("doc_id") % 2 == i),
                         "doc_id", k=k) for i in (0, 1)]
    assert kmv_merge(*halves)["hashes"] == whole["hashes"]
    return out


def q_gap_fill_interp(spark, sf_dir):
    """gap_fill's LINEAR interpolation path: per-type 6h bucket counts
    with gaps filled by pv + (nv-pv)·(t-pt)/(nt-pt).  The operands are
    exact integers, so the IEEE float expression — mirrored verbatim
    in the DuckDB oracle — must reproduce every interpolated double
    bit-for-bit (hash compare, no rounding)."""
    from parquet_spark.temporal import gap_fill
    ev = _t(spark, sf_dir, "events")
    g = gap_fill(ev, "ts", 21600, by=["event_type"],
                 aggs={"n": ("*", "count")}, fill="interp")
    bucket_s = (F.expr(_EPOCH_US.format(col="bucket")) /
                F.lit(1_000_000)).cast("long")
    return (g.select("event_type", bucket_s.alias("bucket_s"),
                     "is_gap", "n")
            .orderBy("event_type", "bucket_s"))


def q_range_join(spark, sf_dir):
    """Range (point-in-interval) join rendered as an EQUI-join via
    grid-cell bucketing (vs Catalyst's nested-loop for the naive
    inequality form); DuckDB checks it with the plain inequality join
    — the bucketed rewrite must reproduce every containment pair."""
    from parquet_spark.temporal import range_join
    ev = _t(spark, sf_dir, "events")
    pts = ev.where(F.col("event_type") == "click")
    iv = (ev.where(F.col("event_type") == "error")
          .select("user_id", F.col("ts").alias("start"),
                  F.expr("ts + INTERVAL 2 HOURS").alias("end"),
                  F.col("event_id").alias("win_id")))
    j = range_join(pts, iv, "ts", "start", "end",
                   by=["user_id"], bucket=3600)
    return (j.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_matches"),
                 F.sum("event_id").alias("sum_click_ids"),
                 F.sum("win_id").alias("sum_win_ids"))
            .orderBy("user_id"))


def q_time_rollup(spark, sf_dir):
    """Hypertable-style continuous-aggregate cascade: raw events
    aggregate once at hour grain, the day grain re-aggregates the
    hour AGGREGATE (not the raw data); DuckDB recomputes both levels
    straight from raw rows — the cascade must be lossless."""
    from parquet_spark.temporal import time_rollup
    ev = _t(spark, sf_dir, "events")
    r = time_rollup(ev, "ts", ("hour", "day"), by=["event_type"],
                    aggs={"n_events": ("*", "count"),
                          "sum_ids": ("event_id", "sum")})
    return r.orderBy("gran", "bucket", "event_type")


def q_pipeline_curation(spark, sf_dir):
    """End-to-end curation PIPELINE facet — the composition story in
    one oracle: C4-style quality gate → deterministic 0.5 Bernoulli
    sample → train/val/test assignment → per-(split, lang)
    accounting.  DuckDB recomputes every stage (the same 4dp-rounded
    ratio rules, the same md5-threshold draws, the same split
    boundaries), so the stages are proven to compose row-exactly, not
    just to work in isolation."""
    from parquet_spark.textops.sampling import assign_splits, hash_sample
    from parquet_spark.textops.textstats import quality_filter
    d = quality_filter(_t(spark, sf_dir, "documents")).where(F.col("keep"))
    s = assign_splits(hash_sample(d, "doc_id", 0.5, seed=17), "doc_id")
    return (s.groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("doc_id").alias("sum_ids"),
                 F.sum("n_words").alias("sum_words"))
            .orderBy("split", "lang"))


def q_compact_rechunk(spark, sf_dir):
    """O10/O11 lifecycle through the ORACLE: write documents
    fragmented (every chunk under-sized), compact with rechunk (runs of
    small chunks decoded + re-encoded to full size), assert the chunk
    count really dropped, then decode THROUGH the compacted snapshot —
    DuckDB recomputes the aggregates from raw parquet, so the
    decode+re-encode merge provably loses/alters nothing."""
    import tempfile

    from parquet_spark.manifest import (compact_table, read_decoded,
                                        read_encoded, write_encoded)
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_rechunk_")
    # 8 parts vs a chunk target bigger than any part -> all chunks small
    n = d.count()
    write_encoded(d, path, key=["doc_id"], n_parts=8,
                  rows_per_chunk=max(200, int(n // 3)))
    n_before = read_encoded(spark, path).count()
    compact_table(spark, path, target_parts=1, rechunk=True)
    n_after = read_encoded(spark, path).count()
    assert n_after < n_before, (n_before, n_after)  # rechunk really merged
    dec = read_decoded(spark, path)
    out = dec.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct(F.md5("text")).alias("n_texts"),
        F.sum("doc_id").alias("sum_ids"))
    out = out.cache()
    out.count()
    return out


def q_checkpoint_resume(spark, sf_dir):
    """North-rule checkpoint contract (BASELINE.json:6) through the
    oracle: a checkpointed encode (one CAS commit per 2 parts) is CUT
    SHORT after 3 of 6 parts (limit_parts stands in for the kill — the
    on-disk state is identical to a SIGKILL between batch commits,
    which tests/test_splits.py kills for real), then a plain re-run
    resumes from the committed prefix.  The facet asserts the commit
    chain's shape (4 checkpoints, disjoint+complete new_parts, coherent
    progress counters) and returns content aggregates decoded through
    the resumed table — DuckDB recomputes them from raw parquet, so the
    committed-prefix + resumed-suffix provably covers every row exactly
    once across the kill boundary (no loss, no duplication)."""
    import tempfile

    from parquet_spark.manifest import EncodedTable, read_decoded
    from parquet_spark.splits import list_splits, write_encoded_splits
    d = _t(spark, sf_dir, "documents")
    src = tempfile.mkdtemp(prefix="entry_ckpt_src_") + "/docs.parquet"
    d.repartition(6).write.parquet(src)  # 6 files -> 6 splits
    assert len(list_splits(src)) == 6
    path = tempfile.mkdtemp(prefix="entry_ckpt_tbl_")
    # "killed" run: 2 checkpoint commits, 3 of 6 parts committed
    part1 = write_encoded_splits(spark, src, path,
                                 checkpoint_every=2, limit_parts=3)
    assert len(part1["parts"]) == 3
    # resume: picks up the remaining 3 splits, 2 more checkpoints
    snap = write_encoded_splits(spark, src, path, checkpoint_every=2)
    hist = EncodedTable(path).history()
    assert len(hist) == 4, [h["meta"].get("checkpoint") for h in hist]
    seen = []
    for h in hist:
        seen += h["meta"]["new_parts"]
        # each checkpoint is a coherent prefix of the final table
        assert len(h["parts"]) == len(seen)
    assert sorted(seen) == list(range(6)), seen  # disjoint + complete
    dec = read_decoded(spark, path)
    out = dec.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct(F.md5("text")).alias("n_texts"),
        F.sum("doc_id").alias("sum_ids")).select(
        F.lit(len(snap["parts"])).cast("int").alias("parts_total"),
        F.lit(len(hist)).cast("int").alias("n_checkpoints"),
        "n_rows", "sum_chars", "n_texts", "sum_ids")
    out = out.cache()
    out.count()
    return out


def q_relocate_range(spark, sf_dir):
    """Chunk-level relocation (compressed chunk rows move, no decode):
    hash-layout corpus -> range layout on url, then a pruned ranged
    scan over the RELOCATED table.  DuckDB recomputes the same range
    aggregates from its own corpus derivation — relocation must
    preserve every chunk payload and keep zone maps prune-exact."""
    import tempfile

    from parquet_spark.engine import decode_table, prune_chunks
    from parquet_spark.manifest import read_encoded, relocate_table, write_encoded
    df = _derived_corpus(spark, sf_dir).select("url", "doc_id", "text")
    src = tempfile.mkdtemp(prefix="entry_reloc_src_")
    dst = tempfile.mkdtemp(prefix="entry_reloc_dst_")
    write_encoded(df, src, key=["url"], n_parts=4, rows_per_chunk=50)
    relocate_table(spark, src, dst, n_parts=3, by="range")
    enc = read_encoded(spark, dst)
    lo, hi = "https://host1", "https://host3"
    pruned = prune_chunks(enc, lo, hi, column="url")
    n_all, n_kept = enc.count(), pruned.count()
    assert 0 < n_kept < n_all, (n_kept, n_all)  # pruning still bites
    out = (decode_table(pruned)
           .where((F.col("url") >= lo) & (F.col("url") <= hi))
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.countDistinct(F.md5("url")).alias("n_urls"),
                F.sum("doc_id").alias("sum_ids"),
                F.countDistinct(F.md5("text")).alias("n_texts")))
    out = out.cache()
    out.count()
    return out


def q_roundtrip_documents(spark, sf_dir):
    """Flagship O1/O16: encode documents, verify bit-identity, decode, and
    return aggregates DuckDB recomputes over the raw parquet — the
    round-trip itself is the thing the oracle certifies."""
    from parquet_spark.engine import decode_table, encode_table
    from parquet_spark.verify import verify_roundtrip
    df = _t(spark, sf_dir, "documents")
    enc = encode_table(df, key=["doc_id"], n_parts=4).cache()
    dec = decode_table(enc)
    verify_roundtrip(df, dec)
    out = dec.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("sum_chars"),
        F.countDistinct(F.md5("text")).alias("n_texts"),
        F.min("doc_id").alias("min_id"), F.max("doc_id").alias("max_id"),
        F.countDistinct("lang").alias("n_langs"))
    out = out.cache()
    out.count()
    enc.unpersist()
    return out


def q_codec_selection(spark, sf_dir):
    """Per-column codec auto-selection on documents (O12-O15).

    RECOMPUTATION oracle (not a pinned golden): DuckDB re-derives the
    expected codec from the SAME sampled statistics the selector uses —
    int-family columns take the integer codec, string columns take the
    dictionary codec iff distinct_ratio <= 0.8 (codecs/column.py
    `_pick_string_codec`, DICT_MAX_DISTINCT_RATIO).  The one branch an
    external engine cannot recompute — the byte-level FSST-vs-plain
    trial encode — is collapsed to a 'str_nondict' family on BOTH
    sides, so the stats gates are genuinely recomputed and a selector
    regression (inverted gate, mis-computed ratio, dict leaking into
    high-cardinality text) hash-mismatches.  rows_per_chunk is pinned
    so the selector sees the same per-chunk shape at any sf."""
    from parquet_spark.engine import encode_table, encoding_stats
    df = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    enc = encode_table(df, key=["doc_id"], n_parts=4, rows_per_chunk=125)
    fam = (F.when(F.col("codec").isin("str_plain", "str_fsst", "fsst",
                                      "prefix"),
                  F.lit("str_nondict")).otherwise(F.col("codec")))
    return (encoding_stats(enc).select("column", fam.alias("codec"))
            .distinct().orderBy("column"))


def q_corpus_encode(spark, sf_dir):
    """North-rule corpus shape (url, warc_ts, html, text, lang) derived
    deterministically from documents; encode url-hash-keyed, verify
    bit-identical round-trip, return decoded aggregates the oracle
    recomputes from its own derivation of the same corpus."""
    from parquet_spark.engine import decode_table, encode_table
    from parquet_spark.verify import verify_roundtrip
    df = _derived_corpus(spark, sf_dir)
    enc = encode_table(df, key=["url"], n_parts=4).cache()
    dec = decode_table(enc)
    verify_roundtrip(df, dec, key=["url"], digest_col="text")
    us = F.expr(_EPOCH_US.format(col="warc_ts"))
    out = dec.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.md5("url")).alias("n_urls"),
        F.sum(F.octet_length("html")).alias("html_bytes"),
        F.countDistinct(F.md5("text")).alias("n_texts"),
        F.min(us).alias("min_us"), F.max(us).alias("max_us"))
    out = out.cache()
    out.count()
    enc.unpersist()
    return out


def q_media_features(spark, sf_dir):
    """REAL image decode (pure-numpy PPM parser, no stub): deterministic
    P6 blobs are synthesized per doc, parsed, and per-channel means
    computed — the oracle recomputes the means from the closed-form pixel
    pattern."""
    from parquet_spark.textops.multimodal import image_features, synth_ppm_df
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 16) \
        .select("doc_id")
    blobs = synth_ppm_df(d, "doc_id", width=4, height=4)
    feats = image_features(blobs, "media_id", "blob")
    return (feats.select("media_id", "width", "height",
                         "mean_r", "mean_g", "mean_b")
            .orderBy("media_id"))


def q_png_features(spark, sf_dir):
    """REAL PNG decode (multimodal.parse_png: stdlib-zlib inflate +
    pure-numpy reverse filtering, CRC-verified chunks): byte-valid
    deterministic PNGs are synthesized per doc with the scanline filter
    type CYCLING 0..4 by row — every reverse-filter path (None/Sub/Up/
    Average/Paeth) participates in every image — then parsed and
    reduced to exact per-channel means.  The oracle recomputes the
    means from the closed-form raster formula, so one flipped byte
    anywhere in deflate/unfilter fails the hash."""
    from parquet_spark.textops.multimodal import (image_features,
                                                  synth_png_df)
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 16) \
        .select("doc_id")
    blobs = synth_png_df(d, "doc_id", width=8, height=8)
    feats = image_features(blobs, "media_id", "blob")
    return (feats.select("media_id", "width", "height",
                         "mean_r", "mean_g", "mean_b")
            .orderBy("media_id"))


def q_hierarchy_rows(spark, sf_dir):
    """O20 run-tree row identity: deterministic md5 guids over natural
    keys with parent links (the reference's ResultName/Guid/Parent/
    StepId columns) — DuckDB recomputes the exact guid strings."""
    from parquet_spark.merge import with_hierarchy
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    h = with_hierarchy(n, "nation_result", ["n_nationkey"],
                       parent_guid="plan-root", step_id="s1")
    return (h.select("n_nationkey", "result_name", "guid", "parent",
                     "step_id").orderBy("n_nationkey"))


def q_streaming_dedup(spark, sf_dir):
    """O18 streaming surface: cross-batch exact dedup as a stateful
    Structured Streaming operator (applyInPandasWithState) over a
    GENUINELY multi-batch file stream — the input is re-laid-out into 3
    parquet files and consumed one file per trigger, so the state
    machinery must carry seen-digests ACROSS micro-batches (a
    single-batch run would never exercise the cross-batch path).

    The oracle checks only batch-order-insensitive facts: each distinct
    digest is emitted exactly once, and the emitted digest SET matches
    DuckDB's (via count + a bit_xor checksum of the digests).  Keeper
    ids are deliberately not oracled: streaming's keeper is first-seen,
    which depends on batch order, while batch SQL's is the global min."""
    import tempfile
    import uuid

    from parquet_spark.streaming import file_stream, streaming_dedup
    src = tempfile.mkdtemp(prefix="sdedup_src_")
    (_t(spark, sf_dir, "documents")
     .select("doc_id", "text", "lang", "source", "n_chars")
     .repartition(3).write.mode("overwrite").parquet(src))
    stream = file_stream(
        spark, src,
        "doc_id long, text string, lang string, source string, n_chars long")
    name = "sdedup_" + uuid.uuid4().hex[:8]
    q = (streaming_dedup(stream).writeStream
         .format("memory").queryName(name).outputMode("update")
         .option("checkpointLocation", tempfile.mkdtemp(prefix="sdck_"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress
                     if p["numInputRows"] and p["numInputRows"] > 0])
    assert n_batches >= 2, f"stream ran in {n_batches} micro-batch(es); " \
        "the cross-batch dedup path was not exercised"
    return spark.sql(
        f"SELECT COUNT(*) AS n_emitted, "
        f"COUNT(DISTINCT digest) AS n_digests, "
        f"BIT_XOR(CAST(CONV(SUBSTRING(digest, 1, 15), 16, 10) AS BIGINT)) "
        f"AS digest_xor FROM {name}")


def q_route_encoded(spark, sf_dir):
    """O17 per-type routing (the reference's file-per-result-type macro
    path): one encoded table per lang value; decode every route and
    return per-route aggregates DuckDB recomputes with GROUP BY lang —
    proving routing splits, encodes, and round-trips each subset
    exactly."""
    import tempfile

    from parquet_spark.manifest import read_decoded, route_encoded
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    base = tempfile.mkdtemp(prefix="entry_routes_")
    snaps = route_encoded(d, "lang", base, key=["doc_id"], n_parts=2)
    rows = []
    for lang in sorted(snaps):
        dec = read_decoded(spark, f"{base}/lang={lang}")
        agg = dec.agg(F.count(F.lit(1)).alias("n"),
                      F.sum("n_chars").alias("sc"),
                      F.countDistinct(F.md5("text")).alias("nt")).head()
        rows.append((lang, agg.n, agg.sc, agg.nt))
    return spark.createDataFrame(
        rows, "lang string, n_docs long, sum_chars long, n_texts long") \
        .orderBy("lang")


def q_audio_features(spark, sf_dir):
    """REAL audio decode (pure-numpy RIFF/WAVE PCM parser): deterministic
    16-bit PCM blobs are synthesized per doc, parsed, and RMS /
    zero-crossing features computed — the oracle recomputes them from
    the closed-form sample pattern (sample j = ((id*37 + j*129) % 2048)
    - 1024; integer math, exact in doubles)."""
    from pyspark.sql import functions as SF

    from parquet_spark.textops.multimodal import audio_features, synth_wav

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "blob": [synth_wav(int(m)) for m in pdf["doc_id"]]})

    d = (_t(spark, sf_dir, "documents").where(F.col("doc_id") < 12)
         .select(F.col("doc_id").cast("long").alias("doc_id")))
    blobs = d.mapInPandas(gen, "doc_id long, blob binary")
    feats = audio_features(blobs, "doc_id", "blob")
    return (feats.withColumn("duration_s", SF.col("duration_s"))
            .orderBy("media_id"))


def q_bss_roundtrip(spark, sf_dir):
    """Byte-stream-split float path through the full encoded format
    (codecs/column.py `_enc_bss`, codec id 9): embeddings
    (list<float32>) encode -> decode, then every element is returned
    exploded — bit-identity makes each float hash-equal to DuckDB
    reading the source parquet directly, so any BSS plane-transpose
    bug (byte order, width, null scatter) mismatches."""
    from parquet_spark.engine import decode_table, encode_table
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 40)
    enc = encode_table(emb, key=["vec_id"], n_parts=2)
    dec = decode_table(enc)
    return (dec.select("vec_id",
                       F.posexplode("embedding").alias("pos", "val"))
            .withColumn("pos", F.col("pos").cast("long"))
            .orderBy("vec_id", "pos"))


def q_alp_roundtrip(spark, sf_dir):
    """ALP decimal-float path through the full encoded format
    (codecs/column.py `_enc_alp`, codec id 10): TPC-H price doubles
    (2-decimal l_extendedprice/l_discount/l_tax, integral l_quantity)
    rescale to small integers under the three-way INT/BSS/ALP trial.
    Encode -> decode and return the raw doubles — bit-identity makes
    every float hash-equal to DuckDB reading the source parquet, so any
    exponent/factor/exception bug mismatches."""
    from parquet_spark.engine import decode_table, encode_table
    li = (_t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 600)
          .select("l_orderkey", "l_linenumber", "l_quantity",
                  "l_extendedprice", "l_discount", "l_tax"))
    enc = encode_table(li, key=["l_orderkey", "l_linenumber"], n_parts=2)
    dec = decode_table(enc)
    return dec.orderBy("l_orderkey", "l_linenumber")


def q_prefix_roundtrip(spark, sf_dir):
    """Prefix (incremental) string codec path through the full encoded
    format (codecs/column.py `_enc_prefix`, codec id 11): the derived
    corpus is laid out by url, so the url column arrives SORTED within
    every chunk and the selector's contiguous-window trial engages the
    DELTA_BYTE_ARRAY-analog codec.  Returns each decoded url — any
    lcp/suffix reconstruction bug mismatches the DuckDB recomputation
    of the same derivation.  The codec actually engaging is asserted
    engine-side (tests/test_engine.py) so this facet certifies
    correctness, not the pick."""
    from parquet_spark.engine import decode_table, encode_table
    df = _derived_corpus(spark, sf_dir).where(F.col("doc_id") < 800) \
        .select("url", "doc_id")
    enc = encode_table(df, key=["url"], n_parts=2)
    return decode_table(enc).orderBy("doc_id")


def q_decontamination(spark, sf_dir):
    """Benchmark decontamination (textops/curation.py
    `ngram_contamination`): bench = every 97th doc's text, corpus = the
    rest; each corpus doc annotated with its count of distinct shared
    word bigrams.  DuckDB recomputes the full explode->join->count
    pipeline; the facet returns the contamination histogram with
    per-bucket doc_id checksums so one mis-flagged doc mismatches."""
    from parquet_spark.textops.curation import ngram_contamination
    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 97 == 0).select("text")
    corpus = d.where(F.col("doc_id") % 97 != 0)
    out = ngram_contamination(corpus, bench, n=2)
    return (out.groupBy("bad_grams")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("doc_id").alias("sum_ids"))
            .orderBy("bad_grams"))


def q_pii_scrub(spark, sf_dir):
    """PII redaction with per-kind counts (textops/curation.py
    `pii_scrub`).  The synthetic corpus has no natural PII, so both
    engines derive the identical salted text (emails, IPv4s, SSNs as
    closed-form functions of doc_id) and must agree on every match
    count AND the md5 of every redacted text — a Java-vs-RE2 semantic
    divergence in the patterns would mismatch immediately."""
    from parquet_spark.textops.curation import pii_scrub
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    salted = d.withColumn("text", F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@ex"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".org from 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".9"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" ssn 123-45-"),
                        F.lpad((F.col("doc_id") % 10000).cast("string"),
                               4, "0")))
         .otherwise(F.lit(""))))
    out = pii_scrub(salted)
    return out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").alias("sum_email"),
        F.sum("n_ipv4").alias("sum_ipv4"),
        F.sum("n_ssn").alias("sum_ssn"),
        F.count_distinct(F.md5("text_clean")).alias("n_clean_texts"),
        F.sum(F.length("text_clean")).alias("clean_chars"))


def q_pack_sequences(spark, sf_dir):
    """GPT-style concat-and-chop sequence packing (textops/curation.py
    `pack_sequences`): md5-ordered docs cumsum'd into 256-token context
    windows across 16 md5-prefix shards.  DuckDB recomputes the window
    algebra; the per-shard seq_id*doc_id checksum pins every single
    document's window assignment."""
    from parquet_spark.textops.curation import pack_sequences
    d = _t(spark, sf_dir, "documents")
    out = pack_sequences(d, budget=256, shard_chars=1)
    return (out.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.max("seq_id").alias("max_seq"),
                 F.sum("n_tokens").alias("sum_tokens"),
                 F.sum(F.col("seq_id") * F.col("doc_id")).alias("assign_chk"),
                 F.sum("seq_off").alias("sum_off"))
            .orderBy("shard"))


def q_zone_prune_dbl(spark, sf_dir):
    """Double zone maps (engine.py `zone_min_dbl`/`zone_max_dbl`):
    float columns carry their own zone family, so a float value-range
    predicate prunes chunks (asserted to bite on a value-sorted layout)
    and the residual filter is exact.  DuckDB recomputes the aggregate
    over raw events; sums stay on int columns (double sums are
    order-dependent) while min/max of the double column compare
    bit-exact."""
    from parquet_spark.engine import (encode_table, prune_chunks_pred,
                                      scan_filtered)
    ev = _t(spark, sf_dir, "events")
    # key on the double itself: sortWithinPartitions makes every chunk
    # a narrow sorted run of values, so double zones are tight
    enc = encode_table(ev, key=["value"], n_parts=4,
                       rows_per_chunk=200,
                       zone_cols=["event_id", "value"]).cache()
    n_all = enc.count()
    kept = prune_chunks_pred(enc, [("value", 10.0, 60.0)])
    assert kept.count() < n_all, "float zone pruning must bite"
    got = scan_filtered(enc, [("value", 10.0, 60.0)])
    out = got.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("event_id").alias("sum_ids"),
        F.count_distinct("event_type").alias("n_types"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"))
    out = out.cache()
    out.count()
    enc.unpersist()
    return out


def q_bloom_prune(spark, sf_dir):
    """Per-chunk Bloom filters (engine.py `_build_bloom` /
    `_bloom_keep_cond`, the Parquet-format BloomFilter analog):
    equality/IN on a high-cardinality NON-key column over a doc-keyed
    hash layout — string zone ranges are useless there (every chunk
    spans the value space), so only the bloom can prune, and the facet
    asserts it bites.  DuckDB recomputes the scan result from raw
    parquet with the same text-probe derivation."""
    from parquet_spark.engine import (encode_table, prune_chunks_pred,
                                      scan_filtered)
    d = _t(spark, sf_dir, "documents")
    enc = encode_table(d, key=["doc_id"], n_parts=4, rows_per_chunk=100,
                       bloom_cols=["text"]).cache()
    n_all = enc.count()
    probes = [r.text for r in
              d.where(F.col("doc_id").isin(3, 77, 450)).collect()]
    kept = prune_chunks_pred(enc, [("text", "in", probes)])
    assert kept.count() < n_all, "bloom pruning must bite"
    got = scan_filtered(enc, [("text", "in", probes)])
    out = got.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("sum_ids"),
        F.count_distinct(F.md5("text")).alias("n_texts"),
        F.sum("n_chars").alias("sum_chars"))
    out = out.cache()
    out.count()
    enc.unpersist()
    return out


def q_row_deletes(spark, sf_dir):
    """Row-level deletes (manifest.py `delete_rows` / `rewrite_table`,
    the Iceberg equality-delete + rewrite_data_files analog): delete
    doc_id % 10 = 3 rows by key, read back merge-on-read (anti-join,
    no data file rewritten), then physically rewrite and read again —
    BOTH states must equal DuckDB's filtered aggregate, and the facet
    asserts the merge-on-read snapshot kept the original part files
    while the rewrite dropped the delete list."""
    import tempfile

    from parquet_spark.manifest import (EncodedTable, delete_rows,
                                        read_decoded, rewrite_table,
                                        write_encoded)
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    path = tempfile.mkdtemp(prefix="entry_deletes_") + "/t"
    write_encoded(d, path, key=["doc_id"], n_parts=4, rows_per_chunk=50)
    doomed = [i for i in range(500) if i % 10 == 3]
    snap = delete_rows(spark, path, [("doc_id", "in", doomed)])
    t = EncodedTable(path)
    assert t.data_files(t.snapshot_at(0)) == t.data_files()  # no rewrite
    outs = []
    for state in ("mor", "rewritten"):
        if state == "rewritten":
            snap = rewrite_table(spark, path)
            assert "delete_files" not in snap["meta"]
        dec = read_decoded(spark, path)
        outs.append(dec.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").alias("sum_ids"),
            F.count_distinct(F.md5("text")).alias("n_texts"),
            F.sum("n_chars").alias("sum_chars"))
            .withColumn("state", F.lit(state)))
    out = outs[0].unionByName(outs[1]).orderBy("state")
    out = out.cache()
    out.count()
    return out


def q_upsert(spark, sf_dir):
    """MERGE INTO by key (manifest.py `upsert_rows`): matched keys are
    replaced (equality delete scoped to pre-existing parts — Iceberg's
    sequence-number rule, so the replacements survive their own
    delete), unmatched keys insert into a fresh part-id epoch.  DuckDB
    recomputes the merged state with plain CASE/UNION relational
    algebra — a mis-scoped delete (replacements vanishing) or a lost
    delete list (old rows resurrecting) mismatches on both counts and
    checksums."""
    import tempfile

    from parquet_spark.manifest import (read_decoded, upsert_rows,
                                        write_encoded)
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    path = tempfile.mkdtemp(prefix="entry_upsert_") + "/t"
    write_encoded(d, path, key=["doc_id"], n_parts=4, rows_per_chunk=50)
    upd = (d.where(F.col("doc_id") % 20 == 1)
           .withColumn("text", F.concat(F.lit("u:"), F.col("text"))))
    ins = (d.where(F.col("doc_id") < 10)
           .withColumn("doc_id", F.col("doc_id") + 10000))
    upsert_rows(spark, path, upd.unionByName(ins))
    dec = read_decoded(spark, path)
    out = dec.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("sum_ids"),
        F.count_distinct(F.md5("text")).alias("n_texts"),
        F.sum("n_chars").alias("sum_chars"))
    out = out.cache()
    out.count()
    return out


def q_null_prune(spark, sf_dir):
    """Null-count zone stats (engine.py `zone_nulls`): IS NULL prunes
    chunks with zero nulls, IS NOT NULL skips all-null chunks.  Nulls
    are derived deterministically (lang nulled where doc_id % 7 = 0) so
    DuckDB recomputes the IS NULL scan exactly; pruning asserted to
    bite on a lang-keyed layout (nulls sort first, clustering into the
    leading chunks)."""
    from parquet_spark.engine import (encode_table, prune_chunks_pred,
                                      scan_filtered)
    d = _t(spark, sf_dir, "documents").withColumn(
        "lang", F.when(F.col("doc_id") % 7 != 0, F.col("lang")))
    enc = encode_table(d, key=["lang"], n_parts=4,
                       rows_per_chunk=100).cache()
    n_all = enc.count()
    kept = prune_chunks_pred(enc, [("lang", "isnull", None)])
    assert kept.count() < n_all, "null-count pruning must bite"
    got = scan_filtered(enc, [("lang", "isnull", None)])
    out = got.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("sum_ids"),
        F.count_distinct(F.md5("text")).alias("n_texts"))
    out = out.cache()
    out.count()
    enc.unpersist()
    return out


def q_incremental_read(spark, sf_dir):
    """Incremental changelog read (manifest.py `read_increment`): write
    documents doc_id<300 (snapshot 0), append 300..449 as a second
    part-id epoch (snapshot 1), then read ONLY the increment — the
    diff of two part manifests, scanning just the appended files.
    DuckDB recomputes the appended slice directly; a diff that leaked
    base rows, dropped appended rows, or mis-walked the snapshot chain
    mismatches."""
    import tempfile

    from parquet_spark.manifest import read_increment, write_encoded
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_increment_") + "/t"
    write_encoded(d.where(F.col("doc_id") < 300), path,
                  key=["doc_id"], n_parts=4)
    write_encoded(d.where((F.col("doc_id") >= 300) & (F.col("doc_id") < 450)),
                  path, key=["doc_id"], n_parts=4, part_offset=4)
    inc = read_increment(spark, path, from_snapshot_id=0)
    return inc.select("doc_id", "lang", "source", "n_chars",
                      F.md5("text").alias("text_md5")).orderBy("doc_id")


def q_meta_agg(spark, sf_dir):
    """Aggregate pushdown to metadata (manifest.py `metadata_stats`):
    count/min/max/null-count per column answered entirely from the
    per-chunk zone statistics — no payload byte is decoded (the scan
    projects only zone columns of the chunk relation).  DuckDB
    recomputes every aggregate with a full scan of the same slice;
    exactness of the metadata fold IS the assertion.  Timestamp
    bounds surface as the bit-faithful epoch-us int64 the zones
    store."""
    import tempfile

    from parquet_spark.manifest import metadata_stats, write_encoded
    li = (_t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 2000)
          .select("l_orderkey", "l_linenumber", "l_quantity",
                  "l_extendedprice", "l_shipdate"))
    path = tempfile.mkdtemp(prefix="entry_metaagg_") + "/t"
    write_encoded(li, path, key=["l_orderkey", "l_linenumber"], n_parts=4)
    return metadata_stats(
        spark, path,
        columns=["l_orderkey", "l_quantity", "l_extendedprice",
                 "l_shipdate"]).orderBy("column")


def q_range_file_prune(spark, sf_dir):
    """Explicit range partitioning (north rule) + manifest file
    pruning: documents written mode='range' on doc_id own DISJOINT key
    ranges per part, so the driver prunes whole part FILES from the
    per-part zone summaries (manifest._prune_parts) before any Spark
    job — asserted to bite (kept < total files).  DuckDB recomputes the
    key-range aggregates; a boundary/placement/summary bug that
    dropped a live file or leaked rows mismatches."""
    import tempfile

    from parquet_spark.manifest import (EncodedTable, _prune_parts,
                                        scan_table, write_encoded)
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_rangeprune_") + "/t"
    write_encoded(d, path, key=["doc_id"], n_parts=8, mode="range",
                  rows_per_chunk=40)
    parts = EncodedTable(path).committed_parts()
    pred = [("doc_id", 100, 160)]
    kept = _prune_parts(parts, pred)
    assert 0 < len(kept) < len(parts), (len(kept), len(parts))
    out = (scan_table(spark, path, pred)
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum("doc_id").alias("sum_ids"),
                F.sum("n_chars").alias("sum_chars"),
                F.countDistinct(F.md5("text")).alias("n_texts")))
    out = out.cache()
    out.count()
    return out


def q_recluster_scan(spark, sf_dir):
    """Layout evolution (manifest.py `recluster_table`): documents
    ingested in the hash layout, a key-range equality-deleted
    (merge-on-read), then the table is reclustered to mode='range' on
    the SAME path — one atomic replace commit that applies the
    deletes, freezes fresh boundaries, and leaves the old layout
    time-travelable.  File pruning on the new layout is asserted to
    bite; DuckDB recomputes the post-delete key-range aggregates from
    raw parquet, so a recluster that lost rows, resurrected deleted
    rows, or misplaced a boundary mismatches."""
    import tempfile

    from parquet_spark.manifest import (EncodedTable, _prune_parts,
                                        delete_rows, read_decoded,
                                        recluster_table, scan_table,
                                        write_encoded)
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_recluster_") + "/t"
    write_encoded(d, path, key=["doc_id"], n_parts=4, rows_per_chunk=64)
    delete_rows(spark, path, [("doc_id", 120, 139)])
    recluster_table(spark, path, mode="range", n_parts=8)
    parts = EncodedTable(path).committed_parts()
    pred = [("doc_id", 100, 220)]
    kept = _prune_parts(parts, pred)
    assert 0 < len(kept) < len(parts), (len(kept), len(parts))
    # the pre-recluster snapshot still reads (MOR deletes applied)
    n_old = read_decoded(spark, path, snapshot_id=1).count()
    out = (scan_table(spark, path, pred)
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum("doc_id").alias("sum_ids"),
                F.sum("n_chars").alias("sum_chars"),
                F.countDistinct(F.md5("text")).alias("n_texts"))
           .withColumn("n_live_total", F.lit(n_old).cast("long")))
    out = out.cache()
    out.count()
    return out


def q_ref_pinned_read(spark, sf_dir):
    """Named refs (manifest.py `create_ref`): a tag pins the first
    epoch's snapshot by name; after a second append epoch AND a
    recluster rewrite, reading `ref="v1"` still sees exactly the
    original slice while CURRENT sees both.  DuckDB recomputes both
    slices from raw parquet — a ref resolving to the wrong snapshot,
    or a recluster disturbing the pinned files, mismatches."""
    import tempfile

    from parquet_spark.manifest import (create_ref, read_decoded,
                                        recluster_table, write_encoded)
    d = _t(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="entry_refs_") + "/t"
    write_encoded(d.where(F.col("doc_id") < 250), path,
                  key=["doc_id"], n_parts=2)
    create_ref(path, "v1")
    write_encoded(d.where((F.col("doc_id") >= 250)
                          & (F.col("doc_id") < 400)),
                  path, key=["doc_id"], n_parts=2, part_offset=2)
    recluster_table(spark, path, mode="range", n_parts=4)

    def summarize(df, which):
        return (df.agg(F.count(F.lit(1)).alias("n_rows"),
                       F.sum("doc_id").alias("sum_ids"),
                       F.countDistinct(F.md5("text")).alias("n_texts"))
                .withColumn("which", F.lit(which)))

    out = (summarize(read_decoded(spark, path, ref="v1"), "tag_v1")
           .unionByName(summarize(read_decoded(spark, path), "current"))
           .orderBy("which"))
    out = out.cache()
    out.count()
    return out


def q_struct_roundtrip(spark, sf_dir):
    """Nested struct codec (codecs/column.py `_enc_struct`, codec id
    12): events' (event_type, value, user_id) packed into a struct
    column, encoded (each field shredded to its own codec), decoded,
    and returned FLATTENED so DuckDB compares plain scalars — any
    field-order, validity-scatter, or child-codec bug mismatches."""
    from parquet_spark.engine import decode_table, encode_table
    ev = (_t(spark, sf_dir, "events").where(F.col("event_id") < 3000)
          .select("event_id", F.struct("event_type", "value",
                                       "user_id").alias("s")))
    enc = encode_table(ev, key=["event_id"], n_parts=2)
    dec = decode_table(enc)
    return (dec.select("event_id",
                       F.col("s.event_type").alias("event_type"),
                       F.col("s.value").alias("value"),
                       F.col("s.user_id").alias("user_id"))
            .orderBy("event_id"))


def q_zorder_prune(spark, sf_dir):
    """Z-order clustered layout (engine.py `zorder_table`): events
    range-partitioned + sorted by the Morton key of (user_id, ts), so
    zone maps go tight on BOTH columns and a 2-D box predicate prunes
    chunks a single-key layout must keep.  Pruning is asserted to bite
    (kept <= 60% of chunks); DuckDB recomputes the box aggregates from
    raw parquet, so a cell/interleave bug that misplaced rows — or a
    prune that dropped a live chunk — mismatches."""
    from parquet_spark.engine import (decode_table, prune_chunks_pred,
                                      zorder_table)
    ev = _t(spark, sf_dir, "events")
    z = zorder_table(ev, ["user_id", "ts"], n_parts=4,
                     rows_per_chunk=500).cache()
    r = ev.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"),
               F.min("user_id").alias("u0"),
               F.max("user_id").alias("u1")).first()
    tlo = r.t0 + (r.t1 - r.t0) * 2 // 10
    thi = r.t0 + (r.t1 - r.t0) * 4 // 10
    ulo = int(r.u0 + (r.u1 - r.u0) * 2 // 10)
    uhi = int(r.u0 + (r.u1 - r.u0) * 4 // 10)
    kept = prune_chunks_pred(z, [("user_id", ulo, uhi), ("ts", tlo, thi)])
    n_total, n_kept = z.count(), kept.count()
    assert 0 < n_kept <= 0.6 * n_total, (n_kept, n_total)
    us = F.expr(_EPOCH_US.format(col="ts"))
    out = (decode_table(kept)
           .where(F.col("user_id").between(ulo, uhi)
                  & F.col("ts").between(tlo, thi))
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum("user_id").alias("sum_users"),
                F.countDistinct("event_id").alias("n_events"),
                F.min(us).alias("min_us"), F.max(us).alias("max_us")))
    out = out.cache()
    out.count()
    z.unpersist()
    return out


def q_time_travel(spark, sf_dir):
    """Snapshot time travel (manifest.py `snapshot_at` / `history`):
    write documents (snapshot 0), rechunk-compact (snapshot 1), then
    decode BOTH snapshots — two different physical layouts over two
    DISJOINT file sets (asserted) — and return each snapshot's
    aggregates.  DuckDB recomputes the aggregate once from raw parquet
    and expects it at every snapshot id: content stability across the
    commit chain IS the time-travel contract, and a walk that resolved
    a wrong ancestor (e.g. a racer's orphan manifest) or a compaction
    that mutated parent files would mismatch."""
    import tempfile

    from parquet_spark.manifest import (EncodedTable, compact_table,
                                        read_decoded, write_encoded)
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    path = tempfile.mkdtemp(prefix="entry_timetravel_") + "/t"
    write_encoded(d, path, key=["doc_id"], n_parts=4, rows_per_chunk=40)
    compact_table(spark, path, target_parts=1, rechunk=True)
    t = EncodedTable(path)
    hist = t.history()
    assert [s["snapshot_id"] for s in hist] == [0, 1]
    f0, f1 = (set(t.data_files(s)) for s in hist)
    assert f0 and f1 and f0.isdisjoint(f1)
    outs = []
    for sid in (0, 1):
        dec = read_decoded(spark, path, snapshot_id=sid)
        outs.append(dec.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct(F.md5("text")).alias("n_texts"),
            F.sum("doc_id").alias("sum_ids"))
            .withColumn("snapshot_id", F.lit(sid).cast("long")))
    out = outs[0].unionByName(outs[1]).orderBy("snapshot_id")
    out = out.cache()
    out.count()
    return out


def q_expire_vacuum(spark, sf_dir):
    """Full table-maintenance path (manifest.expire_snapshots +
    vacuum_table): three commits, expire history to the last two
    snapshots (tombstoned truncation), vacuum the dead files, then
    decode snapshot 1 BEFORE maintenance and CURRENT after it.  The
    snapshot-1 aggregate is forced eagerly because vacuum is by design
    aggressive — only CURRENT + named refs keep their data files — so
    that time-travel point's files are legitimately reclaimed while
    its (expire-protected) snapshot object stays in history.  DuckDB
    computes the aggregate once from raw parquet; maintenance must be
    invisible to readers.  Asserted along the way: snapshot 0's object
    is gone, history re-rooted at 1, fsck clean with zero orphans."""
    import tempfile

    from parquet_spark.fsck import fsck_table
    from parquet_spark.manifest import (EncodedTable, compact_table,
                                        expire_snapshots, read_decoded,
                                        vacuum_table, write_encoded)

    def _agg(dec, sid):
        return dec.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct(F.md5("text")).alias("n_texts"),
            F.sum("doc_id").alias("sum_ids")) \
            .withColumn("snapshot_id", F.lit(sid).cast("long"))

    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 300)
    path = tempfile.mkdtemp(prefix="entry_expire_") + "/t"
    write_encoded(d, path, key=["doc_id"], n_parts=4, rows_per_chunk=40)
    compact_table(spark, path, target_parts=2)
    compact_table(spark, path, target_parts=1, rechunk=True)
    # materialize (driver-side, 1 row) before vacuum reclaims snap 1's
    # exclusive files; rebuilt as a DataFrame for the union below
    pre = _agg(read_decoded(spark, path, snapshot_id=1), 1)
    pre_rows, pre_schema = pre.collect(), pre.schema
    rep = expire_snapshots(path, keep_last=2, older_than_s=0.0)
    assert len(rep["expired"]) == 1 and rep["tombstone"]
    vacuum_table(path, grace_s=0.0)
    t = EncodedTable(path)
    assert [s["snapshot_id"] for s in t.history()] == [1, 2]
    fr = fsck_table(path)
    assert fr["ok"] and not fr["orphan_snapshots"], fr
    post = _agg(read_decoded(spark, path), 2)
    out = spark.createDataFrame(pre_rows, pre_schema) \
        .unionByName(post).orderBy("snapshot_id")
    out = out.cache()
    out.count()
    return out


def q_rollback_restore(spark, sf_dir):
    """Snapshot rollback (manifest.rollback_table, Iceberg's rollback,
    revert-flavoured): write -> equality-delete -> roll back to the
    pre-delete snapshot as a NEW commit that copies the target's
    parts/meta verbatim.  CURRENT must equal DuckDB's full aggregate
    (the delete undone), while the rolled-past deleted state stays
    time-travelable and must equal DuckDB's filtered aggregate.
    Asserted along the way: history keeps all three commits, the
    rollback commit records its provenance, and no data file was
    rewritten (the restored snapshot references snapshot 0's files)."""
    import tempfile

    from parquet_spark.manifest import (EncodedTable, delete_rows,
                                        read_decoded, rollback_table,
                                        write_encoded)
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    path = tempfile.mkdtemp(prefix="entry_rollback_") + "/t"
    write_encoded(d, path, key=["doc_id"], n_parts=4, rows_per_chunk=50)
    doomed = [i for i in range(400) if i % 7 == 2]
    delete_rows(spark, path, [("doc_id", "in", doomed)])     # snap 1
    snap = rollback_table(path, snapshot_id=0)               # snap 2
    assert snap["meta"]["rollback_of"]["snapshot_id"] == 0
    t = EncodedTable(path)
    assert [s["snapshot_id"] for s in t.history()] == [0, 1, 2]
    assert t.data_files(snap) == t.data_files(t.snapshot_at(0))

    def _agg(dec, state):
        return dec.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").alias("sum_ids"),
            F.count_distinct(F.md5("text")).alias("n_texts"),
            F.sum("n_chars").alias("sum_chars")) \
            .withColumn("state", F.lit(state))

    out = _agg(read_decoded(spark, path, snapshot_id=1), "deleted") \
        .unionByName(_agg(read_decoded(spark, path), "restored")) \
        .orderBy("state")
    out = out.cache()
    out.count()
    return out


def q_binpack_compact(spark, sf_dir):
    """Incremental bin-pack compaction (manifest.compact_small_parts,
    the Iceberg rewrite_data_files binpack analog): a skewed hash
    layout (key=lang) yields unequal parts; rewrite only the parts
    below the largest one, carrying the largest by REFERENCE — the
    facet asserts the carried part's manifest entry (file, hash,
    zones) is byte-identical, at least two small parts packed into
    one bin, and the decoded relation still matches DuckDB's per-lang
    aggregate.  This is the maintenance form whose cost is ∝ the
    fragmentation, not the table — the only compaction that survives
    a 100 TB ingest pattern."""
    import tempfile

    from parquet_spark.manifest import (EncodedTable, compact_small_parts,
                                        read_decoded, write_encoded)
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 500)
    path = tempfile.mkdtemp(prefix="entry_binpack_") + "/t"
    write_encoded(d, path, key=["lang"], n_parts=4, rows_per_chunk=50)
    t = EncodedTable(path)
    snap0 = t.current_snapshot()
    sizes = {pid: int(p["bytes_out"]) for pid, p in snap0["parts"].items()}
    big = max(sizes.values())
    snap = compact_small_parts(spark, path, small_bytes=big,
                               target_bytes=1 << 30)
    bp = snap["meta"]["binpack"]
    assert bp["rewrote"] >= 2 and bp["carried"] >= 1 and bp["bins"] == 1, bp
    for pid, p in snap0["parts"].items():
        if int(p["bytes_out"]) == big:
            assert snap["parts"][pid] == p  # carried by reference
    out = read_decoded(spark, path).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("sum_ids"),
        F.count_distinct(F.md5("text")).alias("n_texts"),
        F.sum("n_chars").alias("sum_chars")).orderBy("lang")
    out = out.cache()
    out.count()
    return out


def q_cherry_pick(spark, sf_dir):
    """Selective WAP publish (manifest.cherry_pick_snapshot, Iceberg's
    cherrypick): two audit branches fork from one published state;
    cherry-pick grafts ONE branch's appended parts onto CURRENT by
    reference (driver-only metadata commit, no data moved), leaving
    the other staged.  Output is the published aggregate after each
    pick; DuckDB recomputes both states from the raw rows.  Asserted
    inline: the unpicked branch's rows stay invisible after the first
    pick, the re-pick is an idempotent no-op, and provenance is
    recorded."""
    import tempfile

    from parquet_spark.manifest import (cherry_pick_snapshot,
                                        read_decoded, write_encoded)

    def _agg(dec, state):
        return dec.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("doc_id").alias("sum_ids"),
            F.count_distinct(F.md5("text")).alias("n_texts"),
            F.sum("n_chars").alias("sum_chars")) \
            .withColumn("state", F.lit(state))

    d = _t(spark, sf_dir, "documents")
    base = d.where(F.col("doc_id") < 200)
    br_a = d.where(F.col("doc_id").between(200, 299))
    br_b = d.where(F.col("doc_id").between(300, 419))
    path = tempfile.mkdtemp(prefix="entry_pick_") + "/t"
    write_encoded(base, path, key=["doc_id"], n_parts=2,
                  rows_per_chunk=64)
    write_encoded(br_a, path, key=["doc_id"], n_parts=2, part_offset=2,
                  rows_per_chunk=64, branch="a")
    write_encoded(br_b, path, key=["doc_id"], n_parts=2, part_offset=4,
                  rows_per_chunk=64, branch="b")

    snap = cherry_pick_snapshot(path, ref="b")
    assert snap["meta"]["cherry_picked_from"]["snapshot_id"] == 1
    # idempotent; branch a still staged (counts prove no leak)
    assert cherry_pick_snapshot(path, ref="b")["_snap_name"] == \
        snap["_snap_name"]
    first = _agg(read_decoded(spark, path), "picked_b")
    first_rows, first_schema = first.collect(), first.schema
    assert first_rows[0]["n_rows"] == base.count() + br_b.count()

    cherry_pick_snapshot(path, ref="a")
    out = spark.createDataFrame(first_rows, first_schema) \
        .unionByName(_agg(read_decoded(spark, path), "picked_both")) \
        .orderBy("state")
    out = out.cache()
    out.count()
    return out


def q_rollup_refresh(spark, sf_dir):
    """Incremental materialized rollup (rollup.create_rollup /
    refresh_rollup): materialize a per-lang aggregate at snapshot 0,
    append a second epoch to the SOURCE, refresh — asserted to run in
    incremental mode, i.e. the refresh read only the appended part
    files (read_increment's manifest diff) and merged partials by the
    count/sum/min/max merge algebra.  DuckDB recomputes the group-by
    from scratch over the full slice; any drift in the merge (double
    count, lost group, min/max regression) mismatches.  A second
    refresh is asserted to be a commit-free no-op."""
    import tempfile

    from parquet_spark.manifest import read_decoded, write_encoded
    from parquet_spark.rollup import create_rollup, refresh_rollup
    d = _t(spark, sf_dir, "documents")
    src = tempfile.mkdtemp(prefix="entry_rollup_") + "/src"
    dst = src[:-4] + "/roll"
    write_encoded(d.where(F.col("doc_id") < 300), src,
                  key=["doc_id"], n_parts=3, rows_per_chunk=64)
    create_rollup(spark, src, dst, group_cols=["lang"],
                  aggs={"n_docs": ("count", "*"),
                        "sum_chars": ("sum", "n_chars"),
                        "min_id": ("min", "doc_id"),
                        "max_id": ("max", "doc_id")})
    write_encoded(d.where((F.col("doc_id") >= 300) &
                          (F.col("doc_id") < 450)), src,
                  key=["doc_id"], n_parts=3, part_offset=3,
                  rows_per_chunk=64)
    rep = refresh_rollup(spark, dst)
    assert rep["refreshed"] and rep["mode"] == "incremental", rep
    assert (rep["from"], rep["to"]) == (0, 1), rep
    assert refresh_rollup(spark, dst)["refreshed"] is False
    out = read_decoded(spark, dst).orderBy("lang")
    out = out.cache()
    out.count()
    return out


def q_token_budget(spark, sf_dir):
    """Budget-truncated quality selection
    (sampling.select_token_budget, the FineWeb/Dolma curation cut):
    keep documents by (score DESC, id ASC) until the token budget
    fills — EXACTLY, but with no global sort: the score axis narrows
    by multi-pass histogram (boundary_cap=16 forces the narrowing to
    actually run at this SF) and only the boundary set is windowed.
    Score = n_chars (integer, bit-portable); DuckDB replays the
    selection as a window cumulative sum, so any drift in the
    above-set/boundary split, the keep rule (cum-before < budget), or
    tie handling mismatches.  Output: selection aggregate + per-lang
    counts of the kept set."""
    from parquet_spark.textops.sampling import select_token_budget
    d = _t(spark, sf_dir, "documents")
    sel, rep = select_token_budget(d, "n_chars", "n_chars", 44444,
                                   id_col="doc_id", boundary_cap=16)
    assert not rep["selected_all"] and rep["passes"] >= 2, rep
    assert rep["selected_tokens"] >= 44444, rep
    out = (sel.groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_kept"),
                F.sum("n_chars").alias("sum_tokens"),
                F.sum("doc_id").alias("sum_ids"),
                F.count_distinct(F.md5("text")).alias("n_texts"))
           .orderBy("lang"))
    out = out.cache()
    out.count()
    return out


def q_table_diff(spark, sf_dir):
    """Key-level reconciliation (verify.diff_tables): encode table A
    (doc_id<400) and a mutated copy B (rows removed where
    doc_id%97=5, n_chars negated where doc_id%89=7, rows 400..409
    added), then diff — one row per differing key with
    added/removed/changed and per-side counts, computed from per-key
    multiset digests so the join shuffles 32 bytes per key, never
    documents.  DuckDB reconstructs the classification directly from
    the mutation rules; any digest false-negative/positive, missed
    multiplicity, or join-side confusion mismatches.  Asserted inline:
    a table diffed against itself is empty."""
    import tempfile

    from parquet_spark.manifest import write_encoded
    from parquet_spark.verify import diff_tables
    d = _t(spark, sf_dir, "documents")
    a = d.where(F.col("doc_id") < 400)
    b = (a.where(F.col("doc_id") % 97 != 5)
         .withColumn("n_chars",
                     F.when(F.col("doc_id") % 89 == 7, -F.col("n_chars"))
                     .otherwise(F.col("n_chars")))
         .unionByName(d.where(F.col("doc_id").between(400, 409))))
    root = tempfile.mkdtemp(prefix="entry_diff_")
    write_encoded(a, root + "/a", key=["doc_id"], n_parts=3,
                  rows_per_chunk=64)
    write_encoded(b, root + "/b", key=["doc_id"], n_parts=3,
                  rows_per_chunk=64)
    assert diff_tables(spark, root + "/a", root + "/a",
                       key=["doc_id"]).count() == 0
    out = (diff_tables(spark, root + "/a", root + "/b", key=["doc_id"])
           .orderBy("doc_id"))
    out = out.cache()
    out.count()
    return out


def q_group_topk(spark, sf_dir):
    """Per-group exemplar selection (sampling.top_k_by_group): the 3
    highest-n_chars documents per lang, ties by doc_id ASC — the
    deterministic 'k best per domain' curation cut.  Catalyst rewrites
    the rank filter into WindowGroupLimit (bounded per-task heap both
    sides of the shuffle — asserted on the physical plan inline), so
    no task ever materializes a whole group.  DuckDB replays the same
    ROW_NUMBER window."""
    from parquet_spark.textops.sampling import top_k_by_group
    d = _t(spark, sf_dir, "documents")
    out = top_k_by_group(d, ["lang"], "n_chars", 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:1500]
    out = (out.select("lang", "doc_id", "n_chars",
                      F.md5("text").alias("text_md5"))
           .orderBy("lang", "doc_id"))
    out = out.cache()
    out.count()
    return out


def q_parquet_export(spark, sf_dir):
    """Plain-parquet interop export (manifest.export_parquet): encode
    documents (global-dict lang, two equality-deleted rows), export
    the pinned CURRENT snapshot hive-partitioned by lang, then compute
    the output aggregate FROM THE EXPORTED FILES via stock
    spark.read.parquet — no engine code on the read side.  DuckDB
    computes the same aggregate from the raw table minus the deleted
    rows; a mismatch means the export leaked deleted rows, dropped
    dict restoration, or tore the snapshot."""
    import tempfile

    from parquet_spark.manifest import (delete_rows, export_parquet,
                                        write_encoded)
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 400)
    root = tempfile.mkdtemp(prefix="entry_export_")
    path = root + "/t"
    write_encoded(d, path, key=["doc_id"], n_parts=3,
                  rows_per_chunk=64, global_dict_cols=["lang"])
    delete_rows(spark, path, [("doc_id", "in", [13, 77, 250])])
    rep = export_parquet(spark, path, root + "/exp",
                         partition_by=["lang"])
    assert rep["snapshot_id"] == 1 and rep["files"] >= 1
    out = (spark.read.parquet(root + "/exp")
           .groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum("doc_id").alias("sum_ids"),
                F.sum("n_chars").alias("sum_chars"),
                F.count_distinct(F.md5("text")).alias("n_texts"))
           .orderBy("lang"))
    out = out.cache()
    out.count()
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Facet order is deliberate: the driver's correctness gate checks
    roughly the FIRST 50 entries per round, so the queue is priority-
    ordered for round 5 —

      0. facets NEW in session 5, never driver-checked (datasource_read,
         datasource_write, datasource_stream, lm_fluency, dup_spans,
         dup_span_removal, html_extract, url_parse, sum_pushdown,
         cdc_changelog, head_pushdown, gopher_rules, mojibake_fix,
         alter_widen, png_features, auto_tuned_write);
      1. facets whose ORACLE MEASURE changed this session and therefore
         need a fresh driver row: gap_fill (r04 hash FAIL — the
         ROUND-at-representation-tie measure was replaced by the
         bit-portable FLOOR quantization, see
         tests/test_oracle_portability.py) and explode_pad (same
         tie-free rewrite applied preemptively);
      2. the highest-value members of the r03-checked pool — their
         latest driver row is two rounds old, so re-checking them keeps
         the staleness invariant (`no facet's latest row older than two
         rounds`) for everything except the multi-round-green facets
         (embedding_near_dups, embedding_near_dups_lsh, ivf_clusters,
         sessionize, pipeline_curation, streaming_window_stats,
         salted_counts_source, zone_prune, chunk_partition_stats,
         token_counts, rolling_fp, fingerprint, dict_gate,
         run_length_lang, for_bitpack_width, merge_union_nullfill,
         scalar_broadcast) that don't fit in the 50-slot budget; those
         are small facets green in r01-r03 with untouched code — the
         safest possible residue (zone_prune's machinery is re-covered
         inside the budget by zone_prune_ts/zone_prune_multi);
      3. the r04-green band (checked last round, code unchanged) at the
         back, followed by the five-facet micro residue.

    Invariant (scripts/check_budget.py): zero never-checked facets past
    slot 50, and the union of consecutive rounds covers all facets.
    """
    return {
        # -- band 0: new in session 5, never checked --------------------
        "datasource_read": q_datasource_read,
        "datasource_write": q_datasource_write,
        "datasource_stream": q_datasource_stream,
        "lm_fluency": q_lm_fluency,
        "dup_spans": q_dup_spans,
        "dup_span_removal": q_dup_span_removal,
        "html_extract": q_html_extract,
        "url_parse": q_url_parse,
        "sum_pushdown": q_sum_pushdown,
        "cdc_changelog": q_cdc_changelog,
        "head_pushdown": q_head_pushdown,
        "gopher_rules": q_gopher_rules,
        "mojibake_fix": q_mojibake_fix,
        "alter_widen": q_alter_widen,
        "png_features": q_png_features,
        "auto_tuned_write": q_auto_tuned_write,
        "semdedup": q_semdedup,
        "bpe_train": q_bpe_train,
        "dsir_select": q_dsir_select,
        "expire_vacuum": q_expire_vacuum,
        "rollback_restore": q_rollback_restore,
        "binpack_compact": q_binpack_compact,
        "cherry_pick": q_cherry_pick,
        "rollup_refresh": q_rollup_refresh,
        "token_budget": q_token_budget,
        "table_diff": q_table_diff,
        "group_topk": q_group_topk,
        "parquet_export": q_parquet_export,
        # -- band 1: oracle measure changed in session 5 ----------------
        "gap_fill": q_gap_fill,
        "explode_pad": q_explode_pad,
        # -- band 2: r03-checked pool due for re-check (staleness) ------
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "time_rollup": q_time_rollup,
        "in_prune": q_in_prune,
        "dict_pruned_scan": q_dict_pruned_scan,
        "global_dict_lang": q_global_dict_lang,
        "dedup_components": q_dedup_components,
        "cosine_topk": q_cosine_topk,
        "ann_buckets": q_ann_buckets,
        "ivf_topk": q_ivf_topk,
        "ivf_recall": q_ivf_recall,
        "pq_topk": q_pq_topk,
        "pq_recall": q_pq_recall,
        "schema_evolution": q_schema_evolution,
        "zone_prune_ts": q_zone_prune_ts,
        "zone_prune_multi": q_zone_prune_multi,
        "route_partitioned": q_route_partitioned,
        "split_assign": q_split_assign,
        "stratified_sample": q_stratified_sample,
        "domain_stats": q_domain_stats,
        "lang_id": q_lang_id,
        "quality_filter": q_quality_filter,
        "quality_by_source": q_quality_by_source,
        "top_vocabulary": q_top_vocabulary,
        "repetition_stats": q_repetition_stats,
        "frame_sample": q_frame_sample,
        "media_metadata": q_media_metadata,
        "exact_dedup": q_exact_dedup,
        "simhash": q_simhash,
        "minhash_signatures": q_minhash_signatures,
        "lsh_pairs": q_lsh_pairs,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_near_dups": q_embedding_near_dups,
        "embedding_near_dups_lsh": q_embedding_near_dups_lsh,
        "ivf_clusters": q_ivf_clusters,
        "sessionize": q_sessionize,
        "pipeline_curation": q_pipeline_curation,
        "streaming_window_stats": q_streaming_window_stats,
        "salted_counts_source": q_salted_counts_source,
        # -- band 3: green in r04, code unchanged (re-check pool for a
        # hypothetical r06) ---------------------------------------------
        "exact_quantiles": q_exact_quantiles,
        "heavy_hitters": q_heavy_hitters,
        "analyze_stats": q_analyze_stats,
        "analyze_incremental": q_analyze_incremental,
        "warc_roundtrip": q_warc_roundtrip,
        "hierarchy_rows": q_hierarchy_rows,
        "codec_selection": q_codec_selection,
        "media_features": q_media_features,
        "audio_features": q_audio_features,
        "route_encoded": q_route_encoded,
        "splits_lineage": q_splits_lineage,
        "roundtrip_documents": q_roundtrip_documents,
        "global_dict_roundtrip": q_global_dict_roundtrip,
        "relocate_range": q_relocate_range,
        "compact_rechunk": q_compact_rechunk,
        "checkpoint_resume": q_checkpoint_resume,
        "corpus_encode": q_corpus_encode,
        "streaming_dedup": q_streaming_dedup,
        "bss_roundtrip": q_bss_roundtrip,
        "alp_roundtrip": q_alp_roundtrip,
        "prefix_roundtrip": q_prefix_roundtrip,
        "incremental_read": q_incremental_read,
        "meta_agg": q_meta_agg,
        "zorder_prune": q_zorder_prune,
        "struct_roundtrip": q_struct_roundtrip,
        "range_file_prune": q_range_file_prune,
        "decontamination": q_decontamination,
        "pii_scrub": q_pii_scrub,
        "pack_sequences": q_pack_sequences,
        "time_travel": q_time_travel,
        "zone_prune_dbl": q_zone_prune_dbl,
        "bloom_prune": q_bloom_prune,
        "null_prune": q_null_prune,
        "row_deletes": q_row_deletes,
        "upsert": q_upsert,
        "recluster_scan": q_recluster_scan,
        "ref_pinned_read": q_ref_pinned_read,
        "gap_fill_interp": q_gap_fill_interp,
        "kmv_ndv": q_kmv_ndv,
        "alter_columns": q_alter_columns,
        "wap_publish": q_wap_publish,
        "count_pushdown": q_count_pushdown,
        "minmax_pushdown": q_minmax_pushdown,
        "domain_mixture": q_domain_mixture,
        "domain_mixture_tokens": q_domain_mixture_tokens,
        "line_dedup": q_line_dedup,
        "token_search": q_token_search,
        "token_rank": q_token_rank,
        "like_prune": q_like_prune,
        # -- tail: multi-round green micro-facets (r01/r02/r03 green,
        # untouched one-expression facets — the safe staleness residue) --
        "zone_prune": q_zone_prune,
        "chunk_partition_stats": q_chunk_partition_stats,
        "token_counts": q_token_counts,
        "rolling_fp": q_rolling_fp,
        "fingerprint": q_fingerprint,
        "dict_gate": q_dict_gate,
        "run_length_lang": q_run_length_lang,
        "for_bitpack_width": q_for_bitpack_width,
        "merge_union_nullfill": q_merge_union_nullfill,
        "scalar_broadcast": q_scalar_broadcast,
    }


def _minhash_sql(pred: str, n_hashes: int = 4) -> str:
    mins = ", ".join(
        f"MIN(md5('{j}' || sh)) AS h{j}" for j in range(n_hashes))
    return f"""
        SELECT doc_id, {mins}
        FROM (SELECT DISTINCT doc_id, unnest({SHINGLE_DUCK}) AS sh
              FROM documents WHERE {pred}) t
        GROUP BY doc_id"""


def _simhash_sql(pred: str, n_bits: int = 16) -> str:
    votes = ", ".join(
        f"SUM((((strpos('0123456789abcdef', substr(md5(tok), {i // 4 + 1}, 1)) - 1)"
        f" >> {3 - i % 4}) & 1) * 2 - 1) AS v{i}" for i in range(n_bits))
    sig = " + ".join(
        f"CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(n_bits))
    return f"""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                     FROM documents WHERE {pred}),
        v AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id)
        SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM v ORDER BY doc_id"""


def _planes_sql(n_planes: int = 4, seed: int = 42, dim: int = 64) -> list[str]:
    from parquet_spark.textops.similarity import hyperplanes
    return ["[" + ", ".join(f"CAST({v} AS DOUBLE)" for v in p) + "]"
            for p in hyperplanes(dim, n_planes, seed)]


def oracle_sql() -> dict[str, str]:
    planes = _planes_sql()
    bucket_expr = " + ".join(
        f"(CASE WHEN list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), {p}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))
    bucket_v = " + ".join(
        f"(CASE WHEN list_dot_product(v, {p}) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes))
    lang_scores = " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS cand, len(list_filter(string_split(text, ' '), "
        f"w -> w IN ({', '.join(repr(s) for s in sw)}))) AS hits FROM documents"
        for lang, sw in _LANGS.items())
    from parquet_spark.textops.curation import PII_PATTERNS
    pii_email, pii_ipv4, pii_ssn = (PII_PATTERNS["email"],
                                    PII_PATTERNS["ipv4"],
                                    PII_PATTERNS["ssn"])
    return {
        "bss_roundtrip": """
            SELECT vec_id,
                   CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
                       AS pos,
                   unnest(embedding) AS val
            FROM embeddings WHERE vec_id < 40 ORDER BY vec_id, pos""",
        "alp_roundtrip": """
            SELECT l_orderkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax
            FROM lineitem WHERE l_orderkey < 600
            ORDER BY l_orderkey, l_linenumber""",
        "prefix_roundtrip": """
            SELECT 'https://host' || CAST(doc_id % 50 AS VARCHAR)
                       || '.example.com/' || md5(CAST(doc_id AS VARCHAR))
                       AS url,
                   doc_id
            FROM documents WHERE doc_id < 800 ORDER BY doc_id""",
        "struct_roundtrip": """
            SELECT event_id, event_type, value, user_id
            FROM events WHERE event_id < 3000 ORDER BY event_id""",
        "ref_pinned_read": """
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts,
                   'tag_v1' AS which
            FROM documents WHERE doc_id < 250
            UNION ALL
            SELECT COUNT(*), CAST(SUM(doc_id) AS BIGINT),
                   COUNT(DISTINCT md5(text)), 'current'
            FROM documents WHERE doc_id < 400
            ORDER BY which""",
        "recluster_scan": """
            WITH live AS (SELECT * FROM documents
                          WHERE doc_id NOT BETWEEN 120 AND 139)
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(DISTINCT md5(text)) AS n_texts,
                   (SELECT COUNT(*) FROM live) AS n_live_total
            FROM live WHERE doc_id BETWEEN 100 AND 220""",
        "range_file_prune": """
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM documents WHERE doc_id BETWEEN 100 AND 160""",
        "zorder_prune": """
            WITH b AS (SELECT min(user_id) AS u0, max(user_id) AS u1,
                              min(ts) AS t0,
                              epoch_us(max(ts)) - epoch_us(min(ts)) AS span
                       FROM events),
                 bounds AS (SELECT u0 + (u1 - u0) * 2 // 10 AS ulo,
                                   u0 + (u1 - u0) * 4 // 10 AS uhi,
                                   t0 + to_microseconds(span * 2 // 10)
                                       AS tlo,
                                   t0 + to_microseconds(span * 4 // 10)
                                       AS thi
                            FROM b)
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(user_id) AS BIGINT) AS sum_users,
                   COUNT(DISTINCT event_id) AS n_events,
                   MIN(epoch_us(ts)) AS min_us,
                   MAX(epoch_us(ts)) AS max_us
            FROM events, bounds
            WHERE user_id BETWEEN ulo AND uhi AND ts BETWEEN tlo AND thi""",
        "incremental_read": """
            SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5
            FROM documents WHERE doc_id >= 300 AND doc_id < 450
            ORDER BY doc_id""",
        "meta_agg": """
            WITH s AS (SELECT * FROM lineitem WHERE l_orderkey < 2000),
                 t AS (SELECT COUNT(*) AS n FROM s)
            SELECT * FROM (
              SELECT 'l_extendedprice' AS "column",
                     (SELECT n FROM t) AS covered_rows,
                     CAST(0 AS BIGINT) AS n_nulls,
                     CAST(NULL AS BIGINT) AS min_num,
                     CAST(NULL AS BIGINT) AS max_num,
                     CAST(MIN(l_extendedprice) AS DOUBLE) AS min_dbl,
                     CAST(MAX(l_extendedprice) AS DOUBLE) AS max_dbl,
                     (SELECT n FROM t) AS table_rows
              FROM s
              UNION ALL
              SELECT 'l_orderkey', (SELECT n FROM t),
                     CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0
                              END) AS BIGINT),
                     CAST(MIN(l_orderkey) AS BIGINT),
                     CAST(MAX(l_orderkey) AS BIGINT),
                     CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                     (SELECT n FROM t)
              FROM s
              UNION ALL
              SELECT 'l_quantity', (SELECT n FROM t), CAST(0 AS BIGINT),
                     CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
                     CAST(MIN(l_quantity) AS DOUBLE),
                     CAST(MAX(l_quantity) AS DOUBLE),
                     (SELECT n FROM t)
              FROM s
              UNION ALL
              SELECT 'l_shipdate', (SELECT n FROM t), CAST(0 AS BIGINT),
                     epoch_us(MIN(l_shipdate)), epoch_us(MAX(l_shipdate)),
                     CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                     (SELECT n FROM t)
              FROM s)
            ORDER BY "column" """,
        "decontamination": """
            WITH dw AS (SELECT doc_id, string_split(text, ' ') AS ws
                        FROM documents),
                 pos AS (SELECT doc_id, ws,
                                generate_subscripts(ws, 1) AS i FROM dw),
                 bg AS (SELECT DISTINCT array_to_string(ws[i:i+1], ' ')
                            AS gram
                        FROM pos WHERE doc_id % 97 = 0 AND i < len(ws)),
                 cg AS (SELECT doc_id,
                               array_to_string(ws[i:i+1], ' ') AS gram
                        FROM pos WHERE doc_id % 97 <> 0 AND i < len(ws)),
                 hits AS (SELECT cg.doc_id,
                                 COUNT(DISTINCT cg.gram) AS bad
                          FROM cg JOIN bg USING (gram) GROUP BY cg.doc_id),
                 ann AS (SELECT d.doc_id,
                                COALESCE(h.bad, 0) AS bad_grams
                         FROM documents d LEFT JOIN hits h USING (doc_id)
                         WHERE d.doc_id % 97 <> 0)
            SELECT bad_grams, COUNT(*) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM ann GROUP BY bad_grams ORDER BY bad_grams""",
        "pii_scrub": f"""
            WITH s AS (SELECT doc_id,
                         text || ' contact u' || CAST(doc_id AS VARCHAR)
                              || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                              || '.org from 10.0.'
                              || CAST(doc_id % 256 AS VARCHAR) || '.9'
                              || CASE WHEN doc_id % 3 = 0
                                 THEN ' ssn 123-45-' ||
                                      lpad(CAST(doc_id % 10000 AS VARCHAR),
                                           4, '0')
                                 ELSE '' END AS text
                       FROM documents WHERE doc_id < 400),
                 r AS (SELECT doc_id,
                         len(regexp_extract_all(text, '{pii_email}'))
                             AS n_email,
                         len(regexp_extract_all(text, '{pii_ipv4}'))
                             AS n_ipv4,
                         len(regexp_extract_all(text, '{pii_ssn}'))
                             AS n_ssn,
                         regexp_replace(regexp_replace(regexp_replace(text,
                             '{pii_email}', '<email>', 'g'),
                             '{pii_ipv4}', '<ipv4>', 'g'),
                             '{pii_ssn}', '<ssn>', 'g') AS clean
                       FROM s)
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(n_email) AS BIGINT) AS sum_email,
                   CAST(SUM(n_ipv4) AS BIGINT) AS sum_ipv4,
                   CAST(SUM(n_ssn) AS BIGINT) AS sum_ssn,
                   COUNT(DISTINCT md5(clean)) AS n_clean_texts,
                   CAST(SUM(length(clean)) AS BIGINT) AS clean_chars
            FROM r""",
        "upsert": """
            WITH base AS (SELECT * FROM documents WHERE doc_id < 400),
                 merged AS (
                   SELECT doc_id,
                          CASE WHEN doc_id % 20 = 1 THEN 'u:' || text
                               ELSE text END AS text,
                          n_chars
                   FROM base
                   UNION ALL
                   SELECT doc_id + 10000, text, n_chars
                   FROM base WHERE doc_id < 10)
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM merged""",
        "row_deletes": """
            WITH a AS (SELECT COUNT(*) AS n_rows,
                              CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                              COUNT(DISTINCT md5(text)) AS n_texts,
                              CAST(SUM(n_chars) AS BIGINT) AS sum_chars
                       FROM documents
                       WHERE doc_id < 500 AND doc_id % 10 <> 3)
            SELECT n_rows, sum_ids, n_texts, sum_chars, s AS state
            FROM a, (VALUES ('mor'), ('rewritten')) t(s) ORDER BY state""",
        "null_prune": """
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM documents WHERE doc_id % 7 = 0""",
        "bloom_prune": """
            WITH p AS (SELECT DISTINCT text FROM documents
                       WHERE doc_id IN (3, 77, 450))
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents WHERE text IN (SELECT text FROM p)""",
        "zone_prune_dbl": """
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(event_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT event_type) AS n_types,
                   MIN(value) AS min_v, MAX(value) AS max_v
            FROM events WHERE value BETWEEN 10.0 AND 60.0""",
        "expire_vacuum": """
            WITH a AS (SELECT COUNT(*) AS n_rows,
                              CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                              COUNT(DISTINCT md5(text)) AS n_texts,
                              CAST(SUM(doc_id) AS BIGINT) AS sum_ids
                       FROM documents WHERE doc_id < 300)
            SELECT n_rows, sum_chars, n_texts, sum_ids,
                   CAST(s AS BIGINT) AS snapshot_id
            FROM a, (VALUES (1), (2)) t(s) ORDER BY snapshot_id""",
        "parquet_export": """
            SELECT lang, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM documents
            WHERE doc_id < 400 AND doc_id NOT IN (13, 77, 250)
            GROUP BY lang ORDER BY lang""",
        "group_topk": """
            WITH ranked AS (
              SELECT lang, doc_id, n_chars, md5(text) AS text_md5,
                     ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id ASC) AS rk
              FROM documents)
            SELECT lang, doc_id, n_chars, text_md5
            FROM ranked WHERE rk <= 3 ORDER BY lang, doc_id""",
        "table_diff": """
            WITH rem AS (SELECT doc_id FROM documents
                         WHERE doc_id < 400 AND doc_id % 97 = 5),
            chg AS (SELECT doc_id FROM documents
                    WHERE doc_id < 400 AND doc_id % 89 = 7
                      AND doc_id % 97 <> 5),
            added AS (SELECT doc_id FROM documents
                      WHERE doc_id BETWEEN 400 AND 409)
            SELECT doc_id, 'removed' AS _diff,
                   CAST(1 AS BIGINT) AS n_rows_a,
                   CAST(NULL AS BIGINT) AS n_rows_b FROM rem
            UNION ALL
            SELECT doc_id, 'changed', 1, 1 FROM chg
            UNION ALL
            SELECT doc_id, 'added', CAST(NULL AS BIGINT), 1 FROM added
            ORDER BY doc_id""",
        "token_budget": """
            WITH ranked AS (
              SELECT doc_id, lang, text, n_chars,
                     SUM(n_chars) OVER (
                       ORDER BY n_chars DESC, doc_id ASC
                       ROWS UNBOUNDED PRECEDING) AS cum
              FROM documents)
            SELECT lang, COUNT(*) AS n_kept,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_tokens,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM ranked WHERE cum - n_chars < 44444
            GROUP BY lang ORDER BY lang""",
        "rollup_refresh": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
            FROM documents WHERE doc_id < 450
            GROUP BY lang ORDER BY lang""",
        "cherry_pick": """
            WITH s AS (
              SELECT 'picked_b' AS state FROM (VALUES (1))
              UNION ALL
              SELECT 'picked_both' FROM (VALUES (1)))
            SELECT COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   state
            FROM documents, s
            WHERE doc_id < 200
               OR (doc_id BETWEEN 300 AND 419)
               OR (state = 'picked_both' AND doc_id BETWEEN 200 AND 299)
            GROUP BY state ORDER BY state""",
        "binpack_compact": """
            SELECT lang, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents WHERE doc_id < 500
            GROUP BY lang ORDER BY lang""",
        "rollback_restore": """
            WITH base AS (SELECT * FROM documents WHERE doc_id < 400),
            d AS (SELECT COUNT(*) AS n_rows,
                         CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                         COUNT(DISTINCT md5(text)) AS n_texts,
                         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                         'deleted' AS state
                  FROM base WHERE doc_id % 7 <> 2),
            r AS (SELECT COUNT(*) AS n_rows,
                         CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                         COUNT(DISTINCT md5(text)) AS n_texts,
                         CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                         'restored' AS state
                  FROM base)
            SELECT * FROM d UNION ALL SELECT * FROM r ORDER BY state""",
        "time_travel": """
            WITH a AS (SELECT COUNT(*) AS n_rows,
                              CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                              COUNT(DISTINCT md5(text)) AS n_texts,
                              CAST(SUM(doc_id) AS BIGINT) AS sum_ids
                       FROM documents WHERE doc_id < 300)
            SELECT n_rows, sum_chars, n_texts, sum_ids,
                   CAST(s AS BIGINT) AS snapshot_id
            FROM a, (VALUES (0), (1)) t(s) ORDER BY snapshot_id""",
        "pack_sequences": """
            WITH t AS (SELECT doc_id,
                              md5('42:' || CAST(doc_id AS VARCHAR)) AS h,
                              CAST(len(string_split(text, ' ')) AS BIGINT)
                                  AS tok
                       FROM documents),
                 p AS (SELECT doc_id, substr(h, 1, 1) AS shard, tok,
                              SUM(tok) OVER (PARTITION BY substr(h, 1, 1)
                                             ORDER BY h
                                             ROWS UNBOUNDED PRECEDING)
                              - tok AS strt
                       FROM t)
            SELECT shard, COUNT(*) AS n_docs,
                   MAX(CAST(floor(strt / 256.0) AS BIGINT)) AS max_seq,
                   CAST(SUM(tok) AS BIGINT) AS sum_tokens,
                   CAST(SUM(CAST(floor(strt / 256.0) AS BIGINT) * doc_id)
                        AS BIGINT) AS assign_chk,
                   CAST(SUM(strt % 256) AS BIGINT) AS sum_off
            FROM p GROUP BY shard ORDER BY shard""",
        "dict_gate": """
            SELECT * FROM (
              SELECT 'lang' AS col_name, COUNT(DISTINCT lang) AS n_distinct,
                     COUNT(*) AS n_rows,
                     ROUND(COUNT(DISTINCT lang) * 1.0 / COUNT(*), 6) AS distinct_ratio,
                     COUNT(DISTINCT lang) * 1.0 / COUNT(*) <= 0.8 AS dict_eligible
              FROM documents
              UNION ALL
              SELECT 'source', COUNT(DISTINCT source), COUNT(*),
                     ROUND(COUNT(DISTINCT source) * 1.0 / COUNT(*), 6),
                     COUNT(DISTINCT source) * 1.0 / COUNT(*) <= 0.8
              FROM documents) ORDER BY col_name""",
        "run_length_lang": """
            WITH o AS (SELECT CAST(FLOOR(doc_id / 1000) AS BIGINT) AS chunk, lang,
                              lag(lang) OVER (PARTITION BY CAST(FLOOR(doc_id / 1000) AS BIGINT)
                                              ORDER BY doc_id) AS prev
                       FROM documents)
            SELECT chunk, COUNT(*) AS n_rows,
                   CAST(SUM(CASE WHEN prev IS DISTINCT FROM lang THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_runs,
                   ROUND(COUNT(*) * 1.0 / SUM(CASE WHEN prev IS DISTINCT FROM lang
                                              THEN 1 ELSE 0 END), 4) AS mean_run_len
            FROM o GROUP BY chunk ORDER BY chunk""",
        "for_bitpack_width": """
            WITH c AS (SELECT CAST(FLOOR(event_id / 250) AS BIGINT) AS chunk,
                              epoch_us(ts) AS us FROM events)
            SELECT chunk, MIN(us) AS min_us, MAX(us) AS max_us,
                   CAST(CASE WHEN MAX(us) = MIN(us) THEN 0
                        ELSE FLOOR(LOG2(MAX(us) - MIN(us))) + 1 END AS BIGINT) AS bit_width
            FROM c GROUP BY chunk ORDER BY chunk""",
        "merge_union_nullfill": """
            WITH u AS (
              SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority FROM orders
              UNION ALL
              SELECT o_orderkey, NULL, o_orderpriority FROM orders)
            SELECT COUNT(*) AS n_rows, COUNT(o_totalprice) AS n_price,
                   COUNT(o_orderpriority) AS n_priority FROM u""",
        "explode_pad": """
            WITH ex AS (SELECT vec_id,
                               generate_subscripts(embedding, 1) - 1 AS pos,
                               unnest(embedding) AS val FROM embeddings)
            SELECT COUNT(*) AS n_cells, CAST(SUM(pos) AS BIGINT) AS sum_pos,
                   CAST(SUM(CAST(FLOOR(CAST(val AS DOUBLE) * 1000)
                        AS BIGINT)) AS BIGINT) AS sum_val
            FROM ex""",
        "scalar_broadcast": """
            SELECT r.r_name AS region_name, COUNT(*) AS n_nations
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name ORDER BY region_name""",
        "chunk_partition_stats": """
            SELECT doc_id % 8 AS part_id, COUNT(*) AS n_rows,
                   COUNT(DISTINCT lang) AS n_langs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY 1 ORDER BY part_id""",
        "global_dict_lang": """
            WITH d AS (SELECT value, ROW_NUMBER() OVER (ORDER BY value) - 1 AS dict_id
                       FROM (SELECT DISTINCT lang AS value FROM documents
                             WHERE lang IS NOT NULL))
            SELECT CAST(d.dict_id AS INTEGER) AS lang_id, COUNT(*) AS n
            FROM documents t JOIN d ON t.lang = d.value
            GROUP BY d.dict_id ORDER BY lang_id""",
        "salted_counts_source": """
            SELECT source, COUNT(*) AS n FROM documents
            GROUP BY source ORDER BY source""",
        "exact_dedup": """
            WITH g AS (SELECT md5(text) AS digest, MIN(doc_id) AS keeper_id,
                              COUNT(*) AS n_dups FROM documents GROUP BY 1)
            SELECT COUNT(*) AS n_groups, CAST(SUM(n_dups) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN n_dups > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_groups
            FROM g""",
        "minhash_signatures": _minhash_sql("doc_id < 32") + " ORDER BY doc_id",
        "lsh_pairs": f"""
            WITH sig AS ({_minhash_sql("doc_id < 200")}),
            bands AS (
              SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bkey FROM sig
              UNION ALL
              SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig)
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
            WHERE a.doc_id < b.doc_id ORDER BY doc_a, doc_b""",
        "dedup_components": f"""
            WITH RECURSIVE sig AS ({_minhash_sql("doc_id < 200")}),
            bands AS (
              SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bkey FROM sig
              UNION ALL
              SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig),
            pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
              WHERE a.doc_id < b.doc_id),
            sym AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                    UNION SELECT doc_b, doc_a FROM pairs),
            reach(node, r) AS (
              SELECT src, src FROM sym
              UNION
              SELECT w.node, e.dst FROM reach w JOIN sym e ON e.src = w.r)
            SELECT node AS doc_id, MIN(r) AS comp
            FROM reach GROUP BY node ORDER BY doc_id""",
        "ngram_jaccard": f"""
            WITH sig AS ({_minhash_sql("doc_id < 200")}),
            bands AS (
              SELECT doc_id, 0 AS band, md5(h0 || '|' || h1) AS bkey FROM sig
              UNION ALL
              SELECT doc_id, 1, md5(h2 || '|' || h3) FROM sig),
            pairs AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
              WHERE a.doc_id < b.doc_id),
            sh AS (SELECT DISTINCT doc_id AS doc, unnest({SHINGLE_DUCK}) AS sh
                   FROM documents WHERE doc_id < 200),
            sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
            inter AS (
              SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
              FROM pairs p
              JOIN sh a ON a.doc = p.doc_a
              JOIN sh b ON b.doc = p.doc_b AND b.sh = a.sh
              GROUP BY p.doc_a, p.doc_b),
            j AS (SELECT i.doc_a, i.doc_b,
                         ROUND(i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter), 4) AS jaccard
                  FROM inter i
                  JOIN sizes sa ON sa.doc = i.doc_a
                  JOIN sizes sb ON sb.doc = i.doc_b)
            SELECT COUNT(*) AS n_pairs,
                   CAST(SUM(CAST(jaccard AS DECIMAL(10,4))) AS DOUBLE) AS sum_jaccard,
                   CAST(SUM(CASE WHEN jaccard >= 0.8 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_near_dups
            FROM j""",
        "embedding_near_dups": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings WHERE vec_id < 120),
            p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS av, b.v AS bv
                  FROM e a JOIN e b ON a.vec_id < b.vec_id),
            s AS (SELECT id_a, id_b,
                         ROUND(
                           list_reduce(list_prepend(CAST(0 AS DOUBLE),
                               list_transform(range(1, len(av) + 1),
                                              i -> av[i] * bv[i])),
                               (x, y) -> x + y)
                           / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list_transform(range(1, len(av) + 1),
                                                 i -> av[i] * av[i])),
                                  (x, y) -> x + y))
                              * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list_transform(range(1, len(bv) + 1),
                                                 i -> bv[i] * bv[i])),
                                  (x, y) -> x + y))), 4) AS cos
                  FROM p)
            SELECT id_a, id_b, cos FROM s WHERE cos >= 0.32
            ORDER BY id_a, id_b""",
        "embedding_near_dups_lsh": f"""
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings WHERE vec_id < 120),
            b AS (SELECT vec_id, v, CAST({bucket_v} AS INT) AS bucket FROM e),
            p AS (SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                         a.v AS av, b2.v AS bv
                  FROM b a JOIN b b2
                    ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id),
            s AS (SELECT id_a, id_b,
                         ROUND(
                           list_reduce(list_prepend(CAST(0 AS DOUBLE),
                               list_transform(range(1, len(av) + 1),
                                              i -> av[i] * bv[i])),
                               (x, y) -> x + y)
                           / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list_transform(range(1, len(av) + 1),
                                                 i -> av[i] * av[i])),
                                  (x, y) -> x + y))
                              * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list_transform(range(1, len(bv) + 1),
                                                 i -> bv[i] * bv[i])),
                                  (x, y) -> x + y))), 4) AS cos
                  FROM p)
            SELECT id_a, id_b, cos FROM s WHERE cos >= 0.32
            ORDER BY id_a, id_b""",
        "simhash": _simhash_sql("doc_id < 64"),
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS q_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
                       FROM embeddings WHERE vec_id < 3),
            c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
                  FROM embeddings WHERE vec_id >= 3),
            s AS (SELECT q_id, vec_id,
                         ROUND(list_dot_product(qv, cv) /
                               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
                               6) AS cos
                  FROM q, c),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                               ORDER BY cos DESC, vec_id ASC) AS rank
                  FROM s)
            SELECT q_id, vec_id, cos, CAST(rank AS INTEGER) AS rank
            FROM r WHERE rank <= 3
            ORDER BY q_id, rank""",
        "ann_buckets": f"""
            SELECT bucket, COUNT(*) AS n_vecs FROM (
              SELECT CAST({bucket_expr} AS INT) AS bucket FROM embeddings)
            GROUP BY bucket ORDER BY bucket""",
        "token_counts": """
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
                   CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')))
                        AS BIGINT) AS re_tokens
            FROM documents""",
        "quality_by_source": f"""
            WITH per AS (
              SELECT source, len(string_split(text, ' ')) AS n_words,
                     len(list_filter(string_split(text, ' '),
                         w -> w IN ({', '.join(repr(s) for s in STOP_EN)}))) AS stop_hits,
                     length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
                     length(text) AS n_chars
              FROM documents)
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(n_words) AS BIGINT) AS sum_words,
                   CAST(SUM(stop_hits) AS BIGINT) AS sum_stop_hits,
                   CAST(SUM(n_punct) AS BIGINT) AS sum_punct,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   ROUND(SUM(stop_hits) * 1.0 / SUM(n_words), 6) AS stopword_ratio
            FROM per GROUP BY source ORDER BY source""",
        "quality_filter": f"""
            WITH per AS (
              SELECT length(text) AS n_chars,
                     len(string_split(text, ' ')) AS n_words,
                     len(list_filter(string_split(text, ' '),
                         w -> w IN ({', '.join(repr(s) for s in STOP_EN)})))
                         AS stop_hits,
                     length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                         AS n_punct
              FROM documents),
            r AS (SELECT n_words,
                         ROUND((n_chars - n_words + 1) * 1.0 / n_words, 4)
                             AS mean_word_len,
                         ROUND(stop_hits * 1.0 / n_words, 4) AS stopword_ratio,
                         ROUND(n_punct * 1.0 / n_chars, 4) AS punct_ratio
                  FROM per),
            f AS (SELECT n_words,
                         n_words >= 16 AS ok_words,
                         punct_ratio <= 0.1 AS ok_punct,
                         stopword_ratio >= 0.01 AS ok_stopwords,
                         mean_word_len BETWEEN 2.0 AND 12.0 AS ok_word_len
                  FROM r)
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN ok_words THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_ok_words,
                   CAST(SUM(CASE WHEN ok_punct THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_ok_punct,
                   CAST(SUM(CASE WHEN ok_stopwords THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ok_stopwords,
                   CAST(SUM(CASE WHEN ok_word_len THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ok_word_len,
                   CAST(SUM(CASE WHEN ok_words AND ok_punct AND ok_stopwords
                                      AND ok_word_len THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_kept,
                   CAST(SUM(CASE WHEN ok_words AND ok_punct AND ok_stopwords
                                      AND ok_word_len THEN n_words ELSE 0 END)
                        AS BIGINT) AS kept_words
            FROM f""",
        "repetition_stats": """
            WITH per AS (
              SELECT string_split(text, chr(10)) AS lines,
                     string_split(lower(text), ' ') AS words
              FROM documents WHERE doc_id < 500),
            r AS (SELECT
                    ROUND((len(lines) - len(list_distinct(lines))) * 1.0
                          / len(lines), 4) AS dup_line_frac,
                    ROUND(list_max(list_transform(list_distinct(words),
                            w -> len(list_filter(words, x -> x = w)))) * 1.0
                          / len(words), 4) AS top_word_frac,
                    ROUND((len(words) - len(list_distinct(words))) * 1.0
                          / len(words), 4) AS dup_word_frac
                  FROM per)
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(CAST(dup_line_frac AS DECIMAL(12,4))) AS DOUBLE)
                       AS sum_dup_line_frac,
                   CAST(SUM(CAST(top_word_frac AS DECIMAL(12,4))) AS DOUBLE)
                       AS sum_top_word_frac,
                   CAST(SUM(CAST(dup_word_frac AS DECIMAL(12,4))) AS DOUBLE)
                       AS sum_dup_word_frac,
                   CAST(SUM(CASE WHEN top_word_frac > 0.1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_degenerate
            FROM r""",
        "frame_sample": """
            WITH d AS (SELECT doc_id,
                              octet_length(encode(text)) AS L
                       FROM documents WHERE doc_id < 200),
            f AS (SELECT doc_id, unnest(range(0,
                         CAST(ceil(L / 64.0) AS INT))) AS i, L FROM d),
            k AS (SELECT doc_id, i, LEAST(64, L - i * 64) AS fb
                  FROM f WHERE i % 3 = 0)
            SELECT COUNT(*) AS n_frames, COUNT(DISTINCT doc_id) AS n_media,
                   CAST(SUM(fb) AS BIGINT) AS frame_bytes,
                   CAST(SUM(i) AS BIGINT) AS sum_idx
            FROM k""",
        "top_vocabulary": """
            WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS word
                       FROM documents),
            c AS (SELECT word, COUNT(*) AS n FROM w WHERE word <> ''
                  GROUP BY word),
            r AS (SELECT word, n,
                         ROW_NUMBER() OVER (ORDER BY n DESC, word ASC) AS rank
                  FROM c)
            SELECT CAST(rank AS INTEGER) AS rank, word, n
            FROM r WHERE rank <= 50 ORDER BY rank""",
        "lang_id": f"""
            WITH scored AS ({lang_scores}),
            w AS (SELECT doc_id, cand,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY hits DESC, cand DESC) AS rn
                  FROM scored)
            SELECT cand AS lang_guess, COUNT(*) AS n_docs FROM w WHERE rn = 1
            GROUP BY cand ORDER BY lang_guess""",
        "rolling_fp": """
            WITH h AS (SELECT list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                           list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
                         (a, b) -> (a * 31 + b) % 1000000007) AS fp
                       FROM documents)
            SELECT COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_distinct,
                   CAST(SUM(fp) AS BIGINT) AS sum_fp FROM h""",
        "fingerprint": """
            SELECT COUNT(*) AS n_docs,
                   COUNT(DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text),
                         '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')))) AS n_fingerprints
            FROM documents""",
        "media_metadata": """
            SELECT COUNT(*) AS n_media,
                   CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
                   COUNT(DISTINCT text) AS n_unique
            FROM documents""",
        "schema_evolution": """
            SELECT * FROM (VALUES
              ('o_orderkey', 'bigint', ''),
              ('origin', 'string', ''),
              ('price/double', 'double', 'price'),
              ('price/string', 'string', 'price'),
              ('row_id', 'bigint', '')) AS t("column", "type", "logical_name")
            ORDER BY "column" """,
        "splits_lineage": """
            SELECT COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(DISTINCT md5(text)) AS n_texts,
                   COUNT(DISTINCT lang) AS n_langs
            FROM documents""",
        "zone_prune": f"""
            WITH corpus AS ({_CORPUS_SQL})
            SELECT COUNT(*) AS n_rows, COUNT(DISTINCT md5(url)) AS n_urls,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM corpus
            WHERE url >= 'https://host1' AND url <= 'https://host3'""",
        "zone_prune_multi": f"""
            WITH corpus AS ({_CORPUS_SQL})
            SELECT COUNT(*) AS n_rows, COUNT(DISTINCT md5(url)) AS n_urls,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM corpus
            WHERE url >= 'https://host1' AND url <= 'https://host3'
              AND doc_id BETWEEN 100 AND 400""",
        "global_dict_roundtrip": """
            WITH d AS (SELECT value, ROW_NUMBER() OVER (ORDER BY value) - 1
                              AS dict_id
                       FROM (SELECT DISTINCT lang AS value FROM documents
                             WHERE lang IS NOT NULL))
            SELECT CAST(d.dict_id AS INTEGER) AS lang_id, t.lang,
                   COUNT(*) AS n
            FROM documents t JOIN d ON t.lang = d.value
            GROUP BY 1, 2 ORDER BY lang_id""",
        "exact_quantiles": """
            WITH qs AS (SELECT CAST(q AS DOUBLE) AS q FROM (VALUES
                        (0.05), (0.25), (0.5), (0.75), (0.9), (1.0))
                        t(q)),
            si AS (SELECT doc_id AS v,
                          ROW_NUMBER() OVER (ORDER BY doc_id) AS r
                   FROM documents WHERE doc_id IS NOT NULL),
            sc AS (SELECT n_chars AS v,
                          ROW_NUMBER() OVER (ORDER BY n_chars) AS r
                   FROM documents WHERE n_chars IS NOT NULL),
            ni AS (SELECT COUNT(*) AS n FROM si),
            nc AS (SELECT COUNT(*) AS n FROM sc)
            SELECT q,
                   (SELECT v FROM si WHERE r = GREATEST(1,
                        CAST(CEIL(q * ni.n) AS BIGINT))) AS doc_id_q,
                   (SELECT v FROM sc WHERE r = GREATEST(1,
                        CAST(CEIL(q * nc.n) AS BIGINT))) AS n_chars_q
            FROM qs, ni, nc ORDER BY q""",
        "heavy_hitters": """
            WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
                          FROM documents),
            t AS (SELECT tok FROM toks WHERE tok <> ''
                  UNION ALL
                  SELECT 'u' || CAST(doc_id AS VARCHAR) FROM documents),
            c AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok),
            n AS (SELECT COUNT(*) AS n FROM t)
            SELECT tok, cnt FROM c, n WHERE cnt * 40 > n
            ORDER BY tok""",
        "analyze_stats": """
            WITH tot AS (SELECT COUNT(*) AS nr FROM documents)
            SELECT 'doc_id' AS col, COUNT(doc_id) AS n_nonnull,
                   nr - COUNT(doc_id) AS n_nulls,
                   MIN(doc_id) AS min_num, MAX(doc_id) AS max_num,
                   CAST(NULL AS VARCHAR) AS min_str,
                   CAST(NULL AS VARCHAR) AS max_str,
                   CASE WHEN COUNT(DISTINCT doc_id) < 256
                        THEN COUNT(DISTINCT doc_id) END AS ndv,
                   (SELECT v FROM (SELECT doc_id AS v, ROW_NUMBER()
                        OVER (ORDER BY doc_id) AS r FROM documents
                        WHERE doc_id IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.25 *
                        (SELECT COUNT(doc_id) FROM documents))
                        AS BIGINT))) AS q25,
                   (SELECT v FROM (SELECT doc_id AS v, ROW_NUMBER()
                        OVER (ORDER BY doc_id) AS r FROM documents
                        WHERE doc_id IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.5 *
                        (SELECT COUNT(doc_id) FROM documents))
                        AS BIGINT))) AS q50,
                   (SELECT v FROM (SELECT doc_id AS v, ROW_NUMBER()
                        OVER (ORDER BY doc_id) AS r FROM documents
                        WHERE doc_id IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.75 *
                        (SELECT COUNT(doc_id) FROM documents))
                        AS BIGINT))) AS q75,
                   CAST(NULL AS BOOLEAN) AS dict_sugg
            FROM documents, tot GROUP BY nr
            UNION ALL
            SELECT 'n_chars', COUNT(n_chars), nr - COUNT(n_chars),
                   MIN(n_chars), MAX(n_chars), NULL, NULL,
                   CASE WHEN COUNT(DISTINCT n_chars) < 256
                        THEN COUNT(DISTINCT n_chars) END,
                   (SELECT v FROM (SELECT n_chars AS v, ROW_NUMBER()
                        OVER (ORDER BY n_chars) AS r FROM documents
                        WHERE n_chars IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.25 *
                        (SELECT COUNT(n_chars) FROM documents))
                        AS BIGINT))),
                   (SELECT v FROM (SELECT n_chars AS v, ROW_NUMBER()
                        OVER (ORDER BY n_chars) AS r FROM documents
                        WHERE n_chars IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.5 *
                        (SELECT COUNT(n_chars) FROM documents))
                        AS BIGINT))),
                   (SELECT v FROM (SELECT n_chars AS v, ROW_NUMBER()
                        OVER (ORDER BY n_chars) AS r FROM documents
                        WHERE n_chars IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.75 *
                        (SELECT COUNT(n_chars) FROM documents))
                        AS BIGINT))),
                   CAST(NULL AS BOOLEAN)
            FROM documents, tot GROUP BY nr
            UNION ALL
            SELECT 'lang', COUNT(lang), nr - COUNT(lang),
                   NULL, NULL, MIN(lang), MAX(lang),
                   CASE WHEN COUNT(DISTINCT lang) < 256
                        THEN COUNT(DISTINCT lang) END,
                   NULL, NULL, NULL,
                   (COUNT(DISTINCT lang) <= 4096 AND
                    COUNT(DISTINCT lang) <= 0.5 * COUNT(lang))
            FROM documents, tot GROUP BY nr
            UNION ALL
            SELECT 'source', COUNT(source), nr - COUNT(source),
                   NULL, NULL, MIN(source), MAX(source),
                   CASE WHEN COUNT(DISTINCT source) < 256
                        THEN COUNT(DISTINCT source) END,
                   NULL, NULL, NULL,
                   (COUNT(DISTINCT source) <= 4096 AND
                    COUNT(DISTINCT source) <= 0.5 * COUNT(source))
            FROM documents, tot GROUP BY nr
            UNION ALL
            SELECT 'text', COUNT(text), nr - COUNT(text),
                   NULL, NULL, MIN(text), MAX(text),
                   CASE WHEN COUNT(DISTINCT text) < 256
                        THEN COUNT(DISTINCT text) END,
                   NULL, NULL, NULL,
                   (COUNT(DISTINCT text) <= 4096 AND
                    COUNT(DISTINCT text) <= 0.5 * COUNT(text))
            FROM documents, tot GROUP BY nr
            ORDER BY col""",
        "analyze_incremental": """
            WITH tot AS (SELECT COUNT(*) AS nr FROM documents)
            SELECT 'doc_id' AS col, COUNT(doc_id) AS n_nonnull,
                   nr - COUNT(doc_id) AS n_nulls,
                   MIN(doc_id) AS min_num, MAX(doc_id) AS max_num,
                   CAST(NULL AS VARCHAR) AS min_str,
                   CAST(NULL AS VARCHAR) AS max_str,
                   CASE WHEN COUNT(DISTINCT doc_id) < 256
                        THEN COUNT(DISTINCT doc_id) END AS ndv,
                   (SELECT v FROM (SELECT doc_id AS v, ROW_NUMBER()
                        OVER (ORDER BY doc_id) AS r FROM documents
                        WHERE doc_id IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.25 *
                        (SELECT COUNT(doc_id) FROM documents))
                        AS BIGINT))) AS q25,
                   (SELECT v FROM (SELECT doc_id AS v, ROW_NUMBER()
                        OVER (ORDER BY doc_id) AS r FROM documents
                        WHERE doc_id IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.5 *
                        (SELECT COUNT(doc_id) FROM documents))
                        AS BIGINT))) AS q50,
                   (SELECT v FROM (SELECT doc_id AS v, ROW_NUMBER()
                        OVER (ORDER BY doc_id) AS r FROM documents
                        WHERE doc_id IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.75 *
                        (SELECT COUNT(doc_id) FROM documents))
                        AS BIGINT))) AS q75,
                   CAST(NULL AS BOOLEAN) AS dict_sugg
            FROM documents, tot GROUP BY nr
            UNION ALL
            SELECT 'n_chars', COUNT(n_chars), nr - COUNT(n_chars),
                   MIN(n_chars), MAX(n_chars), NULL, NULL,
                   CASE WHEN COUNT(DISTINCT n_chars) < 256
                        THEN COUNT(DISTINCT n_chars) END,
                   (SELECT v FROM (SELECT n_chars AS v, ROW_NUMBER()
                        OVER (ORDER BY n_chars) AS r FROM documents
                        WHERE n_chars IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.25 *
                        (SELECT COUNT(n_chars) FROM documents))
                        AS BIGINT))),
                   (SELECT v FROM (SELECT n_chars AS v, ROW_NUMBER()
                        OVER (ORDER BY n_chars) AS r FROM documents
                        WHERE n_chars IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.5 *
                        (SELECT COUNT(n_chars) FROM documents))
                        AS BIGINT))),
                   (SELECT v FROM (SELECT n_chars AS v, ROW_NUMBER()
                        OVER (ORDER BY n_chars) AS r FROM documents
                        WHERE n_chars IS NOT NULL)
                    WHERE r = GREATEST(1, CAST(CEIL(0.75 *
                        (SELECT COUNT(n_chars) FROM documents))
                        AS BIGINT))),
                   CAST(NULL AS BOOLEAN)
            FROM documents, tot GROUP BY nr
            UNION ALL
            SELECT 'lang', COUNT(lang), nr - COUNT(lang),
                   NULL, NULL, MIN(lang), MAX(lang),
                   CASE WHEN COUNT(DISTINCT lang) < 256
                        THEN COUNT(DISTINCT lang) END,
                   NULL, NULL, NULL,
                   (COUNT(DISTINCT lang) <= 4096 AND
                    COUNT(DISTINCT lang) <= 0.5 * COUNT(lang))
            FROM documents, tot GROUP BY nr
            UNION ALL
            SELECT 'source', COUNT(source), nr - COUNT(source),
                   NULL, NULL, MIN(source), MAX(source),
                   CASE WHEN COUNT(DISTINCT source) < 256
                        THEN COUNT(DISTINCT source) END,
                   NULL, NULL, NULL,
                   (COUNT(DISTINCT source) <= 4096 AND
                    COUNT(DISTINCT source) <= 0.5 * COUNT(source))
            FROM documents, tot GROUP BY nr
            UNION ALL
            SELECT 'text', COUNT(text), nr - COUNT(text),
                   NULL, NULL, MIN(text), MAX(text),
                   CASE WHEN COUNT(DISTINCT text) < 256
                        THEN COUNT(DISTINCT text) END,
                   NULL, NULL, NULL,
                   (COUNT(DISTINCT text) <= 4096 AND
                    COUNT(DISTINCT text) <= 0.5 * COUNT(text))
            FROM documents, tot GROUP BY nr
            ORDER BY col""",
        "warc_roundtrip": """
            SELECT 'https://' || source || '.example/' ||
                       CAST(doc_id AS VARCHAR) AS url,
                   epoch_us(TIMESTAMP '2020-01-01 00:00:00'
                            + doc_id * INTERVAL 1 SECOND) AS ts_us,
                   octet_length(CAST(text AS BLOB)) AS body_len,
                   md5(text) AS body_md5
            FROM documents ORDER BY url""",
        "count_pushdown": """
            SELECT (SELECT COUNT(*) FROM documents
                    WHERE doc_id BETWEEN 60 AND 440) AS n_range,
                   (SELECT COUNT(*) FROM documents
                    WHERE lang = 'de') AS n_lang,
                   (SELECT COUNT(*) FROM documents
                    WHERE doc_id <= 99
                       OR (lang = 'fr' AND doc_id >= 300)) AS n_any""",
        "mojibake_fix": """
            WITH t AS (
              SELECT doc_id, lang,
                     replace(replace(text, 'a', 'á'), 'e', 'ę') AS t2,
                     (text LIKE '%a%' OR text LIKE '%e%') AS changed
              FROM documents)
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN changed THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_fixed,
                   MIN(md5(doc_id::VARCHAR || ':' || t2)) AS min_fp,
                   MAX(md5(doc_id::VARCHAR || ':' || t2)) AS max_fp
            FROM t GROUP BY lang ORDER BY lang""",
        "gopher_rules": """
            WITH w AS (
              SELECT doc_id, lang,
                     list_filter(regexp_split_to_array(text, '\\s+'),
                                 x -> x <> '') AS words,
                     length(text)
                       - length(replace(text, '#', ''))
                       + len(string_split(text, '...')) - 1 AS n_sym
              FROM documents),
            m AS (
              SELECT doc_id, lang, n_sym,
                     len(words) AS n_words,
                     list_aggregate(list_transform(words,
                                                   x -> length(x)),
                                    'sum') AS n_chars,
                     len(list_filter(words,
                         x -> regexp_matches(x, '[A-Za-z]')))
                       AS alpha_words,
                     len(list_filter(
                         ['the','be','to','of','and','that','have',
                          'with'],
                         s -> list_contains(words, s))) AS stop_hits
              FROM w),
            r AS (
              SELECT lang, n_words, stop_hits,
                     (n_words BETWEEN 30 AND 100000) AS ok_words,
                     (CAST(n_chars AS DOUBLE) / n_words
                      BETWEEN 3.0 AND 10.0) AS ok_wlen,
                     (CAST(n_sym AS DOUBLE) / n_words <= 0.1)
                       AS ok_sym,
                     (CAST(alpha_words AS DOUBLE) / n_words >= 0.8)
                       AS ok_alpha,
                     (stop_hits >= 1) AS ok_stop
              FROM m)
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN ok_words AND ok_wlen AND ok_sym
                                 AND ok_alpha AND ok_stop
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
                   CAST(SUM(CASE WHEN ok_words THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ok_words,
                   CAST(SUM(CASE WHEN ok_wlen THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ok_wlen,
                   CAST(SUM(CASE WHEN ok_sym THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ok_sym,
                   CAST(SUM(CASE WHEN ok_alpha THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ok_alpha,
                   CAST(SUM(CASE WHEN ok_stop THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_ok_stop,
                   CAST(SUM(n_words) AS BIGINT) AS sum_words,
                   CAST(SUM(stop_hits) AS BIGINT) AS sum_stophits
            FROM r GROUP BY lang ORDER BY lang""",
        "head_pushdown": """
            SELECT doc_id, lang, n_chars FROM documents
            ORDER BY doc_id LIMIT 75""",
        "cdc_changelog": """
            WITH step1 AS (
              SELECT doc_id, n_chars FROM documents
              WHERE doc_id % 10 = 0),
            step2 AS (
              SELECT doc_id, n_chars + 1000 AS n_chars FROM documents
              WHERE doc_id % 10 = 0
              UNION ALL
              SELECT 1000000 + i, 9 + i
              FROM UNNEST(generate_series(0, 4)) AS g(i)),
            step3 AS (
              SELECT doc_id, n_chars FROM documents
              WHERE doc_id IN (1, 11, 21)),
            allc AS (
              SELECT 'delete' AS change_type, 1 AS step, doc_id, n_chars
              FROM step1
              UNION ALL
              SELECT 'insert', 2, doc_id, n_chars FROM step2
              UNION ALL
              SELECT 'delete', 3, doc_id, n_chars FROM step3)
            SELECT change_type, CAST(step AS INTEGER) AS step,
                   COUNT(*) AS n,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   MIN(md5(doc_id::VARCHAR || ':' || n_chars::VARCHAR))
                     AS min_fp,
                   MAX(md5(doc_id::VARCHAR || ':' || n_chars::VARCHAR))
                     AS max_fp
            FROM allc GROUP BY change_type, step
            ORDER BY step, change_type""",
        "sum_pushdown": """
            SELECT (SELECT CAST(SUM(n_chars) AS BIGINT)
                    FROM documents) AS s_all,
                   (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents
                    WHERE doc_id BETWEEN 60 AND 440) AS s_range,
                   (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents
                    WHERE lang = 'de') AS s_lang,
                   (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents
                    WHERE doc_id <= 99
                       OR (lang = 'fr' AND doc_id >= 300)) AS s_any,
                   (SELECT CAST(SUM(n_chars) AS DOUBLE)
                           / CAST(COUNT(n_chars) AS DOUBLE)
                    FROM documents
                    WHERE doc_id BETWEEN 60 AND 440) AS a_range,
                   (SELECT CAST(CASE WHEN SUM(n_chars) IS NULL
                                     THEN 1 ELSE 0 END AS INTEGER)
                    FROM documents
                    WHERE doc_id >= 1000000000000) AS n_empty""",
        "minmax_pushdown": """
            WITH b AS (SELECT MIN(event_id) AS mn, MAX(event_id) AS mx
                       FROM events),
            r AS (SELECT CAST(FLOOR(mn + (mx - mn) * 0.1) AS BIGINT) AS lo,
                         CAST(FLOOR(mn + (mx - mn) * 0.8) AS BIGINT) AS hi
                  FROM b)
            SELECT COUNT(*) AS n_rows,
                   MIN(event_id) AS min_id, MAX(event_id) AS max_id,
                   epoch_us(MIN(ts)) AS min_ts, epoch_us(MAX(ts)) AS max_ts,
                   MIN(user_id) AS min_user, MAX(user_id) AS max_user
            FROM events, r WHERE event_id BETWEEN r.lo AND r.hi""",
        "domain_mixture": """
            WITH c AS (SELECT source, COUNT(*) AS n FROM documents
                       GROUP BY source),
            w AS (SELECT * FROM (VALUES ('src0', 10.0), ('src1', 2.0),
                                        ('src2', 1.0)) t(source, wt)),
            r AS (SELECT c.source,
                         LEAST(CAST(c.n AS DOUBLE), (60 * wt) / 13.0)
                           / c.n AS rate
                  FROM c JOIN w USING (source)),
            kept AS (SELECT d.doc_id, d.source, d.text
                     FROM documents d JOIN r USING (source)
                     WHERE (('0x' || substr(md5('42:' ||
                             CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT)
                           / 4294967296.0 < r.rate)
            SELECT source, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM kept GROUP BY source ORDER BY source""",
        "domain_mixture_tokens": """
            WITH c AS (SELECT source, SUM(n_chars) AS n FROM documents
                       GROUP BY source),
            w AS (SELECT * FROM (VALUES ('src0', 10.0), ('src1', 2.0),
                                        ('src2', 1.0)) t(source, wt)),
            r AS (SELECT c.source,
                         LEAST(CAST(c.n AS DOUBLE), (20000 * wt) / 13.0)
                           / c.n AS rate
                  FROM c JOIN w USING (source)),
            kept AS (SELECT d.doc_id, d.source, d.n_chars
                     FROM documents d JOIN r USING (source)
                     WHERE (('0x' || substr(md5('42:' ||
                             CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT)
                           / 4294967296.0 < r.rate)
            SELECT source, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM kept GROUP BY source ORDER BY source""",
        "wap_publish": """
            SELECT lang, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            GROUP BY lang ORDER BY lang""",
        "dup_spans": """
            WITH toks AS (
              SELECT doc_id, lang,
                     list_filter(string_split(text, ' '),
                                 x -> x <> '') AS tk
              FROM documents),
            per_doc AS (
              SELECT doc_id, lang, len(tk) AS n_tokens,
                     greatest(len(tk) - 4, 0) AS n_windows
              FROM toks),
            win AS (
              SELECT doc_id, i AS pos,
                     md5(array_to_string(tk[i:i+4], ' ')) AS h
              FROM toks,
                   UNNEST(generate_series(1, len(tk) - 4)) AS g(i)),
            dup AS (SELECT h FROM win
                    GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
            dwin AS (SELECT w.doc_id, w.pos
                     FROM win w SEMI JOIN dup d USING (h)),
            cov AS (SELECT doc_id,
                           UNNEST(generate_series(pos, pos + 4)) AS t
                    FROM dwin),
            nw AS (SELECT doc_id, COUNT(DISTINCT pos) AS ndw
                   FROM dwin GROUP BY doc_id),
            nt AS (SELECT doc_id, COUNT(DISTINCT t) AS ndt
                   FROM cov GROUP BY doc_id),
            j AS (SELECT p.lang, p.doc_id, p.n_tokens, p.n_windows,
                         COALESCE(nw.ndw, 0) AS ndw,
                         COALESCE(nt.ndt, 0) AS ndt
                  FROM per_doc p
                  LEFT JOIN nw USING (doc_id)
                  LEFT JOIN nt USING (doc_id))
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(SUM(n_windows) AS BIGINT) AS sum_windows,
                   CAST(SUM(ndw) AS BIGINT) AS sum_dup_windows,
                   CAST(SUM(ndt) AS BIGINT) AS sum_dup_tokens,
                   CAST(SUM(CASE WHEN ndw > 0 THEN doc_id
                                 ELSE 0 END) AS BIGINT) AS sum_dup_ids
            FROM j GROUP BY lang ORDER BY lang""",
        "dup_span_removal": """
            WITH toks AS (
              SELECT doc_id, lang,
                     list_filter(string_split(text, ' '),
                                 x -> x <> '') AS tk
              FROM documents),
            win AS (
              SELECT doc_id, i AS pos,
                     md5(array_to_string(tk[i:i+4], ' ')) AS h
              FROM toks,
                   UNNEST(generate_series(1, len(tk) - 4)) AS g(i)),
            own AS (SELECT h, MIN(doc_id) AS own FROM win
                    GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
            cut AS (SELECT DISTINCT w.doc_id, u.t
                    FROM win w JOIN own o USING (h),
                         UNNEST(generate_series(w.pos, w.pos + 4)) AS u(t)
                    WHERE w.doc_id <> o.own),
            cl AS (SELECT doc_id, list_sort(list(t)) AS cuts,
                          COUNT(*) AS nr
                   FROM cut GROUP BY doc_id),
            reb AS (SELECT t.doc_id, t.lang, len(tk) AS n_tokens,
                           COALESCE(cl.nr, 0) AS n_removed,
                           array_to_string(
                             [tk[i] FOR i IN generate_series(1, len(tk))
                              IF NOT list_contains(
                                       COALESCE(cl.cuts,
                                                CAST([] AS BIGINT[])), i)],
                             ' ') AS clean
                    FROM toks t LEFT JOIN cl USING (doc_id))
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(SUM(n_removed) AS BIGINT) AS sum_removed,
                   CAST(SUM(CASE WHEN n_removed > 0 THEN 1
                                 ELSE 0 END) AS BIGINT) AS n_cut_docs,
                   MIN(md5(doc_id::VARCHAR || ':' || clean)) AS min_fp,
                   MAX(md5(doc_id::VARCHAR || ':' || clean)) AS max_fp
            FROM reb GROUP BY lang ORDER BY lang""",
        "html_extract": """
            WITH norm AS (
              SELECT doc_id, lang,
                     CASE WHEN text IS NULL THEN NULL
                          ELSE trim(regexp_replace(text,
                                    '[ \t\n\r]+', ' ', 'g')) END AS t
              FROM documents)
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(length(t)) AS BIGINT) AS sum_chars,
                   CAST(SUM(CASE WHEN t IS NOT NULL AND
                                 len(string_split(t, ' ')) >= 3
                            THEN 1 ELSE 0 END) AS BIGINT) AS sum_links,
                   MIN(md5(doc_id::VARCHAR || ':' || t)) AS min_fp,
                   MAX(md5(doc_id::VARCHAR || ':' || t)) AS max_fp
            FROM norm GROUP BY lang ORDER BY lang""",
        "url_parse": """
            WITH u AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0 THEN 'https'
                          ELSE 'http' END AS scheme,
                     (CASE WHEN doc_id % 4 = 0 THEN 'a.b.'
                           ELSE 'www.' END)
                       || substr(md5(doc_id::VARCHAR), 1, 6)
                       || (CASE WHEN doc_id % 3 = 0 THEN '.co.uk'
                                WHEN doc_id % 3 = 1 THEN '.com'
                                ELSE '.org' END) AS host,
                     CASE WHEN doc_id % 5 = 0 THEN 443
                          WHEN doc_id % 5 = 1 THEN 8080 END AS port,
                     CASE WHEN doc_id % 8 = 5 THEN ''
                          ELSE '/' || substr(md5(doc_id::VARCHAR), 7, 3)
                               || (CASE WHEN doc_id % 4 = 0
                                        THEN '/x/'
                                             || (doc_id % 7)::VARCHAR
                                        ELSE '' END) END AS path,
                     CASE WHEN doc_id % 3 = 0 THEN 'z=9&a=1'
                          WHEN doc_id % 3 = 1
                            THEN 'm=' || (doc_id % 5)::VARCHAR
                          ELSE '' END AS query,
                     (doc_id % 6 = 1) AS has_frag
              FROM documents),
            f AS (
              SELECT *, string_split(host, '.') AS labels,
                     len(string_split(host, '.')) AS nl
              FROM u),
            f2 AS (
              SELECT *,
                     CASE WHEN nl >= 2 AND
                          labels[nl-1] || '.' || labels[nl] IN ('co.uk')
                          THEN 3 ELSE 2 END AS regn
              FROM f),
            f3 AS (
              SELECT doc_id, scheme, host, port, path, query, has_frag,
                     labels[nl] AS tld,
                     CASE WHEN nl <= regn THEN host
                          ELSE array_to_string(
                            labels[nl-regn+1:nl], '.') END AS regdom,
                     len(list_filter(string_split(path, '/'),
                                     x -> x <> '')) AS path_depth,
                     len(list_filter(string_split(query, '&'),
                                     x -> x <> '')) AS n_params,
                     scheme || '://' || host
                       || (CASE WHEN port IS NOT NULL
                                AND NOT (scheme = 'https' AND port = 443)
                                AND NOT (scheme = 'http' AND port = 80)
                                THEN ':' || port::VARCHAR ELSE '' END)
                       || (CASE WHEN path = '' THEN '/' ELSE path END)
                       || (CASE WHEN query <> ''
                                THEN '?' || array_to_string(
                                  list_sort(list_filter(
                                    string_split(query, '&'),
                                    x -> x <> '')), '&')
                                ELSE '' END) AS canon
              FROM f2)
            SELECT tld, COUNT(*) AS n_docs,
                   COUNT(DISTINCT host) AS n_hosts,
                   COUNT(DISTINCT regdom) AS n_regdoms,
                   CAST(SUM(path_depth) AS BIGINT) AS sum_depth,
                   CAST(SUM(n_params) AS BIGINT) AS sum_params,
                   CAST(SUM(CASE WHEN port IS NOT NULL THEN 1
                                 ELSE 0 END) AS BIGINT)
                     AS n_explicit_port,
                   CAST(SUM(CASE WHEN has_frag THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_frag,
                   MIN(md5(doc_id::VARCHAR || ':' || canon)) AS min_fp,
                   MAX(md5(doc_id::VARCHAR || ':' || canon)) AS max_fp
            FROM f3 GROUP BY tld ORDER BY tld""",
        "line_dedup": """
            WITH docs AS (
              SELECT doc_id,
                     array_to_string(
                       list_transform(
                         generate_series(1, CAST(CEIL(
                           len(string_split(text, ' ')) / 2.0) AS INT)),
                         i -> array_to_string(
                           string_split(text, ' ')[((i-1)*2+1):(i*2)],
                           ' ')),
                       chr(10)) AS text
              FROM documents),
            lines AS (
              SELECT doc_id, i AS ord,
                     string_split(text, chr(10))[i] AS line
              FROM docs,
                   UNNEST(generate_series(1,
                     len(string_split(text, chr(10))))) AS g(i)),
            dup AS (SELECT line FROM lines WHERE len(line) >= 1
                    GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2),
            kept AS (SELECT l.* FROM lines l ANTI JOIN dup d USING (line)),
            rebuilt AS (SELECT doc_id,
                               string_agg(line, chr(10) ORDER BY ord)
                                 AS clean,
                               COUNT(*) AS n_kept
                        FROM kept GROUP BY doc_id),
            per_doc AS (
              SELECT d.doc_id,
                     len(string_split(d.text, chr(10)))
                       - COALESCE(r.n_kept, 0) AS n_removed,
                     COALESCE(r.clean, '') AS clean
              FROM docs d LEFT JOIN rebuilt r USING (doc_id))
            SELECT CAST(n_removed AS BIGINT) AS n_removed,
                   COUNT(*) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(clean)) AS n_cleans
            FROM per_doc GROUP BY 1 ORDER BY 1""",
        # brute-force recomputation of the inverted index's answers:
        # regex tokenization mirrors textindex.TOKEN_PATTERN verbatim
        "token_search": """
            WITH tok AS (
              SELECT doc_id,
                     list_contains(list_filter(string_split_regex(
                       lower(text), '[^a-z0-9]+'), x -> x <> ''),
                       'vector') AS has_v,
                     list_contains(list_filter(string_split_regex(
                       lower(text), '[^a-z0-9]+'), x -> x <> ''),
                       'stream') AS has_s
              FROM documents),
            vocab AS (
              SELECT COUNT(DISTINCT x) AS n_tokens
              FROM documents,
                   UNNEST(string_split_regex(lower(text),
                          '[^a-z0-9]+')) AS u(x)
              WHERE x <> '')
            SELECT (SELECT n_tokens FROM vocab) AS n_tokens,
                   COUNT(*) FILTER (WHERE has_v AND has_s) AS n_docs_all,
                   CAST(SUM(doc_id) FILTER (WHERE has_v AND has_s)
                        AS BIGINT) AS sum_ids_all,
                   COUNT(*) FILTER (WHERE has_v OR has_s) AS n_docs_any
            FROM tok""",
        # brute-force tf/df/idf/score/rank recomputation; integer //
        # quantization (IDF_SCALE=1e6) mirrors textindex.rank_tokens
        "token_rank": """
            WITH tf AS (
              SELECT d.doc_id, t.token,
                     len(list_filter(string_split_regex(lower(d.text),
                         '[^a-z0-9]+'), x -> x = t.token)) AS tf
              FROM documents d,
                   (VALUES ('stream'), ('vector'), ('window')) t(token)),
            nz AS (SELECT * FROM tf WHERE tf > 0),
            dfreq AS (SELECT token, COUNT(*) AS df FROM nz GROUP BY token),
            scored AS (
              SELECT nz.doc_id,
                     CAST(SUM(nz.tf * (((SELECT COUNT(*) FROM documents)
                          * 1000000) // dfreq.df)) AS BIGINT) AS score
              FROM nz JOIN dfreq USING (token) GROUP BY nz.doc_id)
            SELECT CAST(ROW_NUMBER() OVER
                        (ORDER BY score DESC, doc_id) AS INTEGER) AS rank,
                   doc_id, score
            FROM scored ORDER BY score DESC, doc_id LIMIT 15""",
        "alter_columns": """
            WITH gen1 AS (SELECT doc_id, text, lang, source AS origin,
                                 CAST(NULL AS DOUBLE) AS score
                          FROM documents WHERE doc_id % 2 = 0),
            gen2 AS (SELECT doc_id, text, lang, source AS origin,
                            CAST(doc_id % 100 AS DOUBLE) AS score
                     FROM documents WHERE doc_id % 2 = 1),
            u AS (SELECT * FROM gen1 UNION ALL SELECT * FROM gen2)
            SELECT origin, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(CASE WHEN score IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null_score,
                   SUM(COALESCE(score, 0.0)) AS sum_score,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM u GROUP BY origin ORDER BY origin""",
        "like_prune": f"""
            WITH corpus AS ({_CORPUS_SQL})
            SELECT COUNT(*) AS n_rows,
                   COUNT(DISTINCT md5(url)) AS n_urls,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM corpus
            WHERE url LIKE 'https://host1%' AND lang LIKE 'd%'""",
        "in_prune": """
            SELECT COUNT(*) AS n_rows, CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM documents WHERE doc_id IN (3, 250, 444)""",
        "dict_pruned_scan": """
            SELECT lang, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents WHERE lang IN ('de', 'fr')
            GROUP BY lang ORDER BY lang""",
        # the auto-tuned table's pruned scan vs the raw table
        "auto_tuned_write": """
            SELECT lang, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            WHERE lang IN ('de', 'en') AND doc_id <= 3999
            GROUP BY lang ORDER BY lang""",
        # the widened two-generation union rebuilt from raw data; the
        # WHERE mirrors the pushed scan predicate
        "alter_widen": """
            WITH u AS (
              SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS v
              FROM documents
              UNION ALL
              SELECT doc_id + 100000, lang,
                     CAST(n_chars + 34359738368 AS BIGINT)
              FROM documents)
            SELECT lang, COUNT(*) AS n_rows,
                   CAST(SUM(v) AS BIGINT) AS sum_v,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM u WHERE v >= 100 GROUP BY lang ORDER BY lang""",
        # the DataSource V2 read path: projection + pushed filter +
        # global-dict restore must reproduce the raw-table aggregate
        "datasource_read": """
            SELECT lang, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents WHERE doc_id <= 149
            GROUP BY lang ORDER BY lang""",
        "datasource_write": """
            SELECT lang, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents WHERE doc_id <= 149
            GROUP BY lang ORDER BY lang""",
        "datasource_stream": """
            SELECT lang, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            GROUP BY lang ORDER BY lang""",
        "lm_fluency": """
            WITH toks AS (
              SELECT doc_id, lang,
                     list_filter(string_split(lower(text), ' '),
                                 x -> x <> '') AS tk
              FROM documents),
            uni AS (SELECT unnest(tk) AS word FROM toks),
            ucnt AS (SELECT word, COUNT(*) AS n FROM uni GROUP BY word),
            vocab AS (
              SELECT word FROM (
                SELECT word,
                       ROW_NUMBER() OVER (ORDER BY n DESC, word ASC) rk
                FROM ucnt) WHERE rk <= 16),
            pairs AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(tk)),
                            i -> struct_pack(w1 := tk[i],
                                             w2 := tk[i + 1]))) AS p
              FROM toks WHERE len(tk) >= 2),
            pw AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM pairs),
            bp AS (
              SELECT w1, w2, COUNT(*) AS n FROM pw
              WHERE w1 IN (SELECT word FROM vocab)
                AND w2 IN (SELECT word FROM vocab)
              GROUP BY w1, w2),
            bigrams AS (
              SELECT w1, w2 FROM (
                SELECT w1, w2,
                       ROW_NUMBER() OVER (ORDER BY n DESC, w1 ASC,
                                          w2 ASC) rk
                FROM bp) WHERE rk <= 64),
            scored AS (
              SELECT pw.doc_id, COUNT(*) AS lm_pairs,
                     SUM(CASE WHEN pw.w2 NOT IN (SELECT word FROM vocab)
                              THEN 1 ELSE 0 END) AS lm_oov,
                     SUM(CASE WHEN EXISTS (
                           SELECT 1 FROM bigrams b
                           WHERE b.w1 = pw.w1 AND b.w2 = pw.w2)
                              THEN 1 ELSE 0 END) AS lm_hits
              FROM pw GROUP BY pw.doc_id)
            SELECT d.lang, COUNT(*) AS n_docs,
                   CAST(SUM(s.lm_pairs) AS BIGINT) AS sum_pairs,
                   CAST(SUM(s.lm_oov) AS BIGINT) AS sum_oov,
                   CAST(SUM(s.lm_hits) AS BIGINT) AS sum_hits
            FROM scored s JOIN documents d USING (doc_id)
            GROUP BY d.lang ORDER BY d.lang""",
        "route_partitioned": """
            SELECT source, COUNT(*) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents WHERE source = 'src3'
            GROUP BY source ORDER BY source""",
        "split_assign": _split_assign_sql(),
        "stratified_sample": f"""
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM documents
            WHERE substr(md5('11:' || CAST(doc_id AS VARCHAR)), 1, 8) <=
                  CASE WHEN lang = 'de' THEN '{_md5_frac_hex(0.5)}'
                       WHEN lang = 'fr' THEN '{_md5_frac_hex(1.0)}'
                       ELSE '{_md5_frac_hex(0.1)}' END
            GROUP BY lang ORDER BY lang""",
        "domain_stats": f"""
            WITH corpus AS ({_CORPUS_SQL})
            SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                   COUNT(*) AS n_docs,
                   CAST(SUM(length(text)) AS BIGINT) AS text_chars
            FROM corpus GROUP BY host HAVING host <> ''
            ORDER BY host""",
        "asof_join": """
            WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
            e AS (SELECT * FROM events WHERE event_type = 'error')
            SELECT c.user_id, COUNT(*) AS n_clicks,
                   COUNT(e.event_id) AS n_matched,
                   CAST(SUM(e.event_id) AS BIGINT) AS sum_err_ids
            FROM c ASOF LEFT JOIN e
              ON c.user_id = e.user_id AND c.ts >= e.ts
            GROUP BY c.user_id ORDER BY c.user_id""",
        "pipeline_curation": f"""
            WITH per AS (
              SELECT doc_id, lang, length(text) AS n_chars,
                     len(string_split(text, ' ')) AS n_words,
                     len(list_filter(string_split(text, ' '),
                         w -> w IN ({', '.join(repr(s) for s in STOP_EN)})))
                         AS stop_hits,
                     length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
                         AS n_punct
              FROM documents),
            r AS (SELECT doc_id, lang, n_words,
                         ROUND((n_chars - n_words + 1) * 1.0 / n_words, 4)
                             AS mean_word_len,
                         ROUND(stop_hits * 1.0 / n_words, 4)
                             AS stopword_ratio,
                         ROUND(n_punct * 1.0 / n_chars, 4) AS punct_ratio
                  FROM per),
            k AS (SELECT doc_id, lang, n_words FROM r
                  WHERE n_words >= 16 AND punct_ratio <= 0.1
                    AND stopword_ratio >= 0.01
                    AND mean_word_len BETWEEN 2.0 AND 12.0),
            smp AS (SELECT * FROM k
                    WHERE substr(md5('17:' || CAST(doc_id AS VARCHAR)),
                                 1, 8) <= '{_md5_frac_hex(0.5)}'),
            sp AS (SELECT *, {_split_case_sql()} AS split FROM smp)
            SELECT split, lang, COUNT(*) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   CAST(SUM(n_words) AS BIGINT) AS sum_words
            FROM sp GROUP BY split, lang ORDER BY split, lang""",
        "range_join": """
            WITH p AS (SELECT * FROM events WHERE event_type = 'click'),
            i AS (SELECT user_id, ts AS start,
                         ts + INTERVAL 2 HOUR AS fin,
                         event_id AS win_id
                  FROM events WHERE event_type = 'error')
            SELECT p.user_id, COUNT(*) AS n_matches,
                   CAST(SUM(p.event_id) AS BIGINT) AS sum_click_ids,
                   CAST(SUM(i.win_id) AS BIGINT) AS sum_win_ids
            FROM p JOIN i ON p.user_id = i.user_id
                         AND i.start <= p.ts AND p.ts <= i.fin
            GROUP BY p.user_id ORDER BY p.user_id""",
        "time_rollup": """
            SELECT 'hour' AS gran, date_trunc('hour', ts) AS bucket,
                   event_type, COUNT(*) AS n_events,
                   CAST(SUM(event_id) AS BIGINT) AS sum_ids
            FROM events GROUP BY 2, 3
            UNION ALL
            SELECT 'day', date_trunc('day', ts), event_type, COUNT(*),
                   CAST(SUM(event_id) AS BIGINT)
            FROM events GROUP BY 2, 3
            ORDER BY gran, bucket, event_type""",
        "sessionize": """
            WITH s AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w
                                  > INTERVAL 86400 SECOND
                          THEN 1 ELSE 0 END AS new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            t AS (
              SELECT user_id,
                     SUM(new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) - 1
                         AS session
              FROM s)
            SELECT user_id, COUNT(*) AS n_events,
                   CAST(MAX(session) + 1 AS BIGINT) AS n_sessions
            FROM t GROUP BY user_id ORDER BY user_id""",
        # full gap_fill recomputation: bucket agg, generate_series
        # grid, gap left-join, IGNORE NULLS carry-forward window
        "gap_fill": """
            WITH b AS (
              SELECT event_type,
                     CAST(epoch_us(ts) // 21600000000 AS BIGINT) * 21600
                       AS bucket_s,
                     COUNT(*) AS n,
                     CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 1000)
                         AS BIGINT)) AS BIGINT) AS sum_value
              FROM events GROUP BY 1, 2),
            g AS (
              SELECT event_type,
                     UNNEST(generate_series(MIN(bucket_s), MAX(bucket_s),
                            CAST(21600 AS BIGINT))) AS bucket_s
              FROM b GROUP BY event_type),
            j AS (
              SELECT g.event_type, g.bucket_s,
                     b.n IS NULL AS is_gap, b.n, b.sum_value
              FROM g LEFT JOIN b USING (event_type, bucket_s))
            SELECT event_type, bucket_s, is_gap,
                   last_value(n IGNORE NULLS) OVER w AS n,
                   last_value(sum_value IGNORE NULLS) OVER w AS sum_value
            FROM j
            WINDOW w AS (PARTITION BY event_type ORDER BY bucket_s
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
            ORDER BY event_type, bucket_s""",
        # linear interpolation mirrored operand-for-operand: IEEE ops
        # on identical exact-integer inputs are bit-identical doubles
        "gap_fill_interp": """
            WITH b AS (
              SELECT event_type,
                     CAST(epoch_us(ts) // 21600000000 AS BIGINT) * 21600
                       AS bucket_s,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            g AS (
              SELECT event_type,
                     UNNEST(generate_series(MIN(bucket_s), MAX(bucket_s),
                            CAST(21600 AS BIGINT))) AS bucket_s
              FROM b GROUP BY event_type),
            j AS (
              SELECT g.event_type, g.bucket_s,
                     b.n IS NULL AS is_gap,
                     CAST(b.n AS DOUBLE) AS v,
                     CASE WHEN b.n IS NOT NULL
                          THEN CAST(g.bucket_s AS DOUBLE) END AS obs_t
              FROM g LEFT JOIN b USING (event_type, bucket_s)),
            w AS (
              SELECT event_type, bucket_s, is_gap, v,
                     CAST(bucket_s AS DOUBLE) AS t,
                     last_value(v IGNORE NULLS) OVER wb AS pv,
                     last_value(obs_t IGNORE NULLS) OVER wb AS pt,
                     first_value(v IGNORE NULLS) OVER wf AS nv,
                     first_value(obs_t IGNORE NULLS) OVER wf AS nt
              FROM j
              WINDOW wb AS (PARTITION BY event_type ORDER BY bucket_s
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW),
                     wf AS (PARTITION BY event_type ORDER BY bucket_s
                            ROWS BETWEEN CURRENT ROW
                            AND UNBOUNDED FOLLOWING))
            SELECT event_type, bucket_s, is_gap,
                   CASE WHEN v IS NOT NULL THEN v
                        ELSE pv + (nv - pv) * ((t - pt) / (nt - pt))
                   END AS n
            FROM w ORDER BY event_type, bucket_s""",
        # the sketch's ground truth; estimate accuracy, sub-k
        # exactness, and merge identity are asserted inside the facet
        "kmv_ndv": """
            SELECT COUNT(DISTINCT lang) AS ndv_lang,
                   COUNT(DISTINCT source) AS ndv_source,
                   COUNT(DISTINCT doc_id) AS ndv_doc
            FROM documents""",
        "zone_prune_ts": """
            WITH e AS (SELECT *, epoch_us(ts) AS us FROM events),
            b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM e),
            r AS (SELECT e.* FROM e, b
                  -- FLOOR matches the Spark facet's Python int() exactly
                  -- (spans are positive); a bare CAST would round half
                  -- away from zero and shift the bound by 1us
                  WHERE us BETWEEN mn + CAST(FLOOR((mx - mn) * 0.4) AS BIGINT)
                                AND mn + CAST(FLOOR((mx - mn) * 0.6) AS BIGINT))
            SELECT COUNT(*) AS n_rows, CAST(SUM(event_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT user_id) AS n_users,
                   CAST(MIN(us) AS BIGINT) AS min_us,
                   CAST(MAX(us) AS BIGINT) AS max_us
            FROM r""",
        "compact_rechunk": """
            SELECT COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(DISTINCT md5(text)) AS n_texts,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM documents""",
        # structural constants (6 parts from repartition(6), ceil(3/2)+
        # ceil(3/2)=4 checkpoint commits) are fixed by the facet's
        # construction; the content aggregates are the recomputation —
        # they certify the committed-prefix + resumed-suffix covers
        # every row exactly once
        "checkpoint_resume": """
            SELECT CAST(6 AS INTEGER) AS parts_total,
                   CAST(4 AS INTEGER) AS n_checkpoints,
                   COUNT(*) AS n_rows,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(DISTINCT md5(text)) AS n_texts,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM documents""",
        "relocate_range": f"""
            WITH corpus AS ({_CORPUS_SQL})
            SELECT COUNT(*) AS n_rows, COUNT(DISTINCT md5(url)) AS n_urls,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM corpus
            WHERE url >= 'https://host1' AND url <= 'https://host3'""",
        "roundtrip_documents": """
            SELECT COUNT(*) AS n_rows, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(DISTINCT md5(text)) AS n_texts,
                   MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
                   COUNT(DISTINCT lang) AS n_langs
            FROM documents""",
        "codec_selection": """
            -- Recompute the selector's decision from the same column
            -- stats: int-family -> 'int'; strings -> 'dict' iff
            -- distinct_ratio <= 0.8 else the non-dict string family
            -- (the fsst-vs-plain trial is encoder-internal; both sides
            -- collapse it to 'str_nondict').
            WITH s AS (SELECT * FROM documents WHERE doc_id < 500),
            stats AS (
              SELECT 'doc_id' AS col, 'int' AS family, 0.0 AS dr
              UNION ALL SELECT 'n_chars', 'int', 0.0
              UNION ALL SELECT 'lang', 'str',
                (SELECT COUNT(DISTINCT lang) * 1.0 / COUNT(lang) FROM s)
              UNION ALL SELECT 'source', 'str',
                (SELECT COUNT(DISTINCT source) * 1.0 / COUNT(source) FROM s)
              UNION ALL SELECT 'text', 'str',
                (SELECT COUNT(DISTINCT text) * 1.0 / COUNT(text) FROM s))
            SELECT col AS "column",
                   CASE WHEN family = 'int' THEN 'int'
                        WHEN dr <= 0.8 THEN 'dict'
                        ELSE 'str_nondict' END AS codec
            FROM stats ORDER BY "column" """,
        "corpus_encode": f"""
            WITH corpus AS ({_CORPUS_SQL})
            SELECT COUNT(*) AS n_rows, COUNT(DISTINCT md5(url)) AS n_urls,
                   CAST(SUM(octet_length(html)) AS BIGINT) AS html_bytes,
                   COUNT(DISTINCT md5(text)) AS n_texts,
                   CAST(MIN(epoch_us(warc_ts)) AS BIGINT) AS min_us,
                   CAST(MAX(epoch_us(warc_ts)) AS BIGINT) AS max_us
            FROM corpus""",
        "semdedup": """
            WITH RECURSIVE e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
            seeds AS (SELECT v AS sv,
                             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                                vec_id) - 1 AS cid
                      FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                      LIMIT 8),
            d AS (SELECT e.vec_id, e.v, s.cid,
                         ROUND(list_reduce(
                             list_prepend(CAST(0 AS DOUBLE),
                                 list_transform(range(1, len(e.v) + 1),
                                     i -> (e.v[i] - s.sv[i]) * (e.v[i] - s.sv[i]))),
                             (a, b) -> a + b), 6) AS dist
                  FROM e CROSS JOIN seeds s),
            a AS (SELECT vec_id, v, cid FROM (
                    SELECT vec_id, v, cid,
                           ROW_NUMBER() OVER (PARTITION BY vec_id
                                              ORDER BY dist, cid) AS rn
                    FROM d) WHERE rn = 1),
            p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
                         ROUND(
                           list_reduce(list_prepend(CAST(0 AS DOUBLE),
                               list_transform(range(1, len(x.v) + 1),
                                              i -> x.v[i] * y.v[i])),
                               (q, w) -> q + w)
                           / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list_transform(range(1, len(x.v) + 1),
                                                 i -> x.v[i] * x.v[i])),
                                  (q, w) -> q + w))
                              * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                  list_transform(range(1, len(y.v) + 1),
                                                 i -> y.v[i] * y.v[i])),
                                  (q, w) -> q + w))), 4) AS cos
                  FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id),
            pr AS (SELECT id_a, id_b FROM p WHERE cos >= 0.30),
            sym AS (SELECT id_a AS src, id_b AS dst FROM pr
                    UNION SELECT id_b, id_a FROM pr),
            reach(node, r) AS (
              SELECT src, src FROM sym
              UNION
              SELECT w.node, s.dst FROM reach w JOIN sym s ON s.src = w.r),
            comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node),
            losers AS (SELECT node FROM comp WHERE comp < node)
            SELECT a.vec_id, CAST(a.cid AS INTEGER) AS cluster
            FROM a LEFT JOIN losers l ON l.node = a.vec_id
            WHERE l.node IS NULL ORDER BY a.vec_id""",
        "dsir_select": r"""
            WITH docs AS (SELECT doc_id, lower(text) AS t, lang
                          FROM documents WHERE text IS NOT NULL),
            w AS (SELECT doc_id, lang,
                         list_filter(regexp_split_to_array(t, '\s+'),
                                     x -> x <> '') AS ws FROM docs),
            g AS (SELECT doc_id, lang,
                         unnest(list_concat(ws,
                             list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i + 1]))) AS gram
                  FROM w),
            b AS (SELECT doc_id, lang,
                         (('0x' || substr(md5(gram), 1, 8))::BIGINT
                          % 256) AS bucket
                  FROM g),
            tb AS (SELECT bucket, COUNT(*) AS t FROM b
                   WHERE lang = 'en' GROUP BY 1),
            rb AS (SELECT bucket, COUNT(*) AS r FROM b
                   WHERE lang <> 'en' GROUP BY 1),
            tt AS (SELECT COALESCE(SUM(t), 0) + 256 AS tden FROM tb),
            rt AS (SELECT COALESCE(SUM(r), 0) + 256 AS rden FROM rb),
            grid AS (SELECT unnest(range(256)) AS bucket),
            lam AS (SELECT grid.bucket,
                           CAST(ROUND(1000.0 * ln(
                               (CAST(COALESCE(tb.t, 0) + 1 AS DOUBLE)
                                    * (SELECT rden FROM rt))
                               / (CAST(COALESCE(rb.r, 0) + 1 AS DOUBLE)
                                    * (SELECT tden FROM tt))), 0)
                                AS BIGINT) AS lam
                    FROM grid
                    LEFT JOIN tb ON tb.bucket = grid.bucket
                    LEFT JOIN rb ON rb.bucket = grid.bucket),
            pd AS (SELECT doc_id, bucket, COUNT(*) AS cnt FROM b
                   WHERE lang <> 'en' GROUP BY 1, 2),
            sc AS (SELECT doc_id, SUM(cnt * lam) AS s FROM pd
                   JOIN lam USING (bucket) GROUP BY 1)
            SELECT doc_id, CAST(s AS BIGINT) AS dsir_score FROM sc
            ORDER BY s DESC, doc_id LIMIT 20""",
        # the full BPE learner replayed in SQL: each merge round is a
        # weighted pair count + argmax + a greedy left-to-right fold
        # expressed as a recursive CTE over symbol positions (the
        # acc[-1]=l AND next=r rewrite is exactly bpe.apply_merge's
        # aggregate fold)
        "bpe_train": """
            WITH RECURSIVE
            wraw AS (SELECT unnest(regexp_split_to_array(lower(text),
                                                         '\\s+')) AS word
                     FROM documents WHERE doc_id < 80 AND text IS NOT NULL),
            wc AS (SELECT word, COUNT(*) AS n FROM wraw
                   WHERE word <> '' AND regexp_full_match(word, '[a-z]+')
                   GROUP BY word),
            s0 AS (SELECT word, n, string_split(word, '') AS toks FROM wc),
            p1 AS (SELECT s.toks[t.i] AS l, s.toks[t.i + 1] AS r,
                          SUM(s.n) AS cnt
                   FROM s0 s, UNNEST(range(1, len(s.toks))) AS t(i)
                   GROUP BY 1, 2),
            best1 AS (SELECT l, r, cnt FROM p1 ORDER BY cnt DESC, l, r
                      LIMIT 1),
            f1(word, n, i, acc) AS (
              SELECT word, n, 1, [toks[1]] FROM s0
              UNION ALL
              SELECT f.word, f.n, f.i + 1,
                     CASE WHEN acc[-1] = (SELECT l FROM best1)
                               AND s.toks[f.i + 1] = (SELECT r FROM best1)
                          THEN list_append(acc[1:len(acc) - 1],
                                           (SELECT l || r FROM best1))
                          ELSE list_append(acc, s.toks[f.i + 1]) END
              FROM f1 f JOIN s0 s ON s.word = f.word
              WHERE f.i < len(s.toks)),
            s1 AS (SELECT f.word, f.n, f.acc AS toks
                   FROM f1 f JOIN s0 s ON s.word = f.word
                   WHERE f.i = len(s.toks)),
            p2 AS (SELECT s.toks[t.i] AS l, s.toks[t.i + 1] AS r,
                          SUM(s.n) AS cnt
                   FROM s1 s, UNNEST(range(1, len(s.toks))) AS t(i)
                   GROUP BY 1, 2),
            best2 AS (SELECT l, r, cnt FROM p2 ORDER BY cnt DESC, l, r
                      LIMIT 1),
            f2(word, n, i, acc) AS (
              SELECT word, n, 1, [toks[1]] FROM s1
              UNION ALL
              SELECT f.word, f.n, f.i + 1,
                     CASE WHEN acc[-1] = (SELECT l FROM best2)
                               AND s.toks[f.i + 1] = (SELECT r FROM best2)
                          THEN list_append(acc[1:len(acc) - 1],
                                           (SELECT l || r FROM best2))
                          ELSE list_append(acc, s.toks[f.i + 1]) END
              FROM f2 f JOIN s1 s ON s.word = f.word
              WHERE f.i < len(s.toks)),
            s2 AS (SELECT f.word, f.n, f.acc AS toks
                   FROM f2 f JOIN s1 s ON s.word = f.word
                   WHERE f.i = len(s.toks)),
            p3 AS (SELECT s.toks[t.i] AS l, s.toks[t.i + 1] AS r,
                          SUM(s.n) AS cnt
                   FROM s2 s, UNNEST(range(1, len(s.toks))) AS t(i)
                   GROUP BY 1, 2),
            best3 AS (SELECT l, r, cnt FROM p3 ORDER BY cnt DESC, l, r
                      LIMIT 1)
            SELECT * FROM (
              SELECT 0 AS rank, l AS left, r AS right,
                     CAST(cnt AS BIGINT) AS cnt FROM best1
              UNION ALL SELECT 1, l, r, CAST(cnt AS BIGINT) FROM best2
              UNION ALL SELECT 2, l, r, CAST(cnt AS BIGINT) FROM best3
            ) ORDER BY rank""",
        "ivf_clusters": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings),
            seeds AS (SELECT v AS sv,
                             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                                vec_id) - 1 AS cid
                      FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                      LIMIT 8),
            d AS (SELECT e.vec_id, s.cid,
                         ROUND(list_reduce(
                             list_prepend(CAST(0 AS DOUBLE),
                                 list_transform(range(1, len(e.v) + 1),
                                     i -> (e.v[i] - s.sv[i]) * (e.v[i] - s.sv[i]))),
                             (a, b) -> a + b), 6) AS dist
                  FROM e CROSS JOIN seeds s),
            a AS (SELECT vec_id, cid,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                                            ORDER BY dist, cid) AS rn
                  FROM d)
            SELECT CAST(cid AS INTEGER) AS cluster, COUNT(*) AS n_vecs
            FROM a WHERE rn = 1
            GROUP BY cid ORDER BY cluster""",
        "ivf_topk": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings),
            seeds AS (SELECT v AS sv,
                             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                                vec_id) - 1 AS cid
                      FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                      LIMIT 8),
            d AS (SELECT e.vec_id, s.cid,
                         ROUND(list_reduce(
                             list_prepend(CAST(0 AS DOUBLE),
                                 list_transform(range(1, len(e.v) + 1),
                                     i -> (e.v[i] - s.sv[i]) * (e.v[i] - s.sv[i]))),
                             (a, b) -> a + b), 6) AS dist
                  FROM e CROSS JOIN seeds s),
            corp AS (SELECT vec_id, cid FROM (
                       SELECT vec_id, cid,
                              ROW_NUMBER() OVER (PARTITION BY vec_id
                                                 ORDER BY dist, cid) AS rn
                       FROM d WHERE vec_id >= 4) WHERE rn = 1),
            qprobe AS (SELECT vec_id AS q_id, cid FROM (
                         SELECT vec_id, cid,
                                ROW_NUMBER() OVER (PARTITION BY vec_id
                                                   ORDER BY dist, cid) AS rn
                         FROM d WHERE vec_id < 4) WHERE rn <= 2),
            pairs AS (SELECT DISTINCT q.q_id, c.vec_id
                      FROM qprobe q JOIN corp c ON q.cid = c.cid),
            s AS (SELECT p.q_id, p.vec_id,
                         ROUND(list_dot_product(qe.v, ce.v) /
                               (sqrt(list_dot_product(qe.v, qe.v)) *
                                sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos
                  FROM pairs p
                  JOIN e qe ON qe.vec_id = p.q_id
                  JOIN e ce ON ce.vec_id = p.vec_id),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                               ORDER BY cos DESC,
                                                        vec_id ASC) AS rank
                  FROM s)
            SELECT q_id, vec_id, cos, CAST(rank AS INTEGER) AS rank
            FROM r WHERE rank <= 3 ORDER BY q_id, rank""",
        "ivf_recall": """
            WITH e AS (SELECT vec_id,
                              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                       FROM embeddings),
            seeds AS (SELECT v AS sv,
                             ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                                vec_id) - 1 AS cid
                      FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                      LIMIT 8),
            d AS (SELECT e.vec_id, s.cid,
                         ROUND(list_reduce(
                             list_prepend(CAST(0 AS DOUBLE),
                                 list_transform(range(1, len(e.v) + 1),
                                     i -> (e.v[i] - s.sv[i]) * (e.v[i] - s.sv[i]))),
                             (a, b) -> a + b), 6) AS dist
                  FROM e CROSS JOIN seeds s),
            corp AS (SELECT vec_id, cid FROM (
                       SELECT vec_id, cid,
                              ROW_NUMBER() OVER (PARTITION BY vec_id
                                                 ORDER BY dist, cid) AS rn
                       FROM d WHERE vec_id >= 4) WHERE rn = 1),
            qprobe AS (SELECT vec_id AS q_id, cid FROM (
                         SELECT vec_id, cid,
                                ROW_NUMBER() OVER (PARTITION BY vec_id
                                                   ORDER BY dist, cid) AS rn
                         FROM d WHERE vec_id < 4) WHERE rn <= 2),
            pairs AS (SELECT DISTINCT q.q_id, c.vec_id
                      FROM qprobe q JOIN corp c ON q.cid = c.cid),
            s AS (SELECT p.q_id, p.vec_id,
                         ROUND(list_dot_product(qe.v, ce.v) /
                               (sqrt(list_dot_product(qe.v, qe.v)) *
                                sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos
                  FROM pairs p
                  JOIN e qe ON qe.vec_id = p.q_id
                  JOIN e ce ON ce.vec_id = p.vec_id),
            r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                               ORDER BY cos DESC,
                                                        vec_id ASC) AS rank
                  FROM s),
            approx AS (SELECT q_id, vec_id FROM r WHERE rank <= 3),
            xs AS (SELECT qe.vec_id AS q_id, ce.vec_id AS vec_id,
                          ROUND(list_dot_product(qe.v, ce.v) /
                                (sqrt(list_dot_product(qe.v, qe.v)) *
                                 sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos
                   FROM e qe, e ce
                   WHERE qe.vec_id < 4 AND ce.vec_id >= 4),
            xr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                                ORDER BY cos DESC,
                                                         vec_id ASC) AS rank
                   FROM xs),
            exact AS (SELECT q_id, vec_id FROM xr WHERE rank <= 3)
            SELECT x.q_id, COUNT(a.vec_id) AS n_hits,
                   ROUND(COUNT(a.vec_id) / 3.0, 6) AS recall
            FROM exact x LEFT JOIN approx a
              ON a.q_id = x.q_id AND a.vec_id = x.vec_id
            GROUP BY x.q_id ORDER BY x.q_id""",
        "pq_topk": _PQ_CORE_SQL + """
            SELECT q_id, vec_id, cos, CAST(rank AS INTEGER) AS rank
            FROM r WHERE rank <= 3 ORDER BY q_id, rank""",
        "pq_recall": _PQ_CORE_SQL + """,
            approx AS (SELECT q_id, vec_id FROM r WHERE rank <= 3),
            xs AS (SELECT qe.vec_id AS q_id, ce.vec_id AS vec_id,
                          ROUND(list_dot_product(qe.v, ce.v) /
                                (sqrt(list_dot_product(qe.v, qe.v)) *
                                 sqrt(list_dot_product(ce.v, ce.v))), 6) AS cos
                   FROM e qe, e ce
                   WHERE qe.vec_id < 4 AND ce.vec_id >= 4),
            xr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                                ORDER BY cos DESC,
                                                         vec_id ASC) AS rank
                   FROM xs),
            exact AS (SELECT q_id, vec_id FROM xr WHERE rank <= 3)
            SELECT x.q_id, COUNT(a.vec_id) AS n_hits,
                   ROUND(COUNT(a.vec_id) / 3.0, 6) AS recall
            FROM exact x LEFT JOIN approx a
              ON a.q_id = x.q_id AND a.vec_id = x.vec_id
            GROUP BY x.q_id ORDER BY x.q_id""",
        "streaming_window_stats": f"""
            WITH corpus AS ({_CORPUS_SQL})
            SELECT CAST(epoch_us(date_trunc('hour', warc_ts)) AS BIGINT)
                       AS window_us,
                   lang, COUNT(*) AS n_docs,
                   CAST(SUM(octet_length(encode(text))) AS BIGINT)
                       AS text_bytes
            FROM corpus GROUP BY 1, 2 ORDER BY window_us, lang""",
        "media_features": """
            SELECT doc_id AS media_id, 4 AS width, 4 AS height,
                   list_sum(list_transform(range(0, 16),
                       j -> CAST((doc_id * 16 + j * 3) % 256 AS DOUBLE))) / 16
                       AS mean_r,
                   list_sum(list_transform(range(0, 16),
                       j -> CAST((doc_id * 16 + j * 3 + 1) % 256 AS DOUBLE))) / 16
                       AS mean_g,
                   list_sum(list_transform(range(0, 16),
                       j -> CAST((doc_id * 16 + j * 3 + 2) % 256 AS DOUBLE))) / 16
                       AS mean_b
            FROM documents WHERE doc_id < 16 ORDER BY media_id""",
        # PNG raster byte j = (doc_id*16 + j) % 256 over an 8x8 RGB
        # image (192 bytes, 64 px/channel) — the decode path must
        # reproduce these exact means through deflate + unfiltering
        "png_features": """
            SELECT doc_id AS media_id, 8 AS width, 8 AS height,
                   list_sum(list_transform(range(0, 64),
                       j -> CAST((doc_id * 16 + j * 3) % 256 AS DOUBLE))) / 64
                       AS mean_r,
                   list_sum(list_transform(range(0, 64),
                       j -> CAST((doc_id * 16 + j * 3 + 1) % 256 AS DOUBLE))) / 64
                       AS mean_g,
                   list_sum(list_transform(range(0, 64),
                       j -> CAST((doc_id * 16 + j * 3 + 2) % 256 AS DOUBLE))) / 64
                       AS mean_b
            FROM documents WHERE doc_id < 16 ORDER BY media_id""",
        "hierarchy_rows": """
            SELECT n_nationkey, 'nation_result' AS result_name,
                   md5('nation_result' || chr(31)
                       || CAST(n_nationkey AS VARCHAR)) AS guid,
                   'plan-root' AS parent, 's1' AS step_id
            FROM nation ORDER BY n_nationkey""",
        "streaming_dedup": """
            WITH g AS (SELECT DISTINCT md5(text) AS dg FROM documents)
            SELECT COUNT(*) AS n_emitted, COUNT(DISTINCT dg) AS n_digests,
                   BIT_XOR(CAST(('0x' || substr(dg, 1, 15)) AS BIGINT))
                       AS digest_xor
            FROM g""",
        "route_encoded": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(DISTINCT md5(text)) AS n_texts
            FROM documents WHERE doc_id < 200
            GROUP BY lang ORDER BY lang""",
        "audio_features": """
            WITH v AS (SELECT doc_id AS media_id,
                              list_transform(range(0, 256),
                                  j -> CAST(((doc_id * 37 + j * 129) % 2048)
                                            - 1024 AS DOUBLE)) AS s
                       FROM documents WHERE doc_id < 12)
            SELECT media_id, 1 AS n_channels, 8000 AS sample_rate,
                   CAST(256 AS BIGINT) AS n_samples,
                   CAST(256 AS DOUBLE) / 8000 AS duration_s,
                   sqrt(list_sum(list_transform(s, x -> x * x)) / 256) AS rms,
                   CAST(len(list_filter(range(1, 256),
                        j -> (s[j + 1] < 0) != (s[j] < 0))) AS BIGINT)
                       AS zero_crossings
            FROM v ORDER BY media_id""",
    }
