"""Dump physical plans of the engine's key operators -> PLANS.md.

Evidence that the declarative plans hit the right physical strategies:
filter/column pushdown into parquet scans, broadcast joins for small
sides, map-side partial aggregation, no Python UDFs outside the codec
mapInArrow stages, AQE enabled. Run: python scripts/dump_plans.py
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    from parquet_spark import tune_malloc_for_workers
    tune_malloc_for_workers()
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from parquet_spark.engine import decode_table, encode_table, prune_chunks
    from parquet_spark.textops.dedup import exact_dedup, minhash_signatures
    from parquet_spark.textops.similarity import cosine_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "embedding", F.expr("transform(embedding, x -> cast(x as double))"))

    sections = []

    def add(title, note, df):
        sections.append((title, note, explain_str(df)))

    add("Projection pushdown to the parquet scan",
        "A 2-column projection must not read `text`/`embedding`: "
        "ReadSchema below lists only doc_id and lang.",
        docs.select("doc_id", "lang").where(F.col("doc_id") < 100))

    add("Encode plan (hash layout)",
        "One exchange (hashpartitioning on the key), in-partition sort, "
        "then the single Arrow codec stage (MapInArrow). No other Python.",
        encode_table(docs.limit(1000), key=["doc_id"], n_parts=4))

    enc = encode_table(docs, key=["doc_id"], n_parts=4)
    add("Zone-map pruned decode",
        "prune_chunks is a metadata-only Filter BEFORE MapInArrow: pruned "
        "chunks never reach the decoder.",
        decode_table(prune_chunks(enc.where(F.col("part_id") == 0)),
                     columns=None))

    from parquet_spark.engine import prune_chunks_pred
    add("Composite-predicate pruned decode (multi-column zones)",
        "prune_chunks_pred compiles an AND/OR range predicate over the "
        "zone arrays into one codegen Filter on chunk metadata, ahead "
        "of the decoder MapInArrow - no payload is touched for pruned "
        "chunks.",
        decode_table(prune_chunks_pred(
            enc, [("doc_id", 0, 100), ("n_chars", 0, 100000)])))

    from parquet_spark.engine import scan_filtered
    add("IN-list predicate pushdown (scan_filtered)",
        "A sparse IN-list compiles to per-VALUE zone checks in one "
        "codegen Filter on chunk metadata (chunks between the listed "
        "values are skipped), then the residual isin() after the "
        "decoder — the encoded analog of parquet PushedFilters for "
        "IN.",
        scan_filtered(enc, [("doc_id", "in", [3, 250, 444])]))

    add("Exact dedup (hash groupBy on md5 digest)",
        "partial_count before the exchange = map-side combine; the "
        "shuffle carries one row per distinct digest per partition.",
        exact_dedup(docs))

    add("MinHash signatures (engine path: int64 xxhash64)",
        "explode + groupBy min() over int64 hashes — all codegen, no "
        "UDFs, and the min() over fixed-width longs compiles to "
        "HashAggregate with map-side partial mins (the earlier md5-"
        "string variant fell back to SortAggregate: a per-partition "
        "sort of the exploded shingle stream, and 32-hex-char keys on "
        "the wire ~4x the shuffle bytes).  The md5 mode survives only "
        "in the DuckDB-checked facets.",
        minhash_signatures(docs.limit(500), n_hashes=2))

    add("Cosine top-k (broadcast the small query side)",
        "BroadcastNestedLoopJoin with the 3-row query set broadcast; the "
        "corpus side streams once with no shuffle before the window.",
        cosine_topk(emb.where(F.col("vec_id") >= 3),
                    emb.where(F.col("vec_id") < 3)
                    .select(F.col("vec_id").alias("q_id"), "embedding"),
                    k=3))

    from parquet_spark.textops.similarity import (ivf_recall,
                                                  ivf_seeds_md5)
    add("IVF recall@k (evaluation metric)",
        "Both searches keep their production shapes — the exact side's "
        "BroadcastNestedLoopJoin + WindowGroupLimit and the IVF side's "
        "cluster-keyed join with the broadcast probe fan-out — and the "
        "metric join itself touches only k x |queries| rows per side "
        "(driver-free, broadcast-able at any corpus size).",
        ivf_recall(emb.where(F.col("vec_id") >= 4),
                   emb.where(F.col("vec_id") < 4)
                   .select(F.col("vec_id").alias("q_id"), "embedding"),
                   ivf_seeds_md5(emb, n_clusters=4), k=3, nprobe=2))

    from parquet_spark.textops.similarity import pq_codebooks_md5, pq_topk
    add("PQ compressed search (ADC + exact re-rank)",
        "Candidate generation scans only the m-byte code arrays — the "
        "ADC score is a codegen expression over the broadcast codebook "
        "literal, no join against the float vectors; the exact-cosine "
        "re-rank then joins just the k*rerank candidates per query "
        "back to their vectors (broadcast-able at any corpus size).",
        pq_topk(emb.where(F.col("vec_id") >= 4),
                emb.where(F.col("vec_id") < 4)
                .select(F.col("vec_id").alias("q_id"), "embedding"),
                pq_codebooks_md5(emb, m=4, k=8), k=3, rerank=2))

    from parquet_spark.textops.similarity import bounded_topk
    add("Bounded two-level top-k (explicit rendering, n above the "
        "WindowGroupLimit threshold)",
        "The first window partitions by (q_id, spark_partition_id()) — "
        "a local top-n per (query, input partition), so candidates "
        "spread across |queries| x n_parts reducers and no task ever "
        "sorts more than one input partition's share; the second window "
        "ranks only the surviving <= n * n_parts rows per query.  This "
        "is the rendering every ranking site switches to when n exceeds "
        "the WindowGroupLimit threshold, where Catalyst's Partial/Final "
        "limit rewrite no longer fires; below it the plain single "
        "window (previous sections) already carries the same bound with "
        "one fewer exchange.",
        bounded_topk(
            emb.where(F.col("vec_id") >= 3)
            .join(F.broadcast(emb.where(F.col("vec_id") < 3)
                              .select(F.col("vec_id").alias("q_id"),
                                      F.col("embedding").alias("qv"))))
            .withColumn("score", F.expr(
                "aggregate(zip_with(embedding, qv, (a, b) -> a * b), "
                "0D, (acc, x) -> acc + x)")),
            [F.col("score").desc(), F.col("vec_id").asc()], n=3))

    from parquet_spark.temporal import asof_join, range_join
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks = events.where(F.col("event_type") == "click")
    errors = events.where(F.col("event_type") == "error")
    add("As-of join (union + window fill)",
        "NO join node anywhere: both sides union into one "
        "(key, time, side)-ordered stream and a last_value window "
        "fills each left row with the preceding right payload — one "
        "exchange on the entity key, one in-partition sort, same plan "
        "shape as any windowed aggregate.",
        asof_join(clicks, errors, "ts", by=["user_id"],
                  right_cols=["event_id"]))

    add("Range join (grid-cell equi-join rewrite)",
        "The inequality containment join appears as a HASH join on "
        "(user_id, cell) — intervals Generate(explode) their cell "
        "span, points map to one cell, and the exact containment "
        "predicate is a post-join Filter. The naive form would be a "
        "BroadcastNestedLoopJoin re-scanning every interval per point.",
        range_join(clicks,
                   errors.select("user_id", F.col("ts").alias("start"),
                                 F.expr("ts + INTERVAL 2 HOURS")
                                 .alias("end"),
                                 F.col("event_id").alias("win_id")),
                   "ts", "start", "end", by=["user_id"], bucket=3600))

    import tempfile

    from parquet_spark.manifest import read_decoded, write_encoded
    gtbl = tempfile.mkdtemp(prefix="plans_gdict_")
    write_encoded(docs.select("doc_id", "lang"), gtbl, key=["doc_id"],
                  n_parts=2, global_dict_cols=["lang"])
    add("Global-dict restore on read (no join)",
        "Columns stored as global-dict int ids are restored by a "
        "LITERAL array lookup inside the projection — pure codegen, no "
        "broadcast, no shuffle; the dictionary rides in the plan, not "
        "in the data.",
        read_decoded(spark, gtbl))

    out = ["# PLANS — physical-plan evidence",
           "",
           "Generated by `python scripts/dump_plans.py` "
           "(Spark 4, AQE on). Each section: why the plan is the one "
           "we want at 100 TB, then `explain('formatted')` output.",
           ""]
    for title, note, plan in sections:
        out += [f"## {title}", "", note, "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
