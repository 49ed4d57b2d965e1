"""End-to-end demo: the 60-second tour of the engine.

    python scripts/demo.py [n_docs]

Generates a deterministic Common-Crawl-style corpus, writes it as an
encoded table (scan-stage path), prints lineage and per-column codec
stats, reads it back with column projection + zone-map pruning, and
verifies the round trip bit-identically.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    from parquet_spark import tune_malloc_for_workers
    tune_malloc_for_workers()
    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from parquet_spark import (encode_table, decode_table, encoding_stats,
                               gen_corpus, prune_chunks, read_decoded,
                               verify_roundtrip, write_encoded_splits)

    work = tempfile.mkdtemp(prefix="pqspark_demo_")
    src = os.path.join(work, "corpus.parquet")
    tbl = os.path.join(work, "encoded_table")

    print(f"1) generating {n_docs:,} deterministic web pages ...")
    gen_corpus(spark, n_docs, seed=42, parts=8).write.parquet(src)
    df = spark.read.parquet(src)

    print("2) scan-stage encode -> committed table with lineage ...")
    t0 = time.monotonic()
    snap = write_encoded_splits(spark, src, tbl, n_tasks=8)
    dt = time.monotonic() - t0
    parts = snap["parts"].values()
    bi = sum(p["bytes_in"] for p in parts)
    bo = sum(p["bytes_out"] for p in parts)
    print(f"   {len(parts)} parts, {bi/1e6:.1f} MB -> {bo/1e6:.1f} MB "
          f"({bi/bo:.2f}x) in {dt:.1f}s  [snapshot {snap['snapshot_id']}]")

    print("3) per-column codec choices (url-hash layout path):")
    enc = encode_table(df, key=["url"], n_parts=8)
    encoding_stats(enc).orderBy("column").show(truncate=False)

    print("4) projected + zone-pruned read (url range) ...")
    enc_c = encode_table(df, key=["url"], n_parts=8,
                         rows_per_chunk=200).cache()
    pruned = prune_chunks(enc_c, "https://host1", "https://host2zz")
    hit = decode_table(pruned, columns=["url", "lang"]) \
        .where(F.col("url").startswith("https://host1"))
    print(f"   chunks: {enc_c.count()} total -> {pruned.count()} after "
          f"pruning; matching rows: {hit.count()}")
    enc_c.unpersist()

    print("5) bit-identical round-trip verification ...")
    rep = verify_roundtrip(df, read_decoded(spark, tbl),
                           key=["url"], digest_col="text")
    print("   ", rep)

    print("6) global-dict table (lang stored as int ids) ...")
    from parquet_spark.manifest import EncodedTable, write_encoded
    gtbl = os.path.join(work, "gdict_table")
    write_encoded(df.select("url", "lang"), gtbl, key=["url"], n_parts=4,
                  global_dict_cols=["lang"])
    t = EncodedTable(gtbl)
    print(f"   stored type: {t.schema().field('lang').type}; dictionary "
          f"({len(t.meta()['global_dicts']['lang'])} values) lives in the "
          "snapshot; read_decoded restores strings transparently")

    print("7) rechunking compaction of a fragmented table ...")
    from parquet_spark.manifest import compact_table, read_encoded
    frag = os.path.join(work, "frag_table")
    write_encoded(df, frag, key=["url"], n_parts=8,
                  rows_per_chunk=max(1000, n_docs))  # every chunk small
    before = read_encoded(spark, frag).count()
    compact_table(spark, frag, target_parts=1, rechunk=True)
    after = read_encoded(spark, frag).count()
    print(f"   {before} under-sized chunks -> {after} full-size chunks; "
          "round-trip stays bit-identical")
    verify_roundtrip(df, read_decoded(spark, frag), key=["url"],
                     digest_col="text")
    print("done.")
    spark.stop()


if __name__ == "__main__":
    main()
