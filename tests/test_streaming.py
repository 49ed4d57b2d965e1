"""Streaming ingest -> encoded table: exactly-once micro-batch commits.

Reference parity: O18 buffer-then-flush lifecycle
(/root/reference/Parquet/ParquetResultListener.cs:107-117) rendered as
foreachBatch over Structured Streaming; idempotent epoch part ranges
give exactly-once on re-delivery.
"""

import os
import tempfile

import pytest

from parquet_spark.corpus import CORPUS_DDL


@pytest.mark.spark
def test_stream_encode_two_batches(spark):
    from parquet_spark.corpus import gen_corpus
    from parquet_spark.manifest import EncodedTable, read_decoded
    from parquet_spark.streaming import encode_stream, file_stream
    from parquet_spark.verify import verify_roundtrip

    src = tempfile.mkdtemp(prefix="stream_src_")
    d1 = gen_corpus(spark, 400, seed=21, parts=1)
    d2 = gen_corpus(spark, 400, seed=22, parts=1)
    d1.write.parquet(os.path.join(src, "f1.parquet"))
    d2.write.parquet(os.path.join(src, "f2.parquet"))

    tbl = tempfile.mkdtemp(prefix="stream_tbl_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    q = encode_stream(file_stream(spark, src, CORPUS_DDL), tbl, ckpt,
                      key=["url"], n_parts=2)
    q.awaitTermination(120)

    both = d1.unionByName(d2)
    dec = read_decoded(spark, tbl)
    assert dec.count() == 800
    verify_roundtrip(both, dec, key=["url"], digest_col="text")
    # two epochs -> two disjoint part-id ranges
    pids = sorted(int(p) for p in EncodedTable(tbl).committed_parts())
    assert len(pids) >= 2 and max(pids) >= 2  # second epoch used offset


@pytest.mark.spark
def test_stream_restart_is_exactly_once(spark):
    from parquet_spark.corpus import gen_corpus
    from parquet_spark.manifest import read_decoded
    from parquet_spark.streaming import encode_stream, file_stream

    src = tempfile.mkdtemp(prefix="stream_src2_")
    gen_corpus(spark, 300, seed=31, parts=1) \
        .write.parquet(os.path.join(src, "f1.parquet"))
    tbl = tempfile.mkdtemp(prefix="stream_tbl2_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt2_")

    q = encode_stream(file_stream(spark, src, CORPUS_DDL), tbl, ckpt,
                      key=["url"], n_parts=2)
    q.awaitTermination(120)
    n1 = read_decoded(spark, tbl).count()

    # restart over the same checkpoint: no new files -> no duplicates
    q = encode_stream(file_stream(spark, src, CORPUS_DDL), tbl, ckpt,
                      key=["url"], n_parts=2)
    q.awaitTermination(120)
    assert read_decoded(spark, tbl).count() == n1 == 300


@pytest.mark.spark
def test_streaming_dedup_across_batches(spark):
    from parquet_spark.streaming import file_stream, streaming_dedup

    src = tempfile.mkdtemp(prefix="sdedup_src_")
    ckpt = tempfile.mkdtemp(prefix="sdedup_ckpt_")
    b1 = spark.createDataFrame(
        [(0, "alpha text"), (1, "beta text")], ["doc_id", "text"])
    b2 = spark.createDataFrame(
        [(2, "beta text"), (3, "gamma text"), (4, "gamma text")],
        ["doc_id", "text"])
    b1.coalesce(1).write.parquet(os.path.join(src, "b1.parquet"))
    b2.coalesce(1).write.parquet(os.path.join(src, "b2.parquet"))

    stream = file_stream(spark, src, "doc_id long, text string")
    q = (streaming_dedup(stream).writeStream
         .format("memory").queryName("dedup_out")
         .outputMode("update")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r.doc_id for r in spark.sql("select * from dedup_out").collect()}
    # one keeper per distinct text across ALL batches; min id wins
    got = sorted(rows)
    assert 0 in got and 3 in got           # alpha, gamma keepers
    assert (1 in got) != (2 in got) or 1 in got  # beta emitted exactly once
    n = spark.sql(
        "select count(distinct digest) c from dedup_out").head().c
    assert n == 3 and len(got) == 3
