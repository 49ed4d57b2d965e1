"""Streaming ingest -> encoded table: exactly-once micro-batch commits.

Reference parity: O18 buffer-then-flush lifecycle
(/root/reference/Parquet/ParquetResultListener.cs:107-117) rendered as
foreachBatch over Structured Streaming; idempotent epoch part ranges
give exactly-once on re-delivery.
"""

import os
import tempfile

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

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


@pytest.mark.spark
def test_windowed_ingest_stats_with_watermark(spark):
    import numpy as np
    import pyarrow.parquet as pq

    from parquet_spark.corpus import gen_batch
    from parquet_spark.streaming import file_stream, windowed_ingest_stats

    src = tempfile.mkdtemp(prefix="wstats_src_")
    ckpt = tempfile.mkdtemp(prefix="wstats_ckpt_")
    # batch 1: ids 0..300 (~10 min of event time); batch 2 is ~55h later,
    # so its arrival pushes the watermark past every batch-1 window
    b1 = gen_batch(np.arange(300, dtype=np.uint64), seed=41)
    b2 = gen_batch(np.arange(100_000, 100_050, dtype=np.uint64), seed=41)
    pq.write_table(pa.Table.from_batches([b1]), os.path.join(src, "f1.parquet"))
    pq.write_table(pa.Table.from_batches([b2]), os.path.join(src, "f2.parquet"))

    stream = file_stream(spark, src, CORPUS_DDL)
    q = (windowed_ingest_stats(stream, window="10 minutes",
                               watermark="30 minutes").writeStream
         .format("memory").queryName("wstats")
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("select * from wstats")
    # every batch-1 window is finalized; batch-2 windows are still open
    total = out.agg(F.sum("n_docs")).head()[0] or 0
    assert out.count() > 0
    assert total == 300


@pytest.mark.spark
def test_streaming_dedup_with_ttl_still_dedups_within_window(spark, tmp_path):
    """TTL variant: behavior within the active window is identical to
    the unbounded version (same digests, lowest id wins); the timeout
    path only evicts idle state."""
    import pandas as pd
    src = tmp_path / "ttl_src"
    src.mkdir()
    pd.DataFrame({"doc_id": [5, 3, 9], "text": ["a", "a", "b"]}).to_parquet(
        src / "b0.parquet")
    from parquet_spark.streaming import file_stream, streaming_dedup
    stream = file_stream(spark, str(src), "doc_id long, text string")
    out = streaming_dedup(stream, ttl_ms=60_000)
    q = (out.writeStream.format("memory").queryName("ttl_dedup")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r.digest: r.doc_id
            for r in spark.sql("select * from ttl_dedup").collect()}
    assert len(rows) == 2 and sorted(rows.values()) == [3, 9]


@pytest.mark.spark
def test_encode_stream_into_wap_branch(spark, tmp_path):
    """Audit-gated streaming ingest: micro-batch commits stage on a
    branch (published readers see nothing mid-stream), then one
    publish releases the whole audited stream atomically."""
    from parquet_spark.manifest import (EncodedTable, publish_branch,
                                        read_decoded)
    from parquet_spark.streaming import encode_stream, file_stream
    src = str(tmp_path / "in")
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").where("doc_id < 200")
    docs.where("doc_id < 100").coalesce(1).write.parquet(src)
    docs.where("doc_id >= 100").coalesce(1).write.parquet(src,
                                                          mode="append")
    tbl = str(tmp_path / "tbl")
    ddl = "doc_id long, text string, lang string, source string, " \
          "n_chars long"
    q = encode_stream(file_stream(spark, src, ddl), tbl,
                      str(tmp_path / "ckpt"), key=["doc_id"], n_parts=2,
                      branch="ingest")
    q.awaitTermination(120)
    assert EncodedTable(tbl)._current_name() is None  # nothing published
    staged = read_decoded(spark, tbl, ref="ingest")
    assert staged.count() == 200
    publish_branch(tbl, "ingest")
    assert read_decoded(spark, tbl).count() == 200


@pytest.mark.spark
def test_stream_sink_datasource_v2(spark):
    """writeStream.format('parquet_spark'): the DataSource V2 streaming
    sink commits each microbatch as one manifest CAS snapshot with
    stream_last_batch idempotency; both read paths see all rows."""
    from parquet_spark.corpus import gen_corpus
    from parquet_spark.datasource import register
    from parquet_spark.manifest import EncodedTable, read_decoded
    from parquet_spark.streaming import file_stream
    from parquet_spark.verify import verify_roundtrip

    register(spark)
    src = tempfile.mkdtemp(prefix="dss_src_")
    d1 = gen_corpus(spark, 300, seed=31, parts=1)
    d2 = gen_corpus(spark, 300, seed=32, parts=1)
    d1.write.parquet(os.path.join(src, "f1.parquet"))
    d2.write.parquet(os.path.join(src, "f2.parquet"))

    tbl = tempfile.mkdtemp(prefix="dss_tbl_")
    ckpt = tempfile.mkdtemp(prefix="dss_ckpt_")
    q = (file_stream(spark, src, CORPUS_DDL)
         .writeStream.format("parquet_spark")
         .option("key", "url")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start(tbl))
    q.awaitTermination(120)

    both = d1.unionByName(d2)
    dec = read_decoded(spark, tbl)
    assert dec.count() == 600
    verify_roundtrip(both, dec, key=["url"], digest_col="text")
    t = EncodedTable(tbl)
    snap = t.current_snapshot()
    assert snap["meta"]["layout"]["mode"] == "external"
    assert snap["meta"]["stream_last_batch"] >= 1  # two microbatches
    # part ids disjoint across batches, lineage complete
    pids = sorted(int(p) for p in snap["parts"])
    assert len(pids) == len(set(pids)) >= 2
    for info in snap["parts"].values():
        assert info["file_hash"] and info["zones"]

    # restart with the SAME checkpoint and a third file: only the new
    # file commits (exactly-once across restarts)
    d3 = gen_corpus(spark, 300, seed=33, parts=1)
    d3.write.parquet(os.path.join(src, "f3.parquet"))
    q2 = (file_stream(spark, src, CORPUS_DDL)
          .writeStream.format("parquet_spark")
          .option("key", "url")
          .option("checkpointLocation", ckpt)
          .trigger(availableNow=True)
          .start(tbl))
    q2.awaitTermination(120)
    assert read_decoded(spark, tbl).count() == 900


@pytest.mark.spark
def test_stream_sink_replayed_batch_is_discarded(spark):
    """Direct idempotency check on the sink contract: re-delivering an
    already-committed batchId discards the attempt's files instead of
    double-appending (the crash window between sink commit and Spark's
    offset commit)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    from parquet_spark.corpus import gen_corpus
    from parquet_spark.datasource import _EncodedTableStreamWriter
    from parquet_spark.manifest import EncodedTable, read_decoded

    tbl = tempfile.mkdtemp(prefix="dss_replay_")
    d = gen_corpus(spark, 200, seed=41, parts=1)
    w = _EncodedTableStreamWriter({"path": tbl, "key": "url"},
                                  d.schema, overwrite=False)
    batches = d.toArrow().to_batches()
    from pyspark import TaskContext  # noqa: F401  (executor-only dep)

    class _Ctx:  # minimal TaskContext stand-in for a driver-side call
        @staticmethod
        def partitionId():
            return 0
    import pyspark
    orig = pyspark.TaskContext.get
    pyspark.TaskContext.get = staticmethod(lambda: _Ctx)
    try:
        m0 = w.write(iter(batches))
        w.commit([m0], 0)
        n1 = read_decoded(spark, tbl).count()
        # replay batch 0: new files written, commit must discard them
        m0r = w.write(iter(batches))
        w.commit([m0r], 0)
    finally:
        pyspark.TaskContext.get = orig
    assert read_decoded(spark, tbl).count() == n1 == 200
    assert not os.path.exists(m0r.file)  # replay's file removed
    snap = EncodedTable(tbl).current_snapshot()
    assert snap["meta"]["stream_last_batch"] == 0


@pytest.mark.spark
def test_stream_source_datasource_v2(spark, tmp_path):
    """readStream.format('parquet_spark'): the encoded table as a
    streaming source — batch 1 replays the whole table (earliest),
    later batches are exactly the appended parts (snapshot-id
    offsets), mirroring read_increment under Structured Streaming."""
    from parquet_spark.corpus import gen_corpus
    from parquet_spark.datasource import register
    from parquet_spark.manifest import write_encoded

    register(spark)
    tbl = tempfile.mkdtemp(prefix="dsr_tbl_")
    d1 = gen_corpus(spark, 250, seed=51, parts=1)
    write_encoded(d1, tbl, key=["url"], n_parts=2)

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    def run_once():
        q = (spark.readStream.format("parquet_spark").load(tbl)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(120)
    run_once()
    got = spark.read.parquet(out_dir)
    assert got.count() == 250
    # append a second epoch; a restarted query emits ONLY the delta
    d2 = gen_corpus(spark, 250, seed=52, parts=1)
    write_encoded(d2, tbl, key=["url"], n_parts=2, part_offset=2)
    run_once()
    got = spark.read.parquet(out_dir)
    assert got.count() == 500
    # content equality with the union (urls differ per seed)
    both = d1.unionByName(d2).select("url", "text")
    assert got.select("url", "text").exceptAll(both).count() == 0
    assert both.exceptAll(got.select("url", "text")).count() == 0


@pytest.mark.spark
def test_stream_source_starting_latest_and_guards(spark, tmp_path):
    from parquet_spark.corpus import gen_corpus
    from parquet_spark.datasource import register
    from parquet_spark.manifest import write_encoded

    register(spark)
    tbl = tempfile.mkdtemp(prefix="dsr_lat_")
    d1 = gen_corpus(spark, 200, seed=61, parts=1)
    write_encoded(d1, tbl, key=["url"], n_parts=2)
    out_dir = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")

    def run_once():
        q = (spark.readStream.format("parquet_spark")
             .option("starting", "latest").load(tbl)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination(120)

    run_once()  # nothing new since query start -> no rows
    import os as _os
    files = [f for f in _os.listdir(out_dir)
             if f.endswith(".parquet")] if _os.path.exists(out_dir) else []
    n0 = (spark.read.parquet(out_dir).count() if files else 0)
    assert n0 == 0
    # append -> only the appended rows arrive
    d2 = gen_corpus(spark, 150, seed=62, parts=1)
    write_encoded(d2, tbl, key=["url"], n_parts=2, part_offset=2)
    run_once()
    assert spark.read.parquet(out_dir).count() == 150


def test_stream_fence_survives_maintenance(spark):
    """A compaction (or any lifecycle commit) landing inside the crash
    window between a batch commit and Spark's offset commit must not
    erase the stream_last_batch fence — the replayed batch is still
    discarded, and a later library append keeps carrying the fence."""
    from parquet_spark.corpus import gen_corpus
    from parquet_spark.datasource import _EncodedTableStreamWriter
    from parquet_spark.manifest import (EncodedTable, compact_table,
                                        read_decoded)

    tbl = tempfile.mkdtemp(prefix="dss_fence_")
    d = gen_corpus(spark, 200, seed=43, parts=1)
    w = _EncodedTableStreamWriter({"path": tbl, "key": "url"},
                                  d.schema, overwrite=False)
    batches = d.toArrow().to_batches()

    class _Ctx:
        @staticmethod
        def partitionId():
            return 0
    import pyspark
    orig = pyspark.TaskContext.get
    pyspark.TaskContext.get = staticmethod(lambda: _Ctx)
    try:
        w.commit([w.write(iter(batches))], 0)
        compact_table(spark, tbl, target_parts=1)   # maintenance lands
        snap = EncodedTable(tbl).current_snapshot()
        assert snap["meta"]["stream_last_batch"] == 0  # fence carried
        m0r = w.write(iter(batches))                # batch 0 replays
        w.commit([m0r], 0)
        assert read_decoded(spark, tbl).count() == 200  # discarded
        assert not os.path.exists(m0r.file)
        # the stream CONTINUES across maintenance: a genuinely new
        # batch appends with ids claimed past the compacted parts
        d2 = gen_corpus(spark, 150, seed=44, parts=1)
        w.commit([w.write(iter(d2.toArrow().to_batches()))], 1)
    finally:
        pyspark.TaskContext.get = orig
    assert read_decoded(spark, tbl).count() == 350
    snap = EncodedTable(tbl).current_snapshot()
    assert snap["meta"]["stream_last_batch"] == 1
