"""Split-based (scan-stage) encode path: correctness + resume.

Mirrors the reference's encode->decode round-trip oracle
(/root/reference/Parquet.Tests/ParquetFileTests.cs:134-172) on the
narrow, no-shuffle path.
"""

import os
import tempfile

import pytest

from tests.conftest import TESTDATA


@pytest.fixture(scope="module")
def corpus_path(spark):
    from parquet_spark.corpus import gen_corpus
    d = tempfile.mkdtemp(prefix="splits_corpus_")
    p = os.path.join(d, "corpus.parquet")
    gen_corpus(spark, 3000, seed=11, parts=3).write.mode("overwrite").parquet(p)
    return p


@pytest.mark.spark
def test_list_splits_covers_all_rows(spark, corpus_path):
    from parquet_spark.splits import list_splits
    splits = list_splits(corpus_path)
    assert len(splits) >= 3
    assert sum(s["n_rows"] for s in splits) == 3000
    assert [s["split_id"] for s in splits] == list(range(len(splits)))


@pytest.mark.spark
def test_encode_splits_roundtrip(spark, corpus_path):
    from parquet_spark.engine import decode_table
    from parquet_spark.splits import encode_splits
    from parquet_spark.verify import verify_roundtrip
    df = spark.read.parquet(corpus_path)
    enc = encode_splits(spark, corpus_path, n_tasks=4)
    dec = decode_table(enc)
    verify_roundtrip(df, dec, key=["url"], digest_col="text")


@pytest.mark.spark
def test_encode_splits_small_chunks(spark, corpus_path):
    from parquet_spark.splits import encode_splits
    enc = encode_splits(spark, corpus_path, n_tasks=2, rows_per_chunk=257)
    rows = enc.select("part_id", "chunk_id", "n_rows").collect()
    per_part = {}
    for r in rows:
        per_part.setdefault(r.part_id, []).append(r.chunk_id)
    for cids in per_part.values():
        assert sorted(cids) == list(range(len(cids)))  # sequential chunk ids


@pytest.mark.spark
def test_write_encoded_splits_resume(spark, corpus_path):
    from parquet_spark.manifest import read_decoded
    from parquet_spark.splits import list_splits, write_encoded_splits
    from parquet_spark.verify import verify_roundtrip
    df = spark.read.parquet(corpus_path)
    n_splits = len(list_splits(corpus_path))
    tbl = tempfile.mkdtemp(prefix="splits_tbl_")
    snap1 = write_encoded_splits(spark, corpus_path, tbl, limit_parts=1)
    assert len(snap1["parts"]) == 1
    snap2 = write_encoded_splits(spark, corpus_path, tbl)
    assert len(snap2["parts"]) == n_splits
    assert snap2["meta"]["new_parts"] == [
        s for s in range(n_splits) if s != snap1["meta"]["new_parts"][0]]
    dec = read_decoded(spark, tbl)
    verify_roundtrip(df, dec, key=["url"], digest_col="text")


@pytest.mark.spark
def test_write_encoded_splits_noop_when_done(spark, corpus_path):
    from parquet_spark.splits import write_encoded_splits
    tbl = tempfile.mkdtemp(prefix="splits_tbl2_")
    write_encoded_splits(spark, corpus_path, tbl)
    snap = write_encoded_splits(spark, corpus_path, tbl)  # nothing to do
    assert snap["meta"]["new_parts"] == []


@pytest.mark.spark
def test_encode_splits_on_documents_table(spark):
    from parquet_spark.engine import decode_table
    from parquet_spark.splits import encode_splits
    from parquet_spark.verify import verify_roundtrip
    p = f"{TESTDATA}/sf0.001/documents.parquet"
    df = spark.read.parquet(p)
    dec = decode_table(encode_splits(spark, p, n_tasks=2))
    verify_roundtrip(df, dec, key=["doc_id"], digest_col="text")


@pytest.mark.spark
def test_sorted_timestamps_get_delta_advantage(spark, corpus_path):
    """Splits mode preserves input (id/time) order, so warc_ts deltas are
    small and the int stream beats the unsorted hash layout on that
    column (FOR/DELTA engage; reference O13 analog)."""
    from pyspark.sql import functions as F

    from parquet_spark.engine import encode_table, encoding_stats
    from parquet_spark.splits import encode_splits

    def ts_bytes(enc):
        st = {r.column: r for r in encoding_stats(enc).collect()}
        assert st["warc_ts"].codec == "int"
        return st["warc_ts"].bytes_out

    splits_b = ts_bytes(encode_splits(spark, corpus_path, n_tasks=2))
    df = spark.read.parquet(corpus_path)
    hash_b = ts_bytes(encode_table(df, key=["url"], n_parts=2))
    # time-ordered chunks must compress the timestamp column materially
    # better than url-hash-scrambled chunks (margin grows with chunk
    # size; this fixture's chunks are only ~1k rows)
    assert splits_b < 0.8 * hash_b


@pytest.mark.spark
def test_compact_splits_table(spark, corpus_path):
    """Scan-stage tables compact like layout tables (O10/O11 merge)."""
    import tempfile

    from parquet_spark.manifest import (EncodedTable, compact_table,
                                        read_decoded)
    from parquet_spark.splits import write_encoded_splits
    from parquet_spark.verify import verify_roundtrip
    df = spark.read.parquet(corpus_path)
    tbl = tempfile.mkdtemp(prefix="splits_compact_")
    write_encoded_splits(spark, corpus_path, tbl)
    n_before = len(EncodedTable(tbl).data_files())
    assert n_before >= 3
    compact_table(spark, tbl, target_parts=1)
    assert len(EncodedTable(tbl).data_files()) == 1
    verify_roundtrip(df, read_decoded(spark, tbl),
                     key=["url"], digest_col="text")
