"""Round-2 hardening: multi-column zone maps / composite pruning,
Mappings persistence, compaction crash-safety + vacuum, and resume
layout fingerprints.

Reference parity: Mappings metadata mirrors
/root/reference/Parquet.Core/Fragment.cs:117-125 (asserted in
Parquet.Tests/FragmentTests.cs:254-313); atomic-finalize semantics
mirror ParquetFile.cs:37-47,106-125.
"""

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from parquet_spark.engine import (decode_table, encode_table, prune_chunks,
                                  prune_chunks_pred)
from parquet_spark.manifest import (EncodedTable, compact_table, read_decoded,
                                    vacuum_table, write_encoded)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.mark.spark
def test_composite_pruning_beats_single_column(spark):
    """A two-column AND predicate must prune at least as hard as either
    single bound, and the pruned decode must equal the full filter."""
    from parquet_spark.corpus import gen_corpus
    df = gen_corpus(spark, 2000, seed=42, parts=2)
    enc = encode_table(df, key=["url"], n_parts=4, rows_per_chunk=100).cache()
    lo, hi = "https://host1", "https://host4"
    n_all = enc.count()
    by_url = prune_chunks_pred(enc, [("url", lo, hi)]).count()
    # warc_ts zone: numeric bounds over a mid-range window
    b = enc.agg(F.min("key_min_num"), F.max("key_max_num")).head()
    # url is the sort key; grab ts bounds from the multi-column zones
    z = (enc.select(F.posexplode("zone_cols").alias("i", "c"),
                    F.col("zone_min_num"), F.col("zone_max_num"))
         .where(F.col("c") == "warc_ts")
         .agg(F.min(F.try_element_at("zone_min_num",
                                     (F.col("i") + 1).cast("int"))),
              F.max(F.try_element_at("zone_max_num",
                                     (F.col("i") + 1).cast("int")))).head())
    t_lo = z[0] + (z[1] - z[0]) // 4
    t_hi = z[0] + (z[1] - z[0]) // 2
    by_ts = prune_chunks_pred(enc, [("warc_ts", t_lo, t_hi)]).count()
    both = prune_chunks_pred(
        enc, [("url", lo, hi), ("warc_ts", t_lo, t_hi)])
    n_both = both.count()
    assert n_both <= min(by_url, by_ts) < n_all
    us = F.expr("timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ'1970-01-01 00:00:00', warc_ts)")
    want = df.where((F.col("url") >= lo) & (F.col("url") <= hi)
                    & us.between(t_lo, t_hi))
    got = decode_table(both).where(
        (F.col("url") >= lo) & (F.col("url") <= hi) & us.between(t_lo, t_hi))
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    enc.unpersist()


@pytest.mark.spark
def test_composite_pruning_or_branches(spark, docs):
    enc = encode_table(docs, key=["doc_id"], n_parts=2,
                       rows_per_chunk=50).cache()
    n_all = enc.count()
    pred = {"any": [[("doc_id", 0, 60)], [("doc_id", 400, None)]]}
    kept = prune_chunks_pred(enc, pred)
    assert 0 < kept.count() < n_all
    got = decode_table(kept).where(
        F.col("doc_id").between(0, 60) | (F.col("doc_id") >= 400))
    want = docs.where(
        F.col("doc_id").between(0, 60) | (F.col("doc_id") >= 400))
    assert got.count() == want.count() > 0
    enc.unpersist()


@pytest.mark.spark
def test_mappings_persist_and_recover_cold(spark, docs):
    """Merge colliding frames, write with mappings, reopen the table cold
    and recover physical->logical names (FragmentTests.cs:254-313)."""
    from parquet_spark.merge import merge_tables
    a = docs.select("doc_id", F.col("n_chars").alias("payload"))
    b = docs.select("doc_id", F.col("lang").alias("payload"))
    merged, mappings = merge_tables([a, b], order_key=["doc_id"])
    assert mappings == {"payload/bigint": "payload",
                        "payload/string": "payload"}
    tbl = tempfile.mkdtemp(prefix="mappings_tbl_")
    write_encoded(merged, tbl, key=["doc_id"], n_parts=2, mappings=mappings)
    cold = EncodedTable(tbl)  # fresh handle, no shared state
    assert cold.mappings() == mappings
    dec = read_decoded(spark, tbl)
    assert set(mappings) <= set(dec.columns)
    # mappings survive a resume commit and a compaction
    write_encoded(merged, tbl, key=["doc_id"], n_parts=2)
    assert EncodedTable(tbl).mappings() == mappings
    compact_table(spark, tbl, target_parts=1)
    assert EncodedTable(tbl).mappings() == mappings


@pytest.mark.spark
def test_compaction_never_touches_live_files_and_vacuum(spark, docs):
    tbl = tempfile.mkdtemp(prefix="compact_tbl_")
    write_encoded(docs, tbl, key=["doc_id"], n_parts=4)
    t = EncodedTable(tbl)
    files_v0 = sorted(t.data_files())
    mtimes = {f: os.path.getmtime(f) for f in files_v0}
    compact_table(spark, tbl, target_parts=1)
    # parent snapshot's files still exist, byte-identical (no rewrite)
    for f in files_v0:
        assert os.path.exists(f)
        assert os.path.getmtime(f) == mtimes[f]
    files_v1 = sorted(EncodedTable(tbl).data_files())
    assert files_v1 != files_v0
    assert all("compact-000001-" in os.path.basename(f) for f in files_v1)
    # second compaction writes under the NEXT snapshot id — never mutates
    # files referenced by the live snapshot
    compact_table(spark, tbl, target_parts=2)
    files_v2 = sorted(EncodedTable(tbl).data_files())
    assert all("compact-000002-" in os.path.basename(f) for f in files_v2)
    assert set(files_v1).isdisjoint(files_v2)
    # vacuum is the separate, explicit deletion step (grace_s=0 because
    # the files are seconds old; default spares in-flight writers' files)
    assert vacuum_table(tbl) == []  # default grace spares young files
    removed = vacuum_table(tbl, grace_s=0)
    assert set(removed) == {os.path.abspath(f) for f in files_v0 + files_v1}
    live = glob.glob(os.path.join(tbl, "data", "*.parquet"))
    assert sorted(os.path.abspath(f) for f in live) == [
        os.path.abspath(f) for f in files_v2]
    # decode still exact after compact+compact+vacuum
    dec = read_decoded(spark, tbl)
    assert dec.count() == docs.count()
    assert dec.exceptAll(docs).count() == 0


@pytest.mark.spark
def test_resume_refuses_layout_mismatch_and_compacted(spark, docs):
    tbl = tempfile.mkdtemp(prefix="layout_tbl_")
    write_encoded(docs, tbl, key=["doc_id"], n_parts=2, limit_parts=1)
    # different key / n_parts / chunk size -> part ids mean different data
    with pytest.raises(ValueError, match="cannot resume"):
        write_encoded(docs, tbl, key=["lang"], n_parts=2)
    with pytest.raises(ValueError, match="cannot resume"):
        write_encoded(docs, tbl, key=["doc_id"], n_parts=8)
    with pytest.raises(ValueError, match="cannot resume"):
        write_encoded(docs, tbl, key=["doc_id"], n_parts=2,
                      rows_per_chunk=123)
    # matching layout resumes fine
    write_encoded(docs, tbl, key=["doc_id"], n_parts=2)
    # compaction renumbers part ids -> any further resume must refuse
    compact_table(spark, tbl, target_parts=1)
    with pytest.raises(ValueError, match="cannot resume"):
        write_encoded(docs, tbl, key=["doc_id"], n_parts=2)
    from parquet_spark.splits import write_encoded_splits
    with pytest.raises(ValueError, match="cannot resume"):
        write_encoded_splits(
            spark, "/root/testdata/sf0.001/documents.parquet", tbl)


@pytest.mark.spark
def test_splits_resume_is_content_keyed(spark):
    """Growing the input directory between runs must not shift resume
    identity: only genuinely new row groups are encoded."""
    from parquet_spark.corpus import gen_corpus
    from parquet_spark.splits import write_encoded_splits
    from parquet_spark.verify import verify_roundtrip
    src = tempfile.mkdtemp(prefix="splits_src_")
    d1 = gen_corpus(spark, 600, seed=5, parts=1)
    d1.write.parquet(os.path.join(src, "m_first.parquet"))
    tbl = tempfile.mkdtemp(prefix="splits_grow_tbl_")
    s1 = write_encoded_splits(spark, src, tbl)
    n1 = len(s1["parts"])
    # a new file that sorts BEFORE the existing one (the ordinal-id trap)
    d2 = gen_corpus(spark, 400, seed=6, parts=1) \
        .withColumn("url", F.concat(F.lit("x"), F.col("url")))
    d2.write.parquet(os.path.join(src, "a_second.parquet"))
    s2 = write_encoded_splits(spark, src, tbl)
    # old parts untouched, new parts appended with fresh ids
    for pid, p in s1["parts"].items():
        assert s2["parts"][pid] == p
    assert len(s2["parts"]) > n1
    assert min(int(i) for i in s2["meta"]["new_parts"]) >= n1
    both = d1.unionByName(d2)
    verify_roundtrip(both, read_decoded(spark, tbl), key=["url"],
                     digest_col="text")


@pytest.mark.spark
def test_commit_compare_and_swap(spark, docs):
    """Optimistic concurrency: a commit planned against a stale parent
    must refuse instead of silently clobbering the other writer."""
    from parquet_spark.manifest import ConcurrentCommitError
    tbl = tempfile.mkdtemp(prefix="cas_tbl_")
    write_encoded(docs, tbl, key=["doc_id"], n_parts=2)
    t = EncodedTable(tbl)
    stale_parent = t.current_snapshot()
    # writer B commits meanwhile
    t.commit(dict(t.committed_parts()), None, stale_parent,
             meta=t.meta())
    # writer A still holds the old parent -> CAS must refuse
    with pytest.raises(ConcurrentCommitError):
        t.commit(dict(t.committed_parts()), None, stale_parent,
                 meta=t.meta())
    # retry after re-read succeeds
    fresh = t.current_snapshot()
    snap = t.commit(dict(t.committed_parts()), None, fresh, meta=t.meta())
    assert snap["snapshot_id"] == fresh["snapshot_id"] + 1
    # a create-from-scratch commit on a non-empty table also refuses
    with pytest.raises(ConcurrentCommitError):
        t.commit({}, None, None)
    # lock file is always released
    assert not os.path.exists(os.path.join(tbl, "COMMIT_LOCK"))


@pytest.mark.spark
@pytest.mark.parametrize("by", ["range", "hash"])
def test_relocate_table_moves_compressed_chunks(spark, by):
    """Re-layout by shuffling compressed chunk rows: decode equals the
    original, payload bytes are byte-identical (no re-encode), and in
    range mode whole-part pruning becomes possible."""
    from parquet_spark.corpus import gen_corpus
    from parquet_spark.manifest import read_encoded, relocate_table
    from parquet_spark.verify import verify_roundtrip
    df = gen_corpus(spark, 1500, seed=13, parts=2)
    src = tempfile.mkdtemp(prefix="reloc_src_")
    dst = tempfile.mkdtemp(prefix=f"reloc_dst_{by}_")
    write_encoded(df, src, key=["url"], n_parts=4, rows_per_chunk=100)
    snap = relocate_table(spark, src, dst, n_parts=3, by=by)
    assert len(snap["parts"]) <= 3
    verify_roundtrip(df, read_decoded(spark, dst), key=["url"],
                     digest_col="text")
    # payloads moved, not re-encoded: identical multiset of chunk digests
    dig = lambda p: sorted(  # noqa: E731
        r[0] for r in read_encoded(spark, p).select(
            F.md5(F.col("payloads").getItem(0))).collect())
    assert dig(src) == dig(dst)
    # relocated layout is terminal for resume (ids renumbered)
    with pytest.raises(ValueError, match="cannot resume"):
        write_encoded(df, dst, key=["url"], n_parts=3)
    if by == "range":
        # contiguous chunk placement: parts own non-overlapping ranges
        # of chunk key_min (chunks are not split, so key_max tails may
        # still overlap — documented chunk-granularity ownership)
        spans = (read_encoded(spark, dst)
                 .groupBy("part_id")
                 .agg(F.min("key_min").alias("lo"),
                      F.max("key_min").alias("hi"))
                 .orderBy("lo").collect())
        for a, b in zip(spans, spans[1:]):
            assert a.hi <= b.lo, (a, b)


@pytest.mark.spark
def test_global_dict_ids_dense_at_high_cardinality(spark):
    """Regression: without pinning the range partitioning, the counts
    job and the ranking job could see different sampled boundaries and
    emit duplicated/gapped dict ids (observed live at 300k distinct)."""
    from parquet_spark.dictionary import build_global_dict
    df = (spark.range(0, 60_000)
          .select(F.md5(F.col("id").cast("string")).alias("v"),
                  F.lit(1).alias("pad")))  # pad -> distinct ratio 1.0 on v?
    # duplicate each value once so the 0.8 uniqueness gate passes
    df = df.unionByName(df)
    d = build_global_dict(df, "v")
    rows = d.collect()
    ids = sorted(r.dict_id for r in rows)
    assert ids == list(range(60_000))
    assert len({r.value for r in rows}) == 60_000


@pytest.mark.spark
def test_scan_filtered_timestamp_correct_under_non_utc_session(spark):
    """Regression: the residual filter on TIMESTAMP (LTZ) columns must
    compare in UTC epoch-us (the zone-map domain) regardless of the
    session timezone."""
    from parquet_spark.engine import encode_table, scan_filtered
    # events.ts is TIMESTAMP_NTZ in the testdata; build an LTZ variant
    # under the UTC session so the instant equals the NTZ wall clock
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    enc = encode_table(ev, key=["ts"], n_parts=2, rows_per_chunk=200).cache()
    b = enc.agg(F.min("key_min_num"), F.max("key_max_num")).head()
    lo, hi = b[0], b[0] + (b[1] - b[0]) // 4
    want = ev.where(F.unix_micros(F.col("ts")).between(lo, hi)).count()
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        got = scan_filtered(enc, [("ts", lo, hi)]).count()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert got == want > 0
    enc.unpersist()


@pytest.mark.spark
def test_writers_use_unique_data_file_names(spark, docs):
    """Two write attempts against one table must never share data file
    paths — the CAS on CURRENT cannot protect clobbered bytes."""
    import re
    tbl = tempfile.mkdtemp(prefix="uniq_tbl_")
    write_encoded(docs, tbl, key=["doc_id"], n_parts=2, limit_parts=1)
    first = set(EncodedTable(tbl).data_files())
    write_encoded(docs, tbl, key=["doc_id"], n_parts=2)
    second = set(EncodedTable(tbl).data_files())
    assert first <= second  # resume kept the committed file untouched
    names = [os.path.basename(f) for f in second]
    assert all(re.match(r"part-\d{5}-[0-9a-f]{12}\.parquet$", n)
               for n in names), names
    # the two attempts used different tokens
    tokens = {n.split("-")[2].split(".")[0] for n in names}
    assert len(tokens) == 2


@pytest.mark.spark
def test_two_concurrent_writers_converge_via_cas_retry(spark, docs):
    """Iceberg-style optimistic concurrency end-to-end: two writer
    threads append disjoint part-id ranges to one table; commit races
    resolve by ConcurrentCommitError + retry (write_encoded re-reads
    CURRENT and resumes), and the final snapshot contains both ranges
    with no loss or duplication."""
    import threading
    import time as _t

    from parquet_spark.manifest import ConcurrentCommitError
    tbl = tempfile.mkdtemp(prefix="cas_race_tbl_")
    errors = []

    def writer(offset):
        for _ in range(8):
            try:
                write_encoded(docs, tbl, key=["doc_id"], n_parts=2,
                              part_offset=offset)
                return
            except ConcurrentCommitError:
                _t.sleep(0.05)  # re-read CURRENT and retry
            except Exception as e:  # noqa: BLE001
                errors.append(e)
                return
        errors.append(RuntimeError(f"writer {offset} never converged"))

    t1 = threading.Thread(target=writer, args=(0,))
    t2 = threading.Thread(target=writer, args=(2,))
    t1.start(); t2.start(); t1.join(120); t2.join(120)
    assert not errors, errors
    snap = EncodedTable(tbl).current_snapshot()
    assert sorted(int(p) for p in snap["parts"]) == [0, 1, 2, 3]
    dec = read_decoded(spark, tbl)
    # both ranges carry one full copy of docs
    assert dec.count() == 2 * docs.count()
    assert dec.exceptAll(docs.unionByName(docs)).count() == 0
