"""COUNT(*) aggregate pushdown into zone metadata: provably-full
chunks contribute stored n_rows without decompression; only boundary
chunks decode.  Result must always equal the exact scan count.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from parquet_spark.engine import (_pred_zone_conds, count_filtered,
                                  encode_table, scan_filtered)
from parquet_spark.manifest import (count_where, delete_rows,
                                    scan_table, write_encoded)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.mark.spark
def test_count_filtered_uses_metadata_for_interior_chunks(spark):
    d = _docs(spark)
    enc = encode_table(d, key=["doc_id"], n_parts=2,
                       rows_per_chunk=50).cache()
    pred = [("doc_id", 60, 440)]
    got = count_filtered(enc, pred)
    want = scan_filtered(enc, pred).count()
    assert got == want == d.where(F.col("doc_id").between(60, 439 + 1)
                                  ).count()
    # the metadata shortcut actually fires: interior chunks are proven
    # full, and they cover most of the matching rows
    keep, full = _pred_zone_conds(pred)
    n_full = enc.where(full).count()
    n_keep = enc.where(keep).count()
    assert 0 < n_full < n_keep
    meta_rows = enc.where(full).agg(F.sum("n_rows")).head()[0]
    assert meta_rows > want // 2
    # disjunction: both branches, no double counting
    got_any = count_filtered(enc, {"any": [[("doc_id", 0, 99)],
                                           [("doc_id", 400, None)]]})
    want_any = d.where((F.col("doc_id") <= 99)
                       | (F.col("doc_id") >= 400)).count()
    assert got_any == want_any
    enc.unpersist()


@pytest.mark.spark
def test_count_full_test_is_null_and_nan_safe(spark):
    # lang has no chunk where every row is 'de', and NULL lang rows
    # must never be metadata-counted into a notnull/equality result
    d = _docs(spark)
    enc = encode_table(d, key=["lang", "doc_id"], n_parts=2,
                       rows_per_chunk=32).cache()
    for pred, want in [
        ([("lang", "=", "de")], d.where(F.col("lang") == "de").count()),
        ([("lang", "isnull", None)],
         d.where(F.col("lang").isNull()).count()),
        ([("lang", "notnull", None)],
         d.where(F.col("lang").isNotNull()).count()),
    ]:
        assert count_filtered(enc, pred) == want
    # lang-keyed layout gives constant chunks: equality IS provable
    keep, full = _pred_zone_conds([("lang", "=", "de")])
    assert enc.where(full).count() > 0
    enc.unpersist()
    # double ranges: NaN-unsafe family never metadata-counts, result
    # still exact
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    enc2 = encode_table(ev, key=["value"], n_parts=2,
                        rows_per_chunk=100).cache()
    pred = [("value", 0.0, 50.0)]
    assert count_filtered(enc2, pred) == \
        ev.where(F.col("value").between(0.0, 50.0)).count()
    _, full2 = _pred_zone_conds(pred)
    assert enc2.where(full2).count() == 0  # doubles: never definite
    enc2.unpersist()


@pytest.mark.spark
def test_count_where_table_level(spark, monkeypatch):
    import parquet_spark.manifest as M
    d = _docs(spark)
    tbl = tempfile.mkdtemp(prefix="cw_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=4, mode="range",
                  rows_per_chunk=50, global_dict_cols=["lang"])
    want = d.where(F.col("doc_id").between(60, 440)).count()
    assert count_where(spark, tbl, [("doc_id", 60, 440)]) == want
    # dict column equality counts exactly through the id translation
    want_de = d.where(F.col("lang") == "de").count()
    assert count_where(spark, tbl, [("lang", "=", "de")]) == want_de
    # over-cap dict translation must disable the metadata shortcut,
    # never the correctness
    monkeypatch.setattr(M, "_GDICT_PRUNE_MAX", 0)
    assert count_where(spark, tbl, [("lang", "=", "de")]) == want_de
    monkeypatch.undo()
    # pending deletes force the exact path
    delete_rows(spark, tbl, [("doc_id", 100, 199)])
    left = count_where(spark, tbl, [("doc_id", 60, 440)])
    assert left == scan_table(spark, tbl, [("doc_id", 60, 440)]).count()
    assert left == want - d.where(F.col("doc_id").between(100, 199)
                                  ).count()


@pytest.mark.spark
def test_count_where_after_schema_evolution(spark):
    from parquet_spark.manifest import alter_table
    d = _docs(spark)
    tbl = tempfile.mkdtemp(prefix="cw_alter_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=50)
    alter_table(tbl, rename={"n_chars": "length"},
                add=[("score", "double")])
    want = d.where(F.col("n_chars") >= 100).count()
    assert count_where(spark, tbl, [("length", 100, None)]) == want
    # added column: all-null in old parts
    assert count_where(spark, tbl, [("score", "isnull", None)]) == \
        d.count()
    assert count_where(spark, tbl, [("score", "notnull", None)]) == 0


@pytest.mark.spark
def test_minmax_where_matches_exact_scan(spark):
    from parquet_spark.manifest import minmax_where
    d = _docs(spark)
    tbl = tempfile.mkdtemp(prefix="mm_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=4, mode="range",
                  rows_per_chunk=50, global_dict_cols=["lang"])
    r = minmax_where(spark, tbl, [("doc_id", 60, 440)],
                     ["doc_id", "n_chars"])
    want = d.where(F.col("doc_id").between(60, 440))
    w = want.agg(F.count(F.lit(1)), F.min("doc_id"), F.max("doc_id"),
                 F.min("n_chars"), F.max("n_chars")).head()
    assert r["n_rows"] == w[0]
    assert (r["cols"]["doc_id"]["min"], r["cols"]["doc_id"]["max"]) == \
        (w[1], w[2])
    assert (r["cols"]["n_chars"]["min"], r["cols"]["n_chars"]["max"]) \
        == (w[3], w[4])
    # predicate on the dict column, target int col
    r2 = minmax_where(spark, tbl, [("lang", "=", "de")], ["doc_id"])
    w2 = d.where(F.col("lang") == "de").agg(
        F.count(F.lit(1)), F.min("doc_id"), F.max("doc_id")).head()
    assert r2["n_rows"] == w2[0]
    assert (r2["cols"]["doc_id"]["min"],
            r2["cols"]["doc_id"]["max"]) == (w2[1], w2[2])
    # empty result: no file survives
    r3 = minmax_where(spark, tbl, [("doc_id", 10**9, None)], ["doc_id"])
    assert r3 == {"n_rows": 0, "cols": {"doc_id": {"min": None,
                                                   "max": None}}}
    # guards: dict targets and unknown columns fail loudly
    with pytest.raises(ValueError, match="global-dict"):
        minmax_where(spark, tbl, [("doc_id", 0, 10)], ["lang"])
    with pytest.raises(KeyError, match="nope"):
        minmax_where(spark, tbl, [("doc_id", 0, 10)], ["nope"])
    # pending deletes: exact path, still correct
    delete_rows(spark, tbl, [("doc_id", 100, 199)])
    r4 = minmax_where(spark, tbl, [("doc_id", 60, 440)], ["doc_id"])
    w4 = d.where(F.col("doc_id").between(60, 440)
                 & ~F.col("doc_id").between(100, 199)).agg(
        F.count(F.lit(1)), F.min("doc_id"), F.max("doc_id")).head()
    assert r4["n_rows"] == w4[0]
    assert (r4["cols"]["doc_id"]["min"],
            r4["cols"]["doc_id"]["max"]) == (w4[1], w4[2])


@pytest.mark.spark
def test_minmax_where_metadata_path_fires_and_ts_domain(spark):
    from parquet_spark.engine import _pred_zone_conds
    from parquet_spark.manifest import minmax_where, read_encoded
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    tbl = tempfile.mkdtemp(prefix="mm_ev_")
    write_encoded(ev, tbl, key=["event_id"], n_parts=2, mode="range",
                  rows_per_chunk=200)
    lo, hi = 100, 4500
    r = minmax_where(spark, tbl, [("event_id", lo, hi)],
                     ["event_id", "ts"])
    want = ev.where(F.col("event_id").between(lo, hi))
    us = F.expr("timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
    w = want.agg(F.count(F.lit(1)), F.min("event_id"), F.max("event_id"),
                 F.min(us), F.max(us)).head()
    assert r["n_rows"] == w[0]
    assert (r["cols"]["event_id"]["min"],
            r["cols"]["event_id"]["max"]) == (w[1], w[2])
    # timestamps come back in the zone domain: epoch-us int64
    assert (r["cols"]["ts"]["min"], r["cols"]["ts"]["max"]) == (w[3], w[4])
    # interior chunks really are metadata-counted
    enc = read_encoded(spark, tbl)
    _, full = _pred_zone_conds([("event_id", lo, hi)])
    assert enc.where(full).count() > 0


@pytest.mark.spark
def test_count_metadata_path_survives_rename(spark):
    """After alter_table renames the predicate column, the definite
    test must OR over physical aliases (a chunk populates exactly one)
    so interior chunks still metadata-count instead of decoding."""
    from parquet_spark.manifest import (_grouped_full, _translate_pred,
                                        alter_table, count_where,
                                        read_encoded)
    d = _docs(spark)
    tbl = tempfile.mkdtemp(prefix="cw_ren_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=50)
    alter_table(tbl, rename={"n_chars": "length"})
    # predicate on the RENAMED column over old-generation chunks
    want = d.where(F.col("n_chars").between(0, 10**9)).count()
    assert count_where(spark, tbl, [("length", 0, 10**9)]) == want
    ren = {"n_chars": "length"}
    _, complete, grouped = _translate_pred(
        [("length", 0, 10**9)], {}, ren, return_complete=True)
    full = _grouped_full(grouped, complete, is_any=False)
    enc = read_encoded(spark, tbl)
    assert enc.where(full).count() > 0  # metadata shortcut fires


# ------------------------------------------------------------ SUM pushdown


@pytest.mark.spark
def test_sum_where_matches_exact_scan_and_meta_path_fires(spark):
    from parquet_spark.manifest import sum_where
    d = _docs(spark)
    with tempfile.TemporaryDirectory(prefix="sum_tbl_") as tmp:
        write_encoded(d, tmp, key=["doc_id"], n_parts=2, rows_per_chunk=50)
        for pred in (None, [("doc_id", 60, 440)],
                     {"any": [[("doc_id", 0, 99)],
                              [("doc_id", 400, None)]]}):
            got = sum_where(spark, tmp, "n_chars", pred)
            dec = scan_table(spark, tmp, pred or [])
            want = dec.agg(F.sum("n_chars")).head()[0]
            assert got == want, pred
        # the metadata shortcut fires: interior chunks carry sums
        from parquet_spark.engine import ENCODED_DDL, _pred_zone_conds
        from parquet_spark.manifest import EncodedTable
        from parquet_spark.manifest import _prune_parts
        t = EncodedTable(tmp)
        files = _prune_parts(t.committed_parts(), [])
        enc = spark.read.schema(ENCODED_DDL).parquet(*files)
        keep, full = _pred_zone_conds([("doc_id", 60, 440)])
        idx = F.array_position(F.col("zone_cols"), "n_chars").cast("int")
        s = F.try_element_at(F.col("zone_sum_num"),
                             F.when(idx >= 1, idx))
        assert enc.where(full & s.isNotNull()).count() > 0
        # empty match -> SQL NULL, not 0
        assert sum_where(spark, tmp, "n_chars",
                         [("doc_id", 10**9, None)]) is None


@pytest.mark.spark
def test_sum_where_legacy_files_without_sums_still_exact(spark, tmp_path):
    """Part files written before zone_sum_num existed read as null sums
    under the pinned DDL: every kept chunk decodes (boundary path) and
    the result is still exact."""
    from parquet_spark.engine import ENCODED_DDL
    from parquet_spark.manifest import EncodedTable, sum_where
    import pyarrow.parquet as pq
    import pyarrow as pa
    d = _docs(spark)
    tmp = str(tmp_path / "legacy_tbl")
    write_encoded(d, tmp, key=["doc_id"], n_parts=2, rows_per_chunk=100)
    from parquet_spark.manifest import _prune_parts
    t = EncodedTable(tmp)
    for f in _prune_parts(t.committed_parts(), []):
        tb = pq.read_table(f)
        cols = [c for c in tb.schema.names if c != "zone_sum_num"]
        pq.write_table(tb.select(cols), f)
    got = sum_where(spark, tmp, "n_chars", [("doc_id", 60, 440)])
    want = d.where(F.col("doc_id").between(60, 440)).agg(
        F.sum("n_chars")).head()[0]
    assert got == want


@pytest.mark.spark
def test_sum_where_nulls_deletes_and_guards(spark):
    from parquet_spark.manifest import avg_where, sum_where
    rows = [(i, (i * 7) % 100 if i % 3 else None) for i in range(300)]
    d = spark.createDataFrame(rows, "k bigint, v bigint")
    with tempfile.TemporaryDirectory(prefix="sum_nul_") as tmp:
        write_encoded(d, tmp, key=["k"], n_parts=2, rows_per_chunk=50)
        want = d.agg(F.sum("v")).head()[0]
        assert sum_where(spark, tmp, "v") == want   # nulls skipped
        na = d.agg(F.avg("v")).head()[0]
        assert abs(avg_where(spark, tmp, "v") - na) < 1e-12
        # deletes force the exact path and stay correct
        delete_rows(spark, tmp, [("k", "in", [0, 3, 9])])
        want_d = (d.where(~F.col("k").isin(0, 3, 9))
                  .agg(F.sum("v")).head()[0])
        assert sum_where(spark, tmp, "v") == want_d
        with pytest.raises(KeyError):
            sum_where(spark, tmp, "no_such_col")
    # a table whose matching rows are ALL null sums to SQL NULL
    d2 = spark.createDataFrame([(i, None) for i in range(10)],
                               "k bigint, v bigint")
    with tempfile.TemporaryDirectory(prefix="sum_allnul_") as tmp2:
        write_encoded(d2, tmp2, key=["k"], n_parts=1, rows_per_chunk=5)
        assert sum_where(spark, tmp2, "v") is None


@pytest.mark.spark
def test_sum_where_overflow_guard_is_exact(spark):
    """Values near int64 max: per-chunk sums are withheld (overflow
    unprovable-safe), the decode path fires, and the decimal
    accumulator returns the exact total beyond int64 range."""
    from parquet_spark.manifest import sum_where
    big = (1 << 61)
    d = spark.createDataFrame([(i, big + i) for i in range(40)],
                              "k bigint, v bigint")
    with tempfile.TemporaryDirectory(prefix="sum_ovf_") as tmp:
        write_encoded(d, tmp, key=["k"], n_parts=1, rows_per_chunk=10)
        got = sum_where(spark, tmp, "v")
        want = sum(big + i for i in range(40))   # > 2^63: exact python
        assert got == want and got > (1 << 63)


# ---------------------------------------------------------- LIMIT pushdown


@pytest.mark.spark
def test_read_head_prunes_files_and_matches_order(spark, tmp_path):
    from parquet_spark.manifest import (EncodedTable, _head_files,
                                        read_head, write_encoded)
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    tmp = str(tmp_path / "head_rng")
    write_encoded(d, tmp, key=["doc_id"], n_parts=6, mode="range",
                  rows_per_chunk=32)
    t = EncodedTable(tmp)
    files, skipped, _tau = _head_files(t.committed_parts(), "doc_id", 75)
    assert skipped >= 4          # the prune actually bites
    got = read_head(spark, tmp, 75)
    want = d.orderBy("doc_id").limit(75)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@pytest.mark.spark
def test_read_head_exact_on_hash_string_and_deleted(spark, tmp_path):
    from parquet_spark.manifest import read_head, write_encoded
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # hash layout: overlapping ranges degenerate but stay exact
    tmp = str(tmp_path / "head_hash")
    write_encoded(d, tmp, key=["doc_id"], n_parts=4, rows_per_chunk=64)
    got = read_head(spark, tmp, 10)
    want = d.orderBy("doc_id").limit(10)
    assert got.exceptAll(want).count() == 0 == want.exceptAll(got).count()
    # deletes: over-provisioned target, anti-joined before the cut
    delete_rows(spark, tmp, [("doc_id", "in", [0, 2, 5])])
    g2 = read_head(spark, tmp, 10, columns=["doc_id"])
    w2 = (d.where(~F.col("doc_id").isin(0, 2, 5))
          .orderBy("doc_id").limit(10).select("doc_id"))
    assert g2.exceptAll(w2).count() == 0 == w2.exceptAll(g2).count()
    # string key
    d2 = d.withColumn("sk", F.md5(F.col("doc_id").cast("string")))
    tmp3 = str(tmp_path / "head_str")
    write_encoded(d2, tmp3, key=["sk"], n_parts=4, mode="range",
                  rows_per_chunk=64)
    g3 = read_head(spark, tmp3, 20)
    w3 = d2.orderBy("sk").limit(20)
    assert g3.exceptAll(w3).count() == 0 == w3.exceptAll(g3).count()
    with pytest.raises(ValueError, match="positive"):
        read_head(spark, tmp, 0)


@pytest.mark.spark
def test_read_head_global_dict_key_stays_value_ordered(spark, tmp_path):
    """A global-dict layout key stores frequency-ranked ids whose order
    is NOT value order — read_head must not prune on id bounds and the
    head must come back in VALUE order."""
    from parquet_spark.manifest import read_head, write_encoded
    d = _docs(spark).select("doc_id", "lang", "n_chars") \
        .where(F.col("lang").isNotNull())
    tmp = str(tmp_path / "head_gd")
    write_encoded(d, tmp, key=["lang", "doc_id"], n_parts=3,
                  rows_per_chunk=50, global_dict_cols=["lang"])
    got = read_head(spark, tmp, 25)
    want = d.orderBy("lang", "doc_id").limit(25)
    assert got.exceptAll(want).count() == 0 == want.exceptAll(got).count()


@pytest.mark.spark
def test_read_head_dup_key_deletes_fall_back_exactly(spark, tmp_path):
    """delete_rows on a NON-unique key kills several rows per key row,
    so n_deleted under-provisions the prune target; read_head must
    detect the short certificate and fall back to the unpruned plan."""
    from parquet_spark.manifest import read_head, write_encoded
    rows = [(1, i) for i in range(40)] + \
           [(2, 100 + i) for i in range(3)] + [(3, 200)]
    d = spark.createDataFrame(rows, "key bigint, v bigint")
    tmp = str(tmp_path / "head_dup")
    write_encoded(d, tmp, key=["key"], n_parts=2, mode="range",
                  rows_per_chunk=8)
    delete_rows(spark, tmp, [("key", "=", 1)])   # 1 key row, 40 rows die
    got = read_head(spark, tmp, 2)
    want = (d.where(F.col("key") != 1).orderBy("key", "v").limit(2)
            .select("key", "v"))
    assert sorted((r.key, r.v) for r in got.collect()) == \
        sorted((r.key, r.v) for r in want.collect())


@pytest.mark.spark
def test_read_head_null_keys_sort_first_and_survive_prune(spark,
                                                          tmp_path):
    """Null keys sort FIRST under ASC; chunks/parts mixing null and
    non-null keys must never be pruned away (zone bounds ignore
    nulls)."""
    from parquet_spark.manifest import read_head, write_encoded
    rows = [(None, -1), (None, -2)] + [(i, i) for i in range(200)]
    d = spark.createDataFrame(rows, "key bigint, v bigint")
    tmp = str(tmp_path / "head_null")
    write_encoded(d, tmp, key=["key"], n_parts=2, rows_per_chunk=16)
    got = read_head(spark, tmp, 5)
    want = d.orderBy(F.asc("key"), "v").limit(5)
    gk = sorted((r.key, r.v) for r in got.collect()
                if r.key is not None)
    wk = sorted((r.key, r.v) for r in want.collect()
                if r.key is not None)
    assert gk == wk
    assert sum(1 for r in got.collect() if r.key is None) == 2
