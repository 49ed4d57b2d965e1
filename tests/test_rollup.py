"""Incremental materialized rollups (`rollup.create_rollup` /
`refresh_rollup`): a derived aggregate table whose refresh reads only
the source rows appended since its watermark.

Exactness is the whole point — after any sequence of appends and
refreshes the rollup must equal the from-scratch group-by, because the
aggregate set is restricted to the mergeable algebra (count/sum/min/
max).  Compactions in the source break the append-only diff, so the
refresh must detect that and fall back to a full recompute.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from parquet_spark.manifest import (EncodedTable, read_decoded,
                                    write_encoded)
from parquet_spark.rollup import create_rollup, refresh_rollup

pytestmark = pytest.mark.spark


def _docs(spark, lo, hi):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .where(F.col("doc_id").between(lo, hi - 1)))


def _expected(spark, src):
    return {r.lang: (r.n, r.s, r.lo, r.hi) for r in
            read_decoded(spark, src).groupBy("lang").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("n_chars").alias("s"),
                F.min("doc_id").alias("lo"),
                F.max("doc_id").alias("hi")).collect()}


def _actual(spark, dst):
    return {r.lang: (r.n_docs, r.sum_chars, r.min_id, r.max_id) for r in
            read_decoded(spark, dst).collect()}


def test_rollup_incremental_refresh_is_exact(spark, tmp_path):
    """Create at snapshot 0, append two epochs, refresh twice: each
    refresh must run in incremental mode and land exactly the
    from-scratch aggregate; an unchanged source is a commit-free
    no-op."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "roll")
    write_encoded(_docs(spark, 0, 200), src, key=["doc_id"], n_parts=2)
    create_rollup(spark, src, dst, group_cols=["lang"],
                  aggs={"n_docs": ("count", "*"),
                        "sum_chars": ("sum", "n_chars"),
                        "min_id": ("min", "doc_id"),
                        "max_id": ("max", "doc_id")})
    assert _actual(spark, dst) == _expected(spark, src)

    rep = refresh_rollup(spark, dst)
    assert rep == {**rep, "refreshed": False, "mode": "noop"}
    n_snaps = len(EncodedTable(dst).history())

    write_encoded(_docs(spark, 200, 350), src, key=["doc_id"],
                  n_parts=2, part_offset=2)
    rep = refresh_rollup(spark, dst)
    assert rep["refreshed"] and rep["mode"] == "incremental"
    assert (rep["from"], rep["to"]) == (0, 1)
    assert _actual(spark, dst) == _expected(spark, src)

    write_encoded(_docs(spark, 350, 420), src, key=["doc_id"],
                  n_parts=2, part_offset=4)
    rep = refresh_rollup(spark, dst)
    assert rep["mode"] == "incremental" and rep["to"] == 2
    assert _actual(spark, dst) == _expected(spark, src)
    # no-op again afterwards
    assert refresh_rollup(spark, dst)["refreshed"] is False
    assert len(EncodedTable(dst).history()) == n_snaps + 4  # 2x(content+stamp)


def test_rollup_full_fallback_and_crash_replay(spark, tmp_path):
    """A source delete commit breaks the append-only diff -> refresh
    falls back to a full recompute and stays exact (deletes applied).
    An unstamped head (crash between content and stamp commits) is
    superseded by the next refresh, which resumes from the stamped
    base."""
    from parquet_spark.manifest import delete_rows

    src = str(tmp_path / "src")
    dst = str(tmp_path / "roll")
    write_encoded(_docs(spark, 0, 150), src, key=["doc_id"], n_parts=2)
    create_rollup(spark, src, dst, group_cols=["lang"],
                  aggs={"n_docs": ("count", "*"),
                        "sum_chars": ("sum", "n_chars"),
                        "min_id": ("min", "doc_id"),
                        "max_id": ("max", "doc_id")})

    write_encoded(_docs(spark, 150, 300), src, key=["doc_id"],
                  n_parts=2, part_offset=2)
    delete_rows(spark, src, [("doc_id", "in", [7, 42, 210])])
    rep = refresh_rollup(spark, dst)
    assert rep["refreshed"] and rep["mode"] == "full"
    assert _actual(spark, dst) == _expected(spark, src)

    # simulate the crash window: content commit landed, stamp did not
    write_encoded(_docs(spark, 300, 420), src, key=["doc_id"],
                  n_parts=2, part_offset=4)
    bogus = read_decoded(spark, dst).limit(1)
    write_encoded(bogus, dst, key=["lang"], n_parts=1, replace=True)
    # the next refresh ignores the unstamped head and replays cleanly
    rep = refresh_rollup(spark, dst)
    assert rep["refreshed"] and rep["mode"] == "incremental"
    assert _actual(spark, dst) == _expected(spark, src)


def test_rollup_derived_time_bucket(spark, tmp_path):
    """Derived pre-group expressions: a day bucket over warc_ts from
    the corpus generator, grouped alongside lang."""
    from parquet_spark.corpus import gen_corpus

    src = str(tmp_path / "src")
    dst = str(tmp_path / "roll")
    write_encoded(gen_corpus(spark, 400, seed=83, parts=2), src,
                  key=["url"], n_parts=2)
    create_rollup(spark, src, dst, group_cols=["lang", "day"],
                  derived={"day": "date_trunc('DAY', warc_ts)"},
                  aggs={"n_docs": ("count", "*"),
                        "n_texts": ("count", "text")},
                  key=["lang"], n_parts=1)
    got = {(r.lang, r.day): (r.n_docs, r.n_texts) for r in
           read_decoded(spark, dst).collect()}
    want = {(r.lang, r.day): (r.n, r.t) for r in
            read_decoded(spark, src)
            .withColumn("day", F.expr("date_trunc('DAY', warc_ts)"))
            .groupBy("lang", "day")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("text").alias("t")).collect()}
    assert got == want

    with pytest.raises(ValueError, match="not mergeable"):
        create_rollup(spark, src, str(tmp_path / "r2"),
                      group_cols=["lang"],
                      aggs={"m": ("median", "warc_ts")})


def test_stamp_cas_refuses_racer(spark, tmp_path):
    """The stamp commit must CAS against the exact content commit the
    refresher wrote — if a racer moved CURRENT in between, stamping
    raises instead of mislabeling the racer's content with this
    refresher's watermark (which would double-count the next
    increment)."""
    from parquet_spark.manifest import ConcurrentCommitError
    from parquet_spark.rollup import _stamp, _stamped_base

    src = str(tmp_path / "src")
    dst = str(tmp_path / "roll")
    write_encoded(_docs(spark, 0, 150), src, key=["doc_id"], n_parts=2)
    create_rollup(spark, src, dst, group_cols=["lang"],
                  aggs={"n_docs": ("count", "*")})
    stale = _stamped_base(EncodedTable(dst))
    # racer: any commit that moves dst CURRENT past `stale`
    bogus = read_decoded(spark, dst).limit(1)
    write_encoded(bogus, dst, key=["lang"], n_parts=1, replace=True)
    spec = dict(stale["meta"]["rollup"])
    with pytest.raises(ConcurrentCommitError):
        _stamp(dst, spec, stale)
