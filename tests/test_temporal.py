"""As-of join and sessionization vs independent references: pandas
merge_asof for the join, a plain-python scan for sessions."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row, functions as F


def _mk_events(n, seed, users=5):
    rng = np.random.default_rng(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        rows.append(Row(
            eid=i,
            ts=base + dt.timedelta(seconds=int(rng.integers(0, 100000))),
            uid=int(rng.integers(0, users)),
            val=float(i) * 0.5))
    return rows


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(_mk_events(120, seed=1)).cache()
    right = spark.createDataFrame(_mk_events(80, seed=2)).cache()
    return left, right


def _merge_asof(left, right, direction, tolerance=None):
    lp = left.toPandas().sort_values("ts").reset_index(drop=True)
    rp = (right.toPandas().sort_values("ts").reset_index(drop=True)
          .rename(columns={"eid": "eid_r", "val": "val_r",
                           "ts": "ts_right"}))
    kw = {}
    if tolerance is not None:
        kw["tolerance"] = pd.Timedelta(seconds=tolerance)
    m = pd.merge_asof(lp, rp, left_on="ts", right_on="ts_right",
                      by="uid", direction=direction, **kw)
    return {int(r.eid): (None if pd.isna(r.eid_r) else int(r.eid_r))
            for r in m.itertuples()}


@pytest.mark.spark
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas(spark, sides, direction):
    from parquet_spark.temporal import asof_join
    left, right = sides
    got = {r.eid: r.eid_r for r in
           asof_join(left, right, "ts", by=["uid"],
                     right_cols=["eid", "val"], direction=direction)
           .select("eid", "eid_r").collect()}
    want = _merge_asof(left, right, direction)
    assert got == want
    # every left row present exactly once (left-outer cardinality)
    assert len(got) == left.count()


@pytest.mark.spark
def test_asof_join_tolerance_matches_pandas(spark, sides):
    from parquet_spark.temporal import asof_join
    left, right = sides
    got = {r.eid: r.eid_r for r in
           asof_join(left, right, "ts", by=["uid"],
                     right_cols=["eid"], tolerance=900)
           .select("eid", "eid_r").collect()}
    want = _merge_asof(left, right, "backward", tolerance=900)
    assert got == want
    # tolerance must strictly reduce (or keep) matches
    full = _merge_asof(left, right, "backward")
    assert all(v is None or full[k] == v for k, v in got.items())
    assert (sum(v is not None for v in got.values())
            < sum(v is not None for v in full.values()))


@pytest.mark.spark
def test_asof_join_simultaneous_right_row_matches(spark):
    from parquet_spark.temporal import asof_join
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([Row(eid=1, ts=t0, uid=1)])
    right = spark.createDataFrame([Row(eid=100, ts=t0, uid=1)])
    out = asof_join(left, right, "ts", by=["uid"],
                    right_cols=["eid"]).collect()
    assert out[0].eid_r == 100  # ts_r <= ts includes equality
    # and a right row strictly after does NOT match backward
    right2 = spark.createDataFrame(
        [Row(eid=101, ts=t0 + dt.timedelta(seconds=1), uid=1)])
    out2 = asof_join(left, right2, "ts", by=["uid"],
                     right_cols=["eid"]).collect()
    assert out2[0].eid_r is None


@pytest.mark.spark
def test_sessionize_matches_python(spark):
    from parquet_spark.temporal import sessionize
    rows = _mk_events(200, seed=3, users=4)
    df = spark.createDataFrame(rows)
    got = {r.eid: r.session for r in
           sessionize(df, "ts", "uid", gap=3600,
                      order_cols=["eid"]).collect()}
    by_user = {}
    for r in sorted(rows, key=lambda r: (r.uid, r.ts, r.eid)):
        by_user.setdefault(r.uid, []).append(r)
    want = {}
    for uid, evs in by_user.items():
        sess, prev = -1, None
        for r in evs:
            if prev is None or (r.ts - prev).total_seconds() > 3600:
                sess += 1
            want[r.eid] = sess
            prev = r.ts
    assert got == want


@pytest.mark.spark
def test_range_join_matches_naive_inequality(spark, sides):
    from parquet_spark.temporal import range_join
    left, right = sides
    iv = right.select(
        "uid", F.col("ts").alias("start"),
        F.expr("ts + INTERVAL 30 MINUTES").alias("end"),
        F.col("eid").alias("win_id"))
    got = {(r.eid, r.win_id) for r in
           range_join(left, iv, "ts", "start", "end", by=["uid"],
                      bucket=600).select("eid", "win_id").collect()}
    naive = {(r.eid, r.win_id) for r in
             left.alias("p").join(
                 iv.alias("i"),
                 (F.col("p.uid") == F.col("i.uid")) &
                 (F.col("i.start") <= F.col("p.ts")) &
                 (F.col("p.ts") <= F.col("i.end")))
             .select("p.eid", "i.win_id").collect()}
    assert got == naive and len(got) > 0
    # boundary containment: point exactly at start and at end both match
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    p = spark.createDataFrame([Row(eid=1, ts=t0, uid=1),
                               Row(eid=2, ts=t0 + dt.timedelta(hours=2),
                                   uid=1),
                               Row(eid=3, ts=t0 + dt.timedelta(hours=3),
                                   uid=1)])
    i = spark.createDataFrame([Row(uid=1, start=t0,
                                   end=t0 + dt.timedelta(hours=2),
                                   win_id=9)])
    hits = {r.eid for r in
            range_join(p, i, "ts", "start", "end", by=["uid"],
                       bucket=900).collect()}
    assert hits == {1, 2}  # inclusive bounds; eid=3 outside


@pytest.mark.spark
def test_time_rollup_cascade_lossless(spark):
    from parquet_spark.temporal import time_rollup
    rows = _mk_events(300, seed=5, users=3)
    df = spark.createDataFrame(rows)
    r = time_rollup(df, "ts", ("hour", "day"), by=["uid"],
                    aggs={"n": ("*", "count"), "s": ("eid", "sum"),
                          "mx": ("eid", "max")}).cache()
    # each level equals a DIRECT aggregate of the raw data
    for gran in ("hour", "day"):
        got = {(r_.bucket, r_.uid): (r_.n, r_.s, r_.mx)
               for r_ in r.where(F.col("gran") == gran).collect()}
        want = {(r_.bucket, r_.uid): (r_.n, r_.s, r_.mx)
                for r_ in df.groupBy(
                    F.date_trunc(gran, "ts").cast("timestamp_ntz")
                    .alias("bucket"), "uid")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("eid").alias("s"),
                     F.max("eid").alias("mx")).collect()}
        assert got == want, gran
    r.unpersist()
    with pytest.raises(ValueError):
        time_rollup(df, "ts", ("hour",), aggs={"a": ("val", "avg")})


@pytest.mark.spark
def test_guards(spark, sides):
    from parquet_spark.temporal import asof_join, range_join, time_rollup
    left, right = sides
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "ts", by=["uid"], direction="nearest")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("_rv", F.lit(1)), right, "ts",
                  by=["uid"])
    with pytest.raises(ValueError, match="bucket"):
        range_join(left, right.select(
            "uid", F.col("ts").alias("start"),
            F.col("ts").alias("end")), "ts", bucket=0)
    with pytest.raises(ValueError, match="granularities"):
        time_rollup(left, "ts", ())
    # inverted intervals match nothing (dropped before the explode)
    iv = right.select("uid", F.expr("ts + INTERVAL 1 HOUR").alias("start"),
                      F.col("ts").alias("end"))
    assert range_join(left, iv, "ts", "start", "end",
                      by=["uid"], bucket=600).count() == 0


@pytest.mark.spark
def test_keyless_asof_requires_opt_in(spark, sides):
    """A `by`-less as-of degenerates to a single-task global sort, so
    it is refused unless the caller opts in explicitly — and the
    opt-in path still computes the right answer."""
    from parquet_spark.temporal import asof_join
    left, right = sides
    with pytest.raises(ValueError, match="allow_global_sort"):
        asof_join(left, right, "ts")
    keyed = {(r.uid, r.ts): r.ts_r for r in
             asof_join(left, right, "ts", by=["uid"]).collect()}
    # keyless over a single uid's slice == keyed restricted to that uid
    l1 = left.where(F.col("uid") == 1)
    r1 = right.where(F.col("uid") == 1).drop("uid")
    out = asof_join(l1, r1, "ts", allow_global_sort=True).collect()
    assert {(1, r.ts): r.ts_r for r in out} == \
        {k: v for k, v in keyed.items() if k[0] == 1}


@pytest.mark.spark
def test_reserved_column_guards(spark, sides):
    from parquet_spark.temporal import asof_join, range_join
    left, right = sides
    with pytest.raises(ValueError, match="_rt"):
        asof_join(left, right.withColumn("_rt", F.lit(1)), "ts",
                  by=["uid"])
    iv = right.select("uid", F.col("ts").alias("start"),
                      F.col("ts").alias("end"))
    with pytest.raises(ValueError, match="_cell"):
        range_join(left.withColumn("_cell", F.lit(1)), iv, "ts",
                   by=["uid"], bucket=600)
    with pytest.raises(ValueError, match="_cell"):
        range_join(left, iv.withColumn("_cell", F.lit(1)), "ts",
                   by=["uid"], bucket=600)
    # suffix-rename collision: points already has 'start_r'
    with pytest.raises(ValueError, match="start_r"):
        range_join(left.withColumn("start", F.lit(1))
                       .withColumn("start_r", F.lit(2)),
                   iv, "ts", by=["uid"], bucket=600)


@pytest.mark.spark
def test_time_rollup_granularity_nesting_validated(spark, sides):
    """Misordered or non-nested cascades raise instead of silently
    producing wrong aggregates; week is only valid terminally."""
    from parquet_spark.temporal import time_rollup
    left, _ = sides
    with pytest.raises(ValueError, match="finest"):
        time_rollup(left, "ts", ("day", "hour"))
    with pytest.raises(ValueError, match="week"):
        time_rollup(left, "ts", ("week", "month"))
    with pytest.raises(ValueError, match="unknown"):
        time_rollup(left, "ts", ("hour", "fortnight"))
    # valid: day -> week (week terminal) and hour -> day -> month
    assert time_rollup(left, "ts", ("day", "week")).count() > 0
    assert time_rollup(left, "ts", ("hour", "day", "month")).count() > 0


@pytest.mark.spark
def test_gap_fill_locf_zero_null(spark):
    import datetime as dt

    from parquet_spark.temporal import gap_fill
    rows = [("a", dt.datetime(2024, 1, 1, 0, 5), 1.0),
            ("a", dt.datetime(2024, 1, 1, 0, 20), 2.0),
            ("a", dt.datetime(2024, 1, 1, 3, 10), 5.0),
            ("b", dt.datetime(2024, 1, 1, 1, 0), 7.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    aggs = {"n": ("*", "count"), "sv": ("v", "sum")}
    out = {(r.k, r.bucket.hour): (r.is_gap, r.n, r.sv)
           for r in gap_fill(df, "ts", 3600, by=["k"], aggs=aggs,
                             fill="locf").collect()}
    assert out[("a", 0)] == (False, 2, 3.0)
    assert out[("a", 1)] == (True, 2, 3.0)   # carried forward
    assert out[("a", 2)] == (True, 2, 3.0)
    assert out[("a", 3)] == (False, 1, 5.0)
    assert out[("b", 1)] == (False, 1, 7.0)  # no gaps for b
    assert len(out) == 5
    z = {(r.k, r.bucket.hour): r.n
         for r in gap_fill(df, "ts", 3600, by=["k"],
                           fill="zero").collect()}
    assert z[("a", 1)] == 0 and z[("a", 0)] == 2
    nu = {(r.k, r.bucket.hour): r.sv
          for r in gap_fill(df, "ts", 3600, by=["k"], aggs=aggs,
                            fill="null").collect()}
    assert nu[("a", 2)] is None and nu[("a", 3)] == 5.0


@pytest.mark.spark
def test_gap_fill_numeric_time_and_guards(spark):
    from parquet_spark.temporal import gap_fill
    df = spark.createDataFrame([(1, 10.0), (31, 20.0)],
                               "t long, v double")
    got = {r.bucket: (r.is_gap, r.n)
           for r in gap_fill(df, "t", 10, fill="zero").collect()}
    # numeric time keeps integer-second buckets; keyless by is allowed
    # (grid-sized window, not row-sized)
    assert got == {0: (False, 1), 10: (True, 0), 20: (True, 0),
                   30: (False, 1)}
    with pytest.raises(ValueError, match="step_s"):
        gap_fill(df, "t", 0)
    with pytest.raises(ValueError, match="fill"):
        gap_fill(df, "t", 10, fill="spline")
    with pytest.raises(ValueError, match="unsupported fn"):
        gap_fill(df, "t", 10, aggs={"a": ("v", "avg")})
    with pytest.raises(ValueError, match="collides"):
        gap_fill(df, "t", 10, aggs={"is_gap": ("v", "sum")})
    with pytest.raises(ValueError, match="reserves"):
        gap_fill(df.withColumn("bucket", df.v), "t", 10)


@pytest.mark.spark
def test_gap_fill_interp_linear_and_edges(spark):
    import datetime as dt

    from parquet_spark.temporal import gap_fill
    rows = [("a", dt.datetime(2024, 1, 1, 0, 5), 1.0),
            ("a", dt.datetime(2024, 1, 1, 3, 10), 7.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r.bucket.hour: (r.is_gap, r.sv)
           for r in gap_fill(df, "ts", 3600, by=["k"],
                             aggs={"sv": ("v", "sum")},
                             fill="interp").collect()}
    assert out == {0: (False, 1.0), 1: (True, 3.0), 2: (True, 5.0),
                   3: (False, 7.0)}
    # uneven spacing interpolates by time, not by row position
    rows2 = [(0, 0.0), (40, 8.0)]
    df2 = spark.createDataFrame(rows2, "t long, v double")
    got = {r.bucket: r.sv
           for r in gap_fill(df2, "t", 10, aggs={"sv": ("v", "sum")},
                             fill="interp").collect()}
    assert got == {0: 0.0, 10: 2.0, 20: 4.0, 30: 6.0, 40: 8.0}
