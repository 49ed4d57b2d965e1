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
