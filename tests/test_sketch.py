"""KMV bottom-k distinct-count sketch: exactness, accuracy, merge
algebra, null handling."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.spark
def test_kmv_exact_below_k(spark):
    from parquet_spark.sketch import kmv_estimate, kmv_sketch
    df = spark.range(0, 1000).select((F.col("id") % 37).alias("v"))
    s = kmv_sketch(df, "v", k=256)
    assert s["exact"] and kmv_estimate(s) == 37.0


@pytest.mark.spark
def test_kmv_estimate_accuracy_and_nulls(spark):
    from parquet_spark.sketch import kmv_estimate, kmv_sketch
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 100 == 0, None)
        .otherwise(F.col("id")).alias("v"))
    true = df.where("v is not null").distinct().count()
    s = kmv_sketch(df, "v", k=256)
    assert not s["exact"] and len(s["hashes"]) == 256
    assert abs(kmv_estimate(s) / true - 1) < 0.20
    # all-null column -> empty, exact 0
    empty = kmv_sketch(df.where("v is null"), "v")
    assert empty["exact"] and kmv_estimate(empty) == 0.0


@pytest.mark.spark
def test_kmv_merge_identity_and_guards(spark):
    from parquet_spark.sketch import kmv_merge, kmv_sketch
    df = spark.range(0, 5000).select(F.col("id").alias("v"))
    whole = kmv_sketch(df, "v", k=64)
    parts = [kmv_sketch(df.where(F.col("v") % 3 == i), "v", k=64)
             for i in range(3)]
    assert kmv_merge(*parts)["hashes"] == whole["hashes"]
    # duplicate values across inputs collapse in the union
    twice = kmv_merge(whole, whole)
    assert twice["hashes"] == whole["hashes"]
    with pytest.raises(ValueError, match="different k"):
        kmv_merge(whole, kmv_sketch(df, "v", k=32))
    with pytest.raises(ValueError, match="at least one"):
        kmv_merge()
    with pytest.raises(ValueError, match="k must"):
        kmv_sketch(df, "v", k=1)


@pytest.mark.spark
def test_kmv_cross_partition_duplicates_regression(spark):
    """A value repeated across partitions must not crowd distinct
    survivors out of the global bottom-k: with true ndv 313 >= k=256
    the sketch must hold exactly k distinct hashes and NOT claim
    exactness (regression: the pre-dedup limit(k) collected duplicate
    rows and under-counted)."""
    from parquet_spark.sketch import kmv_estimate, kmv_sketch
    df = spark.range(0, 5000).select((F.col("id") % 313).alias("v")) \
        .repartition(8)
    s = kmv_sketch(df, "v", k=256)
    assert len(s["hashes"]) == 256 and len(set(s["hashes"])) == 256
    assert not s["exact"]
    assert abs(kmv_estimate(s) / 313.0 - 1) < 0.25
    # just past k: still inexact, still k survivors
    d2 = spark.range(0, 2000).select((F.col("id") % 257).alias("v")) \
        .repartition(8)
    s2 = kmv_sketch(d2, "v", k=256)
    assert len(s2["hashes"]) == 256 and not s2["exact"]
    # exactly at k-1: exact
    d3 = spark.range(0, 2000).select((F.col("id") % 255).alias("v")) \
        .repartition(8)
    s3 = kmv_sketch(d3, "v", k=256)
    assert s3["exact"] and kmv_estimate(s3) == 255.0


@pytest.mark.spark
def test_kmv_sketch_many_identical_to_per_column(spark):
    """The one-pass multi-column sketch must produce BIT-identical
    hashes and exactness flags to per-column kmv_sketch — same
    estimator, one scan instead of C."""
    from parquet_spark.sketch import (kmv_estimate, kmv_sketch,
                                      kmv_sketch_many)
    df = spark.range(0, 4000).select(
        (F.col("id") % 313).alias("a"),                      # ndv > k
        (F.col("id") % 37).cast("string").alias("b"),        # exact
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id")).alias("c"),                  # nulls
        F.lit(None).cast("string").alias("d")).repartition(8)
    many = kmv_sketch_many(df, ["a", "b", "c", "d"], k=256)
    for c in ("a", "b", "c", "d"):
        one = kmv_sketch(df, c, k=256)
        assert many[c] == one, c
    assert many["b"]["exact"] and kmv_estimate(many["b"]) == 37.0
    assert many["d"] == {"k": 256, "hashes": [], "exact": True}
    assert not many["a"]["exact"] and len(many["a"]["hashes"]) == 256
    with pytest.raises(ValueError, match="non-empty"):
        kmv_sketch_many(df, [])


# ------------------------------------------------- quantile summaries


def _rank_err(data, est, q):
    """|true rank of est - target rank| on the exact sorted data."""
    import numpy as np
    s = np.sort(np.asarray(data))
    n = len(s)
    t = 1 + int(round(q * (n - 1)))
    lo = int(np.searchsorted(s, est, side="left")) + 1
    hi = int(np.searchsorted(s, est, side="right"))
    if lo <= t <= max(hi, lo):
        return 0
    return min(abs(lo - t), abs(hi - t))


@pytest.mark.spark
@pytest.mark.parametrize("parts", [1, 7, 32])
def test_quantile_summary_bound_holds_across_partitionings(spark, parts):
    import numpy as np
    from parquet_spark.sketch import quantile_query, quantile_summary
    rng = np.random.default_rng(11)
    data = np.concatenate([rng.integers(0, 1000, 20000),
                           rng.integers(10**6, 10**7, 5000)])
    df = (spark.createDataFrame([(int(x),) for x in data], "v bigint")
          .repartition(parts))
    s = quantile_summary(df, "v", eps=0.01)
    assert s["n"] == len(data)
    qs = [0.0, 0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    for q, est in zip(qs, quantile_query(s, qs)):
        assert _rank_err(data, est, q) <= s["err"], (q, parts)


@pytest.mark.spark
def test_quantile_summary_floats_nulls_empty_and_guards(spark):
    import numpy as np
    from parquet_spark.sketch import quantile_query, quantile_summary
    rng = np.random.default_rng(3)
    vals = [float(x) for x in rng.normal(0, 1, 5000)] + [None] * 500
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    s = quantile_summary(df, "v", eps=0.02)
    assert s["n"] == 5000                         # nulls never counted
    data = [v for v in vals if v is not None]
    for q, est in zip([0.1, 0.5, 0.9],
                      quantile_query(s, [0.1, 0.5, 0.9])):
        assert _rank_err(data, est, q) <= s["err"]
    # empty input
    e = quantile_summary(df.where("v > 1e9"), "v")
    assert e["n"] == 0 and quantile_query(e, [0.5]) == [None]
    # type/eps guards
    df2 = spark.createDataFrame([("a",)], "v string")
    with pytest.raises(TypeError):
        quantile_summary(df2, "v")
    with pytest.raises(ValueError):
        quantile_summary(df, "v", eps=0.7)


@pytest.mark.spark
def test_quantile_merge_accumulates_error_honestly(spark):
    import numpy as np
    from parquet_spark.sketch import (quantile_merge, quantile_query,
                                      quantile_summary)
    rng = np.random.default_rng(5)
    a = rng.integers(0, 10**6, 30000)
    b = rng.integers(5 * 10**5, 2 * 10**6, 20000)
    da = spark.createDataFrame([(int(x),) for x in a], "v bigint") \
        .repartition(8)
    db = spark.createDataFrame([(int(x),) for x in b], "v bigint") \
        .repartition(8)
    sa = quantile_summary(da, "v", eps=0.01)
    sb = quantile_summary(db, "v", eps=0.01)
    m = quantile_merge(sa, sb)
    assert m["n"] == 50000
    assert m["err"] >= sa["err"] + sb["err"]     # bound only grows
    assert len(m["values"]) <= 2 / 0.01 + 2      # compression bites
    data = np.concatenate([a, b])
    for q, est in zip([0.05, 0.5, 0.95],
                      quantile_query(m, [0.05, 0.5, 0.95])):
        assert _rank_err(data, est, q) <= m["err"], q
    # identity merges
    assert quantile_merge(sa, {"n": 0, "eps": 1e-3, "err": 0,
                               "values": [], "gaps": []}) == sa
