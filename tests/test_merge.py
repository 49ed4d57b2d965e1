"""Schema-evolution merge tests — fragment semantics from the reference
(/root/reference/Parquet.Tests/FragmentTests.cs:109-136,254-313 collisions;
ParquetFileTests.cs:134-172 merge; Doc/Schema/1.0.0.md:31-32 row order)."""

import pytest
from pyspark.sql import functions as F

from parquet_spark.merge import (find_unique_name, merge_tables,
                                 stringify_unsupported, with_row_id)


def test_find_unique_name_reserves_generated():
    # the reference bug (Fragment.cs:242) would reuse a suffix here
    existing = {"a", "a2"}
    n1 = find_unique_name(existing, "a")
    assert n1 == "a3"
    existing.add(n1)
    assert find_unique_name(existing, "a") == "a4"


@pytest.mark.spark
def test_merge_disjoint_columns_null_fill(spark):
    # F5 fixture: two fragments with disjoint dynamic columns
    f1 = spark.createDataFrame([(1, "p1")], "row bigint, `Plan/Param1` string")
    f2 = spark.createDataFrame([(2, "p2")], "row bigint, `Plan/Param2` string")
    merged, mappings = merge_tables([f1, f2], order_key=["row"])
    assert mappings == {}
    rows = merged.orderBy("row_id").collect()
    assert [r["Plan/Param1"] for r in rows] == ["p1", None]
    assert [r["Plan/Param2"] for r in rows] == [None, "p2"]
    assert set(merged.columns) == {"row", "Plan/Param1", "Plan/Param2", "row_id"}


@pytest.mark.spark
def test_merge_type_collision_split(spark):
    # F4 fixture: same column name, two types -> physical split + Mappings
    f1 = spark.createDataFrame([(1, 5)], "row bigint, Custom int")
    f2 = spark.createDataFrame([(2, 1.5)], "row bigint, Custom double")
    merged, mappings = merge_tables([f1, f2], order_key=["row"])
    assert mappings == {"Custom/int": "Custom", "Custom/double": "Custom"}
    rows = merged.orderBy("row_id").collect()
    assert [r["Custom/int"] for r in rows] == [5, None]
    assert [r["Custom/double"] for r in rows] == [None, 1.5]


@pytest.mark.spark
def test_merge_same_type_no_split(spark):
    f1 = spark.createDataFrame([(1, "x")], "row bigint, c string")
    f2 = spark.createDataFrame([(2, "y")], "row bigint, c string")
    merged, mappings = merge_tables([f1, f2])
    assert mappings == {}
    assert merged.count() == 2 and set(merged.columns) == {"row", "c"}


@pytest.mark.spark
def test_row_order_preserved_across_merge(spark):
    # the reference's hard invariant: rows in publish order across groups
    f1 = spark.range(0, 50).withColumnRenamed("id", "row")
    f2 = spark.range(50, 100).withColumnRenamed("id", "row")
    merged, _ = merge_tables([f1, f2], order_key=["row"])
    rows = merged.orderBy("row_id").select("row").collect()
    assert [r.row for r in rows] == list(range(100))


@pytest.mark.spark
def test_with_row_id_monotone(spark):
    df = spark.range(1000).withColumnRenamed("id", "k").repartition(7)
    out = with_row_id(df, ["k"]).orderBy("row_id").collect()
    assert [r.k for r in out] == list(range(1000))


@pytest.mark.spark
def test_stringify_unsupported(spark):
    df = spark.createDataFrame([({"a": 1}, 5)], "m map<string,int>, x int")
    out = stringify_unsupported(df)
    kinds = dict((f.name, f.dataType.simpleString()) for f in out.schema.fields)
    assert kinds == {"m": "string", "x": "int"}


@pytest.mark.spark
def test_hierarchy_rows_reconstruct_tree(spark):
    from parquet_spark.merge import merge_tables, with_hierarchy
    plan = spark.createDataFrame([("run1",)], ["plan_name"])
    plan_rows = with_hierarchy(plan, "Plan", ["plan_name"])
    root_guid = plan_rows.head().guid
    steps = spark.createDataFrame([("s1", 1), ("s2", 2)], ["step", "k"])
    step_rows = with_hierarchy(steps, "Step", ["step"],
                               parent_guid=root_guid)
    merged, _ = merge_tables([plan_rows, step_rows])
    # children resolve to the root through (parent = guid)
    kids = (merged.alias("c").join(merged.alias("p"),
                                   F.col("c.parent") == F.col("p.guid"))
            .select(F.col("c.result_name"), F.col("p.result_name")
                    .alias("parent_kind")).collect())
    assert {(r[0], r.parent_kind) for r in kids} == {("Step", "Plan")}
    # guids deterministic across re-emission (re-run overwrite story)
    again = with_hierarchy(plan, "Plan", ["plan_name"]).head().guid
    assert again == root_guid
