"""Metadata-only schema evolution (manifest.alter_table): add / drop /
rename columns with zero data files touched.

Reference parity note: the reference library rewrites the whole file on
any schema change (/root/reference/Parquet/ParquetFile.cs:120-124);
alter_table is the Iceberg-style O(1) metadata commit replacement, with
name-addressed chunks guarded against physical-name reuse.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from parquet_spark.manifest import (EncodedTable, alter_table,
                                    read_decoded, scan_table,
                                    write_encoded)


def _docs(spark, n=400):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .where(F.col("doc_id") < n))


@pytest.mark.spark
def test_add_column_nullfills_old_parts_and_appends(spark):
    d = _docs(spark)
    tbl = tempfile.mkdtemp(prefix="alter_add_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=64)
    snap = alter_table(tbl, add=[("score", "double")])
    t = EncodedTable(tbl)
    assert [f.name for f in t.schema(snap)] == [*d.columns, "score"]
    dec = read_decoded(spark, tbl)
    assert dec.count() == d.count()
    assert dec.where(F.col("score").isNull()).count() == d.count()
    # old columns decode unchanged next to the null fill
    assert dec.drop("score").exceptAll(d).count() == 0
    # appends must carry the evolved schema...
    with pytest.raises(ValueError, match="evolved"):
        write_encoded(d.withColumn("doc_id", F.col("doc_id") + 10000),
                      tbl, key=["doc_id"], n_parts=2, rows_per_chunk=64,
                      part_offset=2)
    # ...and store the added column physically in new parts
    d2 = (d.withColumn("doc_id", F.col("doc_id") + 10000)
          .withColumn("score", F.col("doc_id") / 100.0))
    write_encoded(d2, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=64,
                  part_offset=2)
    out = read_decoded(spark, tbl)
    assert out.count() == 2 * d.count()
    assert out.where(F.col("score").isNotNull()).count() == d.count()
    # predicate on the added column: notnull prunes nothing falsely
    got = scan_table(spark, tbl, [("score", "notnull", None)])
    assert got.count() == d.count()


@pytest.mark.spark
def test_drop_column_skips_payloads_and_time_travel(spark):
    d = _docs(spark)
    tbl = tempfile.mkdtemp(prefix="alter_drop_")
    s0 = write_encoded(d, tbl, key=["doc_id"], n_parts=2,
                       rows_per_chunk=64)
    alter_table(tbl, drop=["lang"])
    dec = read_decoded(spark, tbl)
    assert "lang" not in dec.columns
    assert dec.exceptAll(d.drop("lang")).count() == 0
    # time travel to the pre-alter snapshot still sees the column
    old = read_decoded(spark, tbl, snapshot_id=s0["snapshot_id"])
    assert "lang" in old.columns
    assert old.exceptAll(d).count() == 0
    # the name is retired forever (re-adding would resurrect bytes)
    with pytest.raises(ValueError, match="resurrect"):
        alter_table(tbl, add=[("lang", "string")])


@pytest.mark.spark
def test_rename_column_translates_reads_and_pruning(spark):
    d = _docs(spark)
    tbl = tempfile.mkdtemp(prefix="alter_ren_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=64,
                  mode="range")
    alter_table(tbl, rename={"source": "origin"})
    dec = read_decoded(spark, tbl)
    assert "origin" in dec.columns and "source" not in dec.columns
    assert dec.exceptAll(d.withColumnRenamed("source",
                                             "origin")).count() == 0
    # predicates address the LOGICAL name; zone terms expand to the
    # physical alias so pruning still bites on pre-rename parts
    got = scan_table(spark, tbl, [("origin", "=", "src1")])
    want = d.where(F.col("source") == "src1")
    assert got.count() == want.count() > 0
    # append under the new name, then read the mixed generations
    d2 = (d.withColumn("doc_id", F.col("doc_id") + 10000)
          .withColumnRenamed("source", "origin"))
    write_encoded(d2, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=64,
                  mode="range", part_offset=2)
    got2 = scan_table(spark, tbl, [("origin", "=", "src1")])
    assert got2.count() == 2 * want.count()
    # rename BACK restores the identity mapping for both generations
    alter_table(tbl, rename={"origin": "source"})
    ren = EncodedTable(tbl).meta().get("renames", {})
    assert "source" not in ren          # identity mapping restored
    assert ren.get("origin") == "source"  # post-rename parts translate
    back = read_decoded(spark, tbl)
    assert "source" in back.columns
    assert back.where(F.col("source") == "src1").count() == \
        2 * want.count()


@pytest.mark.spark
def test_alter_guards(spark):
    d = _docs(spark, 200)
    tbl = tempfile.mkdtemp(prefix="alter_guard_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=2)
    with pytest.raises(ValueError, match="nothing to alter"):
        alter_table(tbl)
    with pytest.raises(ValueError, match="layout key"):
        alter_table(tbl, drop=["doc_id"])
    with pytest.raises(ValueError, match="layout key"):
        alter_table(tbl, rename={"doc_id": "id"})
    with pytest.raises(KeyError, match="nope"):
        alter_table(tbl, drop=["nope"])
    with pytest.raises(ValueError, match="resurrect"):
        alter_table(tbl, add=[("lang", "string")])  # name in use
    with pytest.raises(ValueError, match="resurrect"):
        alter_table(tbl, rename={"text": "lang"})
    with pytest.raises(ValueError, match="both dropped and renamed"):
        alter_table(tbl, drop=["lang"], rename={"lang": "x"})
    # rename away, then the old physical name stays retired
    alter_table(tbl, rename={"lang": "language"})
    with pytest.raises(ValueError, match="resurrect"):
        alter_table(tbl, add=[("lang", "string")])


@pytest.mark.spark
def test_rename_global_dict_column(spark):
    d = _docs(spark)
    tbl = tempfile.mkdtemp(prefix="alter_gd_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=64,
                  global_dict_cols=["lang"])
    alter_table(tbl, rename={"lang": "language"})
    meta = EncodedTable(tbl).meta()
    assert "language" in meta["global_dicts"]
    assert "lang" not in meta["global_dicts"]
    dec = read_decoded(spark, tbl)
    assert dec.schema["language"].dataType.simpleString() == "string"
    assert dec.exceptAll(d.withColumnRenamed("lang",
                                             "language")).count() == 0
    # value-space predicate on the renamed dict column still translates
    got = scan_table(spark, tbl, [("language", "=", "de")])
    assert got.count() == d.where(F.col("lang") == "de").count() > 0


@pytest.mark.spark
def test_alter_then_compact_preserves_evolution(spark):
    from parquet_spark.manifest import compact_table
    d = _docs(spark)
    tbl = tempfile.mkdtemp(prefix="alter_cmp_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=4, rows_per_chunk=64)
    alter_table(tbl, add=[("tag", "string")], rename={"source": "origin"})
    compact_table(spark, tbl, target_parts=1)
    dec = read_decoded(spark, tbl)
    assert set(dec.columns) == {*d.columns, "tag", "origin"} - {"source"}
    assert dec.where(F.col("tag").isNull()).count() == d.count()
    assert dec.select("doc_id", "origin").exceptAll(
        d.select("doc_id", "source")).count() == 0


@pytest.mark.spark
def test_append_after_global_dict_rename(spark):
    """Renaming a global-dict column must keep the table appendable:
    the layout's global_dict_cols follows the logical name, the
    committed dictionary applies under it, and both generations
    restore."""
    d = _docs(spark)
    tbl = tempfile.mkdtemp(prefix="alter_gd_app_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=64,
                  global_dict_cols=["lang"])
    alter_table(tbl, rename={"lang": "language"})
    lay = EncodedTable(tbl).meta()["layout"]
    assert lay["global_dict_cols"] == ["language"]
    d2 = (d.withColumn("doc_id", F.col("doc_id") + 10000)
          .withColumnRenamed("lang", "language"))
    write_encoded(d2, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=64,
                  part_offset=2, global_dict_cols=["language"])
    out = read_decoded(spark, tbl)
    assert out.count() == 2 * d.count()
    assert out.schema["language"].dataType.simpleString() == "string"
    want = d.select(F.col("lang").alias("language")).unionAll(
        d2.select("language"))
    assert out.select("language").exceptAll(want).count() == 0
    # value predicates translate across BOTH physical generations
    got = scan_table(spark, tbl, [("language", "=", "de")])
    assert got.count() == 2 * d.where(F.col("lang") == "de").count()


# ---------------------------------------------------------------- widening

@pytest.mark.spark
def test_widen_int_and_float_metadata_only(spark):
    """int32->int64 and float32->float64 promotion: snapshot schema
    changes, zero data files touched, old chunks decode at their
    encoded width and upcast exactly."""
    import pyarrow as pa
    d = (_docs(spark)
         .withColumn("small", F.col("n_chars").cast("int"))
         .withColumn("ratio", (F.col("n_chars") / 1000).cast("float")))
    tbl = tempfile.mkdtemp(prefix="alter_widen_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=64)
    t = EncodedTable(tbl)
    files_before = sorted(t.data_files())
    assert t.schema().field("small").type == pa.int32()
    assert t.schema().field("ratio").type == pa.float32()
    alter_table(tbl, widen={"small": "int64", "ratio": "float64"})
    t = EncodedTable(tbl)
    assert t.schema().field("small").type == pa.int64()
    assert t.schema().field("ratio").type == pa.float64()
    assert sorted(t.data_files()) == files_before  # metadata-only
    dec = read_decoded(spark, tbl)
    assert dict(dec.dtypes)["small"] == "bigint"
    assert dict(dec.dtypes)["ratio"] == "double"
    exp = (d.withColumn("small", F.col("small").cast("bigint"))
           .withColumn("ratio", F.col("ratio").cast("double")))
    assert dec.exceptAll(exp).count() == 0 and dec.count() == exp.count()


@pytest.mark.spark
def test_widen_then_append_wide_values(spark):
    """Post-widen appends store the wide type physically; a value that
    only fits the widened type round-trips next to old narrow chunks."""
    d = _docs(spark).withColumn("v", F.col("n_chars").cast("int"))
    tbl = tempfile.mkdtemp(prefix="alter_widen_app_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=64)
    alter_table(tbl, widen={"v": "int64"})
    big = 2**40
    d2 = (d.withColumn("doc_id", F.col("doc_id") + 10_000)
          .withColumn("v", (F.col("doc_id") + big).cast("bigint")))
    write_encoded(d2, tbl, key=["doc_id"], n_parts=2, rows_per_chunk=64,
                  part_offset=2)
    dec = read_decoded(spark, tbl)
    assert dec.count() == 2 * d.count()
    assert dec.where(F.col("v") >= big).count() == d.count()
    # zone pruning on the widened column still bites and stays exact
    got = scan_table(spark, tbl, [("v", big, None)])
    assert got.count() == d.count()


@pytest.mark.spark
def test_widen_rejects_illegal(spark):
    d = (_docs(spark)
         .withColumn("small", F.col("n_chars").cast("int")))
    tbl = tempfile.mkdtemp(prefix="alter_widen_bad_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=2,
                  global_dict_cols=["lang"])
    with pytest.raises(ValueError, match="widen"):
        alter_table(tbl, widen={"n_chars": "int32"})     # narrowing
    with pytest.raises(ValueError, match="widen"):
        alter_table(tbl, widen={"text": "int64"})        # cross-family
    with pytest.raises(ValueError, match="widen"):
        alter_table(tbl, widen={"small": "int32"})       # no-op
    with pytest.raises(ValueError, match="layout key"):
        alter_table(tbl, widen={"doc_id": "int64"})      # key column
    with pytest.raises(ValueError, match="global-dict"):
        alter_table(tbl, widen={"lang": "int64"})        # dict column
    with pytest.raises(KeyError):
        alter_table(tbl, widen={"nope": "int64"})


@pytest.mark.spark
def test_widen_visible_through_datasource(spark):
    """The DataSource V2 reader decodes widened tables with the same
    chunk-physical-width rule."""
    from parquet_spark.datasource import register
    d = _docs(spark).withColumn("ratio",
                                (F.col("n_chars") / 1000).cast("float"))
    tbl = tempfile.mkdtemp(prefix="alter_widen_ds_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=2)
    alter_table(tbl, widen={"ratio": "float64"})
    register(spark)
    df = spark.read.format("parquet_spark").load(tbl)
    assert dict(df.dtypes)["ratio"] == "double"
    exp = d.withColumn("ratio", F.col("ratio").cast("double"))
    assert df.exceptAll(exp).count() == 0 and df.count() == exp.count()
