"""Global (cross-partition) dictionary encoding + skew machinery.

The per-chunk DICT codec (codecs/column.py) stores a local dictionary per
chunk — right when chunk cardinality is low. For columns that repeat
ACROSS partitions (lang, domains), a single global dictionary is smaller
and makes encoded chunks joinable/groupable without decode. This module
builds it Spark-side, mirroring the reference's dictionary gate
(uniqueness ratio <= 0.8, /root/reference/Parquet/ParquetResultListener.cs:45)
at table scope.

Scale design (BASELINE.json: "salted repartition for skewed lang/domain
hot keys, AQE skew-join handling during dictionary merge"):
  * frequency counting is two-phase (salted partial agg -> final agg) so
    one hot key ('en' ~ 60%) can't pin a reducer;
  * the dictionary application join is an explicit broadcast (dictionary
    is small by the 0.8 gate), so the big side never shuffles;
  * AQE skew-join splitting stays on as the safety net when a dictionary
    outgrows broadcast and Spark falls back to sort-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_SALTS = 64


def salted_key_counts(df: DataFrame, col: str,
                      n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Two-phase frequency count robust to Zipf-skewed keys.

    Phase 1 groups by (key, salt) so the hot key spreads over n_salts
    reducers; phase 2 merges the small per-salt partials.
    """
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).alias("_salt")
    partial = (df.select(F.col(col), salt)
               .groupBy(col, "_salt").agg(F.count(F.lit(1)).alias("_c")))
    return partial.groupBy(col).agg(F.sum("_c").alias("n"))


def build_global_dict(df: DataFrame, col: str,
                      max_cardinality: int = 1 << 20,
                      reason_out: dict | None = None) -> DataFrame | None:
    """Dense ids for every distinct non-null value, ordered by value.

    Returns None when the column fails the reference's 0.8 uniqueness
    gate (dictionary would blow up) or exceeds max_cardinality; pass
    `reason_out` to learn WHICH gate refused ("empty" / "cardinality
    <d> > <cap>" / "uniqueness <ratio> > 0.8") — callers can fall back
    differently per cause (write_encoded falls back to per-chunk dicts
    on a cardinality overflow but still refuses a uniqueness failure).
    """
    stats = df.agg(F.countDistinct(col).alias("d"),
                   F.count(col).alias("n")).collect()[0]
    reason = None
    if stats.n == 0:
        reason = "empty"
    elif stats.d / stats.n > 0.8:
        # checked BEFORE the cap: a near-unique column fails the
        # semantic gate regardless of size (dict would not compress)
        reason = f"uniqueness {stats.d / stats.n:.3f} > 0.8"
    elif stats.d > max_cardinality:
        reason = f"cardinality {stats.d} > {max_cardinality}"
    if reason is not None:
        if reason_out is not None:
            reason_out["reason"] = reason
        return None
    vals = df.where(F.col(col).isNotNull()).select(col).distinct()
    # Dense rank WITHOUT a single-partition sort: range-partition the
    # distinct values (so partition p's values all precede p+1's), rank
    # locally per partition, then add each partition's global offset
    # (per-partition counts are metadata-sized).  At 1M+ cardinality
    # this keeps every stage parallel; the old coalesce(1) window made
    # the final rank a one-task sort.
    n_parts = max(2, min(32, vals.sparkSession.sparkContext
                         .defaultParallelism))
    # localCheckpoint PINS the partitioning: repartitionByRange samples
    # boundaries per execution, so without materialization the counts
    # job and the ranking job can see DIFFERENT partition boundaries —
    # offsets then misalign and ids come out duplicated/gapped
    # (observed live at 300k distinct values before this fix)
    ranged = (vals.repartitionByRange(n_parts, col)
              .withColumn("_p", F.spark_partition_id())
              .localCheckpoint(eager=True))
    counts = {r._p: r.c for r in
              ranged.groupBy("_p").agg(F.count(F.lit(1)).alias("c"))
              .collect()}
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for p in sorted(offsets)
                       for x in (p, offsets[p])]), F.col("_p"))
    w = Window.partitionBy("_p").orderBy(col)
    return (ranged.withColumn(
                "dict_id", F.row_number().over(w) - 1 + off_expr)
            .select(F.col("dict_id").cast("int").alias("dict_id"),
                    F.col(col).alias("value")))


def apply_global_dict(df: DataFrame, col: str, dict_df: DataFrame) -> DataFrame:
    """Replace `col` with its dense id via an explicit broadcast join —
    the big side stays in place (no shuffle, no skew exposure)."""
    d = F.broadcast(dict_df.withColumnRenamed("value", col)
                    .withColumnRenamed("dict_id", f"{col}_id"))
    return (df.join(d, on=col, how="left")
              .drop(col)
              .withColumnRenamed(f"{col}_id", col + "_id"))


def restore_global_dict(df: DataFrame, col_id: str,
                        dict_df: DataFrame, out_col: str) -> DataFrame:
    d = F.broadcast(dict_df.withColumnRenamed("dict_id", col_id)
                    .withColumnRenamed("value", out_col))
    return df.join(d, on=col_id, how="left").drop(col_id)
