"""Schema-evolving merge — Spark rendering of the reference's fragment
model.

Operators covered (SURVEY.md §2):
  O6  dynamic column add      -> unionByName(allowMissingColumns=True)
  O7  type-collision split    -> rename to "name/SparkType" + Mappings dict
      (/root/reference/Parquet.Core/Fragment.cs:193-199,117-125)
  O8  unique-name generation  -> find_unique_name (reference intent, with
      the Fragment.cs:242 seen-set bug fixed as SURVEY.md §1.2 directs)
  O9  type normalization      -> stringify_unsupported
      (Fragment.cs:374-384: enums/objects -> invariant string)
  O10 ordered union-by-name with null fill -> merge_tables
      (Fragment.cs:314-364; order invariant Doc/Schema/1.0.0.md:31-32)

Scale notes: unionByName is a zero-shuffle plan (pure concatenation of
partitions); null fill is a constant-folded literal per Catalyst; the
row_id ordering uses sort + monotonically_increasing_id which stays
order-consistent because sorted partitions are range-ordered — no
single-partition window at 100 TB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def find_unique_name(existing: set[str], name: str) -> str:
    """Append an integer suffix until unused (Fragment.cs:227-245, bug-fixed:
    generated names are also reserved so a third collision can't reuse one)."""
    if name not in existing:
        return name
    i = 2
    while f"{name}{i}" in existing:
        i += 1
    return f"{name}{i}"


def resolve_collisions(dfs: list[DataFrame]) -> tuple[list[DataFrame], dict[str, str]]:
    """Split same-name/different-type columns into 'name/Type' physical
    columns; return renamed frames + Mappings {physical -> logical}."""
    types: dict[str, set[str]] = {}
    for df in dfs:
        for f in df.schema.fields:
            types.setdefault(f.name, set()).add(f.dataType.simpleString())
    collided = {n for n, ts in types.items() if len(ts) > 1}
    mappings: dict[str, str] = {}
    physical: dict[tuple[str, str], str] = {}  # (logical, type) -> physical
    taken = set(types.keys())
    out = []
    for df in dfs:
        renames = {}
        for f in df.schema.fields:
            if f.name in collided:
                k = (f.name, f.dataType.simpleString())
                if k not in physical:
                    phys = find_unique_name(taken - {f.name}, f"{k[0]}/{k[1]}")
                    taken.add(phys)
                    physical[k] = phys
                    mappings[phys] = f.name
                renames[f.name] = physical[k]
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        out.append(df)
    return out, mappings


def merge_tables(dfs: list[DataFrame],
                 order_key: list[str] | None = None
                 ) -> tuple[DataFrame, dict[str, str]]:
    """Union-by-name with null fill + collision renaming (O10 flagship).

    Missing columns become typed nulls (Catalyst constant-folds them —
    the analog of the reference's shared empty-column cache,
    Fragment.cs:336-363). Row order: pass order_key to get a stable
    global order and a row_id column.
    """
    dfs, mappings = resolve_collisions(dfs)
    merged = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
    if order_key:
        merged = with_row_id(merged, order_key)
    return merged, mappings


def with_row_id(df: DataFrame, order_key: list[str]) -> DataFrame:
    """Global row ids without a single-partition window: range-sort first,
    then monotonically_increasing_id (ids rise with partition index and
    in-partition position, so sorted order is preserved)."""
    return (df.orderBy(*order_key)
              .withColumn("row_id", F.monotonically_increasing_id()))


ID_COLUMNS = ["result_name", "guid", "parent", "step_id"]


def with_hierarchy(df: DataFrame, result_name: str,
                   guid_cols: list[str], parent_guid: str | None = None,
                   step_id: str | None = None) -> DataFrame:
    """O20: the reference's run-tree row identity (fixed columns
    ResultName/Guid/Parent/StepId, /root/reference/Parquet.Core/
    ParquetFile.cs:58-104, Doc/Schema/1.0.0.md:13-16) as plain columns.

    `guid` is a deterministic digest of the row's natural key columns
    (stable across reruns, unlike java UUIDs); `parent` links to the
    emitting scope's guid; recursion is unnecessary — the tree is
    reconstructed by a self-join on (parent = guid)."""
    guid = F.md5(F.concat_ws("\x1f", F.lit(result_name),
                             *[F.col(c).cast("string") for c in guid_cols]))
    return (df.withColumn("result_name", F.lit(result_name))
              .withColumn("guid", guid)
              .withColumn("parent", F.lit(parent_guid).cast("string"))
              .withColumn("step_id", F.lit(step_id).cast("string")))


_SUPPORTED_PREFIXES = ("tinyint", "smallint", "int", "bigint", "float",
                       "double", "decimal", "string", "binary", "boolean",
                       "timestamp", "date", "array", "void")


def stringify_unsupported(df: DataFrame) -> DataFrame:
    """O9: anything outside the supported scalar set is cast to string
    (reference: enums/objects -> invariant-culture string,
    Fragment.cs:374-384)."""
    exprs = []
    for f in df.schema.fields:
        s = f.dataType.simpleString()
        if s.startswith(_SUPPORTED_PREFIXES):
            exprs.append(F.col(f.name))
        else:
            exprs.append(F.col(f.name).cast("string").alias(f.name))
    return df.select(*exprs)
