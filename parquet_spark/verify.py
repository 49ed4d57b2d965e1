"""Round-trip verifier — the engine's correctness oracle.

Mirrors the reference test suite's decode-what-you-encoded model
(/root/reference/Parquet.Tests/Reader.cs, FragmentTests.cs:100-107):
every encoded partition is decoded and asserted bit-identical, plus the
north-rule per-url contract: byte-identical `text` per `url`
(BASELINE.json:6,15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def verify_roundtrip(original: DataFrame, decoded: DataFrame,
                     key: list[str] | None = None,
                     digest_col: str | None = None) -> dict:
    """Assert decoded == original (order-insensitive, null-safe).

    Returns a report dict; raises AssertionError on any mismatch.
    """
    n_orig = original.count()
    n_dec = decoded.count()
    assert n_orig == n_dec, f"row count {n_orig} != {n_dec}"

    extra = decoded.exceptAll(original).count()
    missing = original.exceptAll(decoded).count()
    assert extra == 0 and missing == 0, \
        f"multiset mismatch: extra={extra} missing={missing}"

    report = {"rows": n_orig, "extra": extra, "missing": missing}

    if key and digest_col:
        o = original.select(*key, F.sha2(F.col(digest_col).cast("binary"), 256)
                            .alias("_d"))
        d = decoded.select(*key, F.sha2(F.col(digest_col).cast("binary"), 256)
                           .alias("_d"))
        bad = (o.alias("o").join(d.alias("d"), on=key, how="full")
               .where(~F.col("o._d").eqNullSafe(F.col("d._d"))).count())
        assert bad == 0, f"{bad} per-key digest mismatches on {digest_col}"
        report["digest_mismatches"] = bad
    return report


def diff_tables(spark, path_a: str, path_b: str, key: list[str],
                snapshot_id_a: int | None = None,
                snapshot_id_b: int | None = None,
                ref_a: str | None = None, ref_b: str | None = None,
                columns: list[str] | None = None,
                backend_a=None, backend_b=None) -> DataFrame:
    """Key-level reconciliation of two encoded tables (or two
    snapshots/refs of the same table): one row per differing key with
    `_diff` ∈ {'added', 'removed', 'changed'} — B relative to A.  The
    audit tool for every state-changing operation this engine ships:
    verify a rewrite/recluster/relocation preserved data (expect zero
    rows), inspect what a WAP branch would publish, or reconcile a
    migrated copy.

    Semantics: rows pair by `key`; non-key column values compare via
    an md5 over null-tagged, `~`-joined string renderings (binary
    hex-encoded), so NULL ≠ '' and column boundaries cannot alias.
    Duplicate keys compare as multisets: the per-key digest aggregates
    each side's row digests with sum+count, so reordering is invisible
    but multiplicity changes are not.

    Scale: one shuffle per side (the per-key aggregation), then a
    key-partitioned full outer join — at 10^12 rows this is the
    minimum data motion any exact reconciliation needs; the row
    payload is reduced to (key, 16-byte digest, count) before the
    join, so the join shuffles key-plus-32-bytes, never documents."""
    from .manifest import read_decoded

    a = read_decoded(spark, path_a, backend=backend_a,
                     snapshot_id=snapshot_id_a, ref=ref_a)
    b = read_decoded(spark, path_b, backend=backend_b,
                     snapshot_id=snapshot_id_b, ref=ref_b)
    cols = columns or [c for c in a.columns if c not in key]
    missing = [c for c in cols if c not in b.columns]
    if missing:
        raise ValueError(f"columns {missing} absent from {path_b}; "
                         "pass columns= to compare the intersection")

    def digest(df):
        parts = []
        for c in cols:
            v = F.col(c)
            if dict(df.dtypes)[c] == "binary":
                v = F.hex(v)
            parts.append(F.coalesce(v.cast("string"), F.lit("\x00null")))
        row_md5 = F.md5(F.concat_ws("~", *parts))
        # order-free multiset digest: sum of the md5's first 16 hex
        # digits as a bigint + row count (collisions need 2^64-scale
        # coincidences across equal-count groups)
        return (df.groupBy(*key).agg(
            F.sum(F.conv(F.substring(row_md5, 1, 15), 16, 10)
                  .cast("decimal(38,0)")).alias("_dg"),
            F.count(F.lit(1)).alias("_n")))

    da, db = digest(a), digest(b)
    j = da.alias("a").join(db.alias("b"), on=key, how="full_outer")
    return (j.withColumn(
        "_diff",
        F.when(F.col("a._n").isNull(), F.lit("added"))
         .when(F.col("b._n").isNull(), F.lit("removed"))
         .when((F.col("a._dg") != F.col("b._dg"))
               | (F.col("a._n") != F.col("b._n")), F.lit("changed")))
        .where(F.col("_diff").isNotNull())
        .select(*key, "_diff",
                F.col("a._n").alias("n_rows_a"),
                F.col("b._n").alias("n_rows_b")))
