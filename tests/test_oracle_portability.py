"""Root-cause regression for the round-4 `gap_fill` driver hash fail.

The facet's measure was ``ROUND(value,3) -> DECIMAL(20,3) -> SUM``,
mirrored "identically" in DuckDB.  That stacks TWO representation-tie
conversions, and the two engines break ties differently:

  * Spark's ``F.round(double, 3)`` is HALF_UP over the double's EXACT
    binary expansion (java.math.BigDecimal semantics) — 7.5245 stored
    as 7.52449999...  rounds DOWN to 7.524;
  * DuckDB 1.0.0's ``ROUND(double, 3)`` computes in scaled-double
    space — the same bits round UP to 7.525.

test_round_tie_divergence_exists measures the divergence rate on the
tie class (~29% in this container), which is why the pattern is banned
from hash-compared measures; the local sf0.01 data happened to dodge
every tie while the driver's environment did not, which is why
scripts/check_oracle.py could not reproduce the r04 verdict.

The portable replacement: FLOOR of the *identical* IEEE product
(``FLOOR(value * 1000) AS BIGINT``).  IEEE multiply is deterministic
bit-for-bit across engines, and floor has no tie to break.
test_floor_quantize_is_portable proves 0 divergences on the same
adversarial inputs; test_no_round_decimal_sum_in_oracles lints every
live oracle for the banned pattern.
"""

import math
import re
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _tie_values(n=50_000, seed=7):
    rng = np.random.default_rng(seed)
    # integers/1000 + 0.0005: every value sits on a .xxx5 decimal tie,
    # where the binary representation falls a hair above or below
    return (rng.integers(0, 100_000, n) / 1000.0 + 0.0005).astype(np.float64)


def _spark_round3(x):
    """Spark's round(double, 3): HALF_UP over the exact binary value."""
    return float(Decimal(x).quantize(Decimal("0.001"), rounding=ROUND_HALF_UP))


def test_round_tie_divergence_exists():
    vals = _tie_values()
    con = duckdb.connect()
    con.register("t", pa.table({"v": vals}))
    duck = con.sql("SELECT ROUND(v, 3) AS r FROM t").fetchnumpy()["r"]
    diffs = sum(1 for i in range(len(vals))
                if _spark_round3(vals[i]) != duck[i])
    # the divergence class is real and large — this is the r04 root cause
    assert diffs > len(vals) * 0.05, (
        f"only {diffs} divergences; if DuckDB's ROUND changed to match "
        "BigDecimal HALF_UP, this documentation test needs updating")


def test_floor_quantize_is_portable():
    vals = _tie_values()
    con = duckdb.connect()
    con.register("t", pa.table({"v": vals}))
    duck = con.sql(
        "SELECT CAST(FLOOR(v * 1000) AS BIGINT) AS f FROM t"
    ).fetchnumpy()["f"]
    diffs = sum(1 for i in range(len(vals))
                if math.floor(vals[i] * 1000.0) != duck[i])
    assert diffs == 0


def test_no_round_decimal_sum_in_oracles():
    """No live oracle may sum ROUND(double)->DECIMAL — the exact pattern
    that failed the r04 driver hash despite a green local sweep."""
    import __spark_entry__ as entry
    banned = re.compile(r"SUM\s*\(\s*CAST\s*\(\s*ROUND", re.I)
    hits = [name for name, sql in entry.oracle_sql().items()
            if banned.search(sql)]
    assert not hits, f"tie-unstable measure in oracles: {hits}"


def test_spark_floor_matches_duckdb_floor(spark, tmp_path):
    """End-to-end: Spark's floor(col*1000) over a parquet file equals
    DuckDB's FLOOR over the same file, on pure tie-class values."""
    vals = _tie_values(n=5_000, seed=11)
    p = str(tmp_path / "ties.parquet")
    import pyarrow.parquet as pq
    pq.write_table(pa.table({"v": vals}), p)
    from pyspark.sql import functions as F
    sdf = (spark.read.parquet(p)
           .agg(F.sum(F.floor(F.col("v") * 1000).cast("long"))
                .alias("s")))
    s_spark = sdf.collect()[0].s
    con = duckdb.connect()
    s_duck = con.sql(
        f"SELECT CAST(SUM(CAST(FLOOR(v * 1000) AS BIGINT)) AS BIGINT) "
        f"FROM read_parquet('{p}')").fetchone()[0]
    assert s_spark == s_duck
