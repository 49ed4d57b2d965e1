"""Dev harness mimicking the driver's correctness gate: run every
queries() entry under Spark at sf0.01 and its oracle_sql() under DuckDB,
compare row count, column names, and order-insensitive values.

KNOWN BLIND SPOT (root cause of the round-4 gap_fill discrepancy —
this sweep said OK, the driver said hash fail): a measure that is only
*conditionally* portable can pass here yet fail under the driver's
environment.  The concrete class: ROUND(double, n) at representation
ties — Spark rounds HALF_UP over the exact binary expansion, DuckDB
1.0.0 rounds in scaled-double space, so .xxx5-adjacent doubles can
legally differ in the last digit (~29%% of the tie class diverges; see
tests/test_oracle_portability.py).  Whether any tie value actually
OCCURS depends on the data instance and library builds, so a green
local sweep proves nothing about tie-free-ness.  Defense: facet
measures must be unconditionally bit-portable (integer/decimal-exact
arithmetic, or FLOOR/CEIL of an identical IEEE expression — never
ROUND of a double feeding a hash-compared value); the lint
test_no_round_decimal_sum_in_oracles enforces the banned pattern."""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
ONLY = sys.argv[1:] if len(sys.argv) > 1 else None


def norm_cell(v):
    """TYPED canonical cell: type-name + exact repr.  Mirrors the driver's
    strict value hash — a DuckDB HUGEINT/DECIMAL and a Spark BIGINT/DOUBLE
    must NOT compare equal even when numerically identical (that is
    exactly the mismatch that cost 9 facets in round 1)."""
    import datetime
    import decimal
    if isinstance(v, bool):
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, float):
        return f"float:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"bytes:{bytes(v).hex()}"
    return f"{type(v).__name__}:{v}"


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    from parquet_spark import tune_malloc_for_workers
    tune_malloc_for_workers()
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            stbl = sdf.toArrow()
            scols = stbl.column_names
            srows = [tuple(r.values()) for r in stbl.to_pylist()]
        except Exception:
            results[name] = "SPARK_FAIL"
            print(f"=== {name}: SPARK FAIL")
            traceback.print_exc()
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(srows)} rows)"
            print(f"=== {name}: rows-only, {len(srows)} rows, cols={scols}")
            continue
        try:
            dtbl = con.sql(oracles[name]).arrow()
            dcols = dtbl.column_names
            drows = [tuple(r.values()) for r in dtbl.to_pylist()]
        except Exception:
            results[name] = "DUCK_FAIL"
            print(f"=== {name}: DUCKDB FAIL")
            traceback.print_exc()
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        # exact Arrow type compare per (sorted) column — the driver's hash
        # is type-sensitive, so a decimal128 vs int64 diff must fail here
        stypes = {c: str(stbl.schema.field(c).type) for c in scols}
        dtypes = {c: str(dtbl.schema.field(c).type) for c in dcols}
        ok_types = ok_cols and stypes == dtypes
        sn, dn = normalize(srows, scols), normalize(drows, dcols)
        ok_vals = sn == dn
        status = "OK" if (ok_cols and ok_types and ok_vals
                          and len(srows) == len(drows)) else "MISMATCH"
        results[name] = status
        print(f"=== {name}: {status} (spark {len(srows)} rows, duck {len(drows)} rows)")
        if status != "OK":
            if not ok_cols:
                print(f"  cols spark={sorted(scols)} duck={sorted(dcols)}")
            elif not ok_types:
                for c in sorted(scols):
                    if stypes[c] != dtypes[c]:
                        print(f"  type diff {c}: spark={stypes[c]} duck={dtypes[c]}")
            for i, (a, b) in enumerate(zip(sn, dn)):
                if a != b:
                    print(f"  first diff row {i}:\n   spark={a}\n   duck ={b}")
                    break
            if len(sn) != len(dn):
                print(f"  row counts differ: {len(sn)} vs {len(dn)}")

    print("\nSummary:")
    bad = 0
    for k, v in results.items():
        print(f"  {k:24s} {v}")
        bad += v in ("MISMATCH", "SPARK_FAIL", "DUCK_FAIL")
    print(f"{len(results) - bad}/{len(results)} clean")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
