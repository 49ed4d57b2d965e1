"""Dev harness mimicking the driver's correctness gate: run every
queries() entry under Spark at sf0.01 and its oracle_sql() under DuckDB,
compare row count, column names, and order-insensitive values."""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
ONLY = sys.argv[1:] if len(sys.argv) > 1 else None


def norm_cell(v):
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        return f"{v:.6f}"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


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
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
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
            rel = con.sql(oracles[name])
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception:
            results[name] = "DUCK_FAIL"
            print(f"=== {name}: DUCKDB FAIL")
            traceback.print_exc()
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        sn, dn = normalize(srows, scols), normalize(drows, dcols)
        ok_vals = sn == dn
        status = "OK" if (ok_cols and ok_vals and len(srows) == len(drows)) \
            else "MISMATCH"
        results[name] = status
        print(f"=== {name}: {status} (spark {len(srows)} rows, duck {len(drows)} rows)")
        if status != "OK":
            if not ok_cols:
                print(f"  cols spark={sorted(scols)} duck={sorted(dcols)}")
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
