"""Exact quantiles (multi-pass histogram narrowing) and exact heavy
hitters (Misra-Gries candidates + exact verify)."""

import math
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F


def _disc(vals, q):
    """Reference percentile_disc: value at rank max(1, ceil(q*n)) of
    the sorted non-null values (IEEE double rank arithmetic, matching
    the module)."""
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


def _encode(spark, df, key, **kw):
    from parquet_spark.manifest import write_encoded
    path = tempfile.mkdtemp(prefix="stats_t_")
    write_encoded(df, path, key=[key], n_parts=4, mode="range",
                  rows_per_chunk=64, **kw)
    return path


@pytest.mark.spark
def test_exact_quantiles_vs_reference(spark):
    from parquet_spark.stats import exact_quantiles
    rng = np.random.RandomState(7)
    vals = rng.randint(-10_000, 10_000, size=2000).tolist()
    vals += [vals[0]] * 50  # heavy duplicate
    rows = [(i, int(v), None if i % 17 == 0 else int(v * 3))
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "rid long, v long, w long")
    path = _encode(spark, df, "rid")
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = exact_quantiles(spark, path, "v", qs)
    assert got == {q: _disc(vals, q) for q in qs}
    # nullable column: ranks over non-null values only
    wvals = [r[2] for r in rows if r[2] is not None]
    gw = exact_quantiles(spark, path, "w", [0.5, 1.0])
    assert gw == {0.5: _disc(wvals, 0.5), 1.0: _disc(wvals, 1.0)}


@pytest.mark.spark
def test_exact_quantiles_multipass_and_edges(spark):
    from parquet_spark.stats import exact_quantiles, quantiles_df
    df = spark.range(0, 500).select(
        F.col("id").alias("rid"),
        (F.col("id") * 37 % 1000 - 500).alias("v"),
        F.lit(42).alias("c"))
    path = _encode(spark, df, "rid")
    vals = [r.v for r in df.select("v").collect()]
    # buckets=4 forces many narrowing passes; must agree with the
    # single-ish-pass default
    for b in (4, 16, 1024):
        got = exact_quantiles(spark, path, "v", [0.1, 0.5, 0.99],
                              buckets=b)
        assert got == {q: _disc(vals, q) for q in (0.1, 0.5, 0.99)}
    # constant column, q extremes
    assert exact_quantiles(spark, path, "c", [0.0, 1.0]) == \
        {0.0: 42, 1.0: 42}
    qdf = quantiles_df(spark, path, "v", [0.5, 0.25])
    assert [tuple(r) for r in qdf.collect()] == \
        [(0.25, _disc(vals, 0.25)), (0.5, _disc(vals, 0.5))]


@pytest.mark.spark
def test_exact_quantiles_rejections(spark):
    from parquet_spark.stats import exact_quantiles
    df = spark.range(0, 10).select(
        F.col("id").alias("rid"), F.lit("x").alias("s"),
        F.lit(None).cast("long").alias("z"))
    path = _encode(spark, df, "rid")
    with pytest.raises(TypeError, match="integer-domain"):
        exact_quantiles(spark, path, "s", [0.5])
    with pytest.raises(ValueError, match="no non-null"):
        exact_quantiles(spark, path, "z", [0.5])
    with pytest.raises(ValueError, match="outside"):
        exact_quantiles(spark, path, "rid", [1.5])
    with pytest.raises(ValueError, match="non-empty"):
        exact_quantiles(spark, path, "rid", [])


@pytest.mark.spark
def test_heavy_hitters_exact_and_bounded(spark):
    from parquet_spark.sketch import heavy_hitters
    # Zipf-ish corpus: token t_i has frequency ~ 3000/i
    rows = []
    rid = 0
    for i in range(1, 200):
        for _ in range(3000 // i):
            rows.append((rid, f"t{i:03d}"))
            rid += 1
    # scatter nulls (ignored) and shuffle deterministically
    rng = np.random.RandomState(3)
    rng.shuffle(rows)
    rows = [(r[0], None if r[0] % 97 == 0 else r[1]) for r in rows]
    df = spark.createDataFrame(rows, "rid long, tok string") \
        .repartition(8, "rid")
    exact = {r.tok: r.c for r in
             df.where("tok is not null").groupBy("tok")
             .agg(F.count(F.lit(1)).alias("c")).collect()}
    n = sum(exact.values())
    for k in (10, 50):
        got = {r.tok: r.cnt for r in
               heavy_hitters(df, "tok", k).collect()}
        want = {t: c for t, c in exact.items() if c * k > n}
        assert got == want and len(want) > 0
    # everything below threshold -> empty result, no error
    uni = spark.range(0, 1000).select(
        F.concat(F.lit("u"), F.col("id")).alias("tok"))
    assert heavy_hitters(uni, "tok", 5).count() == 0
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "tok", 1)
    with pytest.raises(ValueError, match="counters"):
        heavy_hitters(df, "tok", 10, counters=5)


@pytest.mark.spark
def test_heavy_hitters_no_false_negatives_property(spark):
    """Adversarial partitioning: one partition holds nothing but rare
    values; the pigeonhole guarantee must still surface every true
    heavy hitter through the other partitions."""
    from parquet_spark.sketch import heavy_hitters
    hot = [(i, "hot") for i in range(400)]
    warm = [(10_000 + i, f"w{i % 7}") for i in range(700)]
    rare = [(20_000 + i, f"r{i}") for i in range(900)]
    df = spark.createDataFrame(hot + warm + rare, "rid long, tok string") \
        .repartition(6, "rid")
    n = 400 + 700 + 900
    got = {r.tok: r.cnt for r in heavy_hitters(df, "tok", 6).collect()}
    assert got.get("hot") == 400  # 400*6 > 2000
    for t, c in got.items():
        assert c * 6 > n  # nothing under-threshold leaks through
    # integers work too (type-generic kernel)
    di = spark.range(0, 1000).select((F.col("id") % 3).alias("v"))
    gi = {r.v: r.cnt for r in heavy_hitters(di, "v", 4).collect()}
    assert gi == {0: 334, 1: 333, 2: 333}


@pytest.mark.spark
def test_analyze_table_stats_and_roundtrip(spark):
    from parquet_spark.fsck import fsck_table
    from parquet_spark.stats import (analyze_table, suggest_write_options,
                                     table_stats)
    rows = [(i, f"w{i % 7}", None if i % 10 == 0 else i * 3,
             f"t{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "rid long, w string, v long, t string")
    path = _encode(spark, df, "rid")
    st = analyze_table(spark, path, quantile_qs=(0.5,))
    assert st["n_rows"] == 400
    cw = st["cols"]["w"]
    assert (cw["n"], cw["nulls"], cw["min"], cw["max"]) == \
        (400, 0, "w0", "w6")
    assert cw["ndv_exact"] and cw["ndv_est"] == 7.0
    assert cw["dict_suggested"] is True
    ct = st["cols"]["t"]
    assert not ct["ndv_exact"] and ct["dict_suggested"] is False
    cv = st["cols"]["v"]
    assert (cv["n"], cv["nulls"]) == (360, 40)
    vals = [r[2] for r in rows if r[2] is not None]
    assert cv["quantiles"] == {0.5: _disc(vals, 0.5)}
    assert st["cols"]["rid"]["quantiles"] == {0.5: _disc(range(400), 0.5)}
    assert st["cols"]["rid"]["dict_suggested"] is None
    # persisted sidecar reads back identical (json normalizes tuples)
    back = table_stats(path)
    import json
    assert back == json.loads(json.dumps(st))
    # suggestion: dict the low-card string, key the highest-ndv int
    sug = suggest_write_options(st)
    assert sug["global_dict_cols"] == ["w"]
    assert sug["key"] == ["rid"]
    # the sidecar dir is invisible to fsck (advisory, like Puffin)
    rep = fsck_table(path)
    assert rep["ok"] and not rep["orphan_data"]


@pytest.mark.spark
def test_analyze_snapshot_keyed_and_supersede(spark):
    from parquet_spark.manifest import EncodedTable, write_encoded
    from parquet_spark.stats import analyze_table, table_stats
    import tempfile
    df1 = spark.range(0, 100).select(F.col("id").alias("rid"),
                                     F.lit("a").alias("s"))
    path = tempfile.mkdtemp(prefix="stats_snap_")
    write_encoded(df1, path, key=["rid"], n_parts=2, mode="range",
                  rows_per_chunk=64)
    s1 = EncodedTable(path).current_snapshot()["snapshot_id"]
    a1 = analyze_table(spark, path, quantile_qs=())
    df2 = spark.range(100, 300).select(F.col("id").alias("rid"),
                                       F.lit("b").alias("s"))
    write_encoded(df2, path, key=["rid"], n_parts=2, mode="range",
                  rows_per_chunk=64, part_offset=2)
    # old snapshot's stats still resolve; new snapshot has none yet
    assert table_stats(path, snapshot_id=s1)["n_rows"] == 100
    assert table_stats(path) is None
    a2 = analyze_table(spark, path, quantile_qs=())
    assert table_stats(path)["n_rows"] == 300
    assert a1["cols"]["s"]["ndv_est"] == 1.0
    assert a2["cols"]["s"]["ndv_est"] == 2.0
    # re-ANALYZE supersedes (newest sidecar wins)
    analyze_table(spark, path, cols=["rid"], quantile_qs=())
    assert list(table_stats(path)["cols"]) == ["rid"]
    # unknown column fails loudly; write=False persists nothing
    with pytest.raises(ValueError, match="not in"):
        analyze_table(spark, path, cols=["nope"])
    before = table_stats(path)
    analyze_table(spark, path, cols=["s"], quantile_qs=(), write=False)
    assert table_stats(path) == before


@pytest.mark.spark
def test_analyze_incremental_merges_like_full(spark):
    """Append-only refresh: merged stats must equal a full re-ANALYZE
    on every mergeable field (counts, nulls, bounds, exact ndv, the
    KMV hash set itself, quantiles, dict rule)."""
    import tempfile
    from parquet_spark.manifest import write_encoded
    from parquet_spark.stats import (analyze_incremental, analyze_table,
                                     table_stats)
    rows1 = [(i, f"w{i % 5}", None if i % 9 == 0 else i * 2)
             for i in range(300)]
    rows2 = [(i, f"w{i % 11}", i * 2) for i in range(300, 700)]
    ddl = "rid long, w string, v long"
    path = tempfile.mkdtemp(prefix="stats_inc_")
    write_encoded(spark.createDataFrame(rows1, ddl), path, key=["rid"],
                  n_parts=2, mode="range", rows_per_chunk=64)
    analyze_table(spark, path, quantile_qs=(0.5,))
    write_encoded(spark.createDataFrame(rows2, ddl), path, key=["rid"],
                  n_parts=2, mode="range", rows_per_chunk=64,
                  part_offset=2)
    inc = analyze_incremental(spark, path, quantile_qs=(0.5,))
    full = analyze_table(spark, path, quantile_qs=(0.5,), write=False)
    assert inc["incremental_from"] is not None
    assert inc["n_rows"] == full["n_rows"] == 700
    for c in ("rid", "w", "v"):
        for f in ("n", "nulls", "min", "max", "ndv_est", "ndv_exact",
                  "kmv", "quantiles", "dict_suggested"):
            assert inc["cols"][c][f] == full["cols"][c][f], (c, f)
    # the incremental result persisted for CURRENT
    assert table_stats(path)["incremental_from"] == \
        inc["incremental_from"]


@pytest.mark.spark
def test_analyze_incremental_fallbacks(spark):
    import tempfile
    from parquet_spark.manifest import (compact_table, write_encoded)
    from parquet_spark.stats import analyze_incremental, analyze_table
    ddl = "rid long, s string"
    path = tempfile.mkdtemp(prefix="stats_incf_")
    write_encoded(spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(200)], ddl), path,
        key=["rid"], n_parts=2, mode="range", rows_per_chunk=64)
    # no ancestor stats at all -> full analyze, lineage None
    st = analyze_incremental(spark, path, quantile_qs=())
    assert st["incremental_from"] is None and st["n_rows"] == 200
    # append, then compact: history is no longer append-only ->
    # read_increment refuses and the refresh falls back to full
    write_encoded(spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(200, 500)], ddl), path,
        key=["rid"], n_parts=2, mode="range", rows_per_chunk=64,
        part_offset=2)
    compact_table(spark, path)
    st2 = analyze_incremental(spark, path, quantile_qs=())
    assert st2["incremental_from"] is None and st2["n_rows"] == 500
    assert st2["cols"]["s"]["ndv_est"] == 3.0


@pytest.mark.spark
def test_exact_quantiles_timestamp_epoch_us(spark):
    """Timestamp columns: zone bounds are epoch-us int64 while a Spark
    long-cast yields SECONDS — the extraction must use unix_micros or
    every bucket is empty.  Quantiles come back in epoch-us; ANALYZE
    picks them up for timestamp columns too, and a renamed timestamp
    column still resolves its physical type."""
    import tempfile
    from parquet_spark.manifest import alter_table, write_encoded
    from parquet_spark.stats import analyze_table, exact_quantiles
    df = spark.sql("""
        SELECT id AS rid,
               timestamp_micros(1600000000000000 + id * 987654321) AS ts
        FROM range(0, 500)""")
    path = tempfile.mkdtemp(prefix="stats_ts_")
    write_encoded(df, path, key=["rid"], n_parts=4, mode="range",
                  rows_per_chunk=64)
    micros = sorted(
        r.u for r in df.select(F.unix_micros("ts").alias("u")).collect())
    got = exact_quantiles(spark, path, "ts", [0.1, 0.5, 1.0])
    assert got == {q: _disc(micros, q) for q in (0.1, 0.5, 1.0)}
    st = analyze_table(spark, path, quantile_qs=(0.5,), write=False)
    assert st["cols"]["ts"]["quantiles"] == {0.5: _disc(micros, 0.5)}
    # rename-aware: logical name maps back to the physical ts column
    alter_table(path, rename={"ts": "event_ts"})
    got2 = exact_quantiles(spark, path, "event_ts", [0.5])
    assert got2 == {0.5: _disc(micros, 0.5)}


@pytest.mark.spark
def test_exact_quantiles_timestamp_ntz_non_utc_session(spark):
    """TIMESTAMP_NTZ columns (tz-naive Arrow timestamps) decode as
    NTZ, which unix_micros rejects outright — and an implicit NTZ->LTZ
    cast would shift by the session timezone, silently corrupting the
    epoch-us bucket domain under any non-UTC session.  The extraction
    must go through the timezone-free timestampdiff branch (same as
    engine._residual_col); analyze_table must survive an NTZ table."""
    import tempfile
    from parquet_spark.manifest import write_encoded
    from parquet_spark.stats import analyze_table, exact_quantiles
    df = spark.sql("""
        SELECT id AS rid,
               CAST(timestamp_micros(1600000000000000 + id * 987654321)
                    AS TIMESTAMP_NTZ) AS ts
        FROM range(0, 300)""")
    path = tempfile.mkdtemp(prefix="stats_ntz_")
    write_encoded(df, path, key=["rid"], n_parts=4, mode="range",
                  rows_per_chunk=64)
    # the NTZ wall-clock equals the UTC micros it was cast from
    micros = sorted(1600000000000000 + i * 987654321 for i in range(300))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone",
                       "America/New_York")
        got = exact_quantiles(spark, path, "ts", [0.1, 0.5, 1.0])
        assert got == {q: _disc(micros, q) for q in (0.1, 0.5, 1.0)}
        st = analyze_table(spark, path, quantile_qs=(0.5,), write=False)
        assert st["cols"]["ts"]["quantiles"] == {0.5: _disc(micros, 0.5)}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.spark
def test_analyze_df_and_vacuum_prunes_stats(spark):
    """analyze_df profiles a raw frame pre-encode; vacuum_table
    reclaims stats sidecars of snapshots expired off every reachable
    chain, and keeps the reachable ones."""
    import os
    import tempfile
    from parquet_spark.manifest import (EncodedTable, compact_table,
                                        vacuum_table, write_encoded)
    from parquet_spark.stats import (analyze_df, analyze_table,
                                     suggest_write_options, table_stats)
    df = spark.range(0, 300).select(
        F.col("id").alias("rid"), (F.col("id") % 4).cast("string")
        .alias("cat"), F.concat(F.lit("u"), F.col("id")).alias("u"))
    st = analyze_df(df)
    assert st["snapshot_id"] is None and st["n_rows"] == 300
    assert st["cols"]["cat"]["dict_suggested"] is True
    assert st["cols"]["u"]["dict_suggested"] is False
    sug = suggest_write_options(st)
    assert sug["global_dict_cols"] == ["cat"] and sug["key"] == ["rid"]
    with pytest.raises(ValueError, match="not in"):
        analyze_df(df, cols=["zz"])
    # sidecar lifecycle: stats of a compacted-away ancestor vacuum out
    path = tempfile.mkdtemp(prefix="stats_vac_")
    write_encoded(df, path, key=sug["key"], n_parts=2, mode="range",
                  rows_per_chunk=64, global_dict_cols=sug["global_dict_cols"])
    t = EncodedTable(path)
    s1 = t.current_snapshot()["snapshot_id"]
    analyze_table(spark, path, quantile_qs=())
    write_encoded(df.withColumn("rid", F.col("rid") + 300), path,
                  key=["rid"], n_parts=2, mode="range",
                  rows_per_chunk=64, part_offset=2,
                  global_dict_cols=sug["global_dict_cols"])
    compact_table(spark, path)  # rewrites: ancestors become orphaned
    analyze_table(spark, path, quantile_qs=())
    cur = t.current_snapshot()["snapshot_id"]
    sdir = os.path.join(path, "stats")
    before = sorted(os.listdir(sdir))
    removed = vacuum_table(path, grace_s=0.0)
    after = sorted(os.listdir(sdir))
    assert any(f"stats-{s1:06d}-" in r for r in removed)
    assert not any(n.startswith(f"stats-{s1:06d}-") for n in after)
    assert table_stats(path, snapshot_id=cur)["n_rows"] == 600
    assert len(after) < len(before)


@pytest.mark.spark
def test_concurrent_analyze_never_clobbers(spark):
    """Racing ANALYZEs of the same snapshot: per-attempt tokens mean
    both sidecars land; the reader deterministically takes the newest
    (ns-stamped names), and every sidecar is intact JSON."""
    import json
    import os
    import tempfile
    from concurrent.futures import ThreadPoolExecutor
    from parquet_spark.manifest import write_encoded
    from parquet_spark.stats import analyze_table, table_stats
    df = spark.range(0, 200).select(F.col("id").alias("rid"),
                                    (F.col("id") % 7).alias("v"))
    path = tempfile.mkdtemp(prefix="stats_race_")
    write_encoded(df, path, key=["rid"], n_parts=2, mode="range",
                  rows_per_chunk=64)
    with ThreadPoolExecutor(4) as ex:
        rs = list(ex.map(
            lambda i: analyze_table(spark, path, quantile_qs=()),
            range(4)))
    sdir = os.path.join(path, "stats")
    files = [n for n in os.listdir(sdir) if n.endswith(".json")]
    assert len(files) == 4          # nobody clobbered anybody
    for n in files:                  # all intact (atomic writes)
        with open(os.path.join(sdir, n)) as f:
            assert json.load(f)["n_rows"] == 200
    newest = table_stats(path)
    assert newest == json.loads(json.dumps(rs[0], default=str)) or \
        newest["n_rows"] == 200     # same content from every racer
    assert sorted(files)[-1].split("-")[2] == \
        max(n.split("-")[2] for n in files)  # reader pick == newest ns


@pytest.mark.spark
def test_exact_quantiles_full_int64_span(spark):
    """Hash-valued bigints: the column spans more than 2^63, so the
    naive `(_v - lo) DIV bsz` bucket arithmetic overflows int64
    (ANSI: ARITHMETIC_OVERFLOW; non-ANSI: wrapped negatives and a
    corrupt-table RuntimeError).  The floor-div-identity form must
    place every bucket exactly."""
    from parquet_spark.stats import exact_quantiles
    vals = [-(2 ** 63), -(2 ** 62) - 12345, -999, 0, 7,
            2 ** 61, 2 ** 62 + 777, 2 ** 63 - 1] * 25
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "rid long, v long")
    path = _encode(spark, df, "rid")
    qs = [0.0, 0.3, 0.5, 0.9, 1.0]
    got = exact_quantiles(spark, path, "v", qs)
    assert got == {q: _disc(vals, q) for q in qs}
    # small buckets force many passes across the huge span
    got4 = exact_quantiles(spark, path, "v", [0.5], buckets=4)
    assert got4 == {0.5: _disc(vals, 0.5)}


@pytest.mark.spark
def test_analyze_incremental_full_on_new_columns(spark):
    """Schema grows a column after the base ANALYZE: the refresh must
    fall back to a FULL analyze (merging would omit the new column
    from the sidecar forever), per the documented contract."""
    import tempfile
    from parquet_spark.manifest import alter_table, write_encoded
    from parquet_spark.stats import analyze_incremental, analyze_table
    ddl = "rid long, s string"
    path = tempfile.mkdtemp(prefix="stats_grow_")
    write_encoded(spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(100)], ddl), path,
        key=["rid"], n_parts=2, mode="range", rows_per_chunk=64)
    analyze_table(spark, path, quantile_qs=())
    alter_table(path, add=[("extra", "int64")])
    st = analyze_incremental(spark, path, quantile_qs=())
    assert st["incremental_from"] is None          # full path ran
    assert "extra" in st["cols"]                   # new column present
    assert st["cols"]["extra"]["nulls"] == 100


@pytest.mark.spark
def test_vacuum_sweeps_crashed_tmp_sidecar(spark):
    import os
    import tempfile
    from parquet_spark.manifest import vacuum_table, write_encoded
    from parquet_spark.stats import analyze_table, table_stats
    path = tempfile.mkdtemp(prefix="stats_tmp_")
    write_encoded(spark.range(0, 50).select(F.col("id").alias("rid")),
                  path, key=["rid"], n_parts=1, mode="range",
                  rows_per_chunk=64)
    analyze_table(spark, path, quantile_qs=())
    sdir = os.path.join(path, "stats")
    crash = os.path.join(sdir, ".tmp-stats-000001-x.json")
    alien = os.path.join(sdir, "NOTES.txt")
    open(crash, "w").write("{par")   # crashed mid-write
    open(alien, "w").write("keep")   # not ours: never touched
    removed = vacuum_table(path, grace_s=0.0)
    assert crash in removed and not os.path.exists(crash)
    assert os.path.exists(alien)
    assert table_stats(path)["n_rows"] == 50  # live sidecar kept


# --------------------------------------------------- stats-driven writes

@pytest.mark.spark
def test_write_encoded_auto_tune_applies_suggestions(spark):
    """auto_tune=True profiles a bounded sample and adopts the
    suggested key + global-dict columns; explicit args still win;
    resume appends reuse the committed tuning."""
    import tempfile

    import pyarrow as pa
    from pyspark.sql import functions as F

    from parquet_spark.manifest import (EncodedTable, read_decoded,
                                        write_encoded)
    d = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
         .select("doc_id", "lang", "source", "n_chars", "text"))
    path = tempfile.mkdtemp(prefix="auto_tune_")
    write_encoded(d, path, n_parts=2, auto_tune=True)
    t = EncodedTable(path)
    lay = (t.meta().get("layout") or {})
    assert lay["key"] == ["doc_id"]          # highest-ndv int column
    gcols = set(lay.get("global_dict_cols") or [])
    assert "lang" in gcols and "source" in gcols and "text" not in gcols
    # the suggestion actually reached the format: ids stored as ints
    assert pa.types.is_integer(t.schema().field("lang").type)
    dec = read_decoded(spark, path)
    assert dec.exceptAll(d).count() == 0 and dec.count() == d.count()
    # resume append: committed tuning governs, no refusal
    d2 = d.withColumn("doc_id", F.col("doc_id") + 10_000)
    write_encoded(d2, path, n_parts=2, part_offset=2, auto_tune=True)
    assert read_decoded(spark, path).count() == 2 * d.count()
    # explicit args beat the advisor
    path2 = tempfile.mkdtemp(prefix="auto_tune_explicit_")
    write_encoded(d, path2, key=["n_chars"], n_parts=2, auto_tune=True,
                  global_dict_cols=["source"])
    lay2 = EncodedTable(path2).meta()["layout"]
    assert lay2["key"] == ["n_chars"]
    assert lay2.get("global_dict_cols") == ["source"]
