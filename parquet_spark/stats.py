"""Exact distributed quantiles over encoded tables by iterative
histogram refinement.

``approx_percentile`` answers fast but approximately; an exact global
quantile naively needs a full sort (one giant range-shuffle of the
column).  This module computes EXACT quantiles of an integer column
with no sort and no data shuffle, using the classic multi-pass
histogram-narrowing scheme (the "iterative binning" idiom behind
BigQuery's exact quantiles and Greenwald-Khanna's exact variants):

  pass 0  ``minmax_where`` on a ``notnull`` predicate — the table's
          zone metadata alone yields (n_nonnull, min, max) for chunks
          it proves full; only null-bearing boundary chunks decode.
  pass p  ONE narrow scan of the active value ranges (``scan_table``
          pushes the range predicate through manifest file-level
          pruning and chunk zone maps, so the scan shrinks with the
          range), bucketed into ``buckets`` equal-width bins by pure
          integer arithmetic (``DIV`` — no double rounding at int64
          extremes); each quantile's target bucket becomes its next,
          ``buckets``-times-narrower range.

A quantile resolves when its range's bucket width hits 1 (the bin IS
the value).  Every pass shuffles only ``ranges x buckets`` count rows
(map-side combined), so the full column is decoded exactly once (pass
1 spans [min, max]); later passes decode only chunks whose zones
intersect the shrunken ranges — a handful of row groups per pass WHEN
the column correlates with the table layout (the sort/range/z-order
key).  On a layout-uncorrelated column every chunk's zone spans the
domain, so later passes still decode the (single, narrow) column but
filter inside codegen — no sort and no shuffle either way; measured
pass anatomy in BENCH.md.  Total passes <=
ceil(log_buckets(max - min + 1)), i.e. <= 7 for the full int64 domain
at the default 1024 buckets.

Semantics are ``percentile_disc``: the returned value is the smallest
PRESENT value v with  count(col <= v) >= max(1, ceil(q * n_nonnull)),
computed over non-null rows (rank arithmetic is IEEE-double ``q * n``
then ``ceil``, so an oracle must use DOUBLE, not DECIMAL, for q).

Beyond-reference operator (the reference delegates all statistics to
Parquet.Net's row-group metadata); the multi-pass exact-quantile
pattern is public knowledge (e.g. Zhang & Wang, "A fast algorithm for
approximate quantiles", and the map-reduce folklore variant).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from .manifest import CommitBackend, minmax_where, scan_table


def exact_quantiles(spark: SparkSession, table_path: str, col: str,
                    qs: list[float], *, buckets: int = 1024,
                    max_passes: int | None = None,
                    backend: CommitBackend | None = None,
                    snapshot_id: int | None = None,
                    ref: str | None = None) -> dict[float, int]:
    """Exact percentile_disc values of integer column ``col`` for each
    q in ``qs`` (0 <= q <= 1), as ``{q: value}``.

    Raises ValueError on an empty/all-null column or out-of-range q,
    TypeError when the column's zone domain is not integral (exact
    binary narrowing needs a countable domain; for floats use
    approx_percentile or sort the column).
    """
    if not qs:
        raise ValueError("qs must be a non-empty list of quantiles")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")

    stats = minmax_where(spark, table_path, [(col, "notnull", None)],
                         [col], backend=backend,
                         snapshot_id=snapshot_id, ref=ref)
    n = int(stats["n_rows"])
    if n == 0:
        raise ValueError(f"column {col!r} has no non-null rows")
    mn, mx = stats["cols"][col]["min"], stats["cols"][col]["max"]
    if (not isinstance(mn, int)) or isinstance(mn, bool):
        raise TypeError(
            f"exact_quantiles needs an integer-domain column; "
            f"{col!r} has zone bounds of type {type(mn).__name__}")
    # timestamp columns: the zone domain (and minmax_where) is
    # epoch-MICROSECONDS int64, but a Spark long-cast of a timestamp
    # yields SECONDS — extract micros so the scan-side value lives in
    # the same domain as the [mn, mx] bounds; results are returned in
    # epoch-us (the zone domain, like minmax_where).  The extraction
    # must match the DECODED Spark type: tz-aware Arrow timestamps
    # decode as TIMESTAMP (LTZ, unix_micros), tz-naive ones as
    # TIMESTAMP_NTZ, which unix_micros rejects — those use the
    # timezone-free timestampdiff form (same branch as
    # engine._residual_col / temporal._epoch_sec).
    ts_kind = _ts_col_kind(table_path, col, backend, snapshot_id, ref)

    if max_passes is None:
        # exact pass count for this span: each pass shrinks a range's
        # width to ceil(width/buckets), resolving at width <= buckets
        # (bucket size 1).  +2 headroom; callers can still pin it.
        w, p = int(mx) - int(mn) + 1, 1
        while w > buckets:
            w = -(-w // buckets)
            p += 1
        max_passes = p + 2

    # state per quantile: (lo, hi, rank_rem) — the value lies in
    # [lo, hi] and is the rank_rem-th smallest row inside that range
    state: dict[float, tuple[int, int, int]] = {}
    out: dict[float, int] = {}
    for q in qs:
        rank = max(1, math.ceil(q * n))
        state[q] = (int(mn), int(mx), rank)

    for _pass in range(max_passes):
        active = {q: s for q, s in state.items() if q not in out}
        if not active:
            return out
        # after pass 1 every live range is a single former bucket, so
        # distinct ranges are pairwise disjoint (or identical — merged
        # here); one scan with an OR-of-ranges predicate covers all
        ranges = sorted({(lo, hi) for (lo, hi, _) in active.values()})
        pred = ({"any": [[(col, lo, hi)] for lo, hi in ranges]}
                if len(ranges) > 1 else
                [(col, ranges[0][0], ranges[0][1])])
        bszs = [max(1, -((lo - hi - 1) // buckets)) for lo, hi in ranges]
        # integer bucket arithmetic: double rounding would misbin past
        # 2^53, and the naive `(_v - lo) DIV bsz` overflows int64 when
        # the column SPANS more than 2^63 (e.g. hash-valued bigints:
        # lo near -2^63, _v near 2^63-1).  Use the floor-div identity
        #   floor((v-lo)/b) = fdiv(v,b) - (lo//b) - [fmod(v,b) < lo%b]
        # whose intermediates (truncated DIV/% plus small corrections,
        # Python-side lo//b and lo%b as literals) all stay in int64.
        def _bucket(lo, bsz):
            flo, lom = lo // bsz, lo % bsz  # Python floor semantics
            neg = f"CASE WHEN _v % {bsz} < 0 THEN 1 ELSE 0 END"
            fmod = (f"(_v % {bsz} + CASE WHEN _v % {bsz} < 0 "
                    f"THEN {bsz} ELSE 0 END)")
            return (f"((_v DIV {bsz}) - ({neg}) - ({flo}) - "
                    f"(CASE WHEN {fmod} < {lom} THEN 1 ELSE 0 END))")

        arms = " ".join(
            f"WHEN _v >= {lo} AND _v <= {hi} "
            f"THEN {i} * {buckets} + {_bucket(lo, bsz)}"
            for i, ((lo, hi), bsz) in enumerate(zip(ranges, bszs)))
        dec = scan_table(spark, table_path, pred, columns=[col],
                         backend=backend, snapshot_id=snapshot_id,
                         ref=ref)
        vexpr = _micros_expr(col, ts_kind)
        hist = (dec.select(vexpr.alias("_v"))
                .select(F.expr(f"CASE {arms} END").alias("_b"))
                .where(F.col("_b").isNotNull())
                .groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
                .collect())
        counts: dict[int, int] = {int(r["_b"]): int(r["_c"]) for r in hist}
        for q, (lo, hi, rank_rem) in active.items():
            i = ranges.index((lo, hi))
            bsz = bszs[i]
            cum = 0
            for b in range(buckets):
                c = counts.get(i * buckets + b, 0)
                if cum + c >= rank_rem:
                    nlo = lo + b * bsz
                    nhi = min(hi, nlo + bsz - 1)
                    if bsz == 1:
                        out[q] = nlo
                    else:
                        state[q] = (nlo, nhi, rank_rem - cum)
                    break
                cum += c
            else:
                raise RuntimeError(
                    f"quantile {q}: rank {rank_rem} exceeds the "
                    f"{cum} rows in [{lo}, {hi}] — zone metadata and "
                    "scan disagree (corrupt table?)")
        if all(q in out for q in state):
            return out
    raise RuntimeError(
        f"exact_quantiles did not converge in {max_passes} passes "
        f"(buckets={buckets}); raise max_passes")


def _ts_col_kind(table_path, col, backend, snapshot_id, ref) -> str | None:
    """How `col` decodes on the Spark side (logical schema of the
    resolved snapshot, rename-aware via the stored Arrow schema):
    ``"ltz"`` for tz-aware Arrow timestamps (Spark TIMESTAMP),
    ``"ntz"`` for tz-naive ones (Spark TIMESTAMP_NTZ), None for
    non-timestamp columns."""
    import pyarrow as pa

    from .manifest import EncodedTable, _resolve_snap
    table = EncodedTable(table_path, backend=backend)
    snap = _resolve_snap(table, snapshot_id, ref)
    sch = table.schema(snap)
    if sch is None:
        return None
    # the stored Arrow schema usually speaks logical names already;
    # for older parts the meta["renames"] physical->logical map is the
    # fallback (the caller always speaks logical)
    name = col
    if name not in sch.names:
        renames = (snap.get("meta") or {}).get("renames") or {}
        name = next((p for p, lg in renames.items() if lg == col), col)
    if name not in sch.names:
        return None
    t = sch.field(name).type
    if not pa.types.is_timestamp(t):
        return None
    # mirror the DECODE path's type mapping exactly: decode_table goes
    # through from_arrow_schema, which (with its default
    # prefer_timestamp_ntz=False) maps BOTH naive and tz-aware Arrow
    # timestamps to Spark TIMESTAMP (LTZ) — and the decode kernel
    # conforms naive storage to tz=UTC arrays, so the scan-side values
    # are UTC micros in either case.  Deriving the kind from
    # from_arrow_schema (not from t.tz) keeps this function correct by
    # construction if the decode mapping ever changes.
    from pyspark.sql import types as T
    from pyspark.sql.pandas.types import from_arrow_schema
    st = from_arrow_schema(pa.schema([sch.field(name)]))[0].dataType
    if isinstance(st, T.TimestampNTZType):
        return "ntz"
    return "ltz" if isinstance(st, T.TimestampType) else None


def _micros_expr(col: str, ts_kind: str | None):
    """Epoch-microseconds extraction matching the decoded Spark type.

    unix_micros handles LTZ only; TIMESTAMP_NTZ goes through
    timestampdiff (no timezone math — NTZ wall-clock == UTC micros by
    the zone-domain convention, mirroring engine._residual_col)."""
    if ts_kind == "ltz":
        return F.unix_micros(F.col(col))
    if ts_kind == "ntz":
        return F.expr(f"timestampdiff(MICROSECOND, "
                      f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{col}`)")
    return F.col(col).cast("long")


def quantiles_df(spark: SparkSession, table_path: str, col: str,
                 qs: list[float], **kw) -> DataFrame:
    """DataFrame view of :func:`exact_quantiles` — (q double, value
    long) rows ordered by q, for pipelines that want a frame."""
    r = exact_quantiles(spark, table_path, col, qs, **kw)
    rows = [(float(q), int(r[q])) for q in sorted(r)]
    return spark.createDataFrame(rows, "q double, value long")


# --------------------------------------------------------- table statistics
#
# Iceberg-Puffin-style statistics sidecars: ANALYZE computes per-column
# stats (counts, bounds, a mergeable KMV ndv sketch, optional exact
# quantiles) in a bounded number of passes and persists them under
# <table>/stats/ keyed by snapshot id — readable later without touching
# data, mergeable across tables/snapshots via the stored sketches, and
# usable to pre-tune writes (suggest_write_options).  The sidecar dir is
# invisible to the manifest (like Puffin files, it is advisory: losing
# it loses nothing but the stats).

_NDV_DICT_MAX = 4096      # suggest a global dict below this cardinality
_NDV_DICT_RATIO = 0.5     # ... and only when ndv <= ratio * rows


def analyze_table(spark: SparkSession, table_path: str,
                  cols: list[str] | None = None, *, ndv_k: int = 256,
                  quantile_qs: tuple = (0.25, 0.5, 0.75),
                  backend: CommitBackend | None = None,
                  snapshot_id: int | None = None,
                  ref: str | None = None, write: bool = True) -> dict:
    """ANALYZE: per-column statistics of a committed table, persisted
    as a snapshot-keyed sidecar (see module comment).

    Cost: ONE decoded scan aggregates every column's count/nulls/
    min/max map-side (a single-row result); each column adds one KMV
    bottom-k pass (bounded survivors, no data shuffle); integer
    columns add exact-quantile narrowing passes that decode the column
    range-pruned.  Returns the stats dict::

        {"snapshot_id": ..., "n_rows": ..., "ndv_k": ...,
         "cols": {name: {"n": nonnull, "nulls": ..., "min": v,
                         "max": v, "ndv_est": float, "ndv_exact": bool,
                         "kmv": [bottom-k hashes],
                         "quantiles": {q: v} | None,
                         "dict_suggested": bool | None}}}

    ``dict_suggested`` marks string columns worth ``global_dict_cols``
    (ndv <= _NDV_DICT_MAX and <= _NDV_DICT_RATIO * rows); it is None
    for non-string columns.  min/max of string columns follow Spark's
    binary UTF-8 ordering."""
    from .manifest import EncodedTable, _resolve_snap, read_decoded

    table = EncodedTable(table_path, backend=backend)
    snap = _resolve_snap(table, snapshot_id, ref)
    dec = read_decoded(spark, table_path, backend=backend,
                       snapshot_id=snap["snapshot_id"])
    names = [f.name for f in dec.schema.fields]
    if cols is not None:
        missing = [c for c in cols if c not in names]
        if missing:
            raise ValueError(f"analyze_table: columns {missing} not in "
                             f"table schema {names}")
        names = [c for c in names if c in cols]
    types = {f.name: f.dataType.simpleString() for f in dec.schema.fields}

    n_rows, partial = _df_stats(dec, names, ndv_k)
    stats: dict = {"snapshot_id": int(snap["snapshot_id"]),
                   "n_rows": n_rows, "ndv_k": ndv_k, "cols": {}}
    for c in names:
        stats["cols"][c] = _finish_col(
            spark, table_path, c, partial[c], types[c], quantile_qs,
            backend=backend, snapshot_id=snap["snapshot_id"])
    if write:
        _write_stats(table_path, stats)
    return stats


_INT_TYPES = ("tinyint", "smallint", "int", "bigint")


def _df_stats(dec: DataFrame, names: list[str], ndv_k: int):
    """The per-DataFrame half of ANALYZE: TWO passes total regardless
    of width — one agg for count/nulls/min/max of every column, one
    multi-column KMV scan (kmv_sketch_many) for every ndv sketch.  A
    per-column sketch loop would cost C full scans on a C-column
    table; at 100 TB that is the difference between ANALYZE being
    routine and being a weekend.  Returns (n_rows,
    {col: entry-without-quantiles/dict-rule})."""
    from .sketch import kmv_estimate, kmv_sketch_many
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in names:
        aggs += [F.count(F.col(c)).alias(f"n__{c}"),
                 F.min(F.col(c)).alias(f"mn__{c}"),
                 F.max(F.col(c)).alias(f"mx__{c}")]
    row = dec.agg(*aggs).head()
    n_rows = int(row["_n"])
    sketches = kmv_sketch_many(dec, names, k=ndv_k)
    out = {}
    for c in names:
        nn = int(row[f"n__{c}"])
        s = sketches[c]
        out[c] = {"n": nn, "nulls": n_rows - nn,
                  "min": row[f"mn__{c}"], "max": row[f"mx__{c}"],
                  "ndv_est": kmv_estimate(s),
                  "ndv_exact": bool(s["exact"]), "kmv": s["hashes"],
                  "quantiles": None, "dict_suggested": None}
    return n_rows, out


def _dict_gate(ent: dict) -> bool:
    """THE dict-suggestion rule — one definition so analyze_table and
    analyze_df can never diverge."""
    return bool(ent["ndv_est"] <= _NDV_DICT_MAX
                and ent["ndv_est"] <= _NDV_DICT_RATIO * max(ent["n"], 1))


def _finish_col(spark, table_path, c, ent, typ, quantile_qs, *,
                backend, snapshot_id):
    """Apply the stats that need table context: the dict-gate rule for
    strings, exact quantiles for int columns."""
    if typ == "string":
        ent["dict_suggested"] = _dict_gate(ent)
    if (typ in _INT_TYPES or typ.startswith("timestamp")) \
            and ent["n"] and quantile_qs:
        # timestamps report quantiles in epoch-us (the zone domain)
        qv = exact_quantiles(spark, table_path, c, list(quantile_qs),
                             backend=backend, snapshot_id=snapshot_id)
        ent["quantiles"] = {float(q): int(v) for q, v in qv.items()}
    return ent


def analyze_incremental(spark: SparkSession, table_path: str, *,
                        ndv_k: int | None = None,
                        quantile_qs: tuple = (0.25, 0.5, 0.75),
                        backend: CommitBackend | None = None,
                        write: bool = True) -> dict:
    """Refresh CURRENT's statistics from the newest ANALYZEd ancestor
    by scanning ONLY the parts appended since it — the incremental
    companion to :func:`analyze_table`.

    Counts, nulls and bounds add/extremize; ndv merges losslessly via
    the KMV sketch algebra (`kmv_merge` — union = merge hash sets,
    re-truncate); the dict-gate rule recomputes from the merged
    figures.  Quantiles are the one stat with no merge rule: int
    columns recompute them exactly via the (zone-pruned, one-column)
    narrowing passes when ``quantile_qs`` is non-empty — pass ``()``
    to stay strictly increment-sized.  The merged dict persists for
    CURRENT with an ``incremental_from`` lineage field.

    ``ndv_k`` defaults to None = adopt the ancestor sidecar's k (KMV
    sketches only merge losslessly at equal k); pass an explicit k to
    change sketch precision — when it differs from the ancestor's, the
    call falls back to a full re-ANALYZE at the requested k.

    Falls back to a FULL :func:`analyze_table` when (and records
    ``incremental_from: None``): no ancestor has stats, the requested
    ``ndv_k`` differs from the ancestor's, the column subset changed,
    or the history since it is not append-only (compaction / row-level
    deletes — `read_increment` refuses to diff those).  Bounds merge
    compares JSON-normalized values (timestamps as ISO strings),
    matching what the sidecar stores."""
    import json

    from .manifest import EncodedTable, read_increment
    table = EncodedTable(table_path, backend=backend)
    cur = table.current_snapshot()
    if cur is None:
        raise ValueError(f"no committed snapshot at {table_path}")
    cur_sid = int(cur["snapshot_id"])

    base = None
    snap = table._parent_of(cur)
    while snap is not None:
        base = table_stats(table_path, snapshot_id=snap["snapshot_id"],
                           backend=backend)
        if base is not None:
            break
        snap = table._parent_of(snap)

    def _full():
        kw = {} if ndv_k is None else {"ndv_k": ndv_k}
        st = analyze_table(spark, table_path, quantile_qs=quantile_qs,
                           backend=backend, write=write, **kw)
        st["incremental_from"] = None
        return st

    if base is None:
        return _full()
    try:
        inc = read_increment(spark, table_path,
                             from_snapshot_id=base["snapshot_id"],
                             backend=backend)
    except ValueError:
        return _full()  # rewritten/deleted history: diff would lie
    names = list(base["cols"].keys())
    types = {f.name: f.dataType.simpleString()
             for f in inc.schema.fields}
    if any(c not in types for c in names) \
            or any(c not in base["cols"] for c in types):
        # column subset changed in EITHER direction — analyzed columns
        # vanished, or the schema grew columns the ancestor never
        # sketched (merging would silently omit them forever): the
        # docstring's contract is a full re-ANALYZE
        return _full()
    if ndv_k is not None and int(ndv_k) != int(base["ndv_k"]):
        # KMV sketches merge losslessly only at equal k — a different
        # requested precision needs a full re-sketch
        return _full()
    ndv_k = int(base["ndv_k"])
    n_new, new = _df_stats(inc.select(*names), names, ndv_k)

    from .sketch import kmv_estimate, kmv_merge
    norm = json.loads(json.dumps(new, default=_json_default))
    stats: dict = {"snapshot_id": cur_sid,
                   "n_rows": base["n_rows"] + n_new, "ndv_k": ndv_k,
                   "incremental_from": base["snapshot_id"], "cols": {}}
    for c in names:
        b, w = base["cols"][c], norm[c]
        merged_kmv = kmv_merge(
            {"k": ndv_k, "hashes": b["kmv"], "exact": b["ndv_exact"]},
            {"k": ndv_k, "hashes": w["kmv"], "exact": w["ndv_exact"]})
        mins = [v for v in (b["min"], w["min"]) if v is not None]
        maxs = [v for v in (b["max"], w["max"]) if v is not None]
        ent = {"n": b["n"] + w["n"], "nulls": b["nulls"] + w["nulls"],
               "min": min(mins) if mins else None,
               "max": max(maxs) if maxs else None,
               "ndv_est": kmv_estimate(merged_kmv),
               "ndv_exact": bool(merged_kmv["exact"]),
               "kmv": merged_kmv["hashes"], "quantiles": None,
               "dict_suggested": None}
        stats["cols"][c] = _finish_col(
            spark, table_path, c, ent, types[c], quantile_qs,
            backend=backend, snapshot_id=cur_sid)
    if write:
        _write_stats(table_path, stats)
    return stats


def _json_default(v):
    """Sidecar value normalization: timestamps/dates to ISO strings
    (lexicographic order preserves chronology), decimals to strings,
    bytes to hex.  Incremental merges normalize fresh Spark values
    through the same function so both sides compare like-for-like."""
    import datetime
    import decimal
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    raise TypeError(f"unserializable stat value {type(v)}")


def analyze_df(df: DataFrame, cols: list[str] | None = None, *,
               ndv_k: int = 256) -> dict:
    """Profile a raw DataFrame BEFORE it is ever encoded — the
    pre-write companion to :func:`analyze_table` (same entry shape,
    no snapshot/quantiles: there is no table to narrow against).
    Feed the result to :func:`suggest_write_options` to pick
    ``global_dict_cols``/``key`` for the first ``write_encoded`` from
    one bounded sampling pass instead of guessing."""
    names = [f.name for f in df.schema.fields]
    if cols is not None:
        missing = [c for c in cols if c not in names]
        if missing:
            raise ValueError(f"analyze_df: columns {missing} not in "
                             f"schema {names}")
        names = [c for c in names if c in cols]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    n_rows, partial = _df_stats(df, names, ndv_k)
    stats: dict = {"snapshot_id": None, "n_rows": n_rows,
                   "ndv_k": ndv_k, "cols": {}}
    for c in names:
        ent = partial[c]
        if types[c] == "string":
            ent["dict_suggested"] = _dict_gate(ent)
        stats["cols"][c] = ent
    return stats


def _stats_dir(table_path: str) -> str:
    import os
    return os.path.join(table_path, "stats")


def _write_stats(table_path: str, stats: dict) -> str:
    """Atomic sidecar write: tmp + rename.  The name embeds a
    zero-padded wall-clock nanosecond stamp so the reader's
    lexicographically-last pick IS the newest write (re-ANALYZE
    deterministically supersedes — a bare uuid token here once made
    supersede a coin flip), plus a uuid tail so racing same-instant
    ANALYZEs never clobber each other."""
    import json
    import os
    import time
    import uuid
    d = _stats_dir(table_path)
    os.makedirs(d, exist_ok=True)
    sid = stats["snapshot_id"]
    name = (f"stats-{sid:06d}-{time.time_ns():020d}-"
            f"{uuid.uuid4().hex[:8]}.json")
    tmp = os.path.join(d, f".tmp-{name}")
    with open(tmp, "w") as f:
        json.dump(stats, f, default=_json_default)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(d, name))
    return name


def table_stats(table_path: str, snapshot_id: int | None = None,
                backend: CommitBackend | None = None,
                ref: str | None = None) -> dict | None:
    """Read back the newest persisted stats for a snapshot (CURRENT
    when unspecified) without touching data.  None when that snapshot
    was never ANALYZEd."""
    import json
    import os

    from .manifest import EncodedTable, _resolve_snap
    table = EncodedTable(table_path, backend=backend)
    snap = _resolve_snap(table, snapshot_id, ref)
    d = _stats_dir(table_path)
    prefix = f"stats-{snap['snapshot_id']:06d}-"
    try:
        cands = sorted(n for n in os.listdir(d)
                       if n.startswith(prefix) and n.endswith(".json"))
    except OSError:
        return None
    if not cands:
        return None
    with open(os.path.join(d, cands[-1])) as f:
        return json.load(f)


def suggest_write_options(stats: dict) -> dict:
    """Stats-driven write tuning: a pure, deterministic function of an
    :func:`analyze_table` dict.  Returns kwargs for ``write_encoded``:

      global_dict_cols  string columns whose ndv estimate clears the
                        dict gate (<= _NDV_DICT_MAX values and <=
                        _NDV_DICT_RATIO of rows) — table-scope dicts
                        compress AND unlock per-value id pruning
      key               the analyzed column with the highest ndv whose
                        values are integers (best range-layout spread;
                        ties break by column order)

    Advisory: the per-chunk codec auto-selector still samples real
    chunk bytes at write time — this only pre-picks the table-scope
    choices a single chunk cannot see."""
    gdict = [c for c, e in stats["cols"].items() if e["dict_suggested"]]
    best, best_ndv = None, -1.0
    for c, e in stats["cols"].items():
        if isinstance(e["min"], bool) or not isinstance(e["min"], int):
            continue
        if e["ndv_est"] > best_ndv:
            best, best_ndv = c, e["ndv_est"]
    out: dict = {"global_dict_cols": gdict}
    if best is not None:
        out["key"] = [best]
    return out
