"""Time-series operators Spark's DataFrame API lacks as primitives:
as-of join, range (point-in-interval) join, gap-based sessionization,
and hypertable-style multi-granularity rollups.

Both compile to ONE shuffle on the entity key + in-partition window
functions — no per-key loops, no range-explosion join, no Python in
the hot path.  The as-of join uses the classic union-and-fill
rendering of a sort-merge as-of: both sides interleave into a
(key, time)-ordered stream and a last_value(ignorenulls) window carries
each right payload forward to the left rows it matches; at 10^12
events that is the same plan shape as any windowed aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T


def _is_ts(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType,
                      (T.TimestampType, T.TimestampNTZType))


def asof_join(left: DataFrame, right: DataFrame, time_col: str = "ts",
              by: list[str] | None = None,
              right_cols: list[str] | None = None,
              tolerance: float | None = None,
              direction: str = "backward",
              suffix: str = "_r",
              allow_global_sort: bool = False) -> DataFrame:
    """For each left row, the single most recent right row at-or-before
    its timestamp (direction="backward"; "forward" = earliest
    at-or-after), per `by` key, optionally within `tolerance` seconds
    (same-unit numbers for numeric time columns).  Unmatched left rows
    keep NULL right columns (left-outer semantics, pandas
    merge_asof / DuckDB ASOF JOIN parity).

    Plan: union both sides into one (by, time, side)-ordered stream
    (right rows sort before left rows at equal time, so an exactly-
    simultaneous right row matches), then
    last_value(right_payload, ignorenulls) over rowsBetween(unbounded
    preceding, current) fills every left row — one exchange on `by`,
    one in-partition sort, zero joins.  The right time travels inside
    the payload struct and is exposed as f"{time_col}{suffix}".

    The 10^12-event claim holds only WITH a `by` key: the window
    partitions on it, so each task sorts one key's events.  A keyless
    as-of degenerates to a SINGLE partition — one task sorts
    left+right end to end — so it is refused unless the caller opts in
    with allow_global_sort=True (sensible only for driver-scale
    inputs)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got "
                         f"{direction!r}")
    if not by and not allow_global_sort:
        raise ValueError(
            "asof_join without `by` runs as ONE global single-task "
            "sort of both inputs — fine for small frames, a scale-"
            "killer at 10^12 events.  Pass by=[...] to partition the "
            "sort, or allow_global_sort=True to accept the single-"
            "partition plan explicitly")
    reserved = {"_t", "_side", "_rv", "_m"} & set(left.columns)
    if reserved:
        raise ValueError(f"left columns collide with asof_join "
                         f"internals: {sorted(reserved)}")
    by = list(by or [])
    rc = [c for c in (right_cols if right_cols is not None
                      else right.columns)
          if c not in by and c != time_col]
    if "_rt" in rc:
        raise ValueError(
            "right column '_rt' collides with asof_join's matched-"
            "time slot inside the payload struct; rename it")
    payload = F.struct(F.col(time_col).alias("_rt"),
                       *[F.col(c) for c in rc])
    rv_type = right.select(payload.alias("_rv")).schema["_rv"].dataType

    lcols = left.columns
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    l2 = left.select(
        *lcols,
        F.col(time_col).alias("_t"), F.lit(1).alias("_side"),
        F.lit(None).cast(rv_type).alias("_rv"))
    r2 = right.select(
        *[F.col(c) if c in by
          else F.lit(None).cast(ltypes[c]).alias(c) for c in lcols],
        F.col(time_col).alias("_t"), F.lit(0).alias("_side"),
        payload.alias("_rv"))

    order_t = (F.col("_t").asc() if direction == "backward"
               else F.col("_t").desc())
    w = (Window.partitionBy(*by) if by else Window.partitionBy(F.lit(1)))
    w = (w.orderBy(order_t, F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (l2.unionByName(r2)
              .withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
              .where(F.col("_side") == 1))

    if tolerance is not None:
        a, b = F.col("_t"), F.col("_m._rt")
        if direction == "forward":
            a, b = b, a
        if _is_ts(left, time_col):
            # timestamp difference is a day-time interval for BOTH the
            # LTZ and NTZ types (unix_micros rejects NTZ); interval
            # comparison is exact, no timezone math involved
            lag = a - b
            lim = F.make_dt_interval(secs=F.lit(float(tolerance)))
        else:
            lag = a - b
            lim = F.lit(tolerance)
        filled = filled.withColumn(
            "_m", F.when(lag <= lim, F.col("_m")))

    out = [F.col(c) for c in lcols]
    out.append(F.col("_m._rt").alias(f"{time_col}{suffix}"))
    out.extend(F.col(f"_m.{c}").alias(
        f"{c}{suffix}" if c in lcols else c) for c in rc)
    return filled.select(*out)


def sessionize(df: DataFrame, time_col: str = "ts",
               by: str = "user_id", gap: float = 1800.0,
               order_cols: list[str] | None = None,
               out_col: str = "session") -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the entity's previous event exceeds `gap` seconds; sessions
    number 0,1,2,... per entity in time order.  lag + running sum over
    one (by)-partitioned window — a single shuffle keyed by the
    entity, so 10^12 events sessionize at scan speed (skewed entities
    are bounded by their own event counts, not the corpus).
    `order_cols` adds deterministic tie-breaks for simultaneous events
    (e.g. ["event_id"]).  Gap comparison runs on integer microseconds
    for timestamp columns — exact in any engine."""
    extra = [c for c in (order_cols or []) if c != time_col]
    w = Window.partitionBy(by).orderBy(time_col, *extra)
    t = F.col(time_col)
    if _is_ts(df, time_col):
        # interval comparison works for LTZ and NTZ alike, exactly
        lim = F.make_dt_interval(secs=F.lit(float(gap)))
    else:
        lim = F.lit(gap)
    prev = F.lag(t).over(w)
    new = F.when(prev.isNull() | ((t - prev) > lim), 1).otherwise(0)
    return df.withColumn(
        out_col,
        (F.sum(new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
         - 1).cast("long"))


def _epoch_sec(col: str, df: DataFrame):
    """Whole seconds since epoch for numeric, LTZ, and NTZ time
    columns (unix_seconds rejects NTZ; timestampdiff accepts it and
    involves no timezone math)."""
    t = df.schema[col].dataType
    if isinstance(t, T.TimestampNTZType):
        return F.expr(f"timestampdiff(SECOND, "
                      f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})")
    if isinstance(t, T.TimestampType):
        return F.unix_seconds(F.col(col))
    return F.col(col)


def range_join(points: DataFrame, intervals: DataFrame,
               time_col: str = "ts", start_col: str = "start",
               end_col: str = "end", by: list[str] | None = None,
               bucket: float = 3600.0) -> DataFrame:
    """Point-in-interval join (which intervals contain each point) —
    the second temporal operator Spark lacks as a primitive.  The
    naive rendering is an inequality join that Catalyst can only run
    as a (broadcast) nested loop; this renders it as an EQUI-join:
    every interval explodes into the grid cells it spans, every point
    maps to its single cell, the join key becomes (by..., cell), and
    the exact containment predicate filters after the hash join.  A
    point meets an interval in exactly one cell (its own), so no
    dedup pass is needed.  Per-row fan-out is interval_length/bucket —
    pick `bucket` (seconds) near the typical interval length so the
    explode stays O(1) per interval.  Inner-join semantics; all point
    and interval columns survive (interval columns suffixed only on
    collision)."""
    by = list(by or [])
    b = int(bucket)
    if b <= 0:
        raise ValueError(f"bucket must be positive seconds, got {bucket}")
    if "_cell" in points.columns or "_cell" in intervals.columns:
        raise ValueError(
            "column '_cell' collides with range_join's grid-cell "
            "internal (it would be clobbered and dropped); rename it")
    ps = _epoch_sec(time_col, points)
    ss = _epoch_sec(start_col, intervals)
    es = _epoch_sec(end_col, intervals)
    # an inverted interval (end < start) can never contain a point, but
    # sequence() would still explode it DESCENDING through every cell
    # between its bounds — drop such rows before the explode (the
    # containment filter would discard their matches anyway)
    intervals = intervals.where(F.col(start_col) <= F.col(end_col))
    p = points.withColumn("_cell", F.floor(ps / F.lit(b)))
    icols = [c for c in intervals.columns if c not in by]
    renames = {c: (f"{c}_r" if c in points.columns else c) for c in icols}
    # the collision-rename must not itself collide: with another point
    # column ('end' renamed to an existing 'end_r') or with a sibling
    # interval column named like a rename target
    clash = [renames[c] for c in icols
             if renames[c] != c and (renames[c] in points.columns
                                     or renames[c] in icols)]
    if clash:
        raise ValueError(
            f"range_join suffix rename collides with existing columns: "
            f"{sorted(set(clash))}; rename them on one side first")
    i = (intervals.select(
            *by, *[F.col(c).alias(renames[c]) for c in icols],
            F.explode(F.sequence(F.floor(ss / F.lit(b)),
                                 F.floor(es / F.lit(b)))).alias("_cell")))
    j = p.join(i, by + ["_cell"])
    t, s, e = (F.col(time_col), F.col(renames[start_col]),
               F.col(renames[end_col]))
    return j.where((s <= t) & (t <= e)).drop("_cell")


def time_rollup(df: DataFrame, time_col: str = "ts",
                granularities: tuple = ("hour", "day"),
                by: list[str] | None = None,
                aggs: dict[str, tuple] | None = None) -> DataFrame:
    """Hypertable-style multi-granularity rollup (continuous-aggregate
    cascade): the raw data is aggregated ONCE at the finest
    granularity; every coarser level re-aggregates the PREVIOUS level,
    so at 100 TB the raw scan happens exactly once and each cascade
    step shuffles only bucket-count rows.  `aggs` maps output name →
    (column, fn) with fn in {count,sum,min,max} — the decomposable
    aggregates that re-aggregate losslessly (avg = sum/count at read
    time).  Output: (gran, bucket, *by, *aggs) for every level.

    Granularities must run finest -> coarsest along the nesting chain
    second < minute < hour < day < month < quarter < year, with `week`
    allowed only as the LAST level (after day or finer): a misordered
    cascade like ("day","hour") would silently re-truncate day buckets
    (every "hour" row carrying day-grain values), and a non-nested one
    like ("week","month") would assign a month-straddling week's full
    counts to a single month — both raise ValueError instead."""
    if not granularities:
        raise ValueError("granularities must name at least one level")
    _LEVEL = {"second": 0, "minute": 1, "hour": 2, "day": 3,
              "week": 4, "month": 5, "quarter": 6, "year": 7}
    gl = [g.lower() for g in granularities]
    unknown = [g for g in gl if g not in _LEVEL]
    if unknown:
        raise ValueError(
            f"unknown granularities {unknown}; supported (finest to "
            f"coarsest): {list(_LEVEL)}")
    for a, b in zip(gl, gl[1:]):
        if _LEVEL[a] >= _LEVEL[b]:
            raise ValueError(
                f"granularities must be strictly finest->coarsest; "
                f"{a!r} before {b!r} would re-truncate already-coarse "
                "buckets into silently wrong aggregates")
    if "week" in gl[:-1]:
        raise ValueError(
            "'week' buckets do not nest into month/quarter/year (a "
            "week can straddle the boundary, mis-assigning its "
            "counts); 'week' is only valid as the final level")
    granularities = tuple(gl)
    by = list(by or [])
    aggs = aggs or {"n_rows": ("*", "count")}
    reagg = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for name, (_, fn) in aggs.items():
        if fn not in reagg:
            raise ValueError(
                f"agg {name}: {fn!r} does not re-aggregate; use "
                f"count/sum/min/max (avg = sum/count at read time)")
    first = [getattr(F, fn)(F.lit(1) if c == "*" else F.col(c)).alias(n)
             for n, (c, fn) in aggs.items()]
    later = [getattr(F, reagg[fn])(F.col(n)).alias(n)
             for n, (_, fn) in aggs.items()]
    # date_trunc silently promotes TIMESTAMP_NTZ to LTZ — cast the
    # bucket back so the rollup preserves the input's timestamp flavor
    t_type = df.schema[time_col].dataType
    g0 = granularities[0]
    lvl = (df.groupBy(F.date_trunc(g0, F.col(time_col)).cast(t_type)
                      .alias("bucket"), *by).agg(*first))
    outs = [lvl.select(F.lit(g0).alias("gran"), "*")]
    for g in granularities[1:]:
        lvl = (lvl.groupBy(F.date_trunc(g, F.col("bucket")).cast(t_type)
                           .alias("bucket"), *by).agg(*later))
        outs.append(lvl.select(F.lit(g).alias("gran"), "*"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def gap_fill(df: DataFrame, time_col: str = "ts", step_s: int = 3600,
             by: list[str] | None = None,
             aggs: dict[str, tuple] | None = None,
             fill: str = "locf") -> DataFrame:
    """Gap-filled bucketed aggregation (the TimescaleDB
    `time_bucket_gapfill` + `locf` idiom): aggregate into fixed
    `step_s`-second buckets per `by` entity, then materialize every
    missing bucket between each entity's first and last observation,
    filling the aggregate columns by `fill`:

      * ``"locf"`` — last observation carried forward (gauge series),
      * ``"zero"`` — absence means zero (count/sum series),
      * ``"null"`` — leave gaps NULL (caller interpolates),
      * ``"interp"`` — LINEAR interpolation between the surrounding
        observations (the TimescaleDB ``interpolate()`` companion):
        gap value = prev + (next-prev)·(t-tprev)/(tnext-tprev), cast
        to double; leading/trailing gaps (no observation on one side)
        stay NULL, exactly as TimescaleDB leaves them.

    `aggs` maps output name -> (column, fn), fn in count/sum/min/max
    (default {"n": ("*", "count")}).  Output columns: (*by, bucket,
    is_gap, *aggs) — `is_gap` marks generated rows, `bucket` keeps the
    input's timestamp flavor (or stays integer seconds for a numeric
    time column).

    Scale shape: one shuffle into the bucket aggregate (map-side
    combined; group count = entities x buckets, not event count), a
    metadata-sized grid exchange (per-entity min/max -> sequence
    explode, |grid| = time-range/step per entity), one equi-join of
    grid to buckets, and for locf a per-entity window.  With ``by``
    empty that window is a single partition — safe here, unlike a
    row-level sort, because its input is the GRID (bounded by
    time-range/step, independent of corpus size), but prefer a `by`
    key when one exists."""
    by = list(by or [])
    if step_s <= 0:
        raise ValueError(f"step_s must be a positive number of "
                         f"seconds, got {step_s}")
    if fill not in ("locf", "zero", "null", "interp"):
        raise ValueError(
            f"fill must be locf/zero/null/interp, got {fill!r}")
    aggs = aggs or {"n": ("*", "count")}
    for name, (c, fn) in aggs.items():
        if fn not in ("count", "sum", "min", "max"):
            raise ValueError(f"agg {name}: unsupported fn {fn!r} "
                             "(count/sum/min/max)")
        if name in ("bucket", "is_gap"):
            raise ValueError(f"agg name {name!r} collides with a "
                             "gap_fill output column")
    for r in ("bucket", "is_gap", "_bsec", "_present"):
        if r in df.columns:
            raise ValueError(f"gap_fill reserves column {r!r}; rename "
                             "it on the input")
    t_type = df.schema[time_col].dataType
    # rows with a NULL time have no bucket; drop them explicitly (the
    # alternative — a null bucket group silently vanishing in the grid
    # stage — is the same outcome by accident)
    df = df.where(F.col(time_col).isNotNull())
    bsec = (F.floor(_epoch_sec(time_col, df) / step_s)
            * step_s).cast("long")
    exprs = [getattr(F, fn)(F.lit(1) if c == "*" else F.col(c)).alias(n)
             for n, (c, fn) in aggs.items()]
    agg1 = (df.groupBy(*by, bsec.alias("_bsec")).agg(*exprs)
            .withColumn("_present", F.lit(True)))
    grid = (agg1.groupBy(*by).agg(F.min("_bsec").alias("_lo"),
                                  F.max("_bsec").alias("_hi"))
            .select(*by, F.explode(F.sequence(
                F.col("_lo"), F.col("_hi"),
                F.lit(step_s).cast("long"))).alias("_bsec")))
    full = grid.join(agg1, by + ["_bsec"], "left")
    if fill == "locf":
        w = (Window.partitionBy(*by) if by
             else Window.partitionBy(F.lit(1)))
        w = w.orderBy("_bsec").rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)
        vals = [F.last(F.col(n), ignorenulls=True).over(w).alias(n)
                for n in aggs]
    elif fill == "interp":
        base = (Window.partitionBy(*by) if by
                else Window.partitionBy(F.lit(1))).orderBy("_bsec")
        wb = base.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)
        wf = base.rowsBetween(Window.currentRow,
                              Window.unboundedFollowing)
        t = F.col("_bsec").cast("double")
        obs_t = F.when(F.col("_present").isNotNull(), t)

        def interp(n):
            v = F.col(n).cast("double")
            pv = F.last(v, ignorenulls=True).over(wb)
            pt = F.last(obs_t, ignorenulls=True).over(wb)
            nv = F.first(v, ignorenulls=True).over(wf)
            nt = F.first(obs_t, ignorenulls=True).over(wf)
            # operand shape mirrored verbatim by the DuckDB oracle:
            # IEEE ops on identical operands are bit-identical
            return F.when(v.isNotNull(), v).otherwise(
                pv + (nv - pv) * ((t - pt) / (nt - pt))).alias(n)

        vals = [interp(n) for n in aggs]
    elif fill == "zero":
        vals = [F.coalesce(F.col(n), F.lit(0)).alias(n) for n in aggs]
    else:
        vals = [F.col(n) for n in aggs]
    bucket = (F.timestamp_seconds(F.col("_bsec")).cast(t_type)
              if _is_ts(df, time_col) else F.col("_bsec"))
    return full.select(
        *by, bucket.alias("bucket"),
        F.col("_present").isNull().alias("is_gap"), *vals)
