"""Time-series operators Spark's DataFrame API lacks as primitives:
as-of join and gap-based sessionization.

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
              suffix: str = "_r") -> DataFrame:
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
    the payload struct and is exposed as f"{time_col}{suffix}"."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got "
                         f"{direction!r}")
    by = list(by or [])
    rc = [c for c in (right_cols if right_cols is not None
                      else right.columns)
          if c not in by and c != time_col]
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
