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
1 spans [min, max]); later passes touch only chunks whose zones
intersect the shrunken ranges — at 100 TB that is a handful of row
groups per pass.  Total passes <= ceil(log_buckets(max - min + 1)),
i.e. <= 7 for the full int64 domain at the default 1024 buckets.

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
                    max_passes: int = 16,
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
        # integer bucket arithmetic via DIV: double rounding would
        # misbin values once |v| crosses 2^53
        arms = " ".join(
            f"WHEN _v >= {lo} AND _v <= {hi} "
            f"THEN {i} * {buckets} + ((_v - ({lo})) DIV {bsz})"
            for i, ((lo, hi), bsz) in enumerate(zip(ranges, bszs)))
        dec = scan_table(spark, table_path, pred, columns=[col],
                         backend=backend, snapshot_id=snapshot_id,
                         ref=ref)
        hist = (dec.select(F.col(col).cast("long").alias("_v"))
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


def quantiles_df(spark: SparkSession, table_path: str, col: str,
                 qs: list[float], **kw) -> DataFrame:
    """DataFrame view of :func:`exact_quantiles` — (q double, value
    long) rows ordered by q, for pipelines that want a frame."""
    r = exact_quantiles(spark, table_path, col, qs, **kw)
    rows = [(float(q), int(r[q])) for q in sorted(r)]
    return spark.createDataFrame(rows, "q double, value long")
