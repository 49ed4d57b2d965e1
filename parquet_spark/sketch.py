"""KMV (k-minimum-values) distinct-count sketch.

The classic bottom-k estimator (Bar-Yossef et al. 2002; Beyer et al.
SIGMOD 2007): hash every value, keep the k smallest DISTINCT hashes;
the k-th smallest hash's position in the hash space estimates the
distinct count as ndv ~= (k-1) / fraction_of_space_covered.  Error is
~1/sqrt(k) (k=256 -> ~6%).  Sketches are tiny (k longs), exact below k
distinct values, and mergeable — union = merge the hash sets and
re-truncate to k — so per-split/per-day sketches roll up without
rescanning.

Scale shape: a partition-local numpy kernel keeps each input
partition's k smallest distinct hashes (bounded memory, no shuffle of
data); a global `distinct().orderBy(h).limit(k)` over the n_parts x k
survivors collapses cross-partition duplicate hashes in a small
HashAggregate, then TakeOrderedAndProject keeps per-task top-k and the
driver merges k longs.  Corpus size never crosses the
pipe — this is the honest alternative to COUNT(DISTINCT) when the
column has 10^9+ distincts and an exact answer would shuffle them all.

Spark's own approx_count_distinct (HLL++) answers the same question
inside a query; KMV here is the FORMAT-friendly variant: the sketch is
a value you can store per table/snapshot/day and merge later, which
HLL inside an agg expression is not.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F

_SPACE = 2.0 ** 64  # xxhash64 is signed int64; offset by 2^63 below


def kmv_sketch(df: DataFrame, col: str, k: int = 256) -> dict:
    """Build a KMV sketch of a column's distinct count.

    Returns ``{"k": k, "hashes": [k smallest distinct xxhash64 values,
    ascending], "exact": bool}`` — ``exact`` is True when the column
    had fewer than k distinct values, in which case the sketch IS the
    distinct set and the estimate is exact."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def local_min_k(batches: Iterator[pa.RecordBatch]) \
            -> Iterator[pa.RecordBatch]:
        best: np.ndarray | None = None
        for batch in batches:
            h = batch.column(0).to_numpy(zero_copy_only=False)
            u = np.unique(h)  # sorted distinct
            best = u[:k] if best is None else \
                np.unique(np.concatenate([best, u]))[:k]
        if best is not None and len(best):
            yield pa.RecordBatch.from_arrays(
                [pa.array(best, type=pa.int64())], ["h"])

    hashed = df.where(F.col(col).isNotNull()) \
        .select(F.xxhash64(F.col(col)).alias("h"))
    survivors = hashed.mapInArrow(local_min_k, "h bigint")
    # DISTINCT before the top-k: the same value surfaces from every
    # partition that holds it, and bottom-k ROWS of a multiset is not
    # bottom-k DISTINCT hashes — without the dedup a value repeated
    # across partitions crowds real survivors out of the limit and the
    # sketch under-counts (and can falsely claim exactness).  The
    # dedup HashAggregate runs over <= n_parts*k longs, then
    # TakeOrderedAndProject keeps per-task top-k and the driver merges.
    rows = survivors.distinct().orderBy("h").limit(k).collect()
    hashes = sorted(r.h for r in rows)[:k]
    return {"k": k, "hashes": hashes, "exact": len(hashes) < k}


def kmv_merge(*sketches: dict) -> dict:
    """Union sketches (same k): merge hash sets, keep the k smallest.
    The merged sketch estimates the distinct count of the UNION of the
    inputs — per-partition/per-day sketches roll up losslessly."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    ks = {s["k"] for s in sketches}
    if len(ks) != 1:
        raise ValueError(f"cannot merge sketches with different k: {ks}")
    k = ks.pop()
    merged = sorted({h for s in sketches for h in s["hashes"]})[:k]
    # the union is exact only if NO input was truncated AND the merge
    # itself kept everything (below k)
    exact = all(s["exact"] for s in sketches) and len(merged) < k
    return {"k": k, "hashes": merged, "exact": exact}


def kmv_estimate(sketch: dict) -> float:
    """Distinct-count estimate: exact cardinality below k, else
    (k-1) / fraction of the hash space covered by the k-th smallest."""
    hashes = sketch["hashes"]
    if sketch["exact"] or len(hashes) < sketch["k"]:
        return float(len(hashes))
    kth = hashes[sketch["k"] - 1]
    frac = (kth + 2.0 ** 63 + 1.0) / _SPACE
    return (sketch["k"] - 1) / frac


def heavy_hitters(df: DataFrame, col: str, k: int,
                  counters: int | None = None) -> DataFrame:
    """EXACT heavy hitters: every value of ``col`` whose frequency
    strictly exceeds n/k (n = non-null rows), with its exact count —
    in two data passes and bounded memory, never a full groupBy of the
    value space.

    Pass 1 runs Misra-Gries (1982) per input partition inside a
    mapInArrow kernel: ``counters`` (default 2k) running counters,
    batch-merged the "mergeable summaries" way (Agarwal et al., PODS
    2012) — add a batch's exact counts, then subtract the
    (counters+1)-th largest residual from all and drop the
    non-positives.  The summary undercounts any value by at most
    n_p/(counters+1), so every value with LOCAL frequency >
    n_p/(counters+1) survives; a GLOBAL heavy hitter (freq > n/k =
    sum n_p/k) must by pigeonhole exceed n_p/k >= n_p/(counters+1) in
    some partition, so the UNION of per-partition survivor sets is a
    superset of the true answer — no false negatives, at most
    n_parts * counters candidates ever materialize.

    Pass 2 broadcast-left-joins the column against the candidate set
    and computes, in ONE aggregation, the exact count of every
    candidate AND the total n (non-candidates collapse into a single
    NULL-keyed row — the value space never shuffles).  The final
    integer filter ``cnt * k > n`` is exact, so the result is
    deterministic and partitioning-independent even though the
    intermediate candidate set is not.

    Returns a DataFrame (``col``, ``cnt`` long) of the true heavy
    hitters.  NULLs are ignored (SQL frequency semantics).

    ``df`` must be DETERMINISTIC under recomputation (standard Spark
    lineage semantics): the candidate pass and the exact-count pass
    each scan the input once, so a source that yields different rows
    per scan — ``df.sample``/``rand()`` filters without a seeded
    checkpoint, or storage mutated between the two jobs — voids the
    no-false-negative guarantee exactly as it voids any two-action
    Spark program.  For such inputs, materialize first
    (``df.localCheckpoint()`` or write/reread) and pass the pinned
    frame.
    """
    if col == "_hh_cand":
        raise ValueError("column name '_hh_cand' is reserved by "
                         "heavy_hitters' candidate join; rename it")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    m = counters if counters is not None else 2 * k
    if m < k:
        raise ValueError(f"counters={m} must be >= k={k}: Misra-Gries "
                         f"error n_p/(counters+1) must not exceed the "
                         f"n_p/k detection threshold")
    vals = df.where(F.col(col).isNotNull()).select(col)
    vddl = vals.schema[0].dataType.simpleString()

    def mg_partition(batches: Iterator[pa.RecordBatch]) \
            -> Iterator[pa.RecordBatch]:
        counts: dict = {}
        typ = None
        for batch in batches:
            arr = batch.column(0).drop_null()
            typ = arr.type
            if len(arr) == 0:
                continue
            vc = arr.value_counts()  # exact batch summary, Arrow-side
            for v, c in zip(vc.field("values").to_pylist(),
                            vc.field("counts").to_pylist()):
                counts[v] = counts.get(v, 0) + c
            if len(counts) > m:
                # subtract the (m+1)-th largest residual from all:
                # kills >= m+1 counter-mass per unit, the MG invariant
                med = sorted(counts.values(), reverse=True)[m]
                counts = {v: c - med for v, c in counts.items()
                          if c - med > 0}
        if counts:
            yield pa.RecordBatch.from_arrays(
                [pa.array(list(counts.keys()), type=typ)], [col])

    cands = vals.mapInArrow(mg_partition, f"{col} {vddl}").distinct() \
        .withColumnRenamed(col, "_hh_cand")
    tagged = vals.join(F.broadcast(cands),
                       F.col(col) == F.col("_hh_cand"), "left")
    # one aggregation produces candidate counts AND (as the NULL-keyed
    # row) the non-candidate mass; localCheckpoint materializes the
    # <= n_parts*counters + 1 row summary once so the total-n branch
    # does not rescan the corpus, and nothing candidate-sized ever
    # funnels through a single task or the driver
    per = (tagged.groupBy("_hh_cand")
           .agg(F.count(F.lit(1)).alias("cnt"))
           .localCheckpoint())
    tot = per.agg(F.sum("cnt").alias("_n"))
    return (per.where(F.col("_hh_cand").isNotNull())
            .crossJoin(F.broadcast(tot))
            .where(F.col("cnt") * k > F.col("_n"))
            .select(F.col("_hh_cand").alias(col), "cnt"))


def kmv_sketch_many(df: DataFrame, cols: list[str],
                    k: int = 256) -> dict[str, dict]:
    """KMV sketches of MANY columns in ONE pass over the data — the
    ANALYZE building block (per-column :func:`kmv_sketch` calls would
    re-scan the table once per column; at 100 TB a wide table must not
    cost C full scans for C sketches).

    All hashing happens JVM-side (one xxhash64 per column, NULL-gated
    so nulls never hash); a single mapInArrow kernel keeps every
    column's k smallest distinct hashes (bounded memory: cols x k
    longs per partition) and emits (col_idx, h) survivor rows; one
    bounded shuffle (groupBy col_idx over <= cols x n_parts x k rows)
    takes each column's k smallest distinct survivors via
    array_sort(collect_set)[:k].  Results are IDENTICAL to per-column
    kmv_sketch — same hashes, same exactness flags — just one scan.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not cols:
        raise ValueError("cols must be a non-empty list")
    hashed = df.select(*[
        F.when(F.col(c).isNotNull(), F.xxhash64(F.col(c)))
        .alias(f"h{i}") for i, c in enumerate(cols)])

    n_cols = len(cols)

    def local_min_k(batches: Iterator[pa.RecordBatch]) \
            -> Iterator[pa.RecordBatch]:
        best: list = [None] * n_cols
        for batch in batches:
            for i in range(n_cols):
                arr = batch.column(i).drop_null()
                if len(arr) == 0:
                    continue
                u = np.unique(arr.to_numpy(zero_copy_only=False))[:k]
                best[i] = u if best[i] is None else \
                    np.unique(np.concatenate([best[i], u]))[:k]
        idx, hs = [], []
        for i, b in enumerate(best):
            if b is not None and len(b):
                idx.extend([i] * len(b))
                hs.extend(b.tolist())
        if idx:
            yield pa.RecordBatch.from_arrays(
                [pa.array(idx, type=pa.int32()),
                 pa.array(hs, type=pa.int64())], ["i", "h"])

    rows = (hashed.mapInArrow(local_min_k, "i int, h bigint")
            .groupBy("i")
            .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k)
                 .alias("hs"))
            .collect())
    by_i = {int(r["i"]): [int(h) for h in r["hs"]] for r in rows}
    return {c: {"k": k, "hashes": by_i.get(i, []),
                "exact": len(by_i.get(i, [])) < k}
            for i, c in enumerate(cols)}


# -------------------------------------------------- quantile summaries

def quantile_summary(df: DataFrame, col: str, eps: float = 0.005) -> dict:
    """One-pass MERGEABLE epsilon-approximate quantile summary — the
    100 TB complement to stats.exact_quantiles (which is exact but
    needs multiple zone-pruned passes over a committed table; this
    works on any DataFrame in one pass and the result is a value you
    can store per split/day/snapshot and merge later).

    Construction (deterministic, no randomization): each partition
    sorts its non-null values locally (same memory posture as
    sortWithinPartitions) and emits a systematic sample every
    ceil(eps * n_p) values — tuples (v, g) where g counts the raw
    values the tuple represents, so kept values carry their EXACT
    local rank and anything between two kept values is located within
    one sampling gap.  Folding the partitions merges tuple streams by
    value; the rank of any kept value is then known within
    sum_p(gap_p) <= eps*n + P (P = partition count).  The dict carries
    that bound explicitly in ``err`` — every downstream op (merge,
    compress) ADDS its own contribution, so the guarantee is always
    visible, never implied.

    Scale: the driver collects P/eps tuples (32 parts at eps=.005 ->
    ~6.4k rows; at very large P raise eps or roll up day-summaries
    with quantile_merge, which re-compresses to <= 2/eps tuples).
    Restricted to int/float columns; cast timestamps to epoch first
    (the exact_quantiles NTZ lesson — no hidden timezone math here).

    Returns {"n", "eps", "err", "values": [...], "gaps": [...]}."""
    from pyspark.sql.types import (ByteType, DoubleType, FloatType,
                                   IntegerType, LongType, ShortType)
    t = df.schema[col].dataType
    if not isinstance(t, (ByteType, ShortType, IntegerType, LongType,
                          FloatType, DoubleType)):
        raise TypeError(
            f"quantile_summary supports int/float columns; {col!r} is "
            f"{t.simpleString()} (cast timestamps to epoch explicitly)")
    ddl = f"v {t.simpleString()}, g bigint, p int"
    if eps <= 0 or eps >= 0.5:
        raise ValueError(f"eps must be in (0, 0.5), got {eps}")

    def local(batches: Iterator[pa.RecordBatch]) \
            -> Iterator[pa.RecordBatch]:
        chunks = []
        for batch in batches:
            a = batch.column(0)
            if a.null_count:
                a = a.drop_null()
            if len(a):
                chunks.append(a.to_numpy(zero_copy_only=False))
        if not chunks:
            return
        v = np.concatenate(chunks)
        v.sort(kind="stable")
        n_p = len(v)
        s = max(1, int(eps * n_p))
        idx = np.arange(s - 1, n_p, s, dtype=np.int64)
        if idx[-1] != n_p - 1:
            idx = np.append(idx, n_p - 1)
        g = np.diff(np.concatenate([np.array([-1], dtype=np.int64),
                                    idx]))
        first = np.zeros(len(idx), dtype=np.int32)
        first[0] = 1
        yield pa.RecordBatch.from_arrays(
            [pa.array(v[idx]), pa.array(g, type=pa.int64()),
             pa.array(first, type=pa.int32())], ["v", "g", "p"])

    rows = (df.select(F.col(col).alias("v"))
            .mapInArrow(local, ddl).collect())
    if not rows:
        return {"n": 0, "eps": eps, "err": 0, "values": [], "gaps": []}
    vs = np.array([r.v for r in rows])
    gs = np.array([r.g for r in rows], dtype=np.int64)
    n_parts = int(sum(r.p for r in rows))
    order = np.argsort(vs, kind="stable")
    n = int(gs.sum())
    return {"n": n, "eps": eps, "err": int(eps * n) + n_parts,
            "values": [x.item() for x in vs[order]],
            "gaps": [int(x) for x in gs[order]]}


def quantile_merge(a: dict, b: dict, compress: bool = True) -> dict:
    """Merge two summaries (day/split rollup).  Rank errors ADD; with
    ``compress`` the merged tuple stream is re-sampled down to
    <= 2/eps tuples (using the larger eps of the two), adding one more
    eps*n to the carried bound — all accounted in ``err``."""
    if a["n"] == 0:
        return dict(b)
    if b["n"] == 0:
        return dict(a)
    vs = np.array(a["values"] + b["values"])
    gs = np.array(a["gaps"] + b["gaps"], dtype=np.int64)
    order = np.argsort(vs, kind="stable")
    vs, gs = vs[order], gs[order]
    n = int(gs.sum())
    eps = max(a["eps"], b["eps"])
    err = a["err"] + b["err"]
    if compress and len(vs) > 2 / eps:
        step = max(1, int(eps * n))
        cum = np.cumsum(gs)
        # keep the first tuple at/after each rank step + the last
        targets = np.arange(step, n + 1, step, dtype=np.int64)
        idx = np.unique(np.searchsorted(cum, targets, side="left"))
        if idx[-1] != len(vs) - 1:
            idx = np.append(idx, len(vs) - 1)
        gs = np.diff(np.concatenate([np.array([0], dtype=np.int64),
                                     cum[idx]]))
        vs = vs[idx]
        err += step
    return {"n": n, "eps": eps, "err": int(err),
            "values": [x.item() for x in vs],
            "gaps": [int(x) for x in gs]}


def quantile_query(summary: dict, qs: list[float]) -> list:
    """Estimate quantiles from a summary: for target rank
    t = 1 + round(q*(n-1)) return the kept value whose cumulative rank
    first reaches t.  The TRUE rank of the returned value is within
    ``summary['err']`` of t — the deterministic guarantee the
    construction carries (tested against exact sorts in
    tests/test_sketch.py)."""
    n = summary["n"]
    if n == 0:
        return [None for _ in qs]
    cum = np.cumsum(np.array(summary["gaps"], dtype=np.int64))
    vals = summary["values"]
    out = []
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        t = 1 + int(round(q * (n - 1)))
        i = int(np.searchsorted(cum, t, side="left"))
        out.append(vals[min(i, len(vals) - 1)])
    return out
