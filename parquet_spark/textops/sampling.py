"""Deterministic sampling and dataset-split assignment for training
pipelines.  Everything hashes with md5 (not xxhash64) deliberately:
md5 exists in every engine, so a DuckDB/Trino oracle reproduces the
exact sample — reproducible train/val/test membership is a data-lineage
requirement, not a nicety.  All pure built-in expressions (whole-stage
codegen, no UDFs, no shuffle): each row's fate is a function of its own
id, so the ops compose with any scan and scale row-wise to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# md5 first-8-hex-digits as a uniform draw in [0, 2^32)
_HASH_SPACE = float(1 << 32)


def _unit_hash(id_col: str, seed: int) -> Column:
    """Deterministic uniform draw in [0, 1) from (seed, id): the first
    8 hex digits of md5(seed || ':' || id) as an integer / 2^32.
    Changing the seed redraws every row independently."""
    h = F.md5(F.concat(F.lit(f"{seed}:"),
                       F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / _HASH_SPACE


def assign_splits(df: DataFrame, id_col: str,
                  weights: dict[str, float] | None = None,
                  seed: int = 42,
                  out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: each row draws
    u = md5-hash(seed, id) in [0,1) and lands in the split whose
    cumulative-weight interval contains u.  Weights are normalized;
    iteration order of the dict defines the interval order, so pass an
    ordered dict (e.g. {"train": .9, "val": .05, "test": .05}).
    Membership is a pure function of (seed, id): stable across runs,
    engines, partitionings, and appends — new rows join a split without
    reshuffling old ones (the property a random() split lacks)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(weights.values()))
    u = _unit_hash(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def hash_sample(df: DataFrame, id_col: str, fraction: float,
                seed: int = 42) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose md5-hash draw
    falls below `fraction`.  Unlike df.sample(), membership is
    reproducible from (seed, id) alone — an external engine can verify
    exactly which rows were kept, and re-running over re-partitioned or
    appended data keeps the same rows."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(_unit_hash(id_col, seed) < F.lit(float(fraction)))


def stratified_hash_sample(df: DataFrame, id_col: str, strata_col: str,
                           fractions: dict, default: float = 0.0,
                           seed: int = 42) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downweight a dominant
    language): rows keep their md5 draw, each stratum gets its own
    threshold; strata absent from `fractions` use `default`.  One scan,
    no shuffle — the stratum threshold is a CASE expression."""
    for v in fractions.values():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fractions must be in [0, 1], got {v}")
    u = _unit_hash(id_col, seed)
    thr = None
    for val, frac in fractions.items():
        cond = F.col(strata_col).eqNullSafe(F.lit(val))
        thr = (F.when(cond, float(frac)) if thr is None
               else thr.when(cond, float(frac)))
    thr = F.lit(float(default)) if thr is None else thr.otherwise(
        float(default))
    return df.where(u < thr)
