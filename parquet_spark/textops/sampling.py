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


def _water_fill(weights: dict, counts: dict, budget: float) -> dict:
    """Exact weighted fair allocation with per-domain caps (pure,
    driver-side): split `budget` over positive-weight domains by
    weight; any domain whose share exceeds its count contributes
    everything and the leftover re-splits over the rest, iterated to
    stability.  Invariants (property-tested): 0 <= alloc_k <= count_k,
    and Σ alloc == min(budget, Σ counts of weighted domains)."""
    active = {k: float(v) for k, v in weights.items() if v > 0}
    alloc = {k: 0.0 for k in active}
    remaining = float(budget)
    while active and remaining > 0:
        tot_w = sum(active.values())
        share = {k: remaining * w / tot_w for k, w in active.items()}
        starved = {k for k in active if share[k] >= counts[k]}
        if not starved:
            for k in active:
                alloc[k] += share[k]
            break
        for k in starved:
            remaining -= counts[k] - alloc[k]
            alloc[k] = float(counts[k])
            del active[k]
    return alloc


def mix_domains(df: DataFrame, id_col: str, domain_col: str,
                weights: dict, budget_rows: int, seed: int = 42,
                redistribute: bool = True,
                size_col: str | None = None):
    """Target-mixture downsampling (the data-mixing step before
    pretraining): pick per-domain keep rates so the sample realises
    `weights` (relative domain proportions, normalized) within
    `budget_rows`, then apply the deterministic per-domain hash sample.
    Returns (sampled_df, plan) with plan[domain] =
    {"available", "target", "rate"} for mixture-report lineage.

    `size_col` switches the budget's UNIT from rows to that column's
    sum (the pretraining case: budget and weights in TOKENS, pass the
    per-doc token count) — per-domain availability becomes
    SUM(size_col), the allocation is in the same unit, and the
    Bernoulli keep rate alloc/Σsize realises the token target in
    expectation (documents are kept or dropped whole; exact-token
    packing is pack_sequences' job downstream).

    When a domain cannot supply its share (rate would exceed 1),
    `redistribute=True` water-fills: the starved domain contributes
    everything it has and the leftover budget is re-split over the
    remaining domains by their weights (iterated until stable — exact,
    driver-side, O(domains^2) worst case).  `redistribute=False` caps
    each rate at 1 independently (one-pass, exactly
    `min(1, budget*w_d / (sum_w * n_d))` — the form a second engine
    recomputes in closed form; total sampled rows then undershoot the
    budget by the starved domains' deficit).

    Expected counts are Bernoulli (hash-sample) approximations of the
    targets — exact-k per domain would need a per-domain global sort.
    Scale shape: ONE count aggregate shuffling (domain) pairs (the
    driver sees #domains rows, never data), then a zero-shuffle
    scan-stage filter; membership is a pure function of (seed, id), so
    the mixture is reproducible and append-stable like every sampler
    in this module.  Domains absent from `weights` are dropped (weight
    0); unknown weight keys are an error (a typo would silently skew
    the mixture).
    """
    if budget_rows < 1:
        raise ValueError(f"budget_rows must be >= 1, got {budget_rows}")
    bad = [k for k, v in weights.items() if v < 0]
    if bad:
        raise ValueError(f"negative weights for {bad}")
    size = (F.count(F.lit(1)) if size_col is None
            else F.sum(size_col))
    counts = {r[0]: r[1] for r in
              df.groupBy(domain_col).agg(size.alias("n")).collect()}
    unknown = [k for k in weights if k not in counts]
    if unknown:
        raise ValueError(
            f"weights name domains absent from {domain_col!r}: "
            f"{sorted(unknown)} (present: {sorted(map(str, counts))[:20]})")
    if redistribute:
        alloc = _water_fill(weights, counts, budget_rows)
    else:
        active = {k: float(v) for k, v in weights.items() if v > 0}
        alloc = {k: 0.0 for k in active}
        tot_w = sum(active.values())
        for k, w in active.items():
            alloc[k] = min(float(counts[k]),
                           budget_rows * w / tot_w)
    plan = {k: {"available": int(counts[k]),
                "target": alloc[k],
                "rate": (alloc[k] / counts[k]) if counts[k] else 0.0}
            for k in alloc}
    sampled = stratified_hash_sample(
        df, id_col, domain_col,
        {k: p["rate"] for k, p in plan.items()},
        default=0.0, seed=seed)
    return sampled, plan
