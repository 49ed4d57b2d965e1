"""Deterministic sampling and dataset-split assignment for training
pipelines.  Everything hashes with md5 (not xxhash64) deliberately:
md5 exists in every engine, so a DuckDB/Trino oracle reproduces the
exact sample — reproducible train/val/test membership is a data-lineage
requirement, not a nicety.  All pure built-in expressions (whole-stage
codegen, no UDFs, no shuffle): each row's fate is a function of its own
id, so the ops compose with any scan and scale row-wise to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

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


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): pick raw-pool documents whose hashed-n-gram
# distribution looks like a small trusted target set.

def _ngram_bucket_counts(df: DataFrame, text_col: str, id_col: str,
                         n_buckets: int, bigrams: bool,
                         per_doc: bool) -> DataFrame:
    """(bucket[, id]) -> occurrence count of word uni(+bi)grams whose
    md5 lands in that bucket.  The n-gram stream is lowercased
    whitespace words plus (optionally) space-joined adjacent pairs —
    the paper's hashed-n-gram feature map with md5 instead of a
    murmur, so an external SQL engine reproduces every bucket id.
    Pure codegen until the ONE partial-aggregated groupBy."""
    t = F.lower(F.col(text_col))
    ws = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    grams = ws
    if bigrams:
        bi = F.zip_with(F.slice(ws, 1, F.size(ws) - 1),
                        F.slice(ws, 2, F.size(ws) - 1),
                        lambda a, b: F.concat(a, F.lit(" "), b))
        grams = F.concat(ws, bi)
    g = (df.where(F.col(text_col).isNotNull())
         .select(F.col(id_col), F.explode(grams).alias("gram")))
    bucket = (F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10)
              .cast("long") % n_buckets).alias("bucket")
    keys = ["bucket", id_col] if per_doc else ["bucket"]
    return (g.select(F.col(id_col), bucket)
            .groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt")))


def dsir_lambda(docs: DataFrame, target_cond: Column,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 256, scale: int = 1000,
                bigrams: bool = True) -> DataFrame:
    """The per-bucket importance table λ_b = round(scale · ln( p̂_b /
    q̂_b )) with add-one smoothing, as INTEGERS (milli-nats at the
    default scale) so downstream per-doc sums are exact BIGINT
    arithmetic — order-independent across engines (the gap_fill
    lesson: never hash-compare an unquantized float reduction).
    p̂ is the hashed-n-gram distribution of rows matching
    `target_cond`, q̂ of the rest.  Output: (bucket, lam) — n_buckets
    rows, metadata-sized at any corpus scale (broadcast it).

    Exactly one corpus-wide pass: bucket counts partial-aggregate to
    ≤ 2·n_buckets rows before the shuffle; the totals T and R are two
    driver-side scalars.  ln() is the only non-IEEE-exact op in the
    chain; its argument is a single quotient of exact small-integer
    doubles and the result is scaled+rounded, so a 1-ulp libm
    disagreement flips nothing in practice."""
    tagged = docs.withColumn("_is_t", target_cond)
    tcnt = _ngram_bucket_counts(tagged.where(F.col("_is_t")), text_col,
                                id_col, n_buckets, bigrams, False)
    rcnt = _ngram_bucket_counts(tagged.where(~F.col("_is_t")), text_col,
                                id_col, n_buckets, bigrams, False)
    totals = {
        "T": tcnt.agg(F.sum("cnt")).head()[0] or 0,
        "R": rcnt.agg(F.sum("cnt")).head()[0] or 0,
    }
    spark = docs.sparkSession
    grid = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    joined = (grid.join(tcnt.withColumnRenamed("cnt", "t"), "bucket", "left")
              .join(rcnt.withColumnRenamed("cnt", "r"), "bucket", "left")
              .select("bucket",
                      F.coalesce("t", F.lit(0)).alias("t"),
                      F.coalesce("r", F.lit(0)).alias("r")))
    tden = totals["T"] + n_buckets
    rden = totals["R"] + n_buckets
    lam = F.round(F.lit(float(scale)) * F.log(
        ((F.col("t") + 1).cast("double") * F.lit(float(rden)))
        / ((F.col("r") + 1).cast("double") * F.lit(float(tden)))
    ), 0).cast("long")
    return joined.select("bucket", lam.alias("lam"))


def dsir_score(docs: DataFrame, lam: DataFrame,
               text_col: str = "text", id_col: str = "doc_id",
               n_buckets: int = 256, bigrams: bool = True,
               out_col: str = "dsir_score") -> DataFrame:
    """Per-document importance score: the exact BIGINT sum of λ over
    the doc's n-gram occurrences (docs with no n-grams score 0).
    One corpus pass; λ is a broadcast join on the bucket id."""
    per_doc = _ngram_bucket_counts(docs, text_col, id_col, n_buckets,
                                   bigrams, True)
    scores = (per_doc.join(F.broadcast(lam), "bucket")
              .groupBy(id_col)
              .agg(F.sum(F.col("cnt") * F.col("lam")).alias(out_col)))
    return (docs.join(scores, id_col, "left")
            .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(0))))


def dsir_select(docs: DataFrame, target_cond: Column, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = 256, scale: int = 1000,
                bigrams: bool = True) -> DataFrame:
    """End-to-end DSIR selection: learn λ from the target/raw split,
    score every RAW document, keep the top-k most target-like
    (score DESC, id ASC — deterministic).  The paper resamples with
    Gumbel noise; top-k is its deterministic limit and is what an
    external engine can replay bit-for-bit.  Top-k over the raw pool
    uses a global sort of (score, id) PAIRS only after the per-doc
    reduction — at 10^12 docs swap the orderBy/limit for
    similarity.bounded_topk semantics if k is large."""
    lam = dsir_lambda(docs, target_cond, text_col, id_col, n_buckets,
                      scale, bigrams)
    raw = docs.where(~target_cond)
    scored = dsir_score(raw, lam, text_col, id_col, n_buckets, bigrams)
    return (scored.orderBy(F.col("dsir_score").desc(),
                           F.col(id_col).asc()).limit(k))


def select_token_budget(df: DataFrame, score_col: str, token_col: str,
                        budget: int, id_col: str = "doc_id",
                        n_buckets: int = 1024,
                        boundary_cap: int = 100_000
                        ) -> tuple[DataFrame, dict]:
    """Budget-truncated quality selection (the FineWeb/Dolma curation
    cut): keep documents ordered by (score DESC, id ASC) until their
    `token_col` sum first reaches `budget` — i.e. a row is kept iff
    the cumulative tokens of all strictly-better rows is still below
    the budget.  EXACT, with no global sort: a corpus-wide window
    cumsum would funnel 10^12 rows through one task, so instead the
    score axis is narrowed by the multi-pass histogram strategy of
    stats.exact_quantiles — each pass is one scan aggregating
    (token-sum, row-count) into <= n_buckets rows, the driver picks
    the bucket containing the budget boundary, and only when the
    boundary set fits `boundary_cap` does a bounded single-partition
    window order it (the _per_query_rank bounded form).  Buckets
    chain by the floor expression itself (never by recomputed float
    edges), so assignment is bit-stable across passes.

    Ties: rows sharing the boundary SCORE are split by id; a tie set
    larger than boundary_cap still sorts only the tie set, never the
    table (flagged in the report).  Returns (selected rows as a
    DataFrame, report with threshold/token totals/pass count).
    Deterministic given deterministic inputs — the same recompute
    contract as sketch.heavy_hitters."""
    score = F.col(score_col).cast("double")
    # ONE initial scan: totals + global score bounds together
    tot = df.agg(F.sum(token_col).alias("t"),
                 F.count(F.lit(1)).alias("n"),
                 F.min(score).alias("lo"),
                 F.max(score).alias("hi")).collect()[0]
    if tot.n == 0 or tot.t is None or int(tot.t) <= budget:
        return df, {"selected_all": True, "threshold": None,
                    "total_tokens": int(tot.t or 0),
                    "selected_tokens": int(tot.t or 0),
                    "selected_rows": int(tot.n), "budget": budget,
                    "passes": 0, "boundary_rows": 0,
                    "boundary_exceeded_cap": False}

    filters = F.lit(True)     # chain of chosen-bucket predicates
    above = F.lit(False)      # union of strictly-better buckets
    acc = 0                   # exact token sum of `above`
    lo, hi = float(tot.lo), float(tot.hi)
    passes = 0
    n_boundary = int(tot.n)
    while True:
        passes += 1
        if hi <= lo or n_boundary <= boundary_cap or passes > 64:
            break
        w = (hi - lo) / n_buckets
        bucket = F.least(F.lit(n_buckets - 1),
                         F.floor((score - F.lit(lo)) / F.lit(w)))
        # per-bucket min/max of ACTUAL data values ride the same scan,
        # so the next pass needs no separate bounds query (data values,
        # not recomputed float edges — bit-stable)
        hist = {int(r.b): (int(r.t), int(r.n),
                           float(r.mn), float(r.mx)) for r in
                df.where(filters).groupBy(bucket.alias("b"))
                .agg(F.sum(token_col).alias("t"),
                     F.count(F.lit(1)).alias("n"),
                     F.min(score).alias("mn"),
                     F.max(score).alias("mx")).collect()}
        need = budget - acc
        run, chosen = 0, None
        for bi in sorted(hist, reverse=True):
            t = hist[bi][0]
            if run + t >= need:
                chosen = bi
                break
            run += t
        if chosen is None:
            break  # fp slack: boundary is the lowest occupied bucket
        acc += run
        above = above | (filters & (bucket > chosen))
        filters = filters & (bucket == chosen)
        _, n_boundary, lo, hi = hist[chosen]

    # bounded boundary resolution: rows while cum-before < remaining
    remaining = budget - acc
    wspec = (Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    boundary = (df.where(filters)
                .withColumn("_cum", F.sum(token_col).over(wspec))
                .where(F.col("_cum") - F.col(token_col) < remaining)
                .drop("_cum"))
    selected = df.where(above).unionByName(boundary)
    rep_rows = selected.agg(F.sum(token_col).alias("t"),
                            F.count(F.lit(1)).alias("n"),
                            F.min(score).alias("thr")).collect()[0]
    return selected, {
        "selected_all": False,
        "threshold": None if rep_rows.thr is None else float(rep_rows.thr),
        "selected_tokens": int(rep_rows.t or 0),
        "selected_rows": int(rep_rows.n),
        "total_tokens": int(tot.t), "budget": budget, "passes": passes,
        "boundary_rows": n_boundary,
        "boundary_exceeded_cap": n_boundary > boundary_cap}


def top_k_by_group(df: DataFrame, group_cols: list[str],
                   order_col: str, k: int, id_col: str = "doc_id",
                   descending: bool = True) -> DataFrame:
    """Top-k rows per group by (order_col, id tie-break) — the
    exemplar-selection curation op (k highest-quality documents per
    domain/lang bucket), deterministic: ties split by id ASC, so two
    engines and two runs keep the identical set.

    Scale shape: the rank window LOOKS like a per-group sort, but
    Catalyst rewrites `row_number() <= k` into WindowGroupLimit — a
    bounded per-task top-k heap BEFORE the shuffle and again after, so
    each group moves at most k rows past its first stage and no task
    ever holds a full group (the bounded_topk insight applied by the
    optimizer itself; verified in tests against the physical plan)."""
    from pyspark.sql import Window
    ordv = F.col(order_col).desc() if descending \
        else F.col(order_col).asc()
    w = Window.partitionBy(*group_cols).orderBy(ordv, F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= k).drop("_rk"))
