"""Similarity search over an embedding column (array<float/double>).

Brute-force cosine top-k is the correctness baseline (broadcast the
small query set, scan the corpus once — no shuffle on the big side).
The scale path is sign-LSH bucketing: project every vector onto P fixed
hyperplanes, bucket by the sign-bit key, and only score within buckets —
turns the 10^12-row cross product into a bucket-local join. Hyperplane
values are deterministic literals (seed-derived) so Spark and the DuckDB
oracle compute identical buckets.

Everything is built-in expressions (zip_with/aggregate) — JVM-side,
no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a: str, b: str):
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, v) -> s + v)")


def _norm(a: str):
    return F.sqrt(F.expr(f"aggregate({a}, 0D, (s, v) -> s + v * v)"))


# Catalyst rewrites `row_number() OVER (PARTITION BY q ORDER BY ...)
# <= n` into WindowGroupLimit(Partial) -> Exchange -> WindowGroupLimit
# (Final) only while n stays at or under this threshold (Spark default
# for spark.sql.optimizer.windowGroupLimitThreshold); above it the
# single-window plan degrades to a true per-query global sort, so the
# explicit two-level rendering below takes over.
_WGL_THRESHOLD = 1000


def bounded_topk(df: DataFrame, order: list, n: int,
                 qid_col: str = "q_id", rank_col: str = "rank") -> DataFrame:
    """Explicit two-level per-query top-n with a structural task bound.

    Stage 1 keeps a local top-n per (query, input partition) — the
    window key includes spark_partition_id(), so candidates spread over
    |queries| x n_parts reducers and no task ever sorts more than one
    input partition's share.  Stage 2 ranks only the surviving
    <= n * n_parts rows per query.  Exact: every global top-n row is by
    definition in the top-n of its own input partition.

    For n at or under the WindowGroupLimit threshold Catalyst already
    compiles the plain single window to the same bound with one FEWER
    exchange (Partial limit per input partition before the shuffle,
    Final after — plan evidence in PLANS.md "pq_topk"); the ranking
    paths therefore use _per_query_rank, which picks the single-window
    form under the threshold and this rendering above it."""
    for c in ("_lp", "_lr"):
        if c in df.columns:
            raise ValueError(
                f"column {c!r} collides with bounded_topk internals")
    wl = Window.partitionBy(qid_col, "_lp").orderBy(*order)
    wg = Window.partitionBy(qid_col).orderBy(*order)
    return (df.withColumn("_lp", F.spark_partition_id())
            .withColumn("_lr", F.row_number().over(wl))
            .where(F.col("_lr") <= n).drop("_lp", "_lr")
            .withColumn(rank_col, F.row_number().over(wg))
            .where(F.col(rank_col) <= n))


def _per_query_rank(df: DataFrame, order: list, n: int,
                    qid_col: str = "q_id",
                    rank_col: str = "rank") -> DataFrame:
    """Per-query top-n used by every ranking site in this module.

    The plan is bounded either way: under the WindowGroupLimit
    threshold the single window compiles to Partial(limit n per input
    partition) -> Exchange(q) -> Final(limit n) — no task ever sorts
    more than its own partition's share, and at most n * n_parts rows
    per query cross the exchange; above the threshold (where that
    Catalyst rewrite no longer fires) the explicit two-level
    bounded_topk provides the identical bound.  Result identity of the
    two renderings is unit-tested."""
    if n <= _WGL_THRESHOLD:
        w = Window.partitionBy(qid_col).orderBy(*order)
        return (df.withColumn(rank_col, F.row_number().over(w))
                .where(F.col(rank_col) <= n))
    return bounded_topk(df, order, n, qid_col, rank_col)


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "q_id") -> DataFrame:
    """Exact top-k by cosine: broadcast queries x scan corpus once."""
    q = queries.select(F.col(qid_col), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cv"))
    scored = (c.join(F.broadcast(q))
              .withColumn("cos", F.round(_dot("qv", "cv") /
                                         (_norm("qv") * _norm("cv")), 6)))
    return (_per_query_rank(scored,
                            [F.col("cos").desc(), F.col(id_col).asc()],
                            k, qid_col)
            .select(qid_col, id_col, "cos", "rank"))


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic projection planes shared by Spark and the oracle."""
    rng = np.random.default_rng(seed)
    return [[round(float(v), 6) for v in rng.standard_normal(dim)]
            for _ in range(n_planes)]


def lsh_bucket(df: DataFrame, planes: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """Add a sign-bit LSH bucket column (int) from fixed hyperplanes."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        lit = "array(" + ",".join(f"{v}D" for v in p) + ")"
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, {lit}, (x, y) -> x * y), "
            f"0D, (s, v) -> s + v)")
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket.cast("int"))


def _centroid_lit(c: list[float]) -> str:
    return "array(" + ",".join(f"{v}D" for v in c) + ")"


def kmeanspp_seeds(emb: DataFrame, n_clusters: int = 16,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   seed: int = 42,
                   oversample: int = 8) -> list[list[float]]:
    """Deterministic k-means++-style seeding, distributed.

    Classic k-means++ is sequential (one center per pass); this is the
    k-means|| rendering (Bahmani et al., VLDB'12): ONE distance pass
    over the corpus scores an oversampled deterministic candidate pool
    (n_clusters*oversample smallest-xxhash vectors), then the pool —
    driver-sized — is reduced with exact sequential k-means++ greedy
    (each next seed maximizes distance to chosen seeds, weighted by how
    much corpus mass the candidate represents).  Corpus never shuffles;
    per-candidate aggregates are (pool_size)-sized."""
    pool_rows = (emb.select(F.col(vec_col).alias("v"),
                            F.xxhash64(F.col(id_col) + F.lit(seed))
                            .alias("h"))
                 .orderBy("h").limit(n_clusters * oversample).collect())
    pool = [[float(x) for x in r.v] for r in pool_rows]
    # weight of each candidate = corpus rows nearest to it (one pass)
    w_rows = (ivf_assign(emb, pool, vec_col=vec_col, out_col="cand")
              .groupBy("cand").agg(F.count(F.lit(1)).alias("w")).collect())
    weights = {r.cand: r.w for r in w_rows}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    chosen = [0]  # smallest-hash candidate anchors the chain
    while len(chosen) < min(n_clusters, len(pool)):
        best_i, best_score = None, -1.0
        for i in range(len(pool)):
            if i in chosen:
                continue
            near = min(d2(pool[i], pool[j]) for j in chosen)
            score = near * weights.get(i, 1)
            if score > best_score or (score == best_score and
                                      (best_i is None or i < best_i)):
                best_i, best_score = i, score
        chosen.append(best_i)
    return [pool[i] for i in chosen]


def ivf_centroids(emb: DataFrame, n_clusters: int = 16,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  lloyd_iters: int = 1, seed: int = 42,
                  seeding: str = "hash",
                  tol: float = 0.0,
                  stats: dict | None = None) -> list[list[float]]:
    """Deterministic IVF coarse centroids.

    seeding="hash": the n_clusters vectors with the smallest
    xxhash64(id) (stable under repartitioning); "kmeans++": the
    k-means|| pool-and-greedy pass (better spread, ~2 extra passes).
    Refined with up to `lloyd_iters` rounds of expression-only Lloyd
    updates (assign via broadcast argmin, mean via posexplode + groupBy
    — both shuffle only (cluster, dim)-sized aggregates, never the
    corpus).  Stops early when max centroid movement^2 <= tol; pass a
    `stats` dict to receive per-round movement + cluster sizes."""
    if seeding == "kmeans++":
        cents = kmeanspp_seeds(emb, n_clusters, id_col, vec_col, seed)
    else:
        seeds = (emb.select(F.col(vec_col).alias("v"),
                            F.xxhash64(F.col(id_col) + F.lit(seed))
                            .alias("h"))
                 .orderBy("h").limit(n_clusters).collect())
        cents = [[float(x) for x in r.v] for r in seeds]
    _lloyd_refine(emb, cents, vec_col, lloyd_iters, tol=tol, stats=stats)
    return [[round(v, 6) for v in c] for c in cents]


def _lloyd_refine(df: DataFrame, cents: list[list[float]], vec_col: str,
                  iters: int, tol: float = 0.0,
                  stats: dict | None = None) -> list[list[float]]:
    """Expression-only Lloyd rounds, updating `cents` in place: assign
    via broadcast argmin, means via posexplode + groupBy — both shuffle
    only (cluster, dim)-sized aggregates, never the corpus.  Shared by
    the IVF coarse quantizer and the PQ sub-quantizers."""
    if stats is not None:
        stats.setdefault("rounds", [])
    for it in range(iters):
        assigned = ivf_assign(df, cents, vec_col=vec_col)
        means = (assigned.select("cluster",
                                 F.posexplode(F.col(vec_col))
                                 .alias("pos", "x"))
                 .groupBy("cluster", "pos").agg(F.avg("x").alias("m"),
                                                F.count(F.lit(1)).alias("n"))
                 .groupBy("cluster")
                 .agg(F.array_sort(F.collect_list(F.struct("pos", "m")))
                      .alias("sm"), F.max("n").alias("n_vecs"))
                 .collect())
        movement = 0.0
        sizes = {}
        for r in means:
            new = [float(s.m) for s in r.sm]
            movement = max(movement,
                           sum((a - b) * (a - b)
                               for a, b in zip(new, cents[r.cluster])))
            sizes[r.cluster] = r.n_vecs
            cents[r.cluster] = new
        if stats is not None:
            stats["rounds"].append({"iter": it, "max_move_sq": movement,
                                    "sizes": sizes})
        if movement <= tol:
            break
    return cents


def ivf_seeds_md5(emb: DataFrame, n_clusters: int = 16,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> list[list[float]]:
    """Oracle-friendly deterministic seeding: the n_clusters vectors with
    the smallest md5(cast(id as string)), cluster id = md5 rank.  Unlike
    the xxhash seeding in ivf_centroids, md5 exists in DuckDB too, so an
    external SQL oracle can reproduce the seed set exactly."""
    rows = (emb.select(F.col(vec_col).alias("v"),
                       F.md5(F.col(id_col).cast("string")).alias("h"),
                       F.col(id_col).alias("i"))
            .orderBy("h", "i").limit(n_clusters).collect())
    return [[float(x) for x in r.v] for r in rows]


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding", out_col: str = "cluster",
               nprobe: int = 1, round_dp: int | None = None) -> DataFrame:
    """Nearest-centroid id(s) via a pure-expression argmin over the
    broadcast centroid literals.  nprobe > 1 explodes each row into its
    nprobe closest clusters (query-side fan-out).  round_dp rounds the
    squared distance before the argmin (with the cluster-id tie-break
    this makes the assignment reproducible across engines that may sum
    the fold in a different float order)."""
    def dist_expr(c):
        d = F.expr(f"aggregate(zip_with({vec_col}, {_centroid_lit(c)}, "
                   f"(x, y) -> (x - y) * (x - y)), 0D, (s, v) -> s + v)")
        return F.round(d, round_dp) if round_dp is not None else d

    dists = [F.struct(dist_expr(c).alias("d"), F.lit(i).alias("i"))
             for i, c in enumerate(centroids)]
    arr = F.array_sort(F.array(*dists))
    if nprobe <= 1:
        return df.withColumn(out_col, arr[0].getField("i"))
    probes = F.slice(arr, 1, nprobe)
    return (df.withColumn("_p", F.explode(probes))
              .withColumn(out_col, F.col("_p").getField("i")).drop("_p"))


def ivf_topk(corpus: DataFrame, queries: DataFrame,
             centroids: list[list[float]], k: int = 5, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "q_id",
             round_dp: int | None = None) -> DataFrame:
    """IVF approximate top-k: corpus partitioned by nearest centroid
    once (the inverted file); each query scores only its nprobe probe
    lists.  The join key is the cluster id, so the corpus side shuffles
    by cluster — at 10^12 rows that is the bucketed-layout read path.
    `round_dp` rounds assignment distances before the argmin (cluster-
    id tie-break) so an external engine reproduces the exact probe
    sets."""
    c = ivf_assign(corpus.select(F.col(id_col), F.col(vec_col).alias("cv")),
                   centroids, "cv", round_dp=round_dp)
    q = ivf_assign(queries.select(F.col(qid_col), F.col(vec_col).alias("qv")),
                   centroids, "qv", nprobe=nprobe, round_dp=round_dp)
    scored = (c.join(F.broadcast(q), "cluster")
              .withColumn("cos", F.round(_dot("qv", "cv") /
                                         (_norm("qv") * _norm("cv")), 6)))
    dedup = (scored.groupBy(qid_col, id_col)  # probe lists can overlap
             .agg(F.max("cos").alias("cos")))
    return (_per_query_rank(dedup,
                            [F.col("cos").desc(), F.col(id_col).asc()],
                            k, qid_col)
            .select(qid_col, id_col, "cos", "rank"))


def topk_recall(exact: DataFrame, approx: DataFrame, k: int,
                id_col: str = "vec_id",
                qid_col: str = "q_id") -> DataFrame:
    """Recall@k of ANY approximate top-k result against the exact one —
    the standard ANN quality metric: per query, |approx ∩ exact| / k.
    Takes the two (qid, id, ...) result frames, so it composes with
    every search in this module (ivf_topk, ann_topk, pq_topk).  The
    approx side is k x |queries| rows by construction — broadcast it so
    the metric join never shuffles the exact side."""
    a = approx.select(F.col(qid_col).alias("_aq"),
                      F.col(id_col).alias("_ai"))
    hit = ((exact[qid_col] == a["_aq"]) & (exact[id_col] == a["_ai"]))
    return (exact.join(F.broadcast(a), hit, "left")
            .groupBy(qid_col)
            .agg(F.count("_ai").alias("n_hits"),
                 F.round(F.count("_ai") / F.lit(k), 6).alias("recall")))


def ivf_recall(corpus: DataFrame, queries: DataFrame,
               centroids: list[list[float]], k: int = 5, nprobe: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               qid_col: str = "q_id",
               round_dp: int | None = None) -> DataFrame:
    """Recall@k of the IVF search against the exact scan.

    This is the evaluation harness for tuning n_clusters/nprobe, not a
    production search path: the exact side scores the full corpus for
    the query set, so at 100 TB run it over a sampled corpus slice (the
    recall estimate concentrates fast) while the IVF side stays the
    bucketed production plan.  Returns (qid, n_hits, recall) per query;
    both rankings share the 6dp-rounded cosine + id tie-break, so the
    metric is deterministic and externally reproducible."""
    exact = cosine_topk(corpus, queries, k, id_col, vec_col, qid_col)
    approx = ivf_topk(corpus, queries, centroids, k, nprobe,
                      id_col, vec_col, qid_col, round_dp)
    return topk_recall(exact, approx, k, id_col, qid_col)


def ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             n_planes: int = 8, seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding", qid_col: str = "q_id",
             dim: int | None = None) -> DataFrame:
    """Approximate top-k: score only inside matching LSH buckets."""
    if dim is None:
        row = queries.select(F.size(vec_col)).head()
        dim = row[0]
    planes = hyperplanes(dim, n_planes, seed)
    c = lsh_bucket(corpus.select(F.col(id_col), F.col(vec_col).alias("cv")),
                   planes, "cv")
    q = lsh_bucket(queries.select(F.col(qid_col), F.col(vec_col).alias("qv")),
                   planes, "qv")
    scored = (c.join(F.broadcast(q), "bucket")
              .withColumn("cos", F.round(_dot("qv", "cv") /
                                         (_norm("qv") * _norm("cv")), 6)))
    return (_per_query_rank(scored,
                            [F.col("cos").desc(), F.col(id_col).asc()],
                            k, qid_col)
            .select(qid_col, id_col, "cos", "rank"))


# ------------------------------------------------- product quantization

def pq_codebooks_md5(emb: DataFrame, m: int = 4, k: int = 8,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> list[list[list[float]]]:
    """Oracle-friendly deterministic PQ codebooks: subspace j's codebook
    is the j-th subvector of the k vectors with the smallest
    md5(cast(id as string)) — the same externally-reproducible seeding
    as ivf_seeds_md5, so a SQL oracle can rebuild every codebook.
    Returns codebooks[m][k][d/m]; subvectors stay UNROUNDED (repr
    round-trips float64 exactly, and rounding here would make the
    Spark literal disagree with an oracle reading the raw vectors)."""
    rows = (emb.select(F.col(vec_col).alias("v"),
                       F.md5(F.col(id_col).cast("string")).alias("h"),
                       F.col(id_col).alias("i"))
            .orderBy("h", "i").limit(k).collect())
    vecs = [[float(x) for x in r.v] for r in rows]
    d = len(vecs[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [[v[j * dsub:(j + 1) * dsub] for v in vecs] for j in range(m)]


def pq_codebooks(emb: DataFrame, m: int = 4, k: int = 8,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 lloyd_iters: int = 0) -> list[list[list[float]]]:
    """PQ codebooks with optional Lloyd refinement per subspace: the
    md5 seeds anchor determinism, then each subspace's codebook is
    refined independently on the corpus's subvectors (each round is one
    corpus pass per subspace; aggregates shuffle only (k, d/m)-sized
    rows).  lloyd_iters=0 returns the seeded codebooks unchanged."""
    cbs = pq_codebooks_md5(emb, m, k, id_col, vec_col)
    if lloyd_iters:
        dsub = len(cbs[0][0])
        for j in range(m):
            sub = emb.select(
                F.slice(F.col(vec_col), j * dsub + 1, dsub).alias("sv"))
            _lloyd_refine(sub, cbs[j], "sv", lloyd_iters)
            cbs[j] = [[round(x, 6) for x in c] for c in cbs[j]]
    return cbs


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "embedding", out_col: str = "codes",
              round_dp: int | None = None) -> DataFrame:
    """Quantize each vector to m small codes (array<int>, one per
    subspace): per-subspace argmin of L2 distance to the codebook
    entries, pure codegen expressions.  This is the 100 TB scan
    representation — m bytes of codes replace 4·d bytes of floats on
    every ADC-scored row.  `round_dp` rounds each subspace distance
    before the argmin (centroid-id tie-break) for cross-engine
    reproducible codes."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = []
    for j, cb in enumerate(codebooks):
        sub = f"slice({vec_col}, {j * dsub + 1}, {dsub})"

        def dist_expr(c):
            d = F.expr(f"aggregate(zip_with({sub}, {_centroid_lit(c)}, "
                       f"(x, y) -> (x - y) * (x - y)), 0D, (s, v) -> s + v)")
            return F.round(d, round_dp) if round_dp is not None else d

        dists = [F.struct(dist_expr(c).alias("d"), F.lit(i).alias("i"))
                 for i, c in enumerate(cb)]
        codes.append(F.array_sort(F.array(*dists))[0].getField("i"))
    return df.withColumn(out_col, F.array(*codes))


def pq_topk(corpus: DataFrame, queries: DataFrame,
            codebooks: list[list[list[float]]], k: int = 5,
            rerank: int = 4, id_col: str = "vec_id",
            vec_col: str = "embedding", qid_col: str = "q_id",
            round_dp: int | None = None) -> DataFrame:
    """PQ-compressed approximate top-k with exact residual re-ranking.

    Stage 1 (ADC): the corpus is quantized once to m codes per vector;
    each query scores every code row with the asymmetric distance —
    sum over subspaces of L2(query subvector, codebook[j][code_j]) —
    an expression over the broadcast codebook literal, so the scan
    touches only the m-byte codes, never the full vectors.  Stage 2
    (re-rank): only the k·rerank ADC candidates per query join back to
    their exact vectors for the true-cosine ranking — at 10^12 rows
    that join moves k·rerank·|queries| rows, not the corpus.  This is
    the residual-refinement step that IVF-flat could not express (its
    in-list scoring is already exact).

    The ADC candidate RANKING is bounded too (no task ever sorts the
    corpus per query): _per_query_rank keeps a local top-(k·rerank)
    per (query, input partition) before the per-query rank — under the
    WindowGroupLimit threshold Catalyst materializes that bound from
    the single window itself (Partial limit ahead of the exchange,
    Final after; plan in PLANS.md), above it the explicit two-level
    bounded_topk takes over — so at most k·rerank·n_parts rows per
    query ever meet a single task."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("cv"))
    codes = pq_encode(c, codebooks, "cv", "codes",
                      round_dp=round_dp).select(id_col, "codes")
    q = queries.select(F.col(qid_col), F.col(vec_col).alias("qv"))
    cb_lit = "array(" + ",".join(
        "array(" + ",".join(_centroid_lit(cent) for cent in cb) + ")"
        for cb in codebooks) + ")"
    adc = F.expr(
        f"aggregate(transform(sequence(0, {m - 1}), j -> "
        f"aggregate(zip_with(slice(qv, j * {dsub} + 1, {dsub}), "
        f"element_at(element_at({cb_lit}, j + 1), codes[j] + 1), "
        f"(x, y) -> (x - y) * (x - y)), 0D, (s, v) -> s + v)), "
        f"0D, (s, v) -> s + v)")
    if round_dp is not None:
        adc = F.round(adc, round_dp)
    cand = _per_query_rank(
        codes.join(F.broadcast(q)).withColumn("adc", adc),
        [F.col("adc").asc(), F.col(id_col).asc()],
        k * rerank, qid_col, rank_col="crank").select(qid_col, id_col)
    # exact re-rank: candidates only
    scored = (cand.join(c, id_col)
              .join(F.broadcast(q), qid_col)
              .withColumn("cos", F.round(_dot("qv", "cv") /
                                         (_norm("qv") * _norm("cv")), 6)))
    return (_per_query_rank(scored,
                            [F.col("cos").desc(), F.col(id_col).asc()],
                            k, qid_col)
            .select(qid_col, id_col, "cos", "rank"))
