"""Deterministic sampling / split assignment: membership must be a
pure function of (seed, id) — recomputed here with hashlib to prove
the engine's md5-conv-divide expression implements exactly that."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import TESTDATA


def _u(seed, doc_id):
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) / 2 ** 32


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        f"{TESTDATA}/sf0.001/documents.parquet").cache()


@pytest.mark.spark
def test_assign_splits_matches_python_and_partitions(spark, docs):
    from parquet_spark.textops.sampling import assign_splits
    out = assign_splits(docs, "doc_id", seed=42)
    got = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    # exhaustive + disjoint by construction (one label per row)
    assert len(got) == docs.count()
    # python recomputation of every row's split
    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = float(sum(w.values()))
    acc1 = w["train"] / total
    acc2 = acc1 + w["val"] / total
    for did, split in got.items():
        u = _u(42, did)
        want = "train" if u < acc1 else ("val" if u < acc2 else "test")
        assert split == want, (did, u, split, want)
    # roughly the requested proportions
    n = len(got)
    n_train = sum(1 for s in got.values() if s == "train")
    assert 0.8 * n <= n_train <= 0.97 * n


@pytest.mark.spark
def test_hash_sample_deterministic_and_append_stable(spark, docs):
    from parquet_spark.textops.sampling import hash_sample
    kept = {r.doc_id for r in
            hash_sample(docs, "doc_id", 0.3, seed=7)
            .select("doc_id").collect()}
    assert kept == {r.doc_id for r in docs.collect() if _u(7, r.doc_id) < 0.3}
    # membership is per-row: sampling a subset keeps exactly the
    # intersection (the append/repartition-stability property)
    half = docs.where(F.col("doc_id") % 2 == 0)
    kept_half = {r.doc_id for r in
                 hash_sample(half, "doc_id", 0.3, seed=7)
                 .select("doc_id").collect()}
    assert kept_half == {d for d in kept if d % 2 == 0}
    # a different seed redraws
    kept9 = {r.doc_id for r in
             hash_sample(docs, "doc_id", 0.3, seed=9)
             .select("doc_id").collect()}
    assert kept9 != kept
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)


@pytest.mark.spark
def test_stratified_hash_sample_rates(spark, docs):
    from parquet_spark.textops.sampling import stratified_hash_sample
    out = stratified_hash_sample(docs, "doc_id", "lang",
                                 {"de": 0.5, "fr": 1.0}, default=0.0,
                                 seed=11)
    rows = out.select("doc_id", "lang").collect()
    langs = {r.lang for r in rows}
    assert langs <= {"de", "fr"}          # default 0.0 drops the rest
    fr_all = docs.where(F.col("lang") == "fr").count()
    assert sum(1 for r in rows if r.lang == "fr") == fr_all  # 1.0 keeps all
    for r in rows:
        if r.lang == "de":
            assert _u(11, r.doc_id) < 0.5


@pytest.mark.spark
def test_domain_stats_matches_python(spark, docs):
    from parquet_spark.textops.textstats import domain_stats
    df = docs.select(
        F.concat(F.lit("https://host"),
                 F.pmod("doc_id", F.lit(5)).cast("string"),
                 F.lit(".example.com/p")).alias("url"), "text")
    got = {r.host: (r.n_docs, r.text_chars)
           for r in domain_stats(df).collect()}
    rows = df.collect()
    want = {}
    for r in rows:
        host = r.url.split("://")[1].split("/")[0]
        n, c = want.get(host, (0, 0))
        want[host] = (n + 1, c + len(r.text))
    assert got == want


@pytest.mark.spark
def test_mix_domains_water_filling_and_determinism(spark):
    """mix_domains: rates realise the target mixture; a starved domain
    contributes all rows and (redistribute=True) its leftover budget
    flows to the others by weight; membership is (seed, id)-pure."""
    from parquet_spark.textops.sampling import mix_domains
    rows = [(i, "big" if i < 9000 else ("mid" if i < 9900 else "tiny"))
            for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, dom string").cache()
    w = {"big": 1.0, "mid": 1.0, "tiny": 1.0}
    out, plan = mix_domains(df, "doc_id", "dom", w, budget_rows=3000)
    # tiny (100) AND mid (900) are starved at the equal share of 1000:
    # both contribute everything; big absorbs the leftover 2000
    assert plan["tiny"]["rate"] == 1.0 and plan["tiny"]["target"] == 100.0
    assert plan["mid"]["rate"] == 1.0 and plan["mid"]["target"] == 900.0
    assert abs(plan["big"]["target"] - 2000.0) < 1e-9
    assert abs(sum(p["target"] for p in plan.values()) - 3000.0) < 1e-9
    got = {r.dom: r.n for r in
           out.groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["tiny"] == 100 and got["mid"] == 900
    # Bernoulli tolerance: 4 sigma ~ 4*sqrt(2000*.78) ~ 160
    assert abs(got["big"] - 2000) < 170
    # one-pass mode: independent caps, budget undershoots by the deficit
    out2, plan2 = mix_domains(df, "doc_id", "dom", w, budget_rows=3000,
                              redistribute=False)
    assert plan2["tiny"]["rate"] == 1.0
    assert abs(plan2["big"]["target"] - 1000.0) < 1e-9
    # determinism + append stability: same ids kept on a re-run
    a = sorted(r.doc_id for r in out.select("doc_id").collect())
    b = sorted(r.doc_id for r in
               mix_domains(df, "doc_id", "dom", w, 3000)[0]
               .select("doc_id").collect())
    assert a == b
    # guards
    with pytest.raises(ValueError, match="absent"):
        mix_domains(df, "doc_id", "dom", {"nope": 1.0}, 10)
    with pytest.raises(ValueError, match="negative"):
        mix_domains(df, "doc_id", "dom", {"big": -1.0}, 10)
    with pytest.raises(ValueError, match="budget_rows"):
        mix_domains(df, "doc_id", "dom", w, 0)
    df.unpersist()


@pytest.mark.spark
def test_mix_domains_token_budget(spark):
    """size_col switches the budget unit to the column's sum: rates
    realise the TOKEN mixture in expectation, starved domains keep
    everything, and membership stays (seed, id)-deterministic."""
    from parquet_spark.textops.sampling import mix_domains
    rows = [(i,
             "big" if i < 8000 else ("mid" if i < 9900 else "tiny"),
             10 + i % 7)
            for i in range(10000)]
    df = spark.createDataFrame(rows,
                               "doc_id long, dom string, n_tok long")
    w = {"big": 1.0, "mid": 1.0, "tiny": 1.0}
    out, plan = mix_domains(df, "doc_id", "dom", w, budget_rows=30000,
                            size_col="n_tok")
    tok = {r.dom: r.s for r in
           df.groupBy("dom").agg(F.sum("n_tok").alias("s")).collect()}
    # tiny's full token supply is below its share: all kept
    assert plan["tiny"]["rate"] == 1.0
    assert plan["tiny"]["available"] == tok["tiny"]
    assert abs(sum(p["target"] for p in plan.values()) - 30000) < 1e-6
    got = {r.dom: r.s for r in
           out.groupBy("dom").agg(F.sum("n_tok").alias("s")).collect()}
    assert got["tiny"] == tok["tiny"]
    # Bernoulli expectation: realized tokens near the target
    for d in ("big", "mid"):
        assert abs(got[d] - plan[d]["target"]) < 0.15 * plan[d]["target"]


@pytest.mark.spark
def test_dsir_lambda_directional_and_integer(spark):
    """Buckets dominated by target n-grams get positive lambda, raw-
    dominated buckets negative; the table covers every bucket and is
    pure BIGINT (exact downstream sums)."""
    from parquet_spark.textops.sampling import dsir_lambda
    rows = [(i, "alpha beta " * 5, True) for i in range(10)]
    rows += [(100 + i, "gamma delta " * 5, False) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    lam = dsir_lambda(df, F.col("t"), n_buckets=32)
    assert lam.count() == 32
    assert dict(lam.dtypes)["lam"] == "bigint"
    vals = {r.bucket: r.lam for r in lam.collect()}
    # target-only grams land positive, raw-only negative
    from pyspark.sql import functions as SF
    b_alpha = df.sparkSession.range(1).select(
        (SF.conv(SF.substring(SF.md5(SF.lit("alpha")), 1, 8), 16, 10)
         .cast("long") % 32).alias("b")).head().b
    b_gamma = df.sparkSession.range(1).select(
        (SF.conv(SF.substring(SF.md5(SF.lit("gamma")), 1, 8), 16, 10)
         .cast("long") % 32).alias("b")).head().b
    assert vals[b_alpha] > 0 and vals[b_gamma] < 0


@pytest.mark.spark
def test_dsir_select_prefers_target_like_raw_docs(spark):
    """A raw doc written in the target's vocabulary outranks raw docs
    in their own vocabulary; k bounds the output; scores are exact
    (two runs identical)."""
    from parquet_spark.textops.sampling import dsir_select
    rows = [(i, "the quick brown fox jumps over the lazy dog", True)
            for i in range(8)]
    rows += [(50, "the quick brown fox runs", False),
             (51, "zug blorp qwx vnn", False),
             (52, "zug zug blorp blorp qwx", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    sel = dsir_select(df, F.col("t"), k=2, n_buckets=64)
    got = [(r.doc_id, r.dsir_score) for r in
           sel.select("doc_id", "dsir_score").collect()]
    assert got[0][0] == 50 and got[0][1] > 0
    assert len(got) == 2 and got[1][1] < got[0][1]
    again = [(r.doc_id, r.dsir_score) for r in
             dsir_select(df, F.col("t"), k=2, n_buckets=64)
             .select("doc_id", "dsir_score").collect()]
    assert got == again


def test_select_token_budget_exact(spark):
    """Budget-truncated selection equals the brute-force (score DESC,
    id ASC) cumulative cut for int and float scores, across budgets,
    with a tiny boundary_cap forcing multi-pass narrowing."""
    from parquet_spark.textops.sampling import select_token_budget

    d = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
         .select("doc_id", "n_chars")
         .withColumn("q", F.col("n_chars") * 1.0 / (F.col("doc_id") + 7)))
    rows = d.collect()

    def brute(score, budget):
        order = sorted(rows, key=lambda r: (-getattr(r, score), r.doc_id))
        keep, cum = set(), 0
        for r in order:
            if cum >= budget:
                break
            keep.add(r.doc_id)
            cum += r.n_chars
        return keep

    total = sum(r.n_chars for r in rows)
    for score in ("n_chars", "q"):
        for budget in (0, 1, total // 3, total - 1, total + 10):
            sel, rep = select_token_budget(d, score, "n_chars", budget,
                                           boundary_cap=4)
            got = {r.doc_id for r in sel.select("doc_id").collect()}
            if rep.get("selected_all"):
                assert budget >= total
                assert got == {r.doc_id for r in rows}
            else:
                assert got == brute(score, budget), (score, budget, rep)
                assert rep["selected_tokens"] >= min(budget, total) \
                    or budget == 0

    # all-ties: selection degenerates to smallest ids first, still exact
    tie = d.withColumn("c", F.lit(1))
    sel, rep = select_token_budget(tie, "c", "n_chars", total // 2,
                                   boundary_cap=4)
    got = {r.doc_id for r in sel.select("doc_id").collect()}
    keep, cum = set(), 0
    for r in sorted(rows, key=lambda r: r.doc_id):
        if cum >= total // 2:
            break
        keep.add(r.doc_id)
        cum += r.n_chars
    assert got == keep and rep["boundary_exceeded_cap"]


def test_top_k_by_group_exact_and_bounded_plan(spark):
    """Per-group top-k equals the brute-force (order DESC, id ASC) cut,
    and the physical plan uses WindowGroupLimit (bounded per-task
    heap), not a full per-group sort materialization."""
    from parquet_spark.textops.sampling import top_k_by_group

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = top_k_by_group(d, ["lang"], "n_chars", 3)
    got = {(r.lang, r.doc_id) for r in out.collect()}

    want = set()
    rows = d.select("lang", "doc_id", "n_chars").collect()
    for lang in {r.lang for r in rows}:
        grp = sorted((r for r in rows if r.lang == lang),
                     key=lambda r: (-r.n_chars, r.doc_id))[:3]
        want.update((lang, r.doc_id) for r in grp)
    assert got == want

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]
