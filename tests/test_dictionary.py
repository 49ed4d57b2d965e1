"""Global dictionary + skew machinery tests."""

import pytest
from pyspark.sql import functions as F

from parquet_spark.corpus import gen_corpus
from parquet_spark.dictionary import (apply_global_dict, build_global_dict,
                                      restore_global_dict, salted_key_counts)


@pytest.mark.spark
def test_salted_counts_match_plain_counts(spark):
    df = gen_corpus(spark, 3000, seed=31, parts=3)
    salted = {r.lang: r.n for r in salted_key_counts(df, "lang").collect()}
    plain = {r.lang: r.c for r in
             df.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert salted == plain


@pytest.mark.spark
def test_global_dict_roundtrip(spark):
    df = gen_corpus(spark, 2000, seed=37, parts=2)
    d = build_global_dict(df, "lang")
    assert d is not None
    ids = {r.value: r.dict_id for r in d.collect()}
    assert sorted(ids.values()) == list(range(len(ids)))  # dense
    assert list(ids) == sorted(ids)  # ordered by value

    enc = apply_global_dict(df, "lang", d)
    assert "lang_id" in enc.columns and "lang" not in enc.columns
    dec = restore_global_dict(enc, "lang_id", d, "lang")
    orig = df.select("url", "lang").orderBy("url").collect()
    back = dec.select("url", "lang").orderBy("url").collect()
    assert orig == back  # nulls survive via left joins


@pytest.mark.spark
def test_global_dict_refuses_high_cardinality(spark):
    df = gen_corpus(spark, 1000, seed=41, parts=2)
    assert build_global_dict(df, "url") is None  # unique -> ratio 1.0 > 0.8


@pytest.mark.spark
def test_apply_is_broadcast_join(spark):
    df = gen_corpus(spark, 500, seed=43, parts=2)
    d = build_global_dict(df, "lang")
    plan = apply_global_dict(df, "lang", d)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:500]


@pytest.mark.spark
def test_salting_spreads_the_hot_key(spark):
    # 'en' is ~60% of the corpus (Zipf hot key). Unsalted, one reducer
    # gets all of it; salted phase-1 groups spread it over many.
    df = gen_corpus(spark, 4000, seed=47, parts=4)
    n_en = df.where(F.col("lang") == "en").count()
    assert n_en > 1500  # the skew premise holds
    salt = F.pmod(F.xxhash64(*df.columns), F.lit(64)).alias("_salt")
    partial = (df.select("lang", salt)
               .groupBy("lang", "_salt").agg(F.count(F.lit(1)).alias("c")))
    hot = partial.where(F.col("lang") == "en")
    n_groups = hot.count()
    biggest = hot.agg(F.max("c")).head()[0]
    assert n_groups >= 32           # spread across many reducers
    assert biggest < 0.2 * n_en     # no single reducer owns the hot key
