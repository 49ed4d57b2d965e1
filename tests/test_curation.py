"""Curation operators: decontamination, PII scrub, sequence packing."""

import pytest
from pyspark.sql import Row, functions as F

from parquet_spark.textops.curation import (PII_PATTERNS,
                                            ngram_contamination,
                                            pack_sequences, pii_scrub)


def test_contamination_flags_shared_trigrams(spark):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over"),
        Row(doc_id=2, text="completely unrelated training text here"),
        Row(doc_id=3, text="a quick brown fox appears"),
    ])
    bench = spark.createDataFrame([
        Row(text="watch the quick brown fox run"),
    ])
    out = {r.doc_id: r.bad_grams
           for r in ngram_contamination(docs, bench, n=3).collect()}
    # doc 1 shares "the quick brown" + "quick brown fox"; doc 3 shares
    # "quick brown fox"; doc 2 is clean
    assert out == {1: 2, 2: 0, 3: 1}


def test_contamination_short_docs_and_empty_bench(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="too short"),
                                  Row(doc_id=2, text="")])
    bench = spark.createDataFrame([Row(text="too short")])
    out = {r.doc_id: r.bad_grams
           for r in ngram_contamination(docs, bench, n=3).collect()}
    assert out == {1: 0, 2: 0}  # no 3-grams exist on either side
    with pytest.raises(ValueError):
        ngram_contamination(docs, bench, n=0)


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame([Row(
        doc_id=1,
        text="mail bob@example.com or admin@sub.host.org, "
             "ip 10.0.0.7, ssn 123-45-6789 end")])
    row = pii_scrub(df).collect()[0]
    assert row.n_email == 2 and row.n_ipv4 == 1 and row.n_ssn == 1
    assert "bob@example.com" not in row.text_clean
    assert "10.0.0.7" not in row.text_clean
    assert "123-45-6789" not in row.text_clean
    assert row.text_clean.count("<email>") == 2
    assert row.text_clean.endswith("<ssn> end")
    # original column untouched
    assert "bob@example.com" in row.text


def test_pii_patterns_re2_compatible():
    """The DuckDB oracle runs the same patterns under RE2: they must
    produce identical matches there.  Cheap proxy: no alternation or
    lookaround metacharacters that diverge between engines."""
    for pat in PII_PATTERNS.values():
        assert "|" not in pat and "(?=" not in pat and "(?<" not in pat


def test_pack_sequences_window_algebra(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * 10)) for i in range(50)])
    out = pack_sequences(docs, budget=25, shard_chars=1)
    rows = out.orderBy("shard", "seq_id", "seq_off").collect()
    # within each shard: offsets advance by exactly n_tokens mod budget
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rs in by_shard.items():
        start = 0
        for r in rs:
            assert r.seq_id == start // 25
            assert r.seq_off == start % 25
            start += r.n_tokens
    # deterministic across recomputation
    again = pack_sequences(docs, budget=25, shard_chars=1) \
        .orderBy("shard", "seq_id", "seq_off").collect()
    assert rows == again


def test_pack_sequences_guards(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, shard_chars=0)
    with pytest.raises(ValueError, match="reserves"):
        pack_sequences(docs.withColumn("seq_id", F.lit(1)))


def test_pack_sequences_token_col_and_append_stability(spark):
    base = [Row(doc_id=i, text="x", tok=7) for i in range(40)]
    d1 = spark.createDataFrame(base)
    out1 = {r.doc_id: (r.shard, r.seq_id, r.seq_off)
            for r in pack_sequences(d1, token_col="tok", budget=16).collect()}
    # repartitioning must not change any assignment
    out2 = {r.doc_id: (r.shard, r.seq_id, r.seq_off)
            for r in pack_sequences(d1.repartition(7), token_col="tok",
                                    budget=16).collect()}
    assert out1 == out2


# -------------------------------------------------------------- mojibake


def test_fix_mojibake_str_layers_and_guards():
    from parquet_spark.textops.curation import fix_mojibake_str
    t = "café résumé ę — naïve"
    g1 = t.encode("utf-8").decode("latin-1")
    g2 = g1.encode("utf-8").decode("latin-1")
    assert fix_mojibake_str(g1) == (t, 1)
    assert fix_mojibake_str(g2) == (t, 2)      # stacked layers unwind
    assert fix_mojibake_str(t) == (t, 0)       # legit text untouched
    assert fix_mojibake_str("plain") == ("plain", 0)
    # cp1252-smart-quote mojibake (bytes 0x80-0x9F) repairs too
    q = "it’s"
    gq = q.encode("utf-8").decode("cp1252")
    assert fix_mojibake_str(gq) == (q, 1)


@pytest.mark.spark
def test_fix_mojibake_dataframe_roundtrip(spark):
    from parquet_spark.textops.curation import (fix_mojibake,
                                                synth_mojibake)
    rows = [(1, "café au lait"), (2, "plain ascii"), (3, None),
            (4, "ęśąćż polish")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    g = synth_mojibake(df, out_col="garbled")
    f = {r.doc_id: r for r in
         fix_mojibake(g, text_col="garbled", out_col="fixed").collect()}
    assert f[1].fixed == "café au lait" and f[1].n_mojibake_layers == 1
    assert f[2].fixed == "plain ascii" and f[2].n_mojibake_layers == 0
    assert f[3].fixed is None
    assert f[4].fixed == "ęśąćż polish"
    # two stacked layers
    g2 = synth_mojibake(df, out_col="garbled", layers=2)
    f2 = {r.doc_id: r for r in
          fix_mojibake(g2, text_col="garbled",
                       out_col="fixed").collect()}
    assert f2[1].fixed == "café au lait" and \
        f2[1].n_mojibake_layers == 2
