"""Distributed BPE training/application vs an independent pure-Python
reference implementation (same spec: whitespace words, overlapping
pair counts, (cnt DESC, pair ASC) argmax, greedy left-to-right merge
passes in rank order)."""

import collections
import re

import pytest


def _ref_bpe(texts, k, lowercase=False, word_filter=None):
    wc = collections.Counter()
    for t in texts:
        if t is None:
            continue
        if lowercase:
            t = t.lower()
        for w in re.split(r"\s+", t):
            if w:
                wc[w] += 1
    if word_filter:
        pat = re.compile(word_filter)
        wc = collections.Counter(
            {w: n for w, n in wc.items() if pat.match(w)})
    syms = {w: list(w) for w in wc}
    merges = []
    for rank in range(k):
        pc = collections.Counter()
        for w, n in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (lft, r), cnt = sorted(pc.items(),
                               key=lambda kv: (-kv[1], kv[0][0],
                                               kv[0][1]))[0]
        if cnt < 2:
            break
        merges.append({"rank": rank, "left": lft, "right": r,
                       "cnt": cnt})
        m = lft + r
        for w in syms:
            out = []
            for t in syms[w]:
                if out and out[-1] == lft and t == r:
                    out[-1] = m
                else:
                    out.append(t)
            syms[w] = out
    return merges, syms


TEXTS = ["the cat sat on the mat", "the rat and the cat",
         "low lower lowest", "banana bandana", None,
         "aaaa aaaa aa", "the the the low low", "x", "  spaced   out "]


@pytest.mark.spark
def test_train_bpe_matches_reference(spark):
    from parquet_spark.textops.bpe import train_bpe
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    got = train_bpe(df, n_merges=6)
    want, _ = _ref_bpe(TEXTS, 6)
    assert got == want
    # greedy fold, not naive count-driven replace: "aaaa" merges to
    # exactly two "aa" tokens under rank-0 (a,a)
    assert got[0] == {"rank": 0, "left": "a", "right": "a", "cnt": 7}


@pytest.mark.spark
def test_train_bpe_filters_and_min_count(spark):
    from parquet_spark.textops.bpe import train_bpe
    df = spark.createDataFrame(
        [("AB AB AB zz2 zz2 zz2 zz2",)], ["text"])
    # lowercase + alpha filter drops zz2; only (a,b) remains
    got = train_bpe(df, n_merges=3, lowercase=True,
                    word_filter="^[a-z]+$")
    assert got == [{"rank": 0, "left": "a", "right": "b", "cnt": 3}]
    # min_count prunes the whole vocab -> no merges
    assert train_bpe(df, n_merges=3, min_count=10) == []


@pytest.mark.spark
def test_bpe_segment_replays_training_fold(spark):
    from parquet_spark.textops.bpe import bpe_segment, train_bpe
    df = spark.createDataFrame([(t,) for t in TEXTS if t], ["text"])
    merges = train_bpe(df, n_merges=6)
    _, ref_syms = _ref_bpe([t for t in TEXTS if t], 6)
    out = bpe_segment(df, merges).collect()
    for row in out:
        want = []
        for w in row.text.split():
            want.extend(ref_syms[w])
        assert row.tokens == want
        # tokens rebuild the original words byte-for-byte
        assert "".join(row.tokens) == "".join(row.text.split())


@pytest.mark.spark
def test_bpe_segment_null_text_and_empty_merges(spark):
    from parquet_spark.textops.bpe import bpe_segment
    df = spark.createDataFrame([("a b",), (None,)], ["text"])
    rows = {r.text: r.tokens for r in bpe_segment(df, []).collect()}
    assert rows["a b"] == ["a", "b"] and rows[None] is None
