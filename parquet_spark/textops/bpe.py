"""Distributed byte-pair-encoding (BPE) tokenizer training and
application (Sennrich et al. 2016, arXiv:1508.07909) — the classic
subword-vocabulary learner, built Spark-first.

The reference repo has no tokenizer (its surface ends at columnar
encode/decode); this is a training-data-pipeline operator in the same
family as token counting (`textstats.token_counts`), built for the
corpus the engine encodes.

Design — everything heavy runs ONCE over the corpus, iterations run
over the WORD VOCABULARY only:

  1. `word_counts` — one corpus-wide shuffle: split text on
     whitespace, groupBy word, sum occurrences.  Zipf's law makes the
     result tiny relative to the corpus (10^8 distinct words for a
     10^12-token crawl), and `min_count` truncates the long tail.
  2. `train_bpe` — k merge rounds over that vocab table.  Each round:
     adjacent-pair counts weighted by word frequency (arrays_zip of
     two slices, exploded — pure codegen), one metadata-sized argmax
     to the driver (count DESC, pair ASC tie-break → deterministic),
     then the merge applied to every symbol sequence as a greedy
     left-to-right `aggregate` FOLD — also pure codegen, no Python in
     the loop.  localCheckpoint per round stops iterative plan growth
     (same discipline as dedup.connected_components).
  3. `bpe_segment` — apply a learned merge list to a corpus: an Arrow
     batch kernel replaying merges in rank order per word, with a
     per-batch word memo (Zipf again: a batch's distinct-word count is
     far below its token count).

Greedy-fold semantics (identical in training and application, and
mirrored verbatim by the `bpe_train` facet's DuckDB oracle): scanning
left to right, the pair (l, r) merges wherever the accumulator's last
symbol is l and the incoming symbol is r — so "aaaa" under (a,a)
becomes [aa, aa], never [a, aa, a].  One pass per merge rank, exactly
Sennrich's apply order.

100 TB notes: the corpus is touched once (word_counts) plus once per
`bpe_segment`; training iterations shuffle only the vocab table.  The
argmax `.head(1)` per round is ONE row to the driver.  Symbol
sequences live as array<string> columns; merge folds and pair counts
are whole-stage-codegen expressions over them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MAX_WORD = 4096  # fold slice bound; no natural-language word is longer


def word_counts(df: DataFrame, text_col: str = "text",
                min_count: int = 1,
                lowercase: bool = False) -> DataFrame:
    """(word, n) from whitespace tokenization — the single corpus-wide
    pass of BPE training.  `min_count` prunes the Zipf tail (every
    pruned occurrence is lost to pair statistics; at crawl scale a
    min_count of 2-5 shrinks the vocab ~50% while moving top-merge
    counts by <<1%)."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    w = (df.where(F.col(text_col).isNotNull())
           .select(F.explode(F.split(t, r"\s+")).alias("word"))
           .where(F.col("word") != ""))
    out = w.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    if min_count > 1:
        out = out.where(F.col("n") >= min_count)
    return out


def _sym_df(words: DataFrame) -> DataFrame:
    return words.withColumn("syms", F.split(F.col("word"), ""))


def pair_counts(syms: DataFrame, sym_col: str = "syms",
                weight_col: str = "n") -> DataFrame:
    """Adjacent-pair occurrence counts, weighted by word frequency.
    Overlapping positions all count ("aaa" contributes (a,a) twice) —
    the standard BPE statistic.  Pure expression: two shifted slices
    zipped and exploded, one hash aggregate."""
    s = F.col(sym_col)
    pairs = F.arrays_zip(F.slice(s, 1, F.size(s) - 1),
                         F.slice(s, 2, F.size(s) - 1))
    return (syms.where(F.size(s) >= 2)
            .select(F.explode(pairs).alias("p"), F.col(weight_col))
            .select(F.col("p")["0"].alias("left"),
                    F.col("p")["1"].alias("right"), F.col(weight_col))
            .groupBy("left", "right")
            .agg(F.sum(weight_col).alias("cnt")))


def apply_merge(syms: DataFrame, left: str, right: str,
                sym_col: str = "syms") -> DataFrame:
    """One greedy left-to-right merge pass of (left, right) over every
    symbol sequence — the `aggregate` fold (codegen, no UDF)."""
    merged = left + right
    s = F.col(sym_col)

    def step(acc, x):
        hit = (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right))
        return (F.when(hit, F.concat(F.slice(acc, 1, F.size(acc) - 1),
                                     F.array(F.lit(merged))))
                .otherwise(F.concat(acc, F.array(x))))

    folded = F.aggregate(F.slice(s, 2, _MAX_WORD), F.slice(s, 1, 1), step)
    return syms.withColumn(
        sym_col, F.when(F.size(s) >= 2, folded).otherwise(s))


def train_bpe(df: DataFrame, n_merges: int = 10, text_col: str = "text",
              min_count: int = 1, lowercase: bool = False,
              word_filter: str | None = None) -> list[dict]:
    """Learn `n_merges` BPE merges from a corpus.  Returns the ranked
    merge table: [{rank, left, right, cnt}, ...] (possibly shorter if
    the vocabulary runs out of repeated pairs).  `word_filter` is an
    optional rlike pattern words must fully match (the facet uses
    '^[a-z]+$' so an external SQL engine splitting by CODEPOINT and
    Spark splitting by UTF-16 unit cannot disagree on exotic text)."""
    words = word_counts(df, text_col, min_count, lowercase)
    if word_filter is not None:
        words = words.where(F.col("word").rlike(word_filter))
    syms = _sym_df(words).select("syms", "n").localCheckpoint()
    merges: list[dict] = []
    for rank in range(n_merges):
        best = (pair_counts(syms)
                .orderBy(F.col("cnt").desc(), F.col("left").asc(),
                         F.col("right").asc())
                .head(1))
        if not best or best[0]["cnt"] < 2:
            break
        b = best[0]
        merges.append({"rank": rank, "left": b["left"],
                       "right": b["right"], "cnt": int(b["cnt"])})
        syms = apply_merge(syms, b["left"], b["right"]).localCheckpoint()
    return merges


def bpe_segment(df: DataFrame, merges: list[dict],
                text_col: str = "text", out_col: str = "tokens",
                lowercase: bool = False) -> DataFrame:
    """Tokenize a corpus with a learned merge list: whitespace-split,
    then replay merges in rank order per word (the same greedy fold as
    training, run in an Arrow batch kernel with a per-batch word memo
    — distinct words per batch << tokens per batch)."""
    import pyarrow as pa

    ranked = [(m["left"], m["right"]) for m in
              sorted(merges, key=lambda m: m["rank"])]

    def _apply_word(word: str, memo: dict) -> list:
        got = memo.get(word)
        if got is not None:
            return got
        toks = list(word)
        for left, right in ranked:
            if len(toks) < 2:
                break
            out, i, merged = [], 0, left + right
            for t in toks:
                if out and out[-1] == left and t == right:
                    out[-1] = merged
                else:
                    out.append(t)
            toks = out
        memo[word] = toks
        return toks

    def kernel(batches):
        for batch in batches:
            texts = batch.column(text_col).to_pylist()
            memo: dict = {}
            col = []
            for txt in texts:
                if txt is None:
                    col.append(None)
                    continue
                if lowercase:
                    txt = txt.lower()
                toks: list = []
                for w in txt.split():
                    toks.extend(_apply_word(w, memo))
                col.append(toks)
            arrs = [batch.column(i) for i in range(batch.num_columns)]
            arrs.append(pa.array(col, type=pa.list_(pa.string())))
            yield pa.RecordBatch.from_arrays(
                arrs, names=list(batch.schema.names) + [out_col])

    from pyspark.sql.types import StructType
    spark_schema = StructType.fromDDL(
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                  for f in df.schema.fields)
        + f", `{out_col}` array<string>")
    return df.mapInArrow(kernel, spark_schema)
