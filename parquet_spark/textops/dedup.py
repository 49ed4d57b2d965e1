"""Deduplication operators for training-data pipelines.

Scale notes (the 100 TB story):
  * exact dedup: one hash-shuffle on a 32-hex-char digest — minimal key
    width, map-side partial aggregation, AQE-coalesced;
  * MinHash: shingle explode is a narrow map; the signature groupBy
    shuffles doc_id -> fixed-width mins; LSH banding turns the O(n^2)
    pair problem into a self-join on band keys (broadcast never needed,
    bucket keys are high-cardinality so the join is skew-resistant);
  * SimHash: pure per-row expression work (no shuffle until the final
    group), stays in whole-stage codegen — md5+bit tricks, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# word k-shingles over whitespace-tokenized text
SHINGLE_K = 3
N_MINHASH = 8
BAND_SIZE = 2  # 4 bands of 2 hashes


def _shingles(col: str, k: int = SHINGLE_K):
    """array of word k-grams: zero-UDF, codegen-friendly.

    `split` is materialized into a named lambda variable first —
    referencing `split(text)` inside the transform lambda would
    re-tokenize the document once per output element (O(words^2))."""
    return F.expr(
        f"transform(sequence(1, greatest(size(split({col}, ' ')) - {k - 1}, 1)),"
        f" i -> array_join(slice(split({col}, ' '), i, {k}), ' '))")


def _exploded_shingles(df: DataFrame, text_col: str, id_col: str,
                       k: int = SHINGLE_K) -> DataFrame:
    """(id, shingle) rows with the word array computed once per doc."""
    words = F.split(F.col(text_col), " ")
    arr = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(F.col("_w")) - (k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(F.col("_w"), i, k), " "))
    return (df.select(id_col, words.alias("_w"))
              .select(id_col, F.explode(arr).alias("sh")))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact text digest (hash-groupBy)."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("digest"))
              .agg(F.min(id_col).alias("keeper_id"),
                   F.count("*").alias("n_dups")))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       n_hashes: int = N_MINHASH,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """Per-doc MinHash signature: h_j = min(hash(j || shingle)).

    `hash_fn` picks the hash family:
      * "xxhash64" (default, the engine path): int64 signatures.  The
        min() aggregate over fixed-width longs compiles to a
        HashAggregate and each signature is 8 bytes on the wire — a
        min() over md5 STRINGS falls back to SortAggregate (per-
        partition sort of the exploded shingle stream) and ships 32-hex
        keys, ~4x the shuffle bytes.  This is the 100 TB path.
      * "md5": hex-string signatures, bit-identical to DuckDB's md5 —
        used only by the oracle-checked facets (bounded to a few
        hundred docs), where cross-engine reproducibility matters more
        than throughput.

    No distinct() before the aggregation: min() is duplicate-insensitive,
    so deduplicating shingles first would add a full extra shuffle of
    the shingle set for an identical result — the partial min() combines
    map-side and only (doc_id, n_hashes mins) cross the wire."""
    sh = _exploded_shingles(df, text_col, id_col)
    if hash_fn == "xxhash64":
        aggs = [F.min(F.xxhash64(F.concat(F.lit(str(j)), F.col("sh"))))
                .alias(f"h{j}") for j in range(n_hashes)]
    elif hash_fn == "md5":
        aggs = [F.min(F.md5(F.concat(F.lit(str(j)), F.col("sh"))))
                .alias(f"h{j}") for j in range(n_hashes)]
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}: xxhash64|md5")
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame, id_col: str = "doc_id",
                        n_hashes: int = N_MINHASH,
                        band_size: int = BAND_SIZE) -> DataFrame:
    """Docs sharing any band of the signature -> candidate near-dup pairs.

    Band keys adapt to the signature type: int64 signatures (xxhash64
    mode) band via xxhash64 over the band's columns — the self-join key
    stays a fixed-width long; md5 signatures keep the md5 concat key
    (oracle-reproducible)."""
    is_long = dict(sig.dtypes).get("h0") == "bigint"
    bands = []
    for b in range(0, n_hashes, band_size):
        cols = [F.col(f"h{j}") for j in range(b, b + band_size)]
        key = F.xxhash64(*cols) if is_long else \
            F.md5(F.concat_ws("|", *cols))
        bands.append(sig.select(F.col(id_col).alias("doc"),
                                F.lit(b).alias("band"), key.alias("bkey")))
    all_bands = bands[0]
    for extra in bands[1:]:
        all_bands = all_bands.unionByName(extra)
    a, b_ = all_bands.alias("a"), all_bands.alias("b")
    return (a.join(b_, ["band", "bkey"])
             .where(F.col("a.doc") < F.col("b.doc"))
             .select(F.col("a.doc").alias("doc_a"),
                     F.col("b.doc").alias("doc_b"))
             .distinct())


def ngram_jaccard(df: DataFrame, pairs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", k: int = SHINGLE_K) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification stage)."""
    sh = (_exploded_shingles(df, text_col, id_col, k)
          .withColumnRenamed(id_col, "doc")
          .distinct())
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    # intersection size via join on (doc pair, shingle)
    sh_a = sh.select(F.col("doc").alias("doc_a"), "sh")
    sh_b = sh.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh"))
    inter = (pairs.join(sh_a, "doc_a").join(sh_b, ["doc_b", "sh"])
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sizes.withColumnRenamed("doc", "doc_a")
                       .withColumnRenamed("sz", "sz_a"), "doc_a")
            .join(sizes.withColumnRenamed("doc", "doc_b")
                       .withColumnRenamed("sz", "sz_b"), "doc_b")
            .withColumn("jaccard",
                        F.round(F.col("n_inter") /
                                (F.col("sz_a") + F.col("sz_b") -
                                 F.col("n_inter")), 4)))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            n_bits: int = 16) -> DataFrame:
    """n_bit SimHash from md5 nibbles of each token (zero-UDF).

    bit_i(token) = i-th bit of md5(token); simhash bit = majority vote.
    """
    tok = df.select(id_col, F.explode(F.split(F.col(text_col), " "))
                    .alias("tok"))
    h = F.md5(F.col("tok"))
    votes = []
    for i in range(n_bits):
        nib = F.substring(h, i // 4 + 1, 1)
        val = F.instr(F.lit("0123456789abcdef"), nib) - 1
        bit = F.shiftrightunsigned(val, 3 - (i % 4)).bitwiseAND(F.lit(1))
        votes.append(F.sum(bit * 2 - 1).alias(f"v{i}"))
    v = tok.groupBy(id_col).agg(*votes)
    sig = None
    for i in range(n_bits):
        term = F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return v.select(id_col, sig.cast("bigint").alias("simhash"))


def _cos_pair_cols():
    """4dp-rounded cosine over the (va, vb) pair columns — built on
    similarity's shared _dot/_norm so every cosine in the engine
    (top-k, IVF, both near-dup paths) folds identically."""
    from .similarity import _dot, _norm
    return F.round(_dot("va", "vb") / (_norm("va") * _norm("vb")), 4)


def embedding_near_dups(emb: DataFrame, threshold: float = 0.98,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Cosine near-duplicate pairs among embeddings — the brute-force
    O(n^2) CORRECTNESS BASELINE (use embedding_near_dups_lsh at scale)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
             .withColumn("cos", _cos_pair_cols())
             .where(F.col("cos") >= threshold)
             .select("id_a", "id_b", "cos"))


def embedding_near_dups_lsh(emb: DataFrame, planes,
                            threshold: float = 0.98,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """The 100 TB near-dup path: candidate pairs form only WITHIN a
    sign-LSH bucket, so the self-join key is the bucket id and the
    pair problem shrinks from O(n^2) to O(sum bucket_i^2) — at 10^9
    vectors with 2^20 buckets that is ~10^6-row bucket joins instead
    of a 10^18-pair cross product.  Recall trades with n_planes: two
    vectors land in one bucket iff no hyperplane separates them
    (probability (1 - theta/pi)^n_planes), so near-identical pairs are
    kept with high probability and the miss rate is tunable; run with
    several independent plane seeds and union for higher recall.
    Exactness WITHIN the candidate set matches the brute-force
    baseline (same 4dp-rounded cosine + threshold)."""
    from .similarity import lsh_bucket
    b = lsh_bucket(emb, planes, vec_col=vec_col)
    a = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                 "bucket")
    c = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                 "bucket")
    return (a.join(c, "bucket")
             .where(F.col("id_a") < F.col("id_b"))
             .withColumn("cos", _cos_pair_cols())
             .where(F.col("cos") >= threshold)
             .select("id_a", "id_b", "cos"))


def connected_components(pairs: DataFrame, left: str = "doc_a",
                         right: str = "doc_b", max_iters: int = 25,
                         stats: dict | None = None) -> DataFrame:
    """Label the candidate-pair graph: (node, comp) with comp = MIN
    node id in the node's connected component — the canonical-keeper
    convention for dedup clusters.

    Min-label propagation WITH pointer-jumping: every round each node
    takes the min of its own label and its neighbors' labels, then
    follows its label's label one hop (path doubling — the classic
    shortcutting step of Shiloach-Vishkin-style CC).  Neighbor
    propagation alone moves the component minimum ONE hop per round
    (O(diameter) — an adversarial 10^6-node chain would need 10^6
    rounds); the shortcut compresses label chains geometrically, so
    convergence is O(log n) rounds even for path graphs.  Labels only
    ever reference in-component nodes (inductively: a label is some
    neighbor's current label), so the fixed point is unchanged — the
    component minimum.  Near-dup clusters are small and dense
    (diameter 2-3), so at 100 TB this is 2-3 shuffles of the EDGE
    list plus a same-sized label self-join — the corpus never enters
    the loop (reference analog: none; the reference stops at pair
    emission).  Each round localCheckpoints (iterative plans otherwise
    grow exponentially) and convergence is driven by a metadata-sized
    changed-label count, recorded per round in `stats` along with
    stats["converged"].  If max_iters elapse with labels still moving
    a RuntimeWarning is emitted — the returned labels are then NOT
    component minima and dedup_keep refuses them.  Nodes appearing in
    no pair are absent (they are their own keepers)."""
    import warnings
    sym = (pairs.select(F.col(left).alias("src"), F.col(right).alias("dst"))
           .union(pairs.select(F.col(right).alias("src"),
                               F.col(left).alias("dst")))).localCheckpoint()
    labels = (sym.select(F.col("src").alias("node")).distinct()
              .withColumn("comp", F.col("node")).localCheckpoint())
    if stats is not None:
        stats.setdefault("rounds", [])
    changed = None
    for _ in range(max_iters):
        nmin = (sym.join(labels, sym["dst"] == labels["node"])
                .groupBy("src").agg(F.min("comp").alias("nmin")))
        new = (labels.join(nmin, labels["node"] == nmin["src"], "left")
               .select(labels["node"],
                       F.least(labels["comp"],
                               F.coalesce(F.col("nmin"), labels["comp"]))
                       .alias("comp")))
        # pointer jumping: comp <- min(comp, comp[comp]).  comp values
        # are node ids present in `labels` (every dst is also a src in
        # the symmetric edge list), and always in-component.
        hop = new.select(F.col("node").alias("_c"),
                         F.col("comp").alias("_cc"))
        new = (new.join(hop, new["comp"] == hop["_c"], "left")
               .select("node",
                       F.least(F.col("comp"),
                               F.coalesce(F.col("_cc"), F.col("comp")))
                       .alias("comp")).localCheckpoint())
        changed = (new.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.comp") != F.col("o.comp")).count())
        labels = new
        if stats is not None:
            stats["rounds"].append({"changed": changed})
        if changed == 0:
            break
    converged = changed == 0 or changed is None
    if stats is not None:
        stats["converged"] = converged
    if not converged:
        warnings.warn(
            f"connected_components stopped after max_iters={max_iters} "
            f"with {changed} labels still changing — returned labels "
            "are NOT component minima; raise max_iters",
            RuntimeWarning, stacklevel=2)
    return labels


def dedup_keep(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
               left: str = "doc_a", right: str = "doc_b",
               max_iters: int = 25) -> DataFrame:
    """Keep ONE canonical document per near-dup cluster — the dedup
    endgame after pair generation: cluster the pairs into connected
    components, drop every non-minimum member, keep everything that
    was never paired.  The corpus side is a single left_anti join
    against the loser set (bounded by the PAIR count, tiny vs the
    corpus — broadcast-able in practice), so the full pipeline
    shingles→signatures→LSH pairs→components→keepers touches the
    corpus exactly twice: once to sign, once to filter.  Refuses
    unconverged labels (a truncated CC run would silently keep
    multiple "canonical" docs per cluster)."""
    cc_stats: dict = {}
    comp = connected_components(pairs, left, right, max_iters,
                                stats=cc_stats)
    if not cc_stats.get("converged", True):
        raise RuntimeError(
            f"connected_components did not converge within "
            f"max_iters={max_iters}; dedup_keep would keep multiple "
            "canonicals per cluster — raise max_iters")
    losers = (comp.where(F.col("node") != F.col("comp"))
              .select(F.col("node").alias(id_col)))
    return df.join(losers, id_col, "left_anti")


_LINE_COLS = ("_pos", "_line", "_n_kept", "_clean")


def dedup_lines(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", min_docs: int = 2,
                sep: str = "\n", min_chars: int = 1,
                out_col: str | None = None) -> DataFrame:
    """Corpus-level duplicate-LINE removal (the C4/CCNet boilerplate
    pass): any line occurring in >= `min_docs` DISTINCT documents is
    deleted from every document; the per-doc remainder is re-joined in
    original line order.  Returns df plus `out_col` (default
    "{text_col}_clean"), `n_lines`, and `n_removed` — a doc whose every
    line is boilerplate comes back as the empty string, for the caller
    to drop or keep.

    Lines shorter than `min_chars` (after the split; default 1 = keep
    empties out of the dup vote) never count as duplicates and are
    always kept — C4 similarly votes only on "real" lines.

    Scale shape (10^12 docs): everything is line-granular —
      * the duplicate vote is a hash-shuffle groupBy on the line value
        with map-side partial count-distinct (no doc payload moves);
      * membership is a repartition-join of (id, pos, line) against the
        duplicate-line set (never collected, never broadcast: the set
        is unbounded at corpus scale), left as a plain shuffle join for
        AQE to size — ultra-common boilerplate lines are exactly the
        rows the anti-join DROPS, so the skewed keys vanish at the join
        rather than concentrating after it;
      * re-assembly groups by doc id: per-task width is one document's
        lines (collect_list + array_sort over a single doc — bounded by
        document size, not corpus size).
    Three line-level shuffles total, zero UDFs, no driver materialization.
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    out_col = out_col or f"{text_col}_clean"
    clash = [c for c in (*_LINE_COLS, "n_lines", "n_removed", out_col)
             if c in df.columns]
    if clash:
        raise ValueError(f"dedup_lines reserves/overwrites columns "
                         f"{clash}; rename them first")
    # F.split takes a Java REGEX but array_join re-joins literally:
    # quote the separator (\Q...\E) so '|', '.', '||' etc. split on
    # the literal characters they rejoin with
    sep_re = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    ex = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_re))
        .alias("_pos", "_line"))
    votable = ex.where(F.length("_line") >= min_chars)
    dup = (votable.groupBy("_line")
           .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
           .where(F.col("_nd") >= min_docs)
           .select("_line"))
    kept = ex.join(dup, "_line", "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("_pos", "_line"))),
                            lambda s: s["_line"]),
                        sep).alias("_clean"),
                    F.count(F.lit(1)).alias("_n_kept")))
    return (df.join(rebuilt, id_col, "left")
            .withColumn("n_lines",
                        F.size(F.split(F.col(text_col), sep_re)))
            .withColumn(out_col, F.coalesce(F.col("_clean"), F.lit("")))
            .withColumn("n_removed",
                        F.col("n_lines")
                        - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .drop("_clean", "_n_kept"))


def _span_tokens(text_col: str):
    """Case-SENSITIVE non-empty whitespace tokens (span identity is
    exact text, unlike the lowercased stats tokenizers)."""
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != "")


def _span_windows(base: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id, _pos, _h) rows: one md5 per k-token window, 1-based start
    position.  Docs with < k tokens emit nothing.  The digest — never
    the text — is what every downstream shuffle carries."""
    n = F.size(F.col("_tk"))
    return (base.where(n >= k)
            .select(
                F.col(id_col),
                F.posexplode(F.transform(
                    F.sequence(F.lit(1), n - (k - 1)),
                    lambda i: F.md5(F.array_join(
                        F.slice(F.col("_tk"), i, k), " "))))
                .alias("_p0", "_h"))
            .select(id_col, (F.col("_p0") + 1).alias("_pos"), "_h"))


def dup_span_stats(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 20,
                   min_docs: int = 2) -> DataFrame:
    """Exact SUBSTRING-level duplication stats — the span-granular
    member of the dedup family (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", window-granular
    rendering): a k-token window whose md5 occurs in >= `min_docs`
    DISTINCT documents marks every token position it covers as
    duplicated.  Doc-level (exact_dedup/minhash) misses mostly-unique
    pages sharing a boilerplate paragraph; line-level (dedup_lines)
    misses spans that cross line breaks or differ in line framing —
    this is the signal RefinedWeb/Gopher-style pipelines cut on.

    Returns one row per input doc: (id, n_tokens, n_windows,
    n_dup_windows, n_dup_tokens) — all exact integers, so the facet is
    hash-checkable cross-engine.  n_dup_tokens is the size of the
    UNION of covered positions (overlapping duplicated windows do not
    double-count); the cut quantity `n_dup_tokens / n_tokens` is the
    usual "duplicated n-gram fraction".

    Tokenization is case-SENSITIVE non-empty whitespace split (span
    identity is exact text, unlike the lowercased stats tokenizers).
    Docs with < k tokens have zero windows and never vote.

    Scale shape (10^12 docs): one narrow explode to (id, pos,
    window-md5) — same volume as the minhash shingle pass;
      * the duplicate vote is a map-side-combined hash-groupBy on the
        16-byte digest with count_distinct(id) (no text payload ever
        shuffles — windows travel as md5 only);
      * membership is a repartition-join of window rows against the
        duplicate digests (unbounded at corpus scale: never collected,
        never broadcast); ultra-common boilerplate digests are HOT
        keys that survive this join, so it is left as a plain shuffle
        join for AQE's skew-split to size;
      * coverage explodes sequence(pos, pos+k-1) ONLY for windows that
        survived the semi-join (duplicated spans, typically a small
        fraction), then rolls up through (id, position) before the
        per-doc totals — a two-level aggregation with map-side partial
        combine, chosen over two count_distincts in one agg, which
        would Expand-duplicate every coverage row per distinct
        function; per-task width is bounded by one document's
        positions.
    Zero UDFs, zero driver materialization.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    base = df.select(F.col(id_col), _span_tokens(text_col).alias("_tk"))
    n = F.size(F.col("_tk"))
    per_doc = base.select(
        id_col, n.alias("n_tokens"),
        F.greatest(n - (k - 1), F.lit(0)).alias("n_windows"))
    win = _span_windows(base, id_col, k)
    dup = (win.groupBy("_h")
           .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
           .where(F.col("_nd") >= min_docs)
           .select("_h"))
    dwin = win.join(dup, "_h", "left_semi")
    # Two-level aggregation instead of two count_distincts in one agg:
    # multi-distinct would Expand (duplicate) every coverage row per
    # distinct function and shuffle a 4-column key.  Grouping by
    # (id, position) first — `_st` marks positions where a duplicated
    # window STARTS (exactly one coverage row per group can satisfy
    # _t == _pos) — gets map-side partial combine and a single narrow
    # shuffle; the per-doc rollup is then distinct-free.
    stats = (dwin.select(
                 F.col(id_col), F.col("_pos"),
                 F.explode(F.sequence(
                     F.col("_pos"), F.col("_pos") + (k - 1))).alias("_t"))
             .groupBy(id_col, "_t")
             .agg(F.max(F.when(F.col("_t") == F.col("_pos"), 1)
                        .otherwise(0)).alias("_st"))
             .groupBy(id_col)
             .agg(F.sum("_st").alias("n_dup_windows"),
                  F.count(F.lit(1)).alias("n_dup_tokens")))
    return (per_doc.join(stats, id_col, "left")
            .fillna(0, ["n_dup_windows", "n_dup_tokens"]))


def remove_dup_spans(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: int = 20,
                     min_docs: int = 2) -> DataFrame:
    """The ACTION half of ExactSubstr dedup (Lee et al. 2021): rewrite
    each document with every duplicated k-token span cut, keeping
    exactly one canonical copy corpus-wide.  `dup_span_stats` measures
    the duplicated-n-gram fraction; this operator removes it.

    Keep-one rule (deterministic, order-free): each duplicated digest
    (>= `min_docs` distinct docs) is OWNED by its minimum `id_col`; a
    token position is cut iff some duplicated window covering it
    belongs to a doc that is NOT that window's owner.  The owner doc
    keeps its copy (including within-doc repeats of a span it owns);
    every other doc loses all of that span's positions.  Overlapping
    cut windows union (a position is removed once).

    Returns the input rows with `text_col` REPLACED by the cleaned
    text (kept tokens joined by a single space — output is
    token-normalized, as the whitespace tokenizer implies) plus
    `n_tokens` (pre-cut) and `n_removed`; `n_tokens - n_removed` is
    the kept-token count.  Docs shorter than k tokens pass through
    with `n_removed = 0` (but still space-normalized).

    Scale shape (10^12 docs): identical skeleton to `dup_span_stats`
    — windows shuffle as 16-byte md5s only; the owner vote is one
    map-side-combined hash-groupBy per digest (count_distinct + min);
    the membership join is a plain shuffle join sized by AQE's
    skew-split (boilerplate digests are hot keys); the coverage
    explode runs ONLY for non-owner duplicated windows.  The per-doc
    cut set (`collect_set` of positions) is bounded by one document's
    token count — the same per-task width every per-doc array op here
    already carries — and the rebuild is pure codegen
    (zip_with/filter/array_join, zero UDFs).  One final shuffle join
    hands the cut sets back to the full-width rows, so document
    payloads move exactly once.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    for c in ("n_tokens", "n_removed", "_tk", "_cut"):
        if c in df.columns:
            raise ValueError(f"column {c!r} is reserved by "
                             f"remove_dup_spans; rename it first")
    base = df.select(F.col(id_col), _span_tokens(text_col).alias("_tk"))
    win = _span_windows(base, id_col, k)
    owner = (win.groupBy("_h")
             .agg(F.count_distinct(F.col(id_col)).alias("_nd"),
                  F.min(F.col(id_col)).alias("_own"))
             .where(F.col("_nd") >= min_docs)
             .select("_h", "_own"))
    cuts = (win.join(owner, "_h")
            .where(F.col(id_col) != F.col("_own"))
            .select(F.col(id_col),
                    F.explode(F.sequence(
                        F.col("_pos"), F.col("_pos") + (k - 1))).alias("_t"))
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_set("_t")).alias("_cut")))
    tk = F.col("_tk")
    cut = F.coalesce(F.col("_cut"), F.array().cast("array<int>"))
    # null out cut positions, drop the nulls, re-join: stays in codegen.
    # An empty token array zips against sequence(1,0)=[1,0] as an
    # all-null pad, which the filter drops — "" comes out either way.
    kept = F.filter(
        F.zip_with(tk, F.sequence(F.lit(1), F.size(tk)),
                   lambda tok, i: F.when(F.array_contains(cut, i),
                                         F.lit(None)).otherwise(tok)),
        lambda x: x.isNotNull())
    return (df.join(cuts, id_col, "left")
            .withColumn("_tk", _span_tokens(text_col))
            .withColumn("n_tokens", F.size(tk))
            .withColumn("n_removed",
                        F.coalesce(F.size(F.col("_cut")), F.lit(0)))
            .withColumn(text_col, F.array_join(kept, " "))
            .drop("_tk", "_cut"))


def semdedup(emb: DataFrame, n_clusters: int = 8, threshold: float = 0.9,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: list[list[float]] | None = None,
             round_dp: int | None = 6,
             max_iters: int = 25) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication through the embedding space — cluster the corpus
    with k-means, compare pairs only WITHIN a cluster, and keep one
    canonical member per group of semantic near-duplicates.

    Pipeline (all existing engine primitives, so every cosine and
    every cluster assignment folds identically with the IVF / near-dup
    facets):

      1. coarse clustering — ``ivf_assign`` against ``centroids``
         (default: the deterministic md5-ranked seed set of
         ``ivf_seeds_md5``, which an external SQL engine reproduces
         exactly; production callers pass Lloyd-refined
         ``ivf_centroids(...)`` instead — the keep-set then depends on
         the refined partition but the algorithm is unchanged);
      2. candidate pairs — a self-join keyed on the CLUSTER id with
         the shared 4dp-rounded cosine, thresholded at ``threshold``;
      3. canonical keepers — ``dedup_keep``: connected components over
         the pair list, keep the MIN id per component (the engine-wide
         canonical-keeper convention; the paper keeps the member
         farthest from the centroid — same cluster-level reduction,
         different representative choice).

    Returns the input rows that survive, plus the ``cluster`` column.

    100 TB design: the paper's whole point is that clustering bounds
    the pair problem — the self-join key is the cluster id, so cost is
    O(sum c_i^2) over cluster sizes, never O(n^2).  Scale n_clusters
    with the corpus (LAION runs use k ~ 50k) so E[c_i] stays ~1e4-1e5
    and each cluster's pair block fits one task; the centroid list is
    a broadcast literal (ivf_assign's argmin is pure expression
    codegen, no shuffle), so the only shuffles are the cluster-keyed
    self-join and the edge-list-sized connected-components rounds.
    Skewed (over-dense) clusters are the known failure mode — at scale
    feed ``ivf_centroids`` more clusters or re-split heavy clusters
    with a second seeding pass over just their members."""
    from .similarity import ivf_assign, ivf_seeds_md5
    if centroids is None:
        centroids = ivf_seeds_md5(emb, n_clusters=n_clusters,
                                  id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(emb, centroids, vec_col=vec_col,
                          round_dp=round_dp)
    a = assigned.select(F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("va"), "cluster")
    b = assigned.select(F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("vb"), "cluster")
    pairs = (a.join(b, "cluster")
             .where(F.col("id_a") < F.col("id_b"))
             .withColumn("cos", _cos_pair_cols())
             .where(F.col("cos") >= threshold)
             .select("id_a", "id_b"))
    return dedup_keep(assigned, pairs, id_col=id_col,
                      left="id_a", right="id_b", max_iters=max_iters)
