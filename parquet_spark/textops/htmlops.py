"""HTML -> text extraction: the step between a WARC crawl and the
corpus `text` column (BASELINE.json input_hint binds the table shape
(url, warc_ts, html:binary, text, lang); the north rule's per-row
invariant is *byte-identical extracted text per url*).

Two halves:

- `extract_text` — the real operator.  Stdlib-`html.parser` tokenizer
  per document inside a `mapInArrow` batch kernel (the same execution
  shape as warc.read_warc / multimodal.image_features: Python touches
  data only in Arrow batches, the op is narrow / partition-preserving,
  so at 10^12 docs it runs scan-parallel with zero shuffle and memory
  bounded by one Arrow batch).  Extraction spec (C4-style):

    * content inside <script> <style> <noscript> <template> <title>
      is dropped (head noise, trackers, inline CSS/JS);
    * HTML comments and all tags are dropped, text nodes kept;
    * character/entity references decode (&amp; &#32; &#x20; ...);
    * whitespace is normalized: any run of whitespace -> one space,
      leading/trailing trimmed (C4's whitespace canonicalization —
      tag boundaries and entity-decoded spaces are indistinguishable
      from literal spaces after this, which is what makes the spec
      *invertible* on single-spaced source text).

- `synth_html` — the deterministic fixture (pure codegen, no Python):
  wraps a clean text column into realistic HTML — DOCTYPE/head/title,
  an inline <script> and <style>, an HTML comment, per-paragraph <p>
  tags with class attributes, the first paragraph's lead words inside
  an inline <a> anchor, and a literal `&#32;` charref replacing the
  first space of every paragraph (so entity decoding is exercised on
  every row, not just on rows that happen to contain specials).
  Specials in the source text are escaped (& < > ") so
  `extract_text(synth_html(text)) == whitespace_normalize(text)`
  EXACTLY — the byte-identity the north rule asks for, certifiable
  against a second engine that only ever sees the original text.

Reference parity: the C# library stops at encode/decode of an
already-extracted table (Parquet/ParquetResultListener.cs); extraction
is the upstream step its users run elsewhere.  No counterpart file.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pyarrow as pa

from pyspark.sql import Column, DataFrame, functions as F

# None of these are HTML void elements, so every starttag has a
# matching endtag in well-formed input; malformed input (unclosed
# <script>) degrades to dropping the rest of the document — the
# conservative direction for a skip list.
_SKIP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "title"})


class _TextExtractor(HTMLParser):
    """Collects text nodes outside skip-listed containers; counts
    anchors.  convert_charrefs=True folds &amp;/&#NN;/&#xHH; into the
    data stream before handle_data sees it."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.n_links = 0
        self._skip = 0

    def handle_starttag(self, tag, attrs):  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip += 1
        if tag == "a":
            self.n_links += 1

    def handle_endtag(self, tag):  # noqa: ANN001
        if tag in _SKIP_TAGS and self._skip:
            self._skip -= 1

    def handle_data(self, data):  # noqa: ANN001
        if not self._skip and data:
            self.parts.append(data)


def extract_html_text(blob: bytes | str) -> tuple[str, int]:
    """One document: (normalized extracted text, n_anchor_tags).
    Accepts bytes (utf-8, errors=replace — crawl bodies lie about
    charsets) or str."""
    if isinstance(blob, (bytes, bytearray, memoryview)):
        s = bytes(blob).decode("utf-8", errors="replace")
    else:
        s = blob
    p = _TextExtractor()
    p.feed(s)
    p.close()
    return " ".join(" ".join(p.parts).split()), p.n_links


def extract_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "text") -> DataFrame:
    """DataFrame op: decode `html_col` (binary or string) into
    whitespace-normalized visible text.  Every OTHER input column
    passes through untouched; output adds `out_col` (string) and
    `n_links` (bigint).  Null/empty html -> null text, 0 links.

    Narrow (no shuffle): one Arrow batch in, one out, rows aligned —
    at crawl scale the cost is the per-byte tokenizer, parallel over
    whatever partitioning the scan already has."""
    passthrough = [c for c in df.columns if c != html_col]
    src = df.select(*passthrough, html_col)
    out_fields = [src.schema[c] for c in passthrough]
    out_schema_ddl = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields]
        + [f"`{out_col}` string", "`n_links` bigint"])

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            blobs = batch.column(len(passthrough)).to_pylist()
            texts: list[str | None] = []
            links: list[int] = []
            for blob in blobs:
                if blob is None:
                    texts.append(None)
                    links.append(0)
                    continue
                t, n = extract_html_text(blob)
                texts.append(t)
                links.append(n)
            cols = [batch.column(i) for i in range(len(passthrough))]
            cols.append(pa.array(texts, type=pa.string()))
            cols.append(pa.array(links, type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                cols, names=passthrough + [out_col, "n_links"])

    return src.mapInArrow(run, out_schema_ddl)


def _esc(col: Column) -> Column:
    """HTML-escape a text column (order matters: & first)."""
    col = F.replace(col, F.lit("&"), F.lit("&amp;"))
    col = F.replace(col, F.lit("<"), F.lit("&lt;"))
    col = F.replace(col, F.lit(">"), F.lit("&gt;"))
    return F.replace(col, F.lit('"'), F.lit("&quot;"))


def synth_html(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", out_col: str = "html",
               words_per_para: int = 12) -> DataFrame:
    """Deterministic HTML rendering of a clean text column (test/bench
    fixture — pure whole-stage-codegen expressions, so it synthesises
    at scan speed at any scale).  All boilerplate noise lives in
    containers `extract_text` drops (title/script/style/comment) or in
    markup it never emits (attributes), so extraction is the exact
    inverse on whitespace-normalized source text.  Each paragraph's
    first space is written as the charref `&#32;` and the first
    paragraph's first two words sit inside an inline <a> anchor —
    every row exercises entity decoding and inline-tag flattening."""
    h = F.md5(F.col(id_col).cast("string"))
    w = F.split(_esc(F.col(text_col)), " ")
    nw = F.size(w)
    npara = F.greatest(F.ceil(nw / F.lit(words_per_para)), F.lit(1))

    def para(i: Column) -> Column:
        chunk = F.slice(w, i * words_per_para + 1, words_per_para)
        # first space of the paragraph as a charref (&#32; == ' ')
        body = F.when(
            F.size(chunk) >= 2,
            F.concat(F.element_at(chunk, 1), F.lit("&#32;"),
                     F.array_join(F.slice(chunk, 2, words_per_para), " "))
        ).otherwise(F.array_join(chunk, " "))
        # lead words of paragraph 0 wrapped in an inline anchor
        body = F.when(
            (i == 0) & (F.size(chunk) >= 3),
            F.concat(F.lit('<a href="#top" rel="nofollow">'),
                     F.element_at(chunk, 1), F.lit("&#32;"),
                     F.element_at(chunk, 2), F.lit("</a> "),
                     F.array_join(F.slice(chunk, 3, words_per_para), " "))
        ).otherwise(body)
        return F.concat(F.lit('<p class="s'),
                        F.pmod(i, F.lit(7)).cast("string"),
                        F.lit('">'), body, F.lit("</p>"))

    paras = F.array_join(
        F.transform(F.sequence(F.lit(0), (npara - 1).cast("int")), para),
        "\n")
    doc = F.concat(
        F.lit("<!DOCTYPE html><html><head><title>doc "), h,
        F.lit("</title><script type=\"text/javascript\">var s=\""), h,
        F.lit("\";if(s){window.__f=s;}</script>"),
        F.lit("<style>p{margin:0 0 1em}.s0{font-weight:600}</style>"),
        F.lit("</head><body><!-- fp "), h, F.lit(" -->\n"),
        paras,
        F.lit("\n</body></html>"))
    return df.withColumn(
        out_col,
        F.when(F.col(text_col).isNull(), F.lit(None).cast("binary"))
        .otherwise(F.encode(doc, "UTF-8")))
