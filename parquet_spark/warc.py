"""WARC (ISO 28500) source: ingest Common-Crawl-style archives into
the engine's corpus shape (url, warc_ts, html, ...).

The scale model mirrors Common Crawl's own layout — a crawl is ~10^5
independent ~1 GB ``.warc.gz`` files — so the natural Spark plan is
one task per archive file: ``spark.read.format("binaryFile")`` lists
and distributes the files (no shuffle), and a single ``mapInArrow``
kernel parses each file's records.  Parallelism = number of archive
files; memory per task is bounded by one archive (the binaryFile
contract).  Nothing about parsing is row-at-a-time Python-UDF-shaped:
the kernel is one Python call per FILE, emitting Arrow batches.

Format notes (public spec, ISO 28500 / WARC 1.0-1.1):

* a record = ``WARC/1.x`` version line, ``Name: value`` header lines,
  empty line, exactly ``Content-Length`` payload bytes, then a blank
  ``\\r\\n\\r\\n`` separator;
* ``WARC-Target-URI`` is sometimes angle-bracket-wrapped (older
  writers) — unwrapped here;
* ``WARC-Date`` is ISO-8601 UTC, second precision in 1.0, optional
  fractional seconds in 1.1 — both parsed;
* Common Crawl compresses each record as its own gzip MEMBER so
  readers can split archives; Python's zlib/gzip consume multi-member
  streams natively, so ``.warc.gz`` content is handled transparently
  (magic-byte sniff, not extension).

``response`` records carry an HTTP response as payload; with
``http_unwrap=True`` (default) the HTTP status line + headers are
stripped and ``html`` is the body alone, which is the corpus-table
contract (input_hint: html:binary).  Other record types (request,
metadata, warcinfo) pass through unwrapped — filter on ``warc_type``.
"""

from __future__ import annotations

import datetime
import gzip
from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

_OUT_SCHEMA = pa.schema([
    ("src_file", pa.string()),
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("warc_type", pa.string()),
    ("html", pa.binary()),
    ("body_length", pa.int64()),
])

_OUT_DDL = ("src_file string, url string, warc_ts timestamp, "
            "warc_type string, html binary, body_length bigint")


def _parse_warc_date(s: str) -> datetime.datetime | None:
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1]
    for fmt in ("%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S"):
        try:
            return datetime.datetime.strptime(s, fmt)
        except ValueError:
            continue
    return None


def _resync(buf: bytes, start: int, stats: dict, from_pos: int) -> int:
    """Scan forward from ``start`` for the next record anchor and
    account the skipped bytes.  An anchor is ``WARC/`` followed by a
    version-line shape (digits/dots then CRLF, e.g. ``WARC/1.0\\r\\n``)
    — the shape check rejects a literal "WARC/" inside skipped payload
    bytes; a surviving false anchor only fails header parsing and
    resyncs again, strictly forward.  Returns the anchor offset, or
    len(buf) when none remains (tail counted as truncated)."""
    i = start
    while True:
        i = buf.find(b"WARC/", i)
        if i < 0:
            stats["truncated"] += 1
            stats["bytes_skipped"] += len(buf) - from_pos
            return len(buf)
        eol = buf.find(b"\r\n", i + 5, i + 12)
        if eol > i + 5 and \
                all(c in b"0123456789." for c in buf[i + 5:eol]):
            stats["resyncs"] += 1
            stats["bytes_skipped"] += i - from_pos
            return i
        i += 5


def parse_warc_records(buf: bytes, http_unwrap: bool = True,
                       strict: bool = False,
                       stats: dict | None = None) -> Iterator[dict]:
    """Yield ``{url, warc_ts, warc_type, html, body_length}`` per
    record of one WARC archive (bytes).  Gzip (including Common
    Crawl's record-per-member framing) is sniffed and decompressed.

    Malformed records raise under ``strict``; otherwise the parser
    RESYNCS — it scans forward for the next ``WARC/`` line anchor so
    one corrupt record (bad/missing Content-Length, garbage between
    records) cannot silently drop every well-formed record after it
    in a 10^5-file ingest.  Pass ``stats`` (a dict) to receive the
    audit counts: ``resyncs``, ``bytes_skipped``, ``truncated``;
    :func:`warc_audit` surfaces the same counts distributedly."""
    if stats is None:
        stats = {}
    stats.setdefault("resyncs", 0)
    stats.setdefault("bytes_skipped", 0)
    stats.setdefault("truncated", 0)
    if buf[:2] == b"\x1f\x8b":
        buf = gzip.decompress(buf)  # multi-member streams supported
    pos, n = 0, len(buf)
    while pos < n:
        # tolerate stray separators between records
        while pos < n and buf[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            if strict:
                raise ValueError(f"not a WARC record at offset {pos}")
            pos = _resync(buf, pos, stats, pos)
            continue
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            # no complete header remains anywhere past pos
            if strict:
                raise ValueError("truncated WARC header")
            stats["truncated"] += 1
            stats["bytes_skipped"] += n - pos
            return
        headers: dict[str, str] = {}
        lines = buf[pos:hdr_end].split(b"\r\n")
        for ln in lines[1:]:  # lines[0] is the version line
            k, sep, v = ln.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = \
                    v.strip().decode("utf-8", "replace")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            if strict:
                raise ValueError("WARC record without Content-Length")
            pos = _resync(buf, hdr_end + 4, stats, pos)
            continue
        if clen < 0:
            # a negative length would move the cursor BACKWARDS and
            # re-parse the same record forever — one crafted/corrupt
            # record must not wedge an executor
            if strict:
                raise ValueError(f"negative Content-Length {clen}")
            pos = _resync(buf, hdr_end + 4, stats, pos)
            continue
        body_start = hdr_end + 4
        if body_start + clen > n:
            # truncated archive OR a lying Content-Length: a later
            # anchor means the length was garbage — resync to it
            if strict:
                raise ValueError("truncated WARC payload")
            pos = _resync(buf, body_start, stats, pos)
            continue
        payload = buf[body_start:body_start + clen]
        pos = body_start + clen
        wtype = headers.get("warc-type", "")
        url = headers.get("warc-target-uri", "") or None
        if url and url.startswith("<") and url.endswith(">"):
            url = url[1:-1]
        body = payload
        if http_unwrap and wtype == "response" \
                and payload[:5] == b"HTTP/":
            cut = payload.find(b"\r\n\r\n")
            if cut >= 0:
                body = payload[cut + 4:]
        yield {"url": url,
               "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
               "warc_type": wtype, "html": body,
               "body_length": len(body)}


def read_warc(spark: SparkSession, path: str,
              http_unwrap: bool = True,
              record_types: tuple = ("response",)) -> DataFrame:
    """Distributed WARC ingest: one row per record of every archive
    under ``path`` (a binaryFile glob — ``.warc`` and ``.warc.gz``
    mix freely).  Returns (src_file, url, warc_ts, warc_type,
    html, body_length); pass ``record_types=None`` to keep request/
    metadata/warcinfo records too."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def parse_files(batches: Iterator[pa.RecordBatch]) \
            -> Iterator[pa.RecordBatch]:
        for batch in batches:
            paths = batch.column(0).to_pylist()
            blobs = batch.column(1).to_pylist()
            rows: dict[str, list] = {f.name: [] for f in _OUT_SCHEMA}
            for p, blob in zip(paths, blobs):
                for rec in parse_warc_records(blob, http_unwrap):
                    if record_types is not None \
                            and rec["warc_type"] not in record_types:
                        continue
                    rows["src_file"].append(p)
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(rec["warc_ts"])
                    rows["warc_type"].append(rec["warc_type"])
                    rows["html"].append(rec["html"])
                    rows["body_length"].append(rec["body_length"])
            if rows["src_file"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(rows[f.name], type=f.type)
                     for f in _OUT_SCHEMA],
                    schema=_OUT_SCHEMA)

    return files.mapInArrow(parse_files, _OUT_DDL)


_AUDIT_SCHEMA = pa.schema([
    pa.field("src_file", pa.string()),
    pa.field("records", pa.int64()),
    pa.field("resyncs", pa.int64()),
    pa.field("bytes_skipped", pa.int64()),
    pa.field("truncated", pa.int64()),
])
_AUDIT_DDL = ("src_file string, records bigint, resyncs bigint, "
              "bytes_skipped bigint, truncated bigint")


def warc_audit(spark: SparkSession, path: str) -> DataFrame:
    """Data-loss audit for a WARC ingest: one row per archive with the
    record count and the non-strict parser's resync/skip accounting
    (``resyncs``, ``bytes_skipped``, ``truncated``).  Run it over the
    same glob as :func:`read_warc` to quantify exactly what a 10^5-file
    ingest silently skipped; an all-zero audit proves the ingest was
    lossless.  Same parallelism unit as read_warc (one task per
    archive via binaryFile)."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def audit_files(batches: Iterator[pa.RecordBatch]) \
            -> Iterator[pa.RecordBatch]:
        for batch in batches:
            paths = batch.column(0).to_pylist()
            blobs = batch.column(1).to_pylist()
            rows: dict[str, list] = {f.name: [] for f in _AUDIT_SCHEMA}
            for p, blob in zip(paths, blobs):
                st: dict = {}
                n_rec = sum(1 for _ in parse_warc_records(
                    blob, http_unwrap=False, stats=st))
                rows["src_file"].append(p)
                rows["records"].append(n_rec)
                rows["resyncs"].append(st["resyncs"])
                rows["bytes_skipped"].append(st["bytes_skipped"])
                rows["truncated"].append(st["truncated"])
            if rows["src_file"]:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(rows[f.name], type=f.type)
                     for f in _AUDIT_SCHEMA],
                    schema=_AUDIT_SCHEMA)

    return files.mapInArrow(audit_files, _AUDIT_DDL)


def write_warc_bytes(records: list[dict], http_wrap: bool = True,
                     per_record_gzip: bool = False) -> bytes:
    """Deterministic WARC writer (tests/fixtures; also the honest
    inverse proof for the parser).  ``records``: dicts with url
    (str), ts (datetime), body (bytes).  ``per_record_gzip`` emits
    Common Crawl's record-per-gzip-member framing."""
    out = []
    for r in records:
        body = r["body"]
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                   b"\r\n" + body) if http_wrap else body
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: response\r\n"
               f"WARC-Target-URI: {r['url']}\r\n"
               f"WARC-Date: {r['ts'].strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
               f"Content-Length: {len(payload)}\r\n\r\n"
               ).encode("ascii")
        rec = hdr + payload + b"\r\n\r\n"
        if per_record_gzip:
            rec = gzip.compress(rec, 6)  # one gzip MEMBER per record
        out.append(rec)
    return b"".join(out)
