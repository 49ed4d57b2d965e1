"""WARC (ISO 28500) source: parser inverse, gzip member framing,
HTTP unwrapping, distributed read, malformed tails."""

import datetime
import gzip
import os

import pytest
from pyspark.sql import functions as F

from parquet_spark.warc import (parse_warc_records, read_warc,
                                write_warc_bytes)


def _recs(n, base=0):
    t0 = datetime.datetime(2020, 1, 1)
    return [{"url": f"https://ex.org/{base + i}",
             "ts": t0 + datetime.timedelta(seconds=base + i),
             "body": f"<html>doc {base + i} é</html>".encode()}
            for i in range(n)]


def test_parser_inverts_writer_plain_and_gzip():
    recs = _recs(7)
    for gz in (False, True):
        buf = write_warc_bytes(recs, per_record_gzip=gz)
        got = list(parse_warc_records(buf))
        assert len(got) == 7
        for r, g in zip(recs, got):
            assert g["url"] == r["url"]
            assert g["warc_ts"] == r["ts"]
            assert g["html"] == r["body"]
            assert g["warc_type"] == "response"
            assert g["body_length"] == len(r["body"])


def test_parser_edges():
    recs = _recs(3)
    buf = write_warc_bytes(recs)
    # no unwrap: payload keeps the HTTP envelope
    raw = list(parse_warc_records(buf, http_unwrap=False))
    assert raw[0]["html"].startswith(b"HTTP/1.1 200 OK")
    # truncated tail: lenient skips, strict raises
    cut = buf[:len(buf) - 10]
    assert len(list(parse_warc_records(cut))) == 2
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_records(cut, strict=True))
    # garbage prefix: lenient yields nothing, strict raises
    assert list(parse_warc_records(b"PK\x03\x04junk")) == []
    with pytest.raises(ValueError, match="not a WARC"):
        list(parse_warc_records(b"NOPE", strict=True))
    # angle-bracket URI + fractional 1.1 date
    one = (b"WARC/1.1\r\nWARC-Type: metadata\r\n"
           b"WARC-Target-URI: <https://x.y/z>\r\n"
           b"WARC-Date: 2021-06-01T10:20:30.500000Z\r\n"
           b"Content-Length: 2\r\n\r\nhi\r\n\r\n")
    g = list(parse_warc_records(one))[0]
    assert g["url"] == "https://x.y/z" and g["warc_type"] == "metadata"
    assert g["warc_ts"] == datetime.datetime(2021, 6, 1, 10, 20, 30,
                                             500000)


def test_parser_resyncs_past_malformed_records():
    """One corrupt record must not drop the rest of the archive: the
    non-strict parser scans to the next WARC/ anchor and accounts the
    loss in `stats` (ADVICE r04: no silent mid-archive truncation)."""
    good = _recs(3)
    a, b, c = (write_warc_bytes([r]) for r in good)
    # (1) garbage BETWEEN records
    st = {}
    got = list(parse_warc_records(a + b"\x00GARBAGE\x00" + b + c,
                                  stats=st))
    assert [g["url"] for g in got] == [r["url"] for r in good]
    assert st["resyncs"] == 1 and st["bytes_skipped"] > 0
    assert st["truncated"] == 0
    # (2) non-numeric Content-Length in the middle record
    bad = b.replace(b"Content-Length: ", b"Content-Length: xx")
    st = {}
    got = list(parse_warc_records(a + bad + c, stats=st))
    assert [g["url"] for g in got] == [good[0]["url"], good[2]["url"]]
    assert st["resyncs"] == 1
    # (3) lying (too-large) Content-Length swallows into the next
    # record; resync recovers the third
    lying = b.replace(b"Content-Length: ",
                      b"Content-Length: 99999\r\nX-Pad: ")
    st = {}
    got = list(parse_warc_records(a + lying + c, stats=st))
    assert good[2]["url"] in [g["url"] for g in got]
    # (4) strict still raises at the first malformed record
    with pytest.raises(ValueError):
        list(parse_warc_records(a + bad + c, strict=True))
    # (5) clean archive audits all-zero
    st = {}
    assert len(list(parse_warc_records(a + b + c, stats=st))) == 3
    assert st == {"resyncs": 0, "bytes_skipped": 0, "truncated": 0}


@pytest.mark.spark
def test_warc_audit_distributed(spark, tmp_path):
    from parquet_spark.warc import warc_audit
    clean = write_warc_bytes(_recs(4))
    dirty = (write_warc_bytes(_recs(2, base=50)) + b"\xffJUNK\xff"
             + write_warc_bytes(_recs(1, base=60)))
    (tmp_path / "clean.warc").write_bytes(clean)
    (tmp_path / "dirty.warc").write_bytes(dirty)
    rows = {os.path.basename(r.src_file.replace("file:", "")): r
            for r in warc_audit(spark,
                                str(tmp_path) + "/*.warc").collect()}
    assert rows["clean.warc"].records == 4
    assert rows["clean.warc"].resyncs == 0
    assert rows["clean.warc"].bytes_skipped == 0
    assert rows["dirty.warc"].records == 3
    assert rows["dirty.warc"].resyncs == 1
    assert rows["dirty.warc"].bytes_skipped > 0


@pytest.mark.spark
def test_read_warc_distributed(spark, tmp_path):
    # two archives, one plain + one gzip, plus a metadata record that
    # the default record_types filter drops
    a = write_warc_bytes(_recs(5))
    extra = (b"WARC/1.0\r\nWARC-Type: metadata\r\n"
             b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
             b"Content-Length: 3\r\n\r\nabc\r\n\r\n")
    (tmp_path / "a.warc").write_bytes(a + extra)
    (tmp_path / "b.warc.gz").write_bytes(
        write_warc_bytes(_recs(4, base=100), per_record_gzip=True))
    df = read_warc(spark, str(tmp_path) + "/*.warc*")
    rows = sorted(df.collect(), key=lambda r: r.url)
    assert len(rows) == 9
    assert all(r.warc_type == "response" for r in rows)
    assert rows[0].url == "https://ex.org/0"
    assert rows[0].html == "<html>doc 0 é</html>".encode()
    assert rows[0].warc_ts == datetime.datetime(2020, 1, 1)
    assert {os.path.basename(r.src_file.replace("file:", ""))
            for r in rows} == {"a.warc", "b.warc.gz"}
    # keep everything: the metadata record shows up
    df_all = read_warc(spark, str(tmp_path) + "/*.warc*",
                       record_types=None)
    assert df_all.count() == 10
    # ingest -> encode -> decode round-trip on the corpus contract
    import tempfile
    from parquet_spark.manifest import read_decoded, write_encoded
    from parquet_spark.verify import verify_roundtrip
    src = df.select("url", "warc_ts", "html",
                    F.col("body_length").alias("n_bytes"))
    tbl = tempfile.mkdtemp(prefix="warc_tbl_")
    write_encoded(src, tbl, key=["url"], n_parts=2, mode="range",
                  rows_per_chunk=4)
    dec = read_decoded(spark, tbl)
    verify_roundtrip(src, dec, key=["url"])
