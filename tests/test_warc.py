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
