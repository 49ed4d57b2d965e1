"""Property-based round-trip tests (hypothesis) for the codec layer.

The reference's oracle is decode-what-you-encoded equality; here the
inputs are adversarial rather than golden: arbitrary byte blobs, int
patterns, and string lists must round-trip bit-identically through
every codec path the auto-selector can take.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from parquet_spark.codecs import (decode_column, decode_int64, encode_column,
                                  encode_int64, fsst)

SETTINGS = dict(max_examples=60, deadline=None)


@settings(**SETTINGS)
@given(st.binary(min_size=0, max_size=4096))
def test_fsst_roundtrip_any_bytes(buf):
    table = fsst.train(buf)
    assert fsst.decode(fsst.encode(buf, table)) == buf


@settings(**SETTINGS)
@given(st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                min_size=0, max_size=500))
def test_int_stream_roundtrip_any_ints(vals):
    arr = np.array(vals, dtype=np.int64)
    np.testing.assert_array_equal(decode_int64(encode_int64(arr)), arr)


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.text(max_size=60)),
                min_size=0, max_size=300))
def test_column_string_roundtrip_any(vals):
    arr = pa.array(vals, type=pa.string())
    name, payload = encode_column(arr)
    assert decode_column(payload, pa.string()).equals(arr)


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.binary(max_size=80)),
                min_size=0, max_size=200))
def test_column_binary_roundtrip_any(vals):
    arr = pa.array(vals, type=pa.binary())
    name, payload = encode_column(arr)
    assert decode_column(payload, pa.binary()).equals(arr)


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(),
                          st.floats(allow_nan=True, allow_infinity=True)),
                min_size=0, max_size=300))
def test_column_float_roundtrip_any(vals):
    arr = pa.array(vals, type=pa.float64())
    name, payload = encode_column(arr)
    out = decode_column(payload, pa.float64())
    # NaNs break equals(); compare bit patterns through pandas round trip
    a = arr.to_pandas().to_numpy(dtype=np.float64)
    b = out.to_pandas().to_numpy(dtype=np.float64)
    np.testing.assert_array_equal(a.view(np.int64), b.view(np.int64))
    assert arr.is_null().equals(out.is_null())


@settings(**SETTINGS)
@given(st.lists(st.sampled_from(["en", "de", "fr", None]),
                min_size=0, max_size=400))
def test_column_low_cardinality_roundtrip(vals):
    arr = pa.array(vals, type=pa.string())
    name, payload = encode_column(arr)
    assert decode_column(payload, pa.string()).equals(arr)


@settings(**SETTINGS)
@given(st.binary(min_size=64, max_size=4096),
       st.integers(min_value=0, max_value=255))
def test_fsst_escape_mode_any_bytes(buf, filler):
    """Force escape-mode consideration: append the full alphabet so no
    byte value is free, plus a run of an arbitrary filler byte."""
    buf = buf + bytes(range(256)) + bytes([filler] * 7)
    table = fsst.train(buf)
    assert fsst.decode(fsst.encode(buf, table)) == buf


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(),
                          st.decimals(min_value=-10**20, max_value=10**20,
                                      places=4, allow_nan=False,
                                      allow_infinity=False)),
                min_size=0, max_size=200))
def test_column_decimal_roundtrip_any(vals):
    arr = pa.array(vals, type=pa.decimal128(30, 4))
    name, payload = encode_column(arr)
    assert decode_column(payload, arr.type).equals(arr)


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)),
                min_size=0, max_size=120),
       st.sampled_from(["auto", "none", "zstd", "snappy", "lz4",
                        "gzip", "brotli"]))
def test_column_roundtrip_every_block_codec(vals, spec):
    from parquet_spark.codecs.column import block_codecs_available
    if spec not in ("auto", "none") and spec not in block_codecs_available():
        return
    arr = pa.array(vals, type=pa.string())
    name, payload = encode_column(arr, block_codec=spec)
    assert decode_column(payload, pa.string()).equals(arr)


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(),
                          st.lists(st.integers(-2**31, 2**31 - 1),
                                   max_size=20)),
                min_size=0, max_size=100))
def test_column_list_roundtrip_any(vals):
    arr = pa.array(vals, type=pa.list_(pa.int64()))
    name, payload = encode_column(arr)
    assert decode_column(payload, arr.type).equals(arr)
