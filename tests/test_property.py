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


@settings(**SETTINGS)
@given(st.text(min_size=1, max_size=24))
def test_prefix_upper_dominates_every_extension(p):
    """Every string with prefix p sorts strictly below _prefix_upper(p)
    (code-point AND utf-8 byte order), and p itself sorts below it —
    the invariant LIKE-prefix zone pruning rests on."""
    from parquet_spark.engine import _prefix_upper
    up = _prefix_upper(p)
    if up is None:
        assert all(ord(c) == 0x10FFFF for c in p)
        return
    for suffix in ("", "a", "\x00", "\U0010ffff" * 2, p):
        s = p + suffix
        assert s < up
        assert s.encode("utf-8") < up.encode("utf-8")
    # tightness: the bound is itself a valid string with no prefix p
    # shorter than it (it differs from p within len(p) chars)
    assert not up.startswith(p)


@settings(**SETTINGS)
@given(st.dictionaries(st.sampled_from(list("abcdefgh")),
                       st.floats(0.0, 10.0), min_size=1, max_size=8),
       st.dictionaries(st.sampled_from(list("abcdefgh")),
                       st.integers(1, 500), min_size=8, max_size=8),
       st.integers(1, 2000))
def test_mix_domains_water_fill_invariants(weights, counts, budget):
    """Driver-side water-filling algebra: allocations never exceed
    availability, the budget is exhausted exactly when supply allows,
    and zero-weight domains get nothing."""
    from parquet_spark.textops.sampling import _water_fill
    weights = {k: v for k, v in weights.items() if k in counts}
    alloc = _water_fill(weights, counts, budget)
    if not alloc:
        return
    total_avail = sum(counts[k] for k in alloc)
    for k, a in alloc.items():
        assert -1e-9 <= a <= counts[k] + 1e-9
    got = sum(alloc.values())
    want = min(float(budget), float(total_avail))
    assert abs(got - want) < 1e-6 * max(1.0, want)


def _mk_sketch(hashes, k):
    hs = sorted(set(hashes))[:k]
    return {"k": k, "hashes": hs, "exact": len(hs) < k}


@given(st.lists(st.integers(-2**63, 2**63 - 1), max_size=60),
       st.lists(st.integers(-2**63, 2**63 - 1), max_size=60),
       st.lists(st.integers(-2**63, 2**63 - 1), max_size=60),
       st.integers(2, 16))
def test_kmv_merge_algebra(a, b, c, k):
    """Merge is commutative, associative, idempotent, and equals the
    sketch of the concatenated input — the property that makes
    per-split sketches roll up losslessly."""
    from parquet_spark.sketch import kmv_merge
    sa, sb, sc = (_mk_sketch(x, k) for x in (a, b, c))
    ab = kmv_merge(sa, sb)
    assert ab["hashes"] == kmv_merge(sb, sa)["hashes"]
    assert kmv_merge(ab, sc)["hashes"] == \
        kmv_merge(sa, kmv_merge(sb, sc))["hashes"]
    assert kmv_merge(sa, sa)["hashes"] == sa["hashes"]
    # merge of truncated parts == truncation of the union ONLY when the
    # parts are untruncated sketches of disjoint/overlapping data; with
    # pre-truncated parts the union sketch is still a superset-safe
    # bottom-k: every merged hash is among the true union's smallest
    union = _mk_sketch(a + b + c, k)
    merged_all = kmv_merge(sa, sb, sc)
    assert set(merged_all["hashes"]) <= set(sorted(set(a + b + c)))
    if all(s["exact"] for s in (sa, sb, sc)):
        assert merged_all["hashes"] == union["hashes"]


@given(st.integers(2, 64), st.integers(0, 4096))
def test_kmv_estimate_monotone_nonneg(k, n):
    """Estimates are non-negative, exact below k, and grow with a
    denser bottom-k (smaller k-th hash => larger estimate)."""
    from parquet_spark.sketch import kmv_estimate
    import random
    rnd = random.Random(k * 7919 + n)
    hs = sorted(rnd.sample(range(-2**40, 2**40), min(n, k)))
    s = {"k": k, "hashes": hs, "exact": len(hs) < k}
    est = kmv_estimate(s)
    assert est >= 0.0
    if len(hs) < k:
        assert est == float(len(hs))
    else:
        tighter = {"k": k, "hashes": [h - 2**41 for h in hs],
                   "exact": False}
        assert kmv_estimate(tighter) >= est
