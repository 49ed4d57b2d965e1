"""Round-trip verifier — the engine's correctness oracle.

Mirrors the reference test suite's decode-what-you-encoded model
(/root/reference/Parquet.Tests/Reader.cs, FragmentTests.cs:100-107):
every encoded partition is decoded and asserted bit-identical, plus the
north-rule per-url contract: byte-identical `text` per `url`
(BASELINE.json:6,15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def verify_roundtrip(original: DataFrame, decoded: DataFrame,
                     key: list[str] | None = None,
                     digest_col: str | None = None) -> dict:
    """Assert decoded == original (order-insensitive, null-safe).

    Returns a report dict; raises AssertionError on any mismatch.
    """
    n_orig = original.count()
    n_dec = decoded.count()
    assert n_orig == n_dec, f"row count {n_orig} != {n_dec}"

    extra = decoded.exceptAll(original).count()
    missing = original.exceptAll(decoded).count()
    assert extra == 0 and missing == 0, \
        f"multiset mismatch: extra={extra} missing={missing}"

    report = {"rows": n_orig, "extra": extra, "missing": missing}

    if key and digest_col:
        o = original.select(*key, F.sha2(F.col(digest_col).cast("binary"), 256)
                            .alias("_d"))
        d = decoded.select(*key, F.sha2(F.col(digest_col).cast("binary"), 256)
                           .alias("_d"))
        bad = (o.alias("o").join(d.alias("d"), on=key, how="full")
               .where(~F.col("o._d").eqNullSafe(F.col("d._d"))).count())
        assert bad == 0, f"{bad} per-key digest mismatches on {digest_col}"
        report["digest_mismatches"] = bad
    return report
