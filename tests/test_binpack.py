"""Incremental bin-pack compaction (`manifest.compact_small_parts`,
the Iceberg rewrite_data_files binpack analog): rewrite only
undersized parts, carry healthy parts by reference.

The scale rationale under test: a maintenance pass whose cost is
proportional to the day's fragmentation, not the table — carried
parts must move into the new snapshot with their file, hash, and
zone metadata byte-identical (no read, no rewrite).
"""

import os

import pytest
from pyspark.sql import functions as F

from parquet_spark.corpus import gen_corpus
from parquet_spark.manifest import (EncodedTable, compact_small_parts,
                                    read_decoded, vacuum_table,
                                    write_encoded)

pytestmark = pytest.mark.spark


def _sizes(snap):
    return {pid: int(p["bytes_out"]) for pid, p in snap["parts"].items()}


def test_binpack_rewrites_only_small_parts(spark, tmp_path):
    """Skewed hash layout (key=lang) gives unequal part sizes; binpack
    with a threshold between them must rewrite exactly the small parts
    into fewer bins, carry the big part file/hash/zones verbatim,
    preserve the decoded relation, and leave the pre-binpack snapshot
    time-travelable until vacuum."""
    df = gen_corpus(spark, 1200, seed=71, parts=4)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["lang"], n_parts=4)         # snap 0
    t = EncodedTable(path)
    snap0 = t.current_snapshot()
    sizes = _sizes(snap0)
    assert len(sizes) >= 3
    big = max(sizes.values())
    small_ids = [pid for pid, b in sizes.items() if b < big]
    assert len(small_ids) >= 2, sizes  # lang skew must give a mix
    big_ids = [pid for pid, b in sizes.items() if b == big]

    before = read_decoded(spark, path).orderBy("url").collect()
    snap = compact_small_parts(spark, path, small_bytes=big,
                               target_bytes=1 << 30)          # snap 1
    assert snap["snapshot_id"] == 1
    bp = snap["meta"]["binpack"]
    assert bp["rewrote"] == len(small_ids)
    assert bp["carried"] == len(big_ids)
    assert bp["bins"] == 1  # giant target -> one packed output

    # carried parts move by reference: identical file, hash, zones
    for pid in big_ids:
        assert snap["parts"][pid] == snap0["parts"][pid]
    # rewritten ids are fresh (offset past every old id)
    new_ids = set(snap["parts"]) - set(big_ids)
    assert all(int(i) > max(int(p) for p in sizes) for i in new_ids)
    for pid in new_ids:
        assert "binpack-000001-" in snap["parts"][pid]["file"]

    after = read_decoded(spark, path).orderBy("url").collect()
    assert after == before
    # pre-binpack snapshot still readable, then vacuum reclaims the
    # small originals but never the carried file
    assert read_decoded(spark, path, snapshot_id=0).count() == 1200
    removed = set(vacuum_table(path, grace_s=0.0))
    assert {os.path.abspath(snap0["parts"][p]["file"])
            for p in small_ids} <= removed
    assert not any(snap0["parts"][p]["file"] in r
                   for p in big_ids for r in removed)
    assert read_decoded(spark, path).count() == 1200


def test_binpack_noop_and_terminal_layout(spark, tmp_path):
    """Fewer than two small parts = no commit at all; after a real
    binpack the layout is 'compacted', so key-addressed resume appends
    are refused (part ids no longer mean hash buckets)."""
    df = gen_corpus(spark, 400, seed=73, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=3)          # snap 0

    # threshold below every part: nothing is small, snapshot unchanged
    snap = compact_small_parts(spark, path, small_bytes=1)
    assert snap["snapshot_id"] == 0
    assert [s["snapshot_id"] for s in
            EncodedTable(path).history()] == [0]

    snap = compact_small_parts(spark, path, small_bytes=1 << 30,
                               target_bytes=1 << 30,
                               rechunk=True)                 # snap 1
    assert snap["meta"]["binpack"]["rewrote"] == 3
    assert snap["meta"]["layout"]["mode"] == "compacted"
    assert read_decoded(spark, path).count() == 400

    more = gen_corpus(spark, 100, seed=74, parts=1)
    with pytest.raises(ValueError, match="layout"):
        write_encoded(more, path, key=["url"], n_parts=3)


def test_maintain_table_full_pass(spark, tmp_path):
    """The one-call maintenance choreography: binpack -> expire ->
    vacuum -> fsck.  After the pass the table reads identically, the
    binpacked originals and expired snapshots are gone, and fsck is
    clean."""
    from parquet_spark.manifest import maintain_table

    df = gen_corpus(spark, 900, seed=109, parts=3)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["lang"], n_parts=4)         # snap 0
    t = EncodedTable(path)
    n_files_before = len(t.data_files())

    rep = maintain_table(spark, path,
                         binpack_small_bytes=1 << 30,
                         binpack_target_bytes=1 << 30,
                         expire_keep_last=1, older_than_s=0.0,
                         vacuum_grace_s=0.0)
    assert rep["binpack"]["rewrote"] == n_files_before
    assert len(rep["expire"]["expired"]) == 1       # snap 0 aged out
    assert rep["vacuumed"]                          # originals reclaimed
    assert rep["fsck"]["ok"] and not rep["fsck"]["orphan_snapshots"]
    assert read_decoded(spark, path).count() == 900
    assert [s["snapshot_id"] for s in
            EncodedTable(path).history()] == [1]

    # knobs default to None/True: a metadata-only pass is a safe no-op
    rep = maintain_table(spark, path, vacuum_grace_s=3600.0)
    assert rep["binpack"] is None and rep["expire"] is None
    assert rep["vacuumed"] == [] and rep["fsck"]["ok"]
    assert read_decoded(spark, path).count() == 900
