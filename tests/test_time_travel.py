"""Time travel: snapshot_id reads over the commit chain.

Every commit keeps the full part manifest and lifecycle ops never
mutate or delete parent data files (until vacuum_table), so any
ancestor of CURRENT is readable — Iceberg-style snapshot isolation.
Reference analog: the single-file overwrite semantics the reference
tests at ResultListenerTests.cs:130-153 have no history at all; the
snapshot chain is this repo's upgrade of that contract.
"""

import os

import pytest
from pyspark.sql import functions as F

from parquet_spark.corpus import gen_corpus
from parquet_spark.manifest import (EncodedTable, compact_table, lineage_df,
                                    read_decoded, vacuum_table,
                                    write_encoded)

pytestmark = pytest.mark.spark


def _counts(df):
    r = df.agg(F.count(F.lit(1)).alias("n"),
               F.count_distinct(F.md5("text")).alias("d")).collect()[0]
    return r.n, r.d


def test_time_travel_across_compaction(spark, tmp_path):
    df = gen_corpus(spark, 1200, seed=31, parts=3)
    path = str(tmp_path / "tbl")
    s0 = write_encoded(df, path, key=["url"], n_parts=4, rows_per_chunk=100)
    before = _counts(read_decoded(spark, path))
    s1 = compact_table(spark, path, target_parts=1)
    assert (s0["snapshot_id"], s1["snapshot_id"]) == (0, 1)

    # CURRENT reads the compacted layout; snapshot 0 reads the original
    assert _counts(read_decoded(spark, path)) == before
    assert _counts(read_decoded(spark, path, snapshot_id=0)) == before
    t = EncodedTable(path)
    assert [s["snapshot_id"] for s in t.history()] == [0, 1]
    # files really differ between the two snapshots
    f0 = set(t.data_files(t.snapshot_at(0)))
    f1 = set(t.data_files(t.snapshot_at(1)))
    assert f0 and f1 and f0.isdisjoint(f1)
    # lineage at the old snapshot reports the old partition count
    assert lineage_df(spark, path, snapshot_id=0).count() == 4
    assert lineage_df(spark, path).count() == 1


def test_time_travel_sees_partial_resume_state(spark, tmp_path):
    df = gen_corpus(spark, 900, seed=37, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=4, limit_parts=2)
    n_partial = read_decoded(spark, path).count()
    write_encoded(df, path, key=["url"], n_parts=4)  # resume to complete
    assert read_decoded(spark, path).count() == 900
    # the killed run's committed state is still addressable
    assert read_decoded(spark, path, snapshot_id=0).count() == n_partial
    assert 0 < n_partial < 900


def test_snapshot_at_unknown_id_raises(spark, tmp_path):
    df = gen_corpus(spark, 300, seed=41, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=2)
    t = EncodedTable(path)
    with pytest.raises(ValueError, match="not an ancestor"):
        t.snapshot_at(7)


def test_orphan_snapshot_does_not_confuse_lineage(spark, tmp_path):
    """A losing racer leaves an orphan snap file with the SAME id as
    the winner; parent_name must keep the walk on the committed chain."""
    df = gen_corpus(spark, 400, seed=43, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=2)
    t = EncodedTable(path)
    s0 = t.current_snapshot()
    # forge an orphan with snapshot_id 0 and garbage parts
    orphan = os.path.join(path, "snapshots", "snap-000000-deadbeef.json")
    with open(orphan, "w") as f:
        f.write('{"snapshot_id": 0, "format_version": 2, '
                '"parent_id": null, "parts": {}}')
    compact_table(spark, path, target_parts=1)
    t2 = EncodedTable(path)
    hist = t2.history()
    assert [s["snapshot_id"] for s in hist] == [0, 1]
    # the walk resolved the REAL snapshot 0, not the orphan
    assert hist[0]["_snap_name"] == s0["_snap_name"]
    assert read_decoded(spark, path, snapshot_id=0).count() == 400


def test_vacuum_reclaims_time_travel(spark, tmp_path):
    df = gen_corpus(spark, 500, seed=47, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=3)
    t = EncodedTable(path)
    old_files = set(t.data_files(t.snapshot_at(0)))
    compact_table(spark, path, target_parts=1)
    removed = set(vacuum_table(path, grace_s=0.0))
    # vacuum removes exactly the files only snapshot 0 referenced
    assert removed == {os.path.abspath(f) for f in old_files}
    # CURRENT still reads fine; snapshot 0 is gone by design
    assert read_decoded(spark, path).count() == 500


def test_expire_snapshots_truncates_history(spark, tmp_path):
    """Three commits; expire with keep_last=2: snapshot 0's object goes
    (tombstoned), history/time-travel re-root at snapshot 1, CURRENT
    reads unchanged, fsck stays clean with no orphan complaints, and a
    follow-up vacuum reclaims snapshot 0's exclusive files."""
    from parquet_spark.fsck import fsck_table
    from parquet_spark.manifest import expire_snapshots

    df = gen_corpus(spark, 600, seed=53, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=3)          # snap 0
    t = EncodedTable(path)
    snap0_files = set(t.data_files(t.snapshot_at(0)))
    compact_table(spark, path, target_parts=2)               # snap 1
    compact_table(spark, path, target_parts=1)               # snap 2

    rep = expire_snapshots(path, keep_last=2, older_than_s=0.0)
    assert len(rep["expired"]) == 1 and rep["tombstone"]
    assert rep["orphans_removed"] == []

    t2 = EncodedTable(path)
    hist = [s["snapshot_id"] for s in t2.history()]
    assert hist == [1, 2]                  # chain re-rooted at snap 1
    with pytest.raises(ValueError):
        t2.snapshot_at(0)                  # that time travel is over
    assert read_decoded(spark, path).count() == 600
    assert read_decoded(spark, path, snapshot_id=1).count() == 600

    rep = fsck_table(path)
    assert rep["ok"] and not rep["orphan_snapshots"]
    assert not rep["broken_refs"]

    removed = set(vacuum_table(path, grace_s=0.0))
    assert {os.path.abspath(f) for f in snap0_files} <= removed
    assert read_decoded(spark, path).count() == 600


def test_expire_snapshots_protects_refs_and_grace(spark, tmp_path):
    """A tag on an old snapshot pins its whole chain; a young snapshot
    survives via the grace window; orphan racer jsons are swept."""
    import json as _json

    from parquet_spark.manifest import create_ref, expire_snapshots

    df = gen_corpus(spark, 300, seed=59, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=2)          # snap 0
    compact_table(spark, path, target_parts=1)               # snap 1
    create_ref(path, "pin", snapshot_id=0)
    compact_table(spark, path, target_parts=2)               # snap 2

    # keep_last=1 keeps only snap 2; the ref pins snap 0 (its chain is
    # just the root), so snap 1 — pinned by nothing — expires
    rep = expire_snapshots(path, keep_last=1, older_than_s=0.0)
    assert [n.startswith("snap-000001-") for n in rep["expired"]] == [True]
    assert [s["snapshot_id"] for s in
            EncodedTable(path).history()] == [2]
    # the pinned snapshot is still readable through its ref
    assert read_decoded(spark, path, ref="pin").count() == 300

    # grace window: everything is young -> nothing expires
    rep = expire_snapshots(path, keep_last=1, older_than_s=3600.0)
    assert rep["expired"] == [] and rep["orphans_removed"] == []

    # orphan snapshot json (losing racer) is swept once old enough
    t = EncodedTable(path)
    orphan = os.path.join(t.snap_dir, "snap-000099-deadbeef.json")
    with open(orphan, "w") as f:
        _json.dump({"snapshot_id": 99, "parts": {},
                    "format_version": 2}, f)
    os.utime(orphan, (0, 0))
    rep = expire_snapshots(path, keep_last=1, older_than_s=0.0)
    assert "snap-000099-deadbeef.json" in rep["orphans_removed"]
    assert not os.path.exists(orphan)


def test_rollback_restores_earlier_state(spark, tmp_path):
    """Write (snap 0) -> delete rows (snap 1) -> rollback to 0 (snap
    2): CURRENT shows the original data, the deleted state stays
    time-travelable, history keeps all three commits, and rolling back
    the rollback (to snap 1) restores the deleted state again."""
    from parquet_spark.manifest import delete_rows, rollback_table

    df = gen_corpus(spark, 400, seed=61, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=3)          # snap 0
    n0, d0 = _counts(read_decoded(spark, path))
    delete_rows(spark, path, [("lang", "in", ["en", "de"])])  # snap 1
    n1, _ = _counts(read_decoded(spark, path))
    assert n1 < n0

    snap = rollback_table(path, snapshot_id=0)               # snap 2
    assert snap["snapshot_id"] == 2
    assert snap["meta"]["rollback_of"]["snapshot_id"] == 0
    assert _counts(read_decoded(spark, path)) == (n0, d0)
    # history intact: the rolled-past delete is still travelable
    assert [s["snapshot_id"] for s in
            EncodedTable(path).history()] == [0, 1, 2]
    assert _counts(read_decoded(spark, path, snapshot_id=1))[0] == n1

    rollback_table(path, snapshot_id=1)                      # snap 3
    assert _counts(read_decoded(spark, path))[0] == n1
    # rollback to CURRENT's own state is a no-op, not an empty commit
    assert rollback_table(path, snapshot_id=3)["snapshot_id"] == 3
    assert [s["snapshot_id"] for s in
            EncodedTable(path).history()] == [0, 1, 2, 3]


def test_rollback_by_ref_and_vacuum_refusal(spark, tmp_path):
    """A tag names the known-good state to restore; after vacuum
    reclaims an unpinned ancestor's files, rolling back to it refuses
    loudly instead of committing dangling file references."""
    from parquet_spark.manifest import (create_ref, drop_ref,
                                        rollback_table)

    df = gen_corpus(spark, 300, seed=67, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=2)          # snap 0
    n0, d0 = _counts(read_decoded(spark, path))
    create_ref(path, "good", snapshot_id=0)
    compact_table(spark, path, target_parts=1)               # snap 1

    snap = rollback_table(path, ref="good")                  # snap 2
    assert snap["meta"]["rollback_of"]["snapshot_id"] == 0
    assert _counts(read_decoded(spark, path)) == (n0, d0)

    # drop the pin, compact away from snap 0's files, vacuum them
    drop_ref(path, "good")
    compact_table(spark, path, target_parts=2)               # snap 3
    vacuum_table(path, grace_s=0.0)
    with pytest.raises(ValueError, match="no longer exist"):
        rollback_table(path, snapshot_id=1)
    # CURRENT is untouched by the refused rollback
    assert _counts(read_decoded(spark, path)) == (n0, d0)


def test_expire_refuses_on_broken_ref(spark, tmp_path):
    """A ref whose snapshot object is unreadable means expiry cannot
    prove what the ref protects — it must refuse rather than sweep the
    ref's surviving ancestors as orphans."""
    import json as _json

    from parquet_spark.manifest import create_ref, expire_snapshots

    df = gen_corpus(spark, 200, seed=97, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=2)          # snap 0
    compact_table(spark, path, target_parts=1)               # snap 1
    create_ref(path, "pin", snapshot_id=0)
    rp = os.path.join(path, "refs", "pin.json")
    ref = _json.loads(open(rp).read())
    ref["snap_name"] = "snap-000000-00000000.json"           # lost object
    with open(rp, "w") as f:
        _json.dump(ref, f)

    with pytest.raises(ValueError, match="unreadable"):
        expire_snapshots(path, keep_last=1, older_than_s=0.0)


def test_expire_finishes_crashed_deletion(spark, tmp_path):
    """A tombstoned name still present on storage (crash between the
    tombstone write and the removal loop) is unreachable, excluded
    from the normal orphan sweep, and skipped by fsck — the next
    expire must finish the deletion."""
    from parquet_spark.manifest import expire_snapshots

    df = gen_corpus(spark, 200, seed=101, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=2)          # snap 0
    compact_table(spark, path, target_parts=1)               # snap 1
    compact_table(spark, path, target_parts=2)               # snap 2
    compact_table(spark, path, target_parts=1)               # snap 3
    t = EncodedTable(path)
    snap0_name = t.snapshot_at(0)["_snap_name"]
    snap0_bytes = open(os.path.join(t.snap_dir, snap0_name), "rb").read()

    rep = expire_snapshots(path, keep_last=2, older_than_s=0.0)
    assert snap0_name in rep["expired"]
    # simulate the crash: the tombstone landed but this delete did not
    with open(os.path.join(t.snap_dir, snap0_name), "wb") as f:
        f.write(snap0_bytes)
    os.utime(os.path.join(t.snap_dir, snap0_name), (0, 0))

    rep = expire_snapshots(path, keep_last=2, older_than_s=0.0)
    assert snap0_name in rep["orphans_removed"]
    assert not os.path.exists(os.path.join(t.snap_dir, snap0_name))


def test_parent_tombstone_outranks_racer_orphan(spark, tmp_path):
    """Legacy snapshot (no parent_name) whose true parent was expired:
    a surviving same-id racer orphan must NOT be adopted as the parent
    — the tombstone ends the history."""
    import json as _json

    from parquet_spark.manifest import expire_snapshots

    df = gen_corpus(spark, 200, seed=103, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=2)          # snap 0
    compact_table(spark, path, target_parts=1)               # snap 1
    t = EncodedTable(path)
    cur_name = t._current_name()
    snap_path = os.path.join(t.snap_dir, cur_name)
    snap = _json.loads(open(snap_path).read())
    del snap["parent_name"]                                  # legacy form
    with open(snap_path, "w") as f:
        _json.dump(snap, f)

    expire_snapshots(path, keep_last=1, older_than_s=0.0)    # snap 0 gone
    # a losing racer's same-id orphan survives (too young to sweep)
    fake = os.path.join(t.snap_dir, "snap-000000-deadbeef.json")
    with open(fake, "w") as f:
        _json.dump({"snapshot_id": 0, "parts": {}, "format_version": 2,
                    "meta": {}}, f)

    hist = [s["snapshot_id"] for s in EncodedTable(path).history()]
    assert hist == [1]  # end-of-history, not the racer's lineage


def test_rollback_handles_legacy_delete_file_strings(spark, tmp_path):
    """Older builds stored meta.delete_files as bare path strings; the
    rollback dangling-file check must accept both forms."""
    import json as _json

    from parquet_spark.manifest import delete_rows, rollback_table

    df = gen_corpus(spark, 200, seed=107, parts=2)
    path = str(tmp_path / "tbl")
    write_encoded(df, path, key=["url"], n_parts=2)          # snap 0
    delete_rows(spark, path, [("lang", "in", ["en"])])       # snap 1
    compact_table(spark, path, target_parts=1)               # snap 2 (applies)
    t = EncodedTable(path)
    snap1_name = t.snapshot_at(1)["_snap_name"]
    sp = os.path.join(t.snap_dir, snap1_name)
    snap = _json.loads(open(sp).read())
    snap["meta"]["delete_files"] = [
        d["path"] for d in snap["meta"]["delete_files"]]     # legacy form
    with open(sp, "w") as f:
        _json.dump(snap, f)

    n1 = read_decoded(spark, path, snapshot_id=1).count()
    snap = rollback_table(path, snapshot_id=1)               # no TypeError
    assert snap["meta"]["rollback_of"]["snapshot_id"] == 1
    assert read_decoded(spark, path).count() == n1
