"""Write-audit-publish branches: staged commits invisible to readers
until an atomic fast-forward publish.

Reference analog: the reference publishes results the moment the file
write finishes (ParquetResultListener.cs); WAP inserts the audit step a
training-data pipeline needs — stage, run quality gates against the
branch, publish or abandon — with the same CAS commit machinery.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from parquet_spark.manifest import (ConcurrentCommitError,
                                    ConditionalPutCommitBackend,
                                    EncodedTable, create_ref, drop_ref,
                                    publish_branch, read_decoded,
                                    vacuum_table, write_encoded)


def _docs(spark, lo, hi):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .where(F.col("doc_id").between(lo, hi - 1)))


@pytest.mark.spark
def test_staged_branch_invisible_until_publish(spark):
    d1, d2 = _docs(spark, 0, 200), _docs(spark, 200, 400)
    tbl = tempfile.mkdtemp(prefix="wap_")
    write_encoded(d1, tbl, key=["doc_id"], n_parts=2)
    cur0 = EncodedTable(tbl)._current_name()
    # stage onto a branch: CURRENT must not move
    write_encoded(d2, tbl, key=["doc_id"], n_parts=2, part_offset=2,
                  branch="audit")
    assert EncodedTable(tbl)._current_name() == cur0
    assert read_decoded(spark, tbl).count() == d1.count()
    # the branch reader sees the staged state (audit surface)
    staged = read_decoded(spark, tbl, ref="audit")
    assert staged.count() == d1.count() + d2.count()
    # publish fast-forwards atomically; the audited rows go live
    snap = publish_branch(tbl, "audit")
    assert EncodedTable(tbl)._current_name() == snap["_snap_name"]
    assert read_decoded(spark, tbl).count() == d1.count() + d2.count()
    # repeat publish is a no-op
    assert publish_branch(tbl, "audit")["_snap_name"] == \
        snap["_snap_name"]


@pytest.mark.spark
def test_branch_chains_multiple_staged_commits(spark):
    d1, d2, d3 = (_docs(spark, 0, 100), _docs(spark, 100, 200),
                  _docs(spark, 200, 300))
    tbl = tempfile.mkdtemp(prefix="wap_chain_")
    write_encoded(d1, tbl, key=["doc_id"], n_parts=1)
    write_encoded(d2, tbl, key=["doc_id"], n_parts=1, part_offset=1,
                  branch="b")
    write_encoded(d3, tbl, key=["doc_id"], n_parts=1, part_offset=2,
                  branch="b")
    assert read_decoded(spark, tbl, ref="b").count() == 300
    assert read_decoded(spark, tbl).count() == 100
    publish_branch(tbl, "b")
    t = EncodedTable(tbl)
    assert read_decoded(spark, tbl).count() == 300
    # the staged chain is now ordinary published history (time travel)
    ids = [s["snapshot_id"] for s in t.history()]
    assert ids == [0, 1, 2]


@pytest.mark.spark
def test_publish_refuses_non_fast_forward(spark):
    d1, d2, d3 = (_docs(spark, 0, 100), _docs(spark, 100, 200),
                  _docs(spark, 200, 300))
    tbl = tempfile.mkdtemp(prefix="wap_ff_")
    write_encoded(d1, tbl, key=["doc_id"], n_parts=1)
    write_encoded(d2, tbl, key=["doc_id"], n_parts=1, part_offset=1,
                  branch="b")
    # a direct commit to CURRENT after the fork
    write_encoded(d3, tbl, key=["doc_id"], n_parts=1, part_offset=2)
    with pytest.raises(ConcurrentCommitError, match="fast-forward"):
        publish_branch(tbl, "b")
    # main kept its own history
    assert read_decoded(spark, tbl).count() == 200


@pytest.mark.spark
def test_wap_guards_and_abandon(spark):
    d1, d2 = _docs(spark, 0, 100), _docs(spark, 100, 200)
    tbl = tempfile.mkdtemp(prefix="wap_guard_")
    write_encoded(d1, tbl, key=["doc_id"], n_parts=1)
    create_ref(tbl, "v1", kind="tag")
    with pytest.raises(ValueError, match="tag"):
        write_encoded(d2, tbl, key=["doc_id"], n_parts=1, part_offset=1,
                      branch="v1")
    with pytest.raises(ValueError, match="tag"):
        publish_branch(tbl, "v1")
    with pytest.raises(ValueError, match="no ref"):
        publish_branch(tbl, "nope")
    # abandon: staged data files die with the ref at vacuum
    write_encoded(d2, tbl, key=["doc_id"], n_parts=1, part_offset=1,
                  branch="reject")
    from parquet_spark.manifest import _ref_snapshot
    staged_files = set(EncodedTable(tbl).data_files(
        _ref_snapshot(EncodedTable(tbl), "reject")))
    assert vacuum_table(tbl, grace_s=0.0) == []  # ref keeps them alive
    drop_ref(tbl, "reject")
    removed = set(vacuum_table(tbl, grace_s=0.0))
    orphans = {os.path.abspath(f)
               for f in staged_files} - {os.path.abspath(f)
                                         for f in EncodedTable(tbl)
                                         .data_files()}
    assert orphans and orphans <= removed
    assert read_decoded(spark, tbl).count() == 100


@pytest.mark.spark
def test_wap_on_conditional_put_backend(spark):
    d1, d2 = _docs(spark, 0, 100), _docs(spark, 100, 200)
    tbl = tempfile.mkdtemp(prefix="wap_cput_")
    be = ConditionalPutCommitBackend(tbl)
    write_encoded(d1, tbl, key=["doc_id"], n_parts=1, backend=be)
    cur0 = be.current()
    write_encoded(d2, tbl, key=["doc_id"], n_parts=1, part_offset=1,
                  branch="audit", backend=be)
    assert be.current() == cur0
    assert read_decoded(spark, tbl, backend=be, ref="audit").count() == 200
    snap = publish_branch(tbl, "audit", backend=be)
    assert be.current() == snap["_snap_name"]
    assert read_decoded(spark, tbl, backend=be).count() == 200


@pytest.mark.spark
def test_branch_on_fresh_table_publishes_from_nothing(spark):
    d = _docs(spark, 0, 100)
    tbl = tempfile.mkdtemp(prefix="wap_fresh_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=1, branch="init")
    assert EncodedTable(tbl)._current_name() is None
    with pytest.raises(ValueError, match="no committed snapshot"):
        read_decoded(spark, tbl)
    assert read_decoded(spark, tbl, ref="init").count() == 100
    publish_branch(tbl, "init")
    assert read_decoded(spark, tbl).count() == 100


@pytest.mark.spark
def test_scan_table_empty_prune_respects_ref(spark):
    """scan_table's all-files-pruned early return must resolve the
    SAME ref/snapshot as the normal path: a branch-only table returns
    an empty frame (not 'no committed snapshot'), and a tag read keeps
    the tagged snapshot's schema."""
    from parquet_spark.manifest import alter_table, scan_table
    d = _docs(spark, 0, 100)
    tbl = tempfile.mkdtemp(prefix="wap_scan_")
    write_encoded(d, tbl, key=["doc_id"], n_parts=1, mode="range",
                  branch="b")
    out = scan_table(spark, tbl, [("doc_id", 10**9, None)], ref="b")
    assert out.count() == 0
    assert set(out.columns) == set(d.columns)
    # tag pinning a pre-alter snapshot keeps the old shape
    publish_branch(tbl, "b")
    create_ref(tbl, "v1", kind="tag")
    alter_table(tbl, drop=["lang"])
    old = scan_table(spark, tbl, [("doc_id", 10**9, None)], ref="v1")
    assert "lang" in old.columns and old.count() == 0
    new = scan_table(spark, tbl, [("doc_id", 10**9, None)])
    assert "lang" not in new.columns


@pytest.mark.spark
def test_cherry_pick_selective_publish(spark):
    """Two audit branches fork from the same published state;
    cherry-pick publishes exactly one of them (the other stays
    staged), is idempotent on a re-pick, and then the second branch's
    append grafts on top."""
    from parquet_spark.manifest import cherry_pick_snapshot

    d1, d2, d3 = (_docs(spark, 0, 200), _docs(spark, 200, 300),
                  _docs(spark, 300, 420))
    tbl = tempfile.mkdtemp(prefix="wap_pick_")
    write_encoded(d1, tbl, key=["doc_id"], n_parts=2)
    write_encoded(d2, tbl, key=["doc_id"], n_parts=2, part_offset=2,
                  branch="a")
    write_encoded(d3, tbl, key=["doc_id"], n_parts=2, part_offset=4,
                  branch="b")
    assert read_decoded(spark, tbl).count() == d1.count()

    snap = cherry_pick_snapshot(tbl, ref="b")      # publish b only
    assert snap["meta"]["cherry_picked_from"]["snapshot_id"] == 1
    assert read_decoded(spark, tbl).count() == d1.count() + d3.count()
    # idempotent: same pick finds nothing new to apply
    assert cherry_pick_snapshot(tbl, ref="b")["_snap_name"] == \
        snap["_snap_name"]

    snap2 = cherry_pick_snapshot(tbl, ref="a")     # then a on top
    assert read_decoded(spark, tbl).count() == \
        d1.count() + d2.count() + d3.count()
    assert snap2["parent_name"] == snap["_snap_name"]


@pytest.mark.spark
def test_cherry_pick_refusals(spark):
    """Id collisions, non-append snapshots, and schema divergence are
    refused loudly; CURRENT is untouched by every refusal."""
    from parquet_spark.manifest import (cherry_pick_snapshot,
                                        compact_table)

    d1, d2, d3 = (_docs(spark, 0, 200), _docs(spark, 200, 300),
                  _docs(spark, 300, 420))
    tbl = tempfile.mkdtemp(prefix="wap_pickref_")
    write_encoded(d1, tbl, key=["doc_id"], n_parts=2)
    # two branches claim the SAME fresh ids
    write_encoded(d2, tbl, key=["doc_id"], n_parts=2, part_offset=2,
                  branch="a")
    write_encoded(d3, tbl, key=["doc_id"], n_parts=2, part_offset=2,
                  branch="c")
    cherry_pick_snapshot(tbl, ref="a")
    n = read_decoded(spark, tbl).count()
    with pytest.raises(ValueError, match="claimed by different parts"):
        cherry_pick_snapshot(tbl, ref="c")
    assert read_decoded(spark, tbl).count() == n

    # a compaction snapshot is a whole-table state, not an append
    compact_table(spark, tbl, target_parts=1)
    create_ref(tbl, "compacted", snapshot_id=2)
    with pytest.raises(ValueError, match="not append-only"):
        cherry_pick_snapshot(tbl, ref="compacted")

    # root snapshots have nothing to diff against
    with pytest.raises(ValueError, match="chain root"):
        cherry_pick_snapshot(tbl, snapshot_id=0)
