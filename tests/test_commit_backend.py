"""CommitBackend: the pluggable atomic-commit primitive.

The snapshot chain's only storage-specific piece is the compare-and-swap
on CURRENT.  These tests drive it through the interface (so an
object-store backend is a drop-in), and pin the two lock hazards the
posix implementation must not have:

  * the unlink-steal race (two waiters both decide a lock is stale,
    both remove it, both enter the critical section — the second
    remove deletes the FIRST stealer's fresh lock);
  * a stalled owner committing after its lock was legitimately stolen.

No Spark needed — commit() is pure driver-side code.
"""

import json
import os
import tempfile
import threading
import time

import pytest

from parquet_spark.manifest import (CommitBackend, ConcurrentCommitError,
                                    EncodedTable, PosixCommitBackend)


def _mk_table():
    return tempfile.mkdtemp(prefix="cb_tbl_")


def test_commit_and_read_through_backend():
    path = _mk_table()
    t = EncodedTable(path)
    snap = t.commit({"0": {"file": "f", "n_rows": 1}}, None, None)
    assert snap["snapshot_id"] == 0
    cur = t.backend.current()
    assert cur.startswith("snap-000000-")  # unique per-attempt name
    assert cur == snap["_snap_name"]
    got = json.loads(t.backend.read(cur))
    assert got["parts"]["0"]["n_rows"] == 1
    assert "_snap_name" not in got  # never serialized


def test_stale_lock_steal_is_atomic_under_contention():
    """N threads race a commit with the same parent while a STALE lock
    blocks the path: exactly one commit wins, the rest raise
    ConcurrentCommitError, and CURRENT names a snapshot whose file
    content matches (no half-commit, no clobber)."""
    path = _mk_table()
    os.makedirs(path, exist_ok=True)
    lock = os.path.join(path, "COMMIT_LOCK")
    with open(lock, "w") as f:
        f.write("deadbeef 0 0")
    os.utime(lock, (time.time() - 10_000, time.time() - 10_000))

    results, errors = [], []
    barrier = threading.Barrier(8)

    def attempt(i):
        t = EncodedTable(path)
        barrier.wait()
        try:
            t.commit({"0": {"writer": i}}, None, None)
            results.append(i)
        except ConcurrentCommitError:
            pass
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(60)
    assert not errors, errors
    assert len(results) == 1, results  # exactly one winner
    t = EncodedTable(path)
    snap = t.current_snapshot()
    assert snap["snapshot_id"] == 0
    assert snap["parts"]["0"]["writer"] == results[0]
    assert not os.path.exists(lock)  # released
    # no stale-steal debris left behind
    assert not [n for n in os.listdir(path) if n.startswith("COMMIT_LOCK.")]


def test_concurrent_chained_commits_never_lose_an_update():
    """Writers repeatedly CAS-retry against a moving CURRENT; every
    successful commit's parent must be the previous snapshot (a lost
    update would fork the chain)."""
    path = _mk_table()
    t0 = EncodedTable(path)
    t0.commit({}, None, None)
    n_ok = []

    def writer(wid):
        t = EncodedTable(path)
        done = 0
        while done < 5:
            parent = t.current_snapshot()
            parts = dict(parent["parts"])
            parts[f"w{wid}-{done}"] = {"writer": wid}
            try:
                t.commit(parts, None, parent, meta=parent.get("meta"))
                done += 1
            except ConcurrentCommitError:
                time.sleep(0.002)
        n_ok.append(done)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(120)
    assert sum(n_ok) == 20
    final = EncodedTable(path).current_snapshot()
    assert final["snapshot_id"] == 20  # 1 root + 20 chained commits
    assert len(final["parts"]) == 20   # nothing lost
    # chain integrity: every snapshot's parent exists and precedes it
    snaps = sorted(os.listdir(os.path.join(path, "snapshots")))
    assert len(snaps) == 21


def test_stalled_owner_aborts_after_lock_stolen():
    """An owner whose lock was stolen (stale window elapsed mid-commit)
    must abort at the pre-flip ownership check, not clobber."""
    path = _mk_table()
    os.makedirs(path, exist_ok=True)
    b1 = PosixCommitBackend(path, lock_stale_s=0.1)
    token1 = b1._acquire()
    assert b1._owns(token1)
    time.sleep(0.15)  # b1 "stalls" past the stale window
    b2 = PosixCommitBackend(path, lock_stale_s=0.1)
    token2 = b2._acquire()  # legitimately steals
    assert b2._owns(token2)
    assert not b1._owns(token1)
    b1._release(token1)  # must NOT remove b2's lock
    assert b2._owns(token2)
    b2._release(token2)
    assert not os.path.exists(os.path.join(path, "COMMIT_LOCK"))


class _MemBackend(CommitBackend):
    """Models an object-store/catalog backend: conditional-PUT CAS, no
    lock object, nothing on the local filesystem."""

    def __init__(self):
        self._snaps: dict[str, str] = {}
        self._current: str | None = None
        self._mu = threading.Lock()

    def current(self):
        return self._current

    def read(self, name):
        return self._snaps[name]

    def commit(self, name, payload, expected):
        with self._mu:  # the store's conditional PUT
            if self._current != expected:
                raise ConcurrentCommitError(
                    f"pointer is {self._current!r}, expected {expected!r}")
            self._snaps[name] = payload
            self._current = name


def test_encoded_table_runs_on_a_pluggable_backend():
    """EncodedTable must route every read and the commit point through
    the backend — proven by a memory backend leaving no CURRENT or
    snapshots/ files on disk."""
    path = _mk_table()
    mem = _MemBackend()
    t = EncodedTable(path, backend=mem)
    s0 = t.commit({"0": {"n_rows": 5}}, None, None)
    s1 = t.commit({"0": {"n_rows": 5}, "1": {"n_rows": 7}}, None, s0)
    assert s1["parent_id"] == 0
    assert t.current_snapshot()["snapshot_id"] == 1
    assert t.committed_parts()["1"]["n_rows"] == 7
    with pytest.raises(ConcurrentCommitError):
        t.commit({}, None, s0)  # stale parent refused by the store CAS
    assert not os.path.exists(os.path.join(path, "CURRENT"))
    assert not os.path.exists(os.path.join(path, "snapshots"))


def test_block_codec_spec_validated_eagerly():
    """A typo'd block codec must fail at the entry point, not mid-job
    once some chunk exceeds the small-body threshold."""
    import pyarrow as pa

    from parquet_spark.codecs.column import (encode_column,
                                             validate_block_codec)
    with pytest.raises(ValueError, match="unknown block codec"):
        validate_block_codec("lzo")
    with pytest.raises(ValueError):
        validate_block_codec("zstd:notanint")
    # even a tiny chunk (body <= 64 B, would have been raw) validates
    with pytest.raises(ValueError, match="unknown block codec"):
        encode_column(pa.array([1, 2]), block_codec="lzo")
    validate_block_codec("auto")
    validate_block_codec("none")
    validate_block_codec("zstd:9")


def test_float_zone_bound_classification():
    """Float bounds are numeric (they prune via BOTH numeric zone
    families — the double arrays for float columns, the int arrays for
    int/timestamp columns); NaN and bool bounds raise."""
    import numpy as np

    from parquet_spark.engine import _is_numeric_bound
    assert _is_numeric_bound(1.5)
    assert _is_numeric_bound(np.float64(2.0))
    with pytest.raises(TypeError, match="NaN"):
        _is_numeric_bound(float("nan"))
    with pytest.raises(TypeError, match="boolean"):
        _is_numeric_bound(True)
    assert _is_numeric_bound(3)
    assert _is_numeric_bound(np.int64(3))
    assert _is_numeric_bound(np.datetime64("2020-01-01"))
    assert not _is_numeric_bound("abc")


def test_conditional_put_backend_contract():
    """The object-store contract exercised locally: put-if-absent
    generation objects, no lock state, exactly-one-winner CAS, and the
    loser leaves only an orphan payload (never a pointer change)."""
    from parquet_spark.manifest import ConditionalPutCommitBackend
    path = _mk_table()
    t = EncodedTable(path, backend=ConditionalPutCommitBackend(path))
    s0 = t.commit({"0": {"n_rows": 1}}, None, None)
    assert t.backend.current() == s0["_snap_name"]
    assert json.loads(t.backend.read(s0["_snap_name"]))["snapshot_id"] == 0
    # CAS against a stale parent refuses without moving the pointer
    with pytest.raises(ConcurrentCommitError):
        t.commit({"1": {}}, None, None)  # expected=None but head exists
    assert t.backend.current() == s0["_snap_name"]
    s1 = t.commit({"1": {}}, None, t.current_snapshot())
    assert t.current_snapshot()["snapshot_id"] == 1
    # two immutable generations exist; nothing was overwritten
    gens = sorted(os.listdir(os.path.join(path, "ptr")))
    assert gens == ["gen-" + "1".zfill(16), "gen-" + "2".zfill(16)]
    assert json.loads(t.backend.read(s1["_snap_name"]))["parts"] == {"1": {}}


_WRITER_SRC = '''
import os, random, sys, time
sys.path.insert(0, {repo!r})
from parquet_spark.manifest import (ConcurrentCommitError,
                                    ConditionalPutCommitBackend,
                                    EncodedTable, PosixCommitBackend)
path, kind, n, wid, log = (sys.argv[1], sys.argv[2], int(sys.argv[3]),
                           sys.argv[4], sys.argv[5])
be = (PosixCommitBackend(path, lock_stale_s=0.5) if kind == "posix"
      else ConditionalPutCommitBackend(path))
t = EncodedTable(path, backend=be)
done = 0
while done < n:
    parent = t.current_snapshot()
    parts = dict(parent["parts"]) if parent else {{}}
    key = f"w{{wid}}-{{done}}"
    parts[key] = {{"writer": wid}}
    try:
        t.commit(parts, None, parent,
                 meta=(parent or {{}}).get("meta"))
    except ConcurrentCommitError:
        time.sleep(random.random() * 0.01)
        continue
    with open(log, "a") as f:
        f.write(key + chr(10))
        f.flush(); os.fsync(f.fileno())
    done += 1
    time.sleep(random.random() * 0.01)
'''


@pytest.mark.parametrize("kind", ["posix", "condput"])
def test_multi_writer_kill_schedule_stress(kind, tmp_path):
    """N writer PROCESSES CAS-retry against one table while two of
    them are SIGKILLed mid-flight; replacements then join.  Invariants
    under every kill schedule: no logged (=acknowledged) commit is
    ever lost, the chain stays linear (snapshot_id == part count, one
    part per commit), and the table stays LIVE — for the posix backend
    that means a killed lock holder is stolen from, for the
    conditional-PUT backend there is no lock to leak at all."""
    import signal
    import subprocess
    import sys as _sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = str(tmp_path / "tbl")
    script = str(tmp_path / "writer.py")
    with open(script, "w") as f:
        f.write(_WRITER_SRC.format(repo=repo))

    def spawn(wid, n):
        log = str(tmp_path / f"log-{wid}")
        p = subprocess.Popen([_sys.executable, script, path, kind,
                              str(n), wid, log])
        return p, log

    procs = [spawn(f"a{i}", 6) for i in range(5)]
    time.sleep(0.35)
    for p, _ in procs[:2]:          # kill two mid-flight
        p.send_signal(signal.SIGKILL)
    for p, _ in procs[2:]:
        assert p.wait(120) == 0
    for p, _ in procs[:2]:
        p.wait(10)
    # liveness after the kills: fresh writers must still commit (for
    # posix this crosses the stale-lock steal if a victim died holding
    # the lock)
    procs2 = [spawn(f"b{i}", 3) for i in range(2)]
    for p, _ in procs2:
        assert p.wait(120) == 0

    from parquet_spark.manifest import ConditionalPutCommitBackend
    be = (PosixCommitBackend(path) if kind == "posix"
          else ConditionalPutCommitBackend(path))
    final = EncodedTable(path, backend=be).current_snapshot()
    parts = final["parts"]
    logged = []
    for _, log in procs + procs2:
        if os.path.exists(log):
            logged += [ln.strip() for ln in open(log) if ln.strip()]
    assert len(logged) >= 3 * 6 + 2 * 3    # survivors all acknowledged
    lost = [k for k in logged if k not in parts]
    assert not lost, f"acknowledged commits lost: {lost}"
    # linear chain: the FIRST commit creates snapshot_id 0 with one
    # part and every later commit adds exactly one — id == parts - 1
    assert final["snapshot_id"] == len(parts) - 1
    # a killed writer may have an unacknowledged tail commit, never a
    # duplicated or forked one
    assert len(parts) >= len(set(logged))


@pytest.mark.spark
def test_write_resume_read_through_conditional_put_backend(spark, tmp_path):
    """Full encode -> resume -> decode cycle with every commit routed
    through the conditional-PUT backend: no CURRENT file and no lock
    object ever exist on disk — pointer state is the immutable
    generation chain only."""
    from pyspark.sql import functions as F

    from parquet_spark.corpus import gen_corpus
    from parquet_spark.manifest import (ConditionalPutCommitBackend,
                                        read_decoded, write_encoded)
    df = gen_corpus(spark, 300, seed=31, parts=3).select(
        "url", "warc_ts", "lang", "text")
    path = str(tmp_path / "tbl")
    be = ConditionalPutCommitBackend(path)
    write_encoded(df, path, key=["url"], n_parts=3, limit_parts=1,
                  backend=be)
    write_encoded(df, path, key=["url"], n_parts=3, backend=be)
    assert not os.path.exists(os.path.join(path, "CURRENT"))
    assert not os.path.exists(os.path.join(path, "COMMIT_LOCK"))
    gens = sorted(os.listdir(os.path.join(path, "ptr")))
    assert len(gens) == 2                      # one per commit
    dec = read_decoded(spark, path, backend=be)
    assert dec.count() == 300
    assert dec.select(*df.columns).exceptAll(df).count() == 0


def test_lifecycle_verbs_through_conditional_put_backend(spark, tmp_path):
    """The session-5 maintenance verbs (binpack, expire, rollback,
    cherry-pick, rollup refresh) each route every snapshot read and
    CAS through the conditional-PUT backend — the executable proof
    that the object-store contract covers the whole lifecycle, not
    just plain writes."""
    from pyspark.sql import functions as F

    from parquet_spark.corpus import gen_corpus
    from parquet_spark.manifest import (ConditionalPutCommitBackend,
                                        EncodedTable, cherry_pick_snapshot,
                                        compact_small_parts,
                                        expire_snapshots, read_decoded,
                                        rollback_table, write_encoded)
    from parquet_spark.rollup import create_rollup, refresh_rollup

    df = gen_corpus(spark, 500, seed=127, parts=3)
    path = str(tmp_path / "tbl")
    be = ConditionalPutCommitBackend(path)
    write_encoded(df, path, key=["lang"], n_parts=4, backend=be)  # snap 0
    snap = compact_small_parts(spark, path, small_bytes=1 << 30,
                               target_bytes=1 << 30,
                               backend=be)                        # snap 1
    assert snap["meta"]["binpack"]["rewrote"] >= 2

    snap = rollback_table(path, snapshot_id=0, backend=be)        # snap 2
    assert snap["meta"]["rollback_of"]["snapshot_id"] == 0
    assert read_decoded(spark, path, backend=be).count() == 500

    # WAP branch + selective publish, all through the backend
    extra = gen_corpus(spark, 120, seed=128, parts=1)
    write_encoded(extra, path, key=["lang"], n_parts=4, part_offset=4,
                  branch="aud", backend=be)
    snap = cherry_pick_snapshot(path, ref="aud", backend=be)      # snap 3
    assert snap["meta"]["cherry_picked_from"]["snapshot_id"] == 3
    assert read_decoded(spark, path, backend=be).count() == 620

    rep = expire_snapshots(path, keep_last=2, older_than_s=0.0,
                           backend=be)
    assert rep["expired"] and rep["tombstone"]
    hist = [s["snapshot_id"] for s in
            EncodedTable(path, backend=be).history()]
    assert hist == [2, 3]

    # rollup over the backend-routed source
    roll = str(tmp_path / "roll")
    rbe = ConditionalPutCommitBackend(roll)
    create_rollup(spark, path, roll, group_cols=["lang"],
                  aggs={"n": ("count", "*")}, backend=rbe,
                  src_backend=be)
    got = {r.lang: r.n for r in read_decoded(spark, roll,
                                             backend=rbe).collect()}
    want = {r.lang: r.n for r in
            read_decoded(spark, path, backend=be).groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want
    # the spec recorded the source backend kind: refresh reconnects
    # to the condput source with no src_backend argument
    assert refresh_rollup(spark, roll, backend=rbe)["refreshed"] is False
    # pointer state stayed pure generation-chain throughout
    assert not os.path.exists(os.path.join(path, "CURRENT"))
    assert not os.path.exists(os.path.join(path, "COMMIT_LOCK"))
