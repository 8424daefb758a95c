"""Multi-writer safety: CAS-checked manifest commits (ADVICE r1).

Two independent KVStore handles on the same path interleave writes;
the flock + base-version check in Manifest.commit means the slower
writer gets CommitConflict and the store's retry loop re-stamps its
batch at the next seq — no commit is ever silently lost (the
reference serializes writers through one queue,
kv/db/db_impl.cpp:1398-1414; we serialize through the LOCK flock).
"""

import threading

import pytest

from quasdb_spark.manifest import CommitConflict
from quasdb_spark.store import KVStore


def test_interleaved_writers_lose_nothing(spark, tmp_path):
    path = str(tmp_path / "mw")
    a = KVStore.create(spark, path)
    b = KVStore.open(spark, path)
    # interleave: each handle writes its own key set, alternating, with
    # both handles deliberately holding stale version reads
    for i in range(4):
        a.put(f"a{i}", str(i))
        b.put(f"b{i}", str(i))
    state = {r["key"]: r["value"] for r in a.scan().collect()}
    assert state == {f"{h}{i}": str(i) for h in "ab" for i in range(4)}
    # every batch got a distinct seq
    assert a.manifest.current().last_seq == 8


def test_stale_base_commit_conflicts(spark, tmp_path):
    st = KVStore.create(spark, str(tmp_path / "stale"))
    stale = st.manifest.current()
    st.put("k", "v")  # advances the version
    with pytest.raises(CommitConflict):
        st.manifest.commit(stale, last_seq=stale.last_seq + 1)


def test_threaded_writers_all_batches_land(spark, tmp_path):
    """Hammer the conflict/retry path from real threads."""
    path = str(tmp_path / "threads")
    KVStore.create(spark, path)
    errs = []

    def writer(tag):
        try:
            h = KVStore.open(spark, path)
            for i in range(3):
                h.put(f"{tag}{i}", tag)
        except Exception as e:  # pragma: no cover - surfaced via errs
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in "xyz"]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    st = KVStore.open(spark, path)
    keys = sorted(r["key"] for r in st.scan().collect())
    assert keys == sorted(f"{t}{i}" for t in "xyz" for i in range(3))
    assert st.manifest.current().last_seq == 9


def test_auto_compaction_bounds_file_count(spark, tmp_path):
    """M2 size-score picking: with auto_compact on, N small batches
    keep the manifest file count bounded by the trigger (Finalize
    analogue, kv/db/version_set.cpp:1217-1259), the state view is
    invariant, and obsolete dirs are vacuumed past the grace window."""
    import os

    st = KVStore.create(spark, str(tmp_path / "auto"))
    st.auto_compact = True
    st.l0_compaction_trigger = 4
    st.level_compaction_trigger = 3
    st.vacuum_grace = 0.0  # deterministic physical deletion in-test
    model = {}
    max_files = 0
    for i in range(14):
        k, v = f"k{i % 5}", f"v{i}"
        st.put(k, v)
        model[k] = v
        max_files = max(max_files, st.properties()["quasdb.num-files"])
    # never more than trigger-1 L0 dirs + a few compaction outputs
    assert max_files <= st.l0_compaction_trigger + st.level_compaction_trigger
    assert {r["key"]: r["value"] for r in st.scan().collect()} == model
    assert st.manifest.current().last_seq == 14  # seqs unaffected
    # physical dirs bounded too (vacuum ran under zero grace)
    n_dirs = len(os.listdir(os.path.join(st.path, "data")))
    assert n_dirs == st.properties()["quasdb.num-files"]
    # the picker reports below-trigger after the fold
    score, _scope = st.compaction_score()
    assert score < 1.0 or st.properties()["quasdb.num-files"] <= 2


def test_maybe_compact_noop_below_trigger(spark, tmp_path):
    st = KVStore.create(spark, str(tmp_path / "noop"))
    st.put("a", "1")
    assert st.maybe_compact() is None
    assert st.properties()["quasdb.num-files"] == 1


def test_compact_defers_physical_deletion(spark, tmp_path):
    """Lazy DataFrames built before a compaction still collect after it
    (deferred vacuum); explicit vacuum() removes the old dirs."""
    import os

    st = KVStore.create(spark, str(tmp_path / "defer"))
    for i in range(3):
        st.write_batch([("put", f"k{j}", f"v{i}") for j in range(10)])
    pre = st.scan()  # lazy plan resolving pre-compaction files
    st.compact()
    rows = pre.collect()  # must not raise missing-file
    assert len(rows) == 10
    data_dirs = os.listdir(os.path.join(st.path, "data"))
    assert len(data_dirs) == 4  # 3 batch dirs + 1 compaction output
    gone = st.vacuum(0.0)  # explicit: no concurrent writer in this test
    assert len(gone) == 3
    assert {r["key"]: r["value"] for r in st.scan().collect()} == \
        {f"k{j}": "v2" for j in range(10)}


def test_cross_process_writers_all_batches_land(spark, tmp_path):
    """The manifest CAS contract across real PROCESSES (flock is
    per-process — the threaded test cannot prove this): 3 independent
    Python processes open the same store and race small write_batches
    through the driver write path (which needs NO SparkSession — an
    embedded writer), and every batch lands exactly once with a
    distinct seq. Parent then reads the merged state through Spark."""
    import os
    import subprocess
    import sys
    import textwrap

    st = KVStore.create(spark, str(tmp_path / "xproc"))
    st.put("init", "0")

    child = textwrap.dedent("""
        import sys
        sys.path.insert(0, {repo!r})
        from quasdb_spark.store import KVStore
        from quasdb_spark.manifest import CommitConflict
        st = KVStore(None, {path!r})   # no SparkSession: writes are driver-side
        me = sys.argv[1]
        for b in range(10):
            for attempt in range(50):
                try:
                    st.write_batch([("put", f"{{me}}-b{{b}}-k{{i}}", me)
                                    for i in range(5)])
                    break
                except CommitConflict:
                    continue
            else:
                sys.exit(2)
    """).format(repo=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), path=st.path)

    procs = [subprocess.Popen([sys.executable, "-c", child, f"p{n}"],
                              stderr=subprocess.PIPE)
             for n in range(3)]
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    ver = st.manifest.current()
    assert ver.last_seq == 1 + 30          # every batch got its own seq
    assert len(ver.files) == 1 + 30        # ...and its own dir
    state = {r["key"]: r["value"] for r in st.scan().collect()}
    assert len(state) == 1 + 3 * 10 * 5    # no lost updates
    for n in range(3):
        assert state[f"p{n}-b9-k4"] == f"p{n}"
    # point reads see the cross-process merge too (driver fast path)
    assert st.get("p1-b3-k2") == "p1"


def test_cross_process_writers_race_compaction_and_vacuum(spark, tmp_path):
    """VERDICT r12 #4's second half: the randomized compact/vacuum/
    write race ACROSS REAL PROCESSES. Two Spark-free embedded writer
    processes hammer randomized batches (mixed puts/deletes, mixed
    sync=True/False) while the parent loops full compactions,
    default-grace vacuums and snapshot register/release against the
    same store. Each child journals (seq, ops) per committed batch;
    the parent replays all journals in global seq order into a dict
    oracle — any batch a racing compaction duplicated or destroyed,
    and any version a mid-race vacuum reclaimed out from under a
    committed dir, breaks state equality. After the writers exit, an
    explicit vacuum(0.0) reclaims the lineage and state must still
    replay exactly."""
    import json
    import os
    import subprocess
    import sys
    import textwrap
    import time

    st = KVStore.create(spark, str(tmp_path / "race"))
    st.put("init", "0")

    child = textwrap.dedent("""
        import json, random, sys
        sys.path.insert(0, {repo!r})
        from quasdb_spark.store import KVStore
        from quasdb_spark.manifest import CommitConflict
        me = sys.argv[1]
        rng = random.Random(1000 + int(me[1]))
        st = KVStore(None, {path!r})   # embedded: no SparkSession
        journal = []
        for b in range(8):
            ops = []
            for i in range(rng.randrange(1, 12)):
                k = f"key{{rng.randrange(30):04d}}"
                if rng.random() < 0.3:
                    ops.append(("del", k, None))
                else:
                    ops.append(("put", k, f"{{me}}-b{{b}}-{{i}}"))
            for attempt in range(80):
                try:
                    seq = st.write_batch(ops,
                                         sync=rng.random() < 0.5)
                    break
                except CommitConflict:
                    continue
            else:
                sys.exit(2)
            journal.append({{"seq": seq, "ops": ops}})
        with open({jdir!r} + f"/journal-{{me}}.jsonl", "w") as f:
            for rec in journal:
                f.write(json.dumps(rec) + "\\n")
    """).format(repo=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), path=st.path,
        jdir=str(tmp_path))

    procs = [subprocess.Popen([sys.executable, "-c", child, f"p{n}"],
                              stderr=subprocess.PIPE)
             for n in range(2)]
    # parent: maintenance storm while the writers are live
    n_maint = 0
    while any(p.poll() is None for p in procs):
        st.compact()                    # single-winner guard exercised
        st.vacuum()                     # DEFAULT grace: must reclaim
        #                                 nothing while writers race
        snap = st.snapshot(f"race-{n_maint}")
        st.release_snapshot(f"race-{n_maint}")
        n_maint += 1
        time.sleep(0.02)
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
    assert n_maint > 0, "maintenance never overlapped the writers"

    # replay every journaled batch in global seq order
    batches = []
    for n in range(2):
        with open(tmp_path / f"journal-p{n}.jsonl") as f:
            batches += [json.loads(line) for line in f]
    seqs = [b["seq"] for b in batches]
    assert len(set(seqs)) == len(seqs), "two batches shared a seq"
    expect = {"init": "0"}
    for b in sorted(batches, key=lambda b: b["seq"]):
        for op, k, v in b["ops"]:
            if op == "put":
                expect[k] = v
            else:
                expect.pop(k, None)
    expect = {k: v for k, v in expect.items() if v is not None}

    def state():
        return {r["key"]: r["value"] for r in st.state().collect()}

    assert state() == expect
    # final compact + explicit zero-grace vacuum (writers are gone:
    # grace 0 is in-contract now) must not change the state
    st.compact()
    gone = st.vacuum(0.0)
    assert gone, "post-race vacuum reclaimed nothing"
    assert state() == expect
    # the driver point-read engine agrees on a sample
    for k in list(expect)[:5]:
        assert st.get(k) == expect[k]
