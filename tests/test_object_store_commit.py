"""Object-store manifest commits via conditional put (SCALE.md §5).

The protocol must be correct given ONLY atomic put-if-absent (what
S3 If-None-Match / GCS ifGenerationMatch=0 provide): live version =
highest-numbered manifest object; installing N+1 is one conditional
create; exactly one racing writer wins. LocalConditionalPut spells the
primitive as O_CREAT|O_EXCL — no flock, no rename, no CURRENT file.
"""

import threading

import pytest

from quasdb_spark.manifest import (CommitConflict, FileEntry,
                                   LocalConditionalPut, Manifest)


def _mk(tmp_path, name="os-store"):
    root = tmp_path / name
    backend = LocalConditionalPut(str(root / "_manifest"))
    return Manifest(str(root), backend=backend)


def test_init_current_and_linear_commits(tmp_path):
    mf = _mk(tmp_path)
    assert not mf.exists()
    mf.init(schema={"key_type": "string"})
    assert mf.exists()
    v1 = mf.current()
    assert v1.version == 1 and v1.schema["key_type"] == "string"

    e = FileEntry(path="data/b1", seq_lo=1, seq_hi=1, rows=10, bytes=100)
    v2 = mf.commit(v1, add=[e], last_seq=1)
    assert mf.current().version == 2
    assert [f.path for f in mf.current().files] == ["data/b1"]
    mf.commit(v2, remove={"data/b1"}, last_seq=2)
    assert mf.current().version == 3 and mf.current().files == []
    # no POSIX-protocol artifacts anywhere
    names = mf.backend.list()
    assert "CURRENT" not in names and "LOCK" not in names


def test_double_init_fails(tmp_path):
    mf = _mk(tmp_path)
    mf.init(schema={})
    with pytest.raises(FileExistsError):
        mf.init(schema={})


def test_stale_base_commit_conflicts(tmp_path):
    mf = _mk(tmp_path)
    mf.init(schema={})
    base = mf.current()
    mf.commit(base, last_seq=1)  # someone advances
    with pytest.raises(CommitConflict):
        mf.commit(base, last_seq=2)  # same base again -> object exists


def test_racing_writers_single_winner(tmp_path):
    """Two writers commit against the SAME base concurrently: exactly
    one conditional put succeeds, the loser gets CommitConflict —
    single-winner semantics from put-if-absent alone."""
    mf = _mk(tmp_path)
    mf.init(schema={})
    base = mf.current()
    results = []
    barrier = threading.Barrier(2)

    def writer(tag):
        barrier.wait()
        try:
            mf.commit(base, add=[FileEntry(
                path=f"data/{tag}", seq_lo=1, seq_hi=1, rows=1, bytes=1)],
                last_seq=1)
            results.append(("ok", tag))
        except CommitConflict:
            results.append(("conflict", tag))

    ts = [threading.Thread(target=writer, args=(t,)) for t in ("a", "b")]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(r[0] for r in results) == ["conflict", "ok"]
    live = mf.current()
    assert live.version == 2 and len(live.files) == 1
    winner = [tag for ok, tag in results if ok == "ok"][0]
    assert live.files[0].path == f"data/{winner}"


def test_kvstore_append_retry_over_conditional_put(tmp_path, spark):
    """KVStore's write path (retry loop re-stamping seqs) works
    unchanged over the object-store protocol: put/get/scan/compact
    round-trip with the backend swapped in."""
    from quasdb_spark.store import KVStore

    st = KVStore(spark, str(tmp_path / "kv"))
    st.manifest = Manifest(st.path, backend=LocalConditionalPut(
        str(tmp_path / "kv" / "_manifest")))
    st.manifest.init(schema=KVStore._schema_dict(False, None))
    st._load_config()

    st.put("a", "1")
    st.put("b", "2")
    st.delete("a")
    st.write_batch([("put", "c", "3"), ("put", "b", "22")])
    assert st.get("a") is None and st.get("b") == "22"
    assert [(r["key"], r["value"]) for r in st.scan().collect()] == [
        ("b", "22"), ("c", "3")]
    st.compact()
    st.vacuum(0.0)  # nullcontext lock path under a backend
    assert [(r["key"], r["value"]) for r in st.scan().collect()] == [
        ("b", "22"), ("c", "3")]
    # history() over the conditional-put backend: one row per version
    # object, newest first, monotone last_seq
    h = st.history().collect()
    assert len(h) >= 5
    assert [r["version"] for r in h] == sorted(
        (r["version"] for r in h), reverse=True)
    seqs = [r["last_seq"] for r in reversed(h)]
    assert seqs == sorted(seqs)


def test_many_racing_writers_converge_with_retries(tmp_path):
    """8 writers x 5 commits each, all racing through put-if-absent
    with the standard read-retry loop: every commit eventually lands,
    versions stay dense, and no writer's file entry is lost — the
    object-store protocol's liveness + safety under real contention."""
    import random

    mf = _mk(tmp_path, "race-many")
    mf.init(schema={})
    n_writers, n_commits = 8, 5
    errors = []

    def writer(tag):
        rng = random.Random(tag)
        for i in range(n_commits):
            for attempt in range(200):
                base = mf.current()
                try:
                    mf.commit(base, add=[FileEntry(
                        path=f"data/{tag}-{i}", seq_lo=1, seq_hi=1,
                        rows=1, bytes=1)], last_seq=base.last_seq + 1)
                    break
                except CommitConflict:
                    if rng.random() < 0.5:
                        continue
            else:
                errors.append(f"{tag}-{i} starved")

    ts = [threading.Thread(target=writer, args=(t,)) for t in range(n_writers)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errors
    live = mf.current()
    assert live.version == 1 + n_writers * n_commits  # dense versions
    assert live.last_seq == n_writers * n_commits
    paths = {f.path for f in live.files}
    assert paths == {f"data/{t}-{i}" for t in range(n_writers)
                     for i in range(n_commits)}


def test_version_numbering_past_padding_width(tmp_path):
    """Version 1,000,000 outgrows the %06d zero-padding. current()
    must still resolve the numerically-highest object ('1000000.json'
    sorts lexicographically BEFORE '999999.json'), and the next commit
    must install 1000001 instead of wedging on CommitConflict forever
    (ADVICE r4)."""
    from quasdb_spark.manifest import Version

    mf = _mk(tmp_path, "pad-overflow")
    for ver in (999999, 1000000):
        v = Version(version=ver, schema={})
        assert mf.backend.put_if_absent(f"{ver:06d}.json", v.to_json())
    live = mf.current()
    assert live.version == 1000000
    nxt = mf.commit(live, add=[FileEntry(
        path="data/after", seq_lo=1, seq_hi=1, rows=1, bytes=1)],
        last_seq=1)
    assert nxt.version == 1000001
    assert mf.current().version == 1000001
