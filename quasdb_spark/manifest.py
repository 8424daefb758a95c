"""Manifest: the store's transaction log (the Spark-side analogue of the
reference's MANIFEST/VersionSet machinery, kv/db/version_set.h:43-306 and
kv/db/version_edit.cpp:12-254).

A store directory looks like:

    <path>/
      _manifest/
        000001.json      # full snapshot of the version after commit 1
        000002.json
        CURRENT          # name of the live manifest file
      data/
        b000000000000001-<uuid>/   # one directory per committed batch
          part-*.parquet
        compact-<n>-<uuid>/        # compaction outputs

Each manifest JSON is a *complete* version (list of live files + counters),
not a delta — at our commit rates (batch-level, not per-record) the
manifest is tiny, and full snapshots make recovery trivial: read CURRENT,
read one JSON, done (the reference replays a delta log instead,
kv/db/version_set.cpp VersionSet::Recover).

Commit protocol (multi-writer-safe, crash-safe):
  0. take an exclusive flock on _manifest/LOCK (the reference's DB lock
     file + writer-queue serialization, kv/db/db_impl.cpp:1398-1414);
     re-read CURRENT and verify the commit's base is still the live
     version — if another writer advanced it, raise CommitConflict (the
     caller re-reads and retries; KVStore write paths do this
     automatically, re-stamping the batch at the new seq).
  1. write NNNNNN.json.tmp, fsync
  2. os.rename to NNNNNN.json (atomic on POSIX; overwrite is safe under
     the lock — an existing NNNNNN.json can only be debris from a
     writer that crashed before step 3, i.e. a version never installed)
  3. write CURRENT.tmp + rename over CURRENT (atomic pointer swap — same
     trick as the reference's SetCurrentFile, kv/db/filename.cpp)
A crash between steps leaves either the old version live or the new one;
never a torn state; the flock dies with the process.

At 100 TB scale this metadata layer stays small: files are tracked at
batch-directory granularity with min/max key stats, so manifest size grows
with the number of *commits*, not rows; a long-lived store is kept compact
by the compaction job folding many batch dirs into a few level dirs.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import tempfile
from dataclasses import dataclass, field, asdict
from typing import Any


class CommitConflict(Exception):
    """Another writer installed a version after this commit's base was
    read. Re-read current() and retry (lost-update prevention — the
    analogue of losing the race for the reference's writer queue head,
    kv/db/db_impl.cpp:1398-1414)."""


@dataclass
class FileEntry:
    """One live data directory (a committed batch or compaction output).

    min_key/max_key allow manifest-level pruning for key-range queries —
    the same role as FileMetaData.smallest/largest in the reference
    (kv/db/version_edit.h); Parquet row-group stats then prune further
    inside each file.
    """

    path: str  # relative to store root
    seq_lo: int
    seq_hi: int
    rows: int
    bytes: int
    min_key: str | None = None
    max_key: str | None = None
    level: int = 0  # 0 = fresh batch, 1 = compacted


@dataclass
class Version:
    version: int = 0
    last_seq: int = 0
    files: list[FileEntry] = field(default_factory=list)
    # registered snapshots: name -> seq (kv/db/snapshot.h semantics; a
    # snapshot is just a sequence number the compactor must keep visible)
    snapshots: dict[str, int] = field(default_factory=dict)
    schema: dict[str, Any] = field(default_factory=dict)
    # streaming exactly-once bookkeeping: stream_id -> last committed
    # micro-batch id (foreachBatch may replay a batch after failure; a
    # batch whose id is <= the recorded one must be a no-op — the same
    # role as the reference's log-number/seq recovery checks,
    # kv/db/db_impl.cpp:322-560)
    streams: dict[str, int] = field(default_factory=dict)

    def to_json(self) -> str:
        d = asdict(self)
        return json.dumps(d, indent=1, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Version":
        d = json.loads(s)
        d["files"] = [FileEntry(**f) for f in d.get("files", [])]
        return Version(**d)


class ConditionalPutStore:
    """The single primitive an object store must offer for safe manifest
    commits: atomic put-if-absent. S3 has it (PutObject with
    ``If-None-Match: *``, GA since 2024), GCS (``ifGenerationMatch=0``),
    Azure Blob (``If-None-Match: *`` etags). Two racing writers both
    try to create the SAME next manifest object; exactly one create
    succeeds, the loser sees "already exists" and turns it into
    CommitConflict — no locks, no rename, no CURRENT pointer (the live
    version is simply the highest-numbered manifest object).

    Subclass per store; `LocalConditionalPut` below is the reference
    implementation (O_CREAT|O_EXCL is the same primitive on POSIX) and
    what the unit tests drive.
    """

    def put_if_absent(self, name: str, content: str) -> bool:
        """Atomically create ``name`` with ``content``. False if it
        already exists (the precondition failed); True on success."""
        raise NotImplementedError

    def read(self, name: str) -> str:
        raise NotImplementedError

    def list(self) -> list[str]:
        """All object names in the manifest prefix."""
        raise NotImplementedError


class LocalConditionalPut(ConditionalPutStore):
    """Conditional put over a local directory via O_CREAT|O_EXCL — the
    POSIX spelling of S3 If-None-Match. Used by tests to prove the
    commit protocol is correct given only the conditional-put primitive
    (no flock, no rename)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def put_if_absent(self, name: str, content: str) -> bool:
        # Object-store PUT is atomic: the object is visible only once
        # complete. The POSIX spelling is write-to-temp + fsync +
        # hard-LINK to the final name — link() is the atomic
        # create-if-absent, and the linked file is already fully
        # written (create-then-write would expose torn reads to
        # concurrent current() calls; caught by the racing-writer
        # stress test).
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(content)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, os.path.join(self.root, name))
            except FileExistsError:
                return False
            return True
        finally:
            os.unlink(tmp)

    def read(self, name: str) -> str:
        with open(os.path.join(self.root, name)) as f:
            return f.read()

    def list(self) -> list[str]:
        try:
            return sorted(os.listdir(self.root))
        except FileNotFoundError:
            return []


class Manifest:
    def __init__(self, store_path: str,
                 backend: ConditionalPutStore | None = None):
        self.store_path = store_path
        self.dir = os.path.join(store_path, "_manifest")
        # None = POSIX protocol (flock + atomic rename + CURRENT swap).
        # A ConditionalPutStore switches to the object-store protocol:
        # version N+1 is installed by put-if-absent of {N+1:06d}.json and
        # the live version is the max-numbered object — see SCALE.md §2.
        self.backend = backend

    # -- lifecycle -----------------------------------------------------
    def init(self, schema: dict[str, Any]) -> Version:
        os.makedirs(os.path.join(self.store_path, "data"), exist_ok=True)
        v = Version(version=1, schema=schema)
        if self.backend is not None:
            if not self.backend.put_if_absent("000001.json", v.to_json()):
                raise FileExistsError(
                    f"manifest already initialized at {self.store_path}")
            return v
        os.makedirs(self.dir, exist_ok=True)
        # O_EXCL creation parity with the backend branch: two processes
        # racing open_or_create with DIFFERENT options must not both
        # "succeed" with the loser's schema silently overwritten — the
        # second init fails like put_if_absent does (review r12).
        first = os.path.join(self.dir, "000001.json")
        try:
            fd = os.open(first, os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                         0o644)
        except FileExistsError:
            raise FileExistsError(
                f"manifest already initialized at {self.store_path}") \
                from None
        try:
            with os.fdopen(fd, "w") as f:
                f.write(v.to_json())
                f.flush()
                os.fsync(f.fileno())
        except BaseException:
            os.unlink(first)
            raise
        self._atomic_write(os.path.join(self.dir, "CURRENT"),
                           "000001.json")
        return v

    def exists(self) -> bool:
        if self.backend is not None:
            return bool(self._backend_versions())
        return os.path.exists(os.path.join(self.dir, "CURRENT"))

    def _backend_versions(self) -> list[str]:
        # numeric sort: lexicographic order breaks once the version
        # counter outgrows the %06d zero-padding ('1000000.json' <
        # '999999.json' as strings), which would pin current() to a
        # stale version and wedge every later commit in CommitConflict
        return sorted((n for n in self.backend.list()
                       if n.endswith(".json") and n[:-5].isdigit()),
                      key=lambda n: int(n[:-5]))

    def current(self) -> Version:
        if self.backend is not None:
            names = self._backend_versions()
            if not names:
                raise FileNotFoundError(
                    f"no manifest objects at {self.store_path}")
            # the live version IS the highest-numbered object: a
            # successful conditional put of N+1 is the commit point
            return Version.from_json(self.backend.read(names[-1]))
        with open(os.path.join(self.dir, "CURRENT")) as f:
            name = f.read().strip()
        with open(os.path.join(self.dir, name)) as f:
            return Version.from_json(f.read())

    # -- commits -------------------------------------------------------
    def commit(self, base: Version, *, add: list[FileEntry] = (),
               remove: set[str] = frozenset(), last_seq: int | None = None,
               snapshots: dict[str, int] | None = None,
               streams: dict[str, int] | None = None,
               durable: bool = True) -> Version:
        """Produce and durably install the next version.

        ``base`` must still be the live version at install time; the
        check runs under an exclusive LOCK flock, so two concurrent
        writers (handles or processes) cannot both install a successor
        of the same base — the loser gets CommitConflict and must
        re-read + retry instead of silently overwriting (ADVICE r1)."""
        nxt = Version(
            version=base.version + 1,
            last_seq=last_seq if last_seq is not None else base.last_seq,
            files=[f for f in base.files if f.path not in remove] + list(add),
            snapshots=dict(snapshots if snapshots is not None else base.snapshots),
            schema=base.schema,
            streams=dict(streams if streams is not None else base.streams),
        )
        if self.backend is not None:
            # object-store protocol: no lock, no rename — the atomic
            # create of the NEXT version object is itself the CAS. A
            # racing writer that already advanced past base makes the
            # put fail (object exists) => CommitConflict; a racing
            # writer still behind can't exist because versions are
            # dense (base was read from the live max).
            if not self.backend.put_if_absent(f"{nxt.version:06d}.json",
                                              nxt.to_json()):
                raise CommitConflict(
                    f"version {nxt.version} already installed at "
                    f"{self.store_path}")
            return nxt
        with self._commit_lock():
            live = self.current()
            if live.version != base.version:
                raise CommitConflict(
                    f"base version {base.version} superseded by "
                    f"{live.version} at {self.store_path}")
            self._write_version(nxt, durable=durable)
        return nxt

    @contextlib.contextmanager
    def _commit_lock(self):
        fd = os.open(os.path.join(self.dir, "LOCK"),
                     os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            fcntl.flock(fd, fcntl.LOCK_UN)
            os.close(fd)

    def _write_version(self, v: Version, durable: bool = True) -> None:
        name = f"{v.version:06d}.json"
        self._atomic_write(os.path.join(self.dir, name), v.to_json(),
                           durable=durable)
        self._atomic_write(os.path.join(self.dir, "CURRENT"), name,
                           durable=durable)

    @staticmethod
    def _atomic_write(path: str, content: str,
                      durable: bool = True) -> None:
        d = os.path.dirname(path)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(content)
                f.flush()
                if durable:
                    os.fsync(f.fileno())
            os.rename(tmp, path)
            # fsync the DIRECTORY: without it the rename itself is not
            # durable and renames are not ordered across power loss —
            # CURRENT could survive pointing at a version file that
            # didn't (review r12; the reference fsyncs the manifest
            # through its WritableFile contract). _write_version calls
            # this for the version file FIRST, so by the time CURRENT's
            # rename is durable the file it names is too.
            # durable=False (WriteOptions::sync=false parity,
            # kv/include/options.h:149-155): rename is still atomic —
            # never a torn state — but the commit may not survive power
            # loss; see KVStore.write_batch(sync=False).
            if durable:
                dfd = os.open(d, os.O_RDONLY)
                try:
                    os.fsync(dfd)
                finally:
                    os.close(dfd)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    # -- GC (reference: RemoveObsoleteFiles, kv/db/db_impl.cpp:248-320) --
    def live_paths(self) -> set[str]:
        return {f.path for f in self.current().files}

    def vacuum(self, grace_seconds: float = 0.0) -> list[str]:
        """Delete data dirs not referenced by the current version.

        Physical deletion is DEFERRED policy, not a commit side effect
        (Delta-style): compaction only unlinks dirs from the manifest;
        readers holding lazy DataFrames (which resolved concrete file
        paths at construction) keep working until someone explicitly
        vacuums. ``grace_seconds`` skips dirs modified within the grace
        window — both a reader grace period and a guard against deleting
        a concurrent writer's data dir written but not yet committed.
        Runs under the commit lock so the live set can't move mid-walk.
        """
        import shutil
        import time

        data_root = os.path.join(self.store_path, "data")
        removed = []
        # under a conditional-put backend there is no lock to take (the
        # live set only grows monotonically in version number; a stale
        # read just means vacuuming less this round)
        lock = (contextlib.nullcontext() if self.backend is not None
                else self._commit_lock())
        with lock:
            live = self.live_paths()
            now = time.time()
            for name in os.listdir(data_root):
                rel = os.path.join("data", name)
                full = os.path.join(data_root, name)
                if rel in live:
                    continue
                if grace_seconds > 0:
                    try:
                        if now - os.path.getmtime(full) < grace_seconds:
                            continue
                    except OSError:
                        continue
                shutil.rmtree(full, ignore_errors=True)
                removed.append(rel)
        return removed
