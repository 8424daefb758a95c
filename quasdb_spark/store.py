"""KVStore — the engine's persistent ordered map (DB API parity).

Spark-first re-expression of the reference's public query API
(kv/include/db.h:41-110): Put/Delete/Write(batch)/Get/NewIterator(range,
reverse, prefix)/GetSnapshot/CompactRange/GetApproximateSizes/GetProperty.

Storage model (SURVEY.md §7.0): an append-only, seq-versioned op-log
stored as sorted Parquet under ``data/``, with a JSON manifest
transaction log under ``_manifest/``. Reads build a declarative "state
view" (filter → LWW dedup → tombstone mask) and hand the whole plan to
Catalyst: key-range predicates push down to the Parquet scan, the
manifest prunes whole files by min/max key first, and AQE handles the
rest.

Log schema: (key STRING|BINARY, seq LONG, sub LONG, op STRING,
value STRING|BINARY)
  - seq: batch-level sequence, allocated monotonically by the manifest
    (one per committed batch — the reference assigns consecutive per-op
    seqs inside a batch, kv/db/db_impl.cpp:1423-1424; we split that into
    (seq, sub) so bulk ingest never needs a global row ordering).
  - sub: intra-batch order, only meaningful when one batch writes the
    same key more than once (newest wins — WriteBatch replay order,
    kv/db/write_batch.cpp:137-162).

Data model options (fixed at create, persisted in the manifest schema):
  - ``binary=True``: keys/values are uninterpreted byte strings — the
    reference's actual contract (kv/include/slice.h:13-82). Spark
    compares BinaryType by unsigned bytewise order, which IS the
    reference's BytewiseComparator (kv/util/comparator.cpp:20-58), so
    every ordering op works unchanged; manifest min/max stats are
    stored as lowercase hex (order-preserving) for JSON.
  - ``codec=...``: a custom comparator expressed as an order-preserving
    key codec (A4, kv/include/comparator.h:14-52). Keys are stored
    ENCODED, so scans, compaction sort, range pruning and seek all run
    JVM-side in natural order == codec order; keys are decoded only on
    API result surfaces (scalar paths in Python, DataFrame paths via an
    Arrow-batched pandas UDF applied after ordering/limit).

Scale notes (100 TB design review):
  - Point get: manifest min/max prune → Parquet row-group prune → a
    key-equality filter that reads a handful of row groups. No shuffle
    when few files survive pruning (AQE collapses the tiny aggregate).
  - Range scan: range predicate is pushed down; the LWW aggregate
    shuffles only surviving rows, partially aggregated map-side.
  - Ingest: one atomic manifest commit per batch — metadata, not data,
    is the serialization point; data writes are fully parallel.
  - Compaction folds many batch dirs into range-partitioned sorted
    Parquet (repartitionByRange by key), restoring manifest-level
    pruning power and bounding file counts — the leveled-compaction
    analogue (kv/db/db_impl.cpp:1031-1220).
"""

from __future__ import annotations

import bisect
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

from quasdb_spark.codec import CODECS, IdentityCodec
from quasdb_spark.manifest import CommitConflict, FileEntry, Manifest, Version
from quasdb_spark.plans.lww import state_view, state_view_window

LOG_FIELDS = [("key", StringType()), ("seq", LongType()), ("sub", LongType()),
              ("op", StringType()), ("value", StringType())]
LOG_SCHEMA = StructType([StructField(n, t, True) for n, t in LOG_FIELDS])


_RESERVED_COLS = ("key", "seq", "sub", "op")


def _log_schema(binary: bool,
                value_schema: StructType | None = None) -> StructType:
    kt = BinaryType() if binary else StringType()
    head = [StructField("key", kt, True), StructField("seq", LongType(), True),
            StructField("sub", LongType(), True),
            StructField("op", StringType(), True)]
    if value_schema is not None:
        return StructType(head + [StructField(f.name, f.dataType, True)
                                  for f in value_schema.fields])
    return StructType(head + [StructField("value", kt, True)])


def _parse_value_schema(value_schema) -> StructType | None:
    """Accept a StructType or a DDL string ('n long, total double')."""
    if value_schema is None or isinstance(value_schema, StructType):
        schema = value_schema
    else:
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(value_schema)
        if not isinstance(schema, StructType):
            raise ValueError("value_schema must describe a struct of "
                             f"columns, got {schema.simpleString()}")
    if schema is not None:
        for f in schema.fields:
            if f.name in _RESERVED_COLS:
                raise ValueError(f"value_schema column {f.name!r} collides "
                                 f"with a reserved log column "
                                 f"{_RESERVED_COLS}")
    return schema


PUT, DEL = "put", "del"

# Footer reads above this fan out as a Spark job instead of driver threads.
_DIST_STATS_MIN_FILES = 33


def _footer_stats(path: str) -> tuple:
    """(rows, bytes, min_key, max_key, seq_lo, seq_hi) from one Parquet
    footer. Module-level (picklable) so it can run inside a Spark task."""
    import os as _os

    import pyarrow.parquet as pq

    nbytes = _os.path.getsize(path)
    md = pq.ParquetFile(path).metadata
    mn = mx = slo = shi = None
    try:
        arrow = md.schema.to_arrow_schema()
        idx = arrow.get_field_index("key")
        sidx = arrow.get_field_index("seq")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st and st.has_min_max:
                mn = st.min if mn is None or st.min < mn else mn
                mx = st.max if mx is None or st.max > mx else mx
            if sidx >= 0:
                ss = md.row_group(rg).column(sidx).statistics
                if ss and ss.has_min_max:
                    slo = ss.min if slo is None or ss.min < slo else slo
                    shi = ss.max if shi is None or ss.max > shi else shi
    except Exception:
        pass
    return md.num_rows, nbytes, mn, mx, slo, shi


def _dir_generation(name: str) -> int:
    """Generation a data dir belongs to, recovered from its name
    (RepairDB path): 'compact-g<N>-...' -> N; legacy 'compact-...'
    outputs predate tiers -> 1; anything else is a fresh batch -> 0."""
    if name.startswith("compact-g"):
        digits = name[len("compact-g"):].split("-", 1)[0]
        if digits.isdigit():
            return int(digits)
    return 1 if name.startswith("compact-") else 0


def prefix_successor(prefix: str) -> str | None:
    """Smallest string greater than every string with ``prefix`` —
    rewrites a prefix scan into a range scan (the reference's
    FindShortSuccessor idea, kv/util/comparator.cpp:60-76)."""
    # Operates in code-point space to match Spark's string comparison
    # semantics (not raw UTF-8 bytes as the reference's comparator does).
    cps = list(prefix)
    while cps:
        last = ord(cps[-1])
        if last < 0x10FFFF:
            # skip the surrogate gap, which is unencodable in UTF-8
            nxt = 0xE000 if last == 0xD7FF else last + 1
            return "".join(cps[:-1]) + chr(nxt)
        cps.pop()
    return None  # prefix was all U+10FFFF — unbounded


def prefix_successor_bytes(prefix: bytes) -> bytes | None:
    """Bytes analogue of prefix_successor: smallest byte string greater
    than every byte string starting with ``prefix`` (the reference's
    FindShortSuccessor over raw bytes, kv/util/comparator.cpp:60-76)."""
    b = bytearray(prefix)
    while b:
        if b[-1] < 0xFF:
            b[-1] += 1
            return bytes(b)
        b.pop()
    return None  # prefix was all 0xFF — unbounded


def _read_normalizable(dtype) -> bool:
    """True when a pyarrow read of this Spark type can be normalized
    to the EXACT python values a Spark collect returns (under the
    engine's pinned UTC session): the plain atomic types, timestamps/
    dates/decimals, and maps/arrays/structs thereof."""
    from pyspark.sql import types as T

    atomic = (T.StringType, T.BinaryType, T.LongType, T.IntegerType,
              T.ShortType, T.ByteType, T.DoubleType, T.FloatType,
              T.BooleanType, T.TimestampType, T.DateType, T.DecimalType)
    if isinstance(dtype, atomic):
        return True
    if isinstance(dtype, T.ArrayType):
        return _read_normalizable(dtype.elementType)
    if isinstance(dtype, T.MapType):
        return (_read_normalizable(dtype.keyType)
                and _read_normalizable(dtype.valueType))
    if isinstance(dtype, T.StructType):
        return all(_read_normalizable(f.dataType) for f in dtype.fields)
    return False


def _arrow_to_spark_conv(dtype):
    """A converter making pyarrow's to_pylist() value for ``dtype``
    identical to Spark's collect() value, or None when they already
    agree. Timestamps: pyarrow yields tz-aware datetimes for
    Spark-written (isAdjustedToUTC) parquet, Spark yields session-tz
    naive ones — under the engine's pinned UTC session the wall time
    is the UTC instant. Maps: pair-list -> dict. Structs: dict ->
    Row in declared field order (what a Spark collect returns)."""
    import datetime as _dt

    from pyspark.sql import Row
    from pyspark.sql import types as T

    if isinstance(dtype, T.TimestampType):
        def conv(v):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            if not type(v) is _dt.datetime:
                # INT96/nanos parquet reads back as pandas.Timestamp
                # (ns resolution); Spark values are micros — exact
                v = v.to_pydatetime()
            return v
        return conv
    if isinstance(dtype, T.ArrayType):
        ec = _arrow_to_spark_conv(dtype.elementType)
        if ec is None:
            return None
        return lambda v: [None if x is None else ec(x) for x in v]
    if isinstance(dtype, T.MapType):
        kc = _arrow_to_spark_conv(dtype.keyType) or (lambda x: x)
        vc = _arrow_to_spark_conv(dtype.valueType) or (lambda x: x)

        def conv(v):
            pairs = v.items() if isinstance(v, dict) else v
            return {kc(k): (None if x is None else vc(x))
                    for k, x in pairs}
        return conv
    if isinstance(dtype, T.StructType):
        names = [f.name for f in dtype.fields]
        convs = [_arrow_to_spark_conv(f.dataType) or (lambda x: x)
                 for f in dtype.fields]
        R = Row(*names)

        def conv(v):
            return R(*[None if v[n] is None else c(v[n])
                       for n, c in zip(names, convs)])
        return conv
    return None


class EmbeddedCompactionUnsupported(RuntimeError):
    """A compaction scope / store shape the bounded Spark-free embedded
    rewriter cannot handle (scoped options, row bound, or a value
    schema only Spark can read). Callers that MUST compact open the
    store with ``KVStore.open(spark, path)``; the auto-compaction tick
    (``maybe_compact``) swallows this and defers maintenance instead of
    failing a write that already committed (ADVICE r13)."""


class _FooterCache:
    """Bounded FIFO cache of parsed Parquet footers and committed-dir
    listings for the driver point-read engine — the analogue of the
    reference's table cache (kv/db/table_cache.cpp:39-131) layered on
    its FIFO cache (kv/util/cache.cpp:152-445; FIFO rather than LRU is
    the reference's own deviation, kept here). Entries are keyed by
    (path, size, mtime_ns): store files and committed data dirs are
    immutable (ingest writes errorifexists, compaction outputs fresh
    dirs), so a key match proves the cached footer/listing is current,
    and vacuumed paths simply age out of the FIFO. FileMetaData
    objects are immutable and safely shared across server threads;
    every read opens its OWN ParquetFile handle with ``metadata=`` so
    no file handle is ever shared (and the footer is never re-parsed).
    """

    def __init__(self, capacity: int = 512):
        import collections
        import threading

        self.capacity = capacity
        self._footers = collections.OrderedDict()
        self._dirs = collections.OrderedDict()
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0

    def _stat_key(self, path: str):
        st = os.stat(path)
        return (path, st.st_size, st.st_mtime_ns)

    def open(self, path: str):
        """A ParquetFile over ``path`` whose footer comes from cache —
        caller owns (and must close) the returned handle."""
        import pyarrow.parquet as pq

        key = self._stat_key(path)
        with self._lock:
            md = self._footers.get(key)
            if md is not None:
                self.hits += 1
        if md is None:
            md = pq.read_metadata(path)
            with self._lock:
                self.misses += 1
                self._footers[key] = md
                while len(self._footers) > self.capacity:
                    self._footers.popitem(last=False)
        return pq.ParquetFile(path, metadata=md)

    def list_dir(self, path: str) -> list:
        """Cached recursive ``*.parquet`` listing of a committed dir.

        The cache key is the TOP-LEVEL dir's mtime, which a change
        inside a nested subdirectory does not touch — so a listing
        that found any subdirectory is returned fresh but NEVER
        cached (committed KV data dirs are flat by construction:
        ingest/compaction write unpartitioned parquet; anything
        nested, e.g. a partitionBy artifact, stays correct at the
        cost of a walk per call)."""
        try:
            st = os.stat(path)
        except FileNotFoundError:
            return []
        key = (path, st.st_mtime_ns)
        with self._lock:
            files = self._dirs.get(key)
            if files is not None:
                return files
        files = []
        flat = True
        for root, dirs, names in os.walk(path):
            if dirs:
                flat = False
            files += [os.path.join(root, n) for n in names
                      if n.endswith(".parquet")]
        files.sort()
        if flat:
            with self._lock:
                self._dirs[key] = files
                while len(self._dirs) > self.capacity:
                    self._dirs.popitem(last=False)
        return files

    def clear(self) -> None:
        with self._lock:
            self._footers.clear()
            self._dirs.clear()
            self.hits = self.misses = 0


_FOOTER_CACHE = _FooterCache()


class WriteBatch:
    """Reorderable op buffer — API parity with the reference's
    WriteBatch (kv/include/write_batch.h:11-59: Put/Delete/Clear/
    Append/Iterate/ApproximateSize). Apply with ``store.write(batch)``;
    ops land atomically in list order (newest wins on same key)."""

    def __init__(self):
        self.ops: list[tuple[str, str, str | None]] = []

    def put(self, key: str, value: str) -> "WriteBatch":
        self.ops.append((PUT, key, value))
        return self

    def delete(self, key: str) -> "WriteBatch":
        self.ops.append((DEL, key, None))
        return self

    def clear(self) -> None:
        self.ops.clear()

    def append(self, other: "WriteBatch") -> "WriteBatch":
        """WriteBatch::Append (kv/db/write_batch.cpp:166-175)."""
        self.ops.extend(other.ops)
        return self

    def __iter__(self):
        return iter(self.ops)

    def __len__(self) -> int:
        return len(self.ops)

    def approximate_size(self) -> int:
        """Rough byte size (the reference reports its encoded rep size,
        kv/include/write_batch.h:49)."""
        return sum(len(k) + len(v or "") + 16 for _, k, v in self.ops)


class KVStore:
    """A single store (one ordered keyspace). Thread-unsafe by design:
    like the reference, all writers serialize (kv/db/db_impl.cpp:1398)."""

    # Auto-compaction tunables (the reference's Options/config knobs,
    # kv/db/dbformat.h config::kL0_CompactionTrigger). Per-handle, like
    # LevelDB Options at open; auto_compact defaults OFF for ad-hoc
    # handles (unregistered as-of reads stay valid until the caller
    # compacts) and ON in the streaming ingest path, where dirs would
    # otherwise accumulate one-per-micro-batch forever.
    auto_compact: bool = False
    l0_compaction_trigger: int = 8
    level_compaction_trigger: int = 8
    vacuum_grace: float = 600.0
    # Seek-stats compaction (R3): a dir's seek budget is
    # max(floor, bytes / bytes_per_seek) — the reference's "one seek
    # costs what compacting 16 KB costs" model (version_set.cpp:775-790)
    seek_budget_bytes_per_seek: int = 16384
    seek_budget_floor: int = 16
    # Fresh-batch key blooms (A1 parity on L0): batches at or above
    # this row count get an adaptive parquet key bloom at write time;
    # below it the filter's ~16 KB smallest candidate would dominate
    # the dir (interactive write_batch dirs are hundreds of bytes).
    # Bulk ingests (row count unknown pre-write) always get one.
    _FRESH_BLOOM_MIN_ROWS: int = 4096
    # Abandoned scan_iter cursors pin their snapshot forever (the
    # generator finally-block never runs if the caller drops it);
    # vacuum reaps scan-* snapshots older than this (seconds).
    scan_snapshot_ttl: float = 6 * 3600.0
    # Footer-stats fan-out policy: the distributed path ships LOCAL
    # filesystem paths into tasks, which is only valid when executors
    # see the driver's filesystem — local[*] masters, or a shared
    # mount/object-store the operator vouches for with "always".
    # "auto" (default) = distributed only under a local master;
    # "never" = always driver-side threads. See SCALE.md §3.
    dist_stats: str = "auto"

    def __init__(self, spark: SparkSession, path: str):
        self._spark = spark
        self.path = os.path.abspath(path)
        self.manifest = Manifest(self.path)
        self.binary = False
        self.codec: type = IdentityCodec
        self.value_schema: StructType | None = None
        # Seek-stats compaction state (R3, kv/db/version_set.cpp:475-489
        # seeding :775-790): in-memory like the reference's
        # allowed_seeks — reads RECORD fragmentation cost here, the
        # next maybe_compact() tick ACTS on it (we have no background
        # thread; maintenance is the tick).
        self._seek_budget: dict[str, int] = {}
        self._seek_pending: tuple | None = None
        # Batch dirs THIS handle wrote with sync=False, flushed (fsync
        # file + dirents) before the next durable manifest commit — see
        # _flush_unsynced (ADVICE r13: without it a later sync=True
        # commit durably installed a CURRENT referencing earlier
        # unsynced, possibly-torn parquet).
        self._unsynced_dirs: list[str] = []
        if self.manifest.exists():
            self._load_config()

    @property
    def spark(self) -> SparkSession:
        """The attached session. On an EMBEDDED handle
        (``open_embedded``) there is none: every driver-engine
        operation (get/multi_get/scan_rows/scan_iter pages/interactive
        write_batch/snapshot/properties) works without ever reading
        this property; anything that genuinely needs a cluster —
        DataFrame scans, bulk ingest, compaction — lands here and gets
        a named error instead of an AttributeError deep in py4j."""
        if self._spark is None:
            raise RuntimeError(
                "this store handle is EMBEDDED (KVStore.open_embedded: "
                "no SparkSession attached). Point reads, bounded scans "
                "and interactive writes run driver-side; for DataFrame "
                "scans, bulk ingest or compaction open the store with "
                "KVStore.open(spark, path)")
        return self._spark

    @spark.setter
    def spark(self, value: SparkSession) -> None:
        self._spark = value

    @classmethod
    def open_embedded(cls, path: str, *,
                      auto_compact: bool = True) -> "KVStore":
        """Open an existing store WITHOUT a SparkSession — the
        reference's embedded-library model (kv/include/db.h:41: a DB
        handle is a library object, not a cluster client). Everything
        the driver engine serves works at embedded cost: get/multi_get
        (footer-pruned point reads), scan_rows/scan_iter (heap-merge
        bounded pages), snapshot/release, approximate_sizes, and
        interactive write_batch/put/delete (pyarrow file + flock-CAS
        manifest commit — the same cross-process-safe path the
        multi-writer tests race). Distributed surfaces raise a named
        RuntimeError. Used by RawStoreServer(workers=N) to serve one
        store from N processes.

        ``auto_compact`` defaults ON here (unlike Spark-attached ad-hoc
        handles): the reference's embedded DB schedules its own
        compaction from the write path (MakeRoomForWrite,
        kv/db/db_impl.cpp:1542-1619), so an embedded handle under
        interactive write load keeps itself at <= l0_compaction_trigger
        live dirs via the bounded Spark-free rewrite — no janitor loop
        needed. Stores past the embedded row bound (or with Spark-only
        value schemas) silently defer maintenance (the tick swallows
        EmbeddedCompactionUnsupported); pass ``auto_compact=False`` to
        opt out, e.g. while unregistered as-of readers are in flight."""
        st = cls(None, path)
        if not st.manifest.exists():
            raise FileNotFoundError(f"no store at {path}")
        st.auto_compact = auto_compact
        return st

    def _load_config(self) -> None:
        """Recover the data-model options persisted at create time."""
        import json as _json

        schema = self.manifest.current().schema or {}
        self.binary = schema.get("key_type") == "binary"
        cname = schema.get("codec", "identity")
        try:
            self.codec = CODECS[cname]
        except KeyError:
            # comparator.h:20-24 parity: a DB created with a custom
            # comparator can only open when that comparator is supplied
            raise LookupError(
                f"store at {self.path} was created with custom codec "
                f"{cname!r}; register it first via "
                "quasdb_spark.codec.register_codec / make_codec") from None
        vs = schema.get("value_schema")
        self.value_schema = (StructType.fromJson(_json.loads(vs))
                             if vs else None)
        # pre-knob stores have no record → snappy, the old behavior
        self.compression = schema.get("compression", "snappy")

    @property
    def log_schema(self) -> StructType:
        return _log_schema(self.binary, self.value_schema)

    @property
    def value_cols(self) -> list[str]:
        """User-facing value column names: the typed schema's fields, or
        the classic single ``value`` column."""
        return ([f.name for f in self.value_schema.fields]
                if self.value_schema is not None else ["value"])

    # ---------------------------------------------------------- lifecycle
    # Per-store on-disk compression (options.h:109-110 parity:
    # kNoCompression | kSnappyCompression, default snappy — extended
    # with the Parquet codecs both engines read: zstd for cold data,
    # gzip for legacy). "none" is the incompressible-value escape
    # hatch (pre-compressed blobs, encrypted payloads) the reference
    # exposes per-DB.
    COMPRESSIONS = ("snappy", "none", "zstd", "gzip")

    @classmethod
    def create(cls, spark: SparkSession, path: str, *, binary: bool = False,
               codec: type | str | None = None,
               value_schema: StructType | str | None = None,
               compression: str = "snappy") -> "KVStore":
        """Create a store. ``binary=True`` makes keys/values raw byte
        strings (slice.h parity, bytewise order). ``codec`` installs a
        custom comparator as an order-preserving key codec (A4); string
        stores only — binary stores already have bytewise order, the
        reference default.

        ``value_schema`` (SURVEY §1.4; a StructType or DDL string like
        ``"n long, total double"``) makes the store's value a set of
        TYPED columns instead of one string: rows are stored as native
        Parquet columns, so reads get column pruning and predicate
        pushdown on value fields — the idiomatic face the reference's
        byte-string contract (kv/include/slice.h:13-26) can't offer.
        put/get then speak dicts; state()/scan() return the typed
        columns."""
        st = cls(spark, path)
        if st.manifest.exists():
            raise FileExistsError(f"store already exists at {path}")
        st.manifest.init(schema=cls._schema_dict(binary, codec, value_schema,
                                                 compression))
        st._load_config()
        return st

    @staticmethod
    def _sniff_compression(data_root: str) -> str:
        """The store's on-disk codec, read from the first data file's
        column metadata (RepairDB recovers options from the data where
        the data records them). Unknown/no files → snappy default."""
        import pyarrow.parquet as pq

        for name in sorted(os.listdir(data_root)):
            d = os.path.join(data_root, name)
            if not os.path.isdir(d):
                continue
            for root, _dirs, files in os.walk(d):
                for f in sorted(files):
                    if not f.endswith(".parquet"):
                        continue
                    md = pq.read_metadata(os.path.join(root, f))
                    if md.num_row_groups:
                        got = md.row_group(0).column(0).compression
                        mapped = {"UNCOMPRESSED": "none",
                                  "SNAPPY": "snappy", "ZSTD": "zstd",
                                  "GZIP": "gzip"}.get(got)
                        if mapped:
                            return mapped
        return "snappy"

    @classmethod
    def _schema_dict(cls, binary: bool, codec: type | str | None,
                     value_schema: StructType | str | None = None,
                     compression: str = "snappy") -> dict:
        import json as _json

        name = (codec if isinstance(codec, str)
                else codec.name if codec is not None else "identity")
        if name not in CODECS:
            raise ValueError(f"unknown codec {name!r}")
        if binary and name != "identity":
            raise ValueError("codecs apply to string stores; binary "
                             "stores use bytewise order already")
        vs = _parse_value_schema(value_schema)
        if binary and vs is not None:
            raise ValueError("value_schema applies to string-key stores; "
                             "binary stores keep the byte-string contract")
        if compression not in cls.COMPRESSIONS:
            raise ValueError(f"unknown compression {compression!r}; "
                             f"one of {cls.COMPRESSIONS}")
        kt = "binary" if binary else "string"
        out = {"columns": [n for n, _ in LOG_FIELDS],
               "key_type": kt, "value_type": kt, "codec": name,
               "compression": compression}
        if vs is not None:
            out["value_type"] = "struct"
            out["columns"] = list(_RESERVED_COLS) + [f.name for f in vs.fields]
            out["value_schema"] = _json.dumps(vs.jsonValue())
        return out

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "KVStore":
        st = cls(spark, path)
        if not st.manifest.exists():
            raise FileNotFoundError(f"no store at {path}")
        return st

    @classmethod
    def open_or_create(cls, spark: SparkSession, path: str, *,
                       binary: bool = False,
                       codec: type | str | None = None,
                       value_schema: StructType | str | None = None,
                       compression: str = "snappy") -> "KVStore":
        st = cls(spark, path)
        if not st.manifest.exists():
            st.manifest.init(schema=cls._schema_dict(binary, codec,
                                                     value_schema,
                                                     compression))
            st._load_config()
        return st

    @classmethod
    def repair(cls, spark: SparkSession, path: str, *, binary: bool = False,
               codec: type | str | None = None,
               value_schema: StructType | str | None = None,
               compression: str | None = None) -> "KVStore":
        """RepairDB (declared by the reference, kv/include/db.h:112-116;
        LevelDB semantics: rebuild metadata from the data files).
        Reconstructs a fresh manifest from the data dirs on disk — per-dir
        key ranges, row counts, byte sizes and seq ranges all come from
        Parquet footers (metadata-only, parallel/distributed like every
        ingest-stats pass; no data scan). Any surviving manifest is moved
        aside, not deleted.

        Lost by design (the repair contract): registered snapshots and
        streaming batch-id positions — they exist only in manifest
        metadata. Data, LWW semantics, and as-of reads at row seqs are
        fully recovered. The caller supplies the data-model options
        (binary/codec) since the schema record lived in the manifest.
        """
        import shutil
        import time

        st = cls(spark, path)
        data_root = os.path.join(st.path, "data")
        if not os.path.isdir(data_root):
            raise FileNotFoundError(f"no data directory at {data_root}")
        if compression is None:
            # recover the store's codec from the data itself (every
            # Parquet column chunk records it) rather than silently
            # resetting an incompressible-value store to snappy
            compression = cls._sniff_compression(data_root)
        if os.path.isdir(st.manifest.dir):
            shutil.move(st.manifest.dir,
                        st.manifest.dir + f".corrupt-{int(time.time())}")
        st.manifest.init(schema=cls._schema_dict(binary, codec, value_schema,
                                                 compression))
        st._load_config()
        entries, last_seq = [], 0
        for name in sorted(os.listdir(data_root)):
            full = os.path.join(data_root, name)
            if not os.path.isdir(full):
                continue
            stats = st._dir_stats(full)
            if stats["rows"] == 0:
                continue
            seq_lo = stats["seq_lo"] if stats["seq_lo"] is not None else 0
            seq_hi = stats["seq_hi"] if stats["seq_hi"] is not None else seq_lo
            entries.append(FileEntry(
                path=os.path.join("data", name), seq_lo=seq_lo,
                seq_hi=seq_hi, rows=stats["rows"], bytes=stats["bytes"],
                min_key=stats["min_key"], max_key=stats["max_key"],
                level=_dir_generation(name)))
            last_seq = max(last_seq, seq_hi)
        st._meta_commit(lambda v: {"add": entries, "last_seq": last_seq})
        return st

    # ------------------------------------------------------ key space
    def _enc(self, key):
        """User key -> stored key (codec encode / bytes passthrough)."""
        if self.binary:
            if not isinstance(key, (bytes, bytearray)):
                raise TypeError(f"binary store requires bytes keys, got "
                                f"{type(key).__name__}")
            return bytes(key)
        stored = self.codec.encode(key)
        if not isinstance(stored, str):
            # Guard the write/read boundary: IdentityCodec passes any
            # type through, so without this a bytes key lands in the
            # string key column and every later read fails confusingly
            # (or not at all). Fail here, before anything is committed.
            raise TypeError(
                f"string store requires str keys (codec "
                f"{self.codec.name!r} encoded {type(key).__name__} to "
                f"{type(stored).__name__}); create the store with "
                f"binary=True for bytes keys")
        return stored

    def _dec(self, stored):
        """Stored key -> user key."""
        if self.binary:
            return bytes(stored)
        return self.codec.decode(stored)

    def _enc_value(self, value):
        if value is None:
            return (None,) * len(self.value_cols) \
                if self.value_schema is not None else None
        if self.value_schema is not None:
            # typed store: value is a mapping of field -> value; missing
            # fields store NULL, unknown fields are an error
            if not isinstance(value, dict):
                raise TypeError("typed store requires dict values "
                                f"({', '.join(self.value_cols)}), got "
                                f"{type(value).__name__}")
            unknown = set(value) - set(self.value_cols)
            if unknown:
                raise ValueError(f"unknown value fields {sorted(unknown)}; "
                                 f"schema has {self.value_cols}")
            return tuple(value.get(f) for f in self.value_cols)
        if self.binary:
            if not isinstance(value, (bytes, bytearray)):
                raise TypeError(f"binary store requires bytes values, got "
                                f"{type(value).__name__}")
            return bytes(value)
        if not isinstance(value, str):
            raise TypeError(f"string store requires str values, got "
                            f"{type(value).__name__}; create the store "
                            f"with binary=True for bytes values")
        return value

    def _enc_bound(self, key):
        """Encode a user range bound (None passes through)."""
        return None if key is None else self._enc(key)

    def _next_key(self, stored):
        """Smallest stored key greater than ``stored`` (exclusive-start
        cursor bound; valid in encoded space, never decoded)."""
        return stored + (b"\x00" if self.binary else "\0")

    def _stat_key(self, stored):
        """Stored key -> the manifest-stats representation (binary keys
        are kept as lowercase hex, which preserves bytewise order)."""
        if stored is None:
            return None
        return stored.hex() if self.binary else stored

    def _decode_keys(self, df: DataFrame, col: str = "key") -> DataFrame:
        """Decode a stored-key column for user-facing output. Identity
        and binary stores are pass-through (zero cost); codec stores
        decode via an Arrow-batched pandas UDF — applied only on result
        surfaces, after ordering and limits, never in the storage path."""
        if self.binary or self.codec is IdentityCodec:
            return df
        codec = self.codec  # don't capture self in the UDF closure
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(StringType())
        def dec(s):
            return s.map(codec.decode)

        return df.withColumn(col, dec(F.col(col)))

    def destroy(self) -> None:
        """DestroyDB analogue (kv/db/db_impl.cpp:1790-1825)."""
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)

    # ------------------------------------------------------------- writes
    def put(self, key: str, value: str, *, sync: bool = True) -> int:
        return self.write_batch([(PUT, key, value)], sync=sync)

    def delete(self, key: str, *, sync: bool = True) -> int:
        """Tombstone write; deleting a missing key is not an error
        (kv/include/db.h:69)."""
        return self.write_batch([(DEL, key, None)], sync=sync)

    def write_batch(self, ops: list[tuple[str, str, str | None]],
                    *, sync: bool = True) -> int:
        """Atomically apply [(op, key, value), ...]; returns the batch's
        seq. Atomicity = single manifest commit: either the whole batch
        is in the current version or none of it is (WriteBatch,
        kv/include/write_batch.h:11-59).

        ``sync=False`` is the reference's ``WriteOptions::sync=false``
        (kv/include/options.h:149-155): skip every fsync on this
        write's data/manifest path. The commit stays ATOMIC (rename
        semantics are unchanged) but is not power-loss durable — an OS
        crash may lose the tail of recent unsynced batches, and, as in
        the reference, a machine crash can require ``repair()`` (which
        rebuilds the manifest from surviving data footers, DestroyDB/
        RepairDB parity). Measured on the interactive driver path the
        fsyncs are ~58% of wall (~8 ms/batch, tools/fsync_tax_ab.py) —
        the same throughput-vs-durability trade the reference defaults
        the OTHER way on; we keep sync=True as the safe default.

        Mixed modes compose like the reference's shared log: a
        ``sync=True`` write first flushes every earlier ``sync=False``
        batch this handle wrote (file bytes + dirents) before its own
        durable manifest commit, so the synced write's durability is
        never poisoned by an unsynced predecessor (ADVICE r13; see
        ``_flush_unsynced``). Unsynced writes from OTHER processes
        stay non-durable until their own handle syncs or compacts."""
        if not ops:
            return self.manifest.current().last_seq
        # encode through the store's codec / validate binary payloads
        # up front (driver-side, tiny), so stored order == codec order
        enc_ops = [(op, self._enc(k), self._enc_value(v))
                   for op, k, v in ops]

        typed = self.value_schema is not None

        # Interactive batches go DRIVER-side (pyarrow write, no Spark
        # job — the reference's Put cost model); big batches and
        # unmappable value types take the parallel Spark writer. The
        # schema is computed ONCE here and threaded through to the
        # commit (not recomputed per retry).
        arrow_schema = (self._arrow_log_schema()
                        if len(enc_ops) <= self._DRIVER_WRITE_MAX_ROWS
                        else None)
        if arrow_schema is None and self._spark is None:
            # fail BEFORE any manifest work: an embedded handle has no
            # parallel writer to fall back to
            raise RuntimeError(
                f"embedded handle: batch of {len(enc_ops)} rows "
                f"exceeds the driver write limit "
                f"({self._DRIVER_WRITE_MAX_ROWS}) or the value schema "
                "needs the Spark writer — split the batch or open the "
                "store with KVStore.open(spark, path)")

        def build(seq):
            # intra-batch order: position in the list, per the
            # reference's replay-in-order semantics
            rows = [(k, seq, i, op, *v) if typed else (k, seq, i, op, v)
                    for i, (op, k, v) in enumerate(enc_ops)]
            if arrow_schema is not None:
                return (rows, arrow_schema), len(rows)
            return self.spark.createDataFrame(rows, self.log_schema), len(rows)

        return self._append_with_retry(build, sync=sync)

    def write(self, batch: "WriteBatch", *, sync: bool = True) -> int:
        """DB::Write(options, batch) parity (kv/db/db_impl.cpp:1396)."""
        return self.write_batch(list(batch), sync=sync)

    def ingest(self, df: DataFrame, *, op_col: str | None = None,
               key_col: str = "key", value_col: str = "value",
               sub_col: str | None = None) -> int:
        """Bulk atomic ingest of a DataFrame as ONE batch (one seq).

        ``op_col`` None means all rows are puts. ``sub_col`` provides the
        intra-batch order for same-key rows; without it, same-key rows
        within one bulk batch have no defined order (documented
        relaxation — pass sub_col when it matters). No global sort or
        window is imposed, so this scales linearly.
        """
        def build(seq):
            return self._log_projection(df, seq, key_col, value_col,
                                        op_col, sub_col), None

        return self._append_with_retry(build)

    def _log_projection(self, df: DataFrame, seq: int, key_col: str,
                        value_col: str, op_col: str | None,
                        sub_col: str | None) -> DataFrame:
        kt = "binary" if self.binary else "string"
        key = F.col(key_col).cast(kt)
        if not self.binary and self.codec is not IdentityCodec:
            # bulk writes under a custom comparator: encode keys with an
            # Arrow-batched UDF so stored order == codec order (the one
            # Python touch in the bulk path; identity stores pay nothing)
            codec = self.codec
            from pyspark.sql.functions import pandas_udf

            @pandas_udf(StringType())
            def enc(s):
                return s.map(codec.encode)

            key = enc(key)
        head = [
            key.alias("key"),
            F.lit(seq).cast("long").alias("seq"),
            (F.col(sub_col).cast("long") if sub_col else F.lit(0).cast("long")).alias("sub"),
            (F.col(op_col) if op_col else F.lit(PUT)).alias("op"),
        ]
        if self.value_schema is not None:
            # typed store: the value columns come straight off the input
            # DataFrame, cast to the declared types (value_col ignored)
            return df.select(*head, *[
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in self.value_schema.fields])
        return df.select(*head, F.col(value_col).cast(kt).alias("value"))

    def ingest_batch(self, df: DataFrame, stream_id: str, batch_id: int,
                     **ingest_kwargs) -> int | None:
        """Idempotent micro-batch ingest for Structured Streaming
        (foreachBatch). A replayed batch (id <= last committed for this
        stream) is a no-op, giving exactly-once store commits on top of
        at-least-once batch delivery — the WAL-recovery analogue
        (kv/db/db_impl.cpp:322-560). Returns the batch seq, or None if
        the batch was already committed."""
        key_col = ingest_kwargs.pop("key_col", "key")
        value_col = ingest_kwargs.pop("value_col", "value")
        op_col = ingest_kwargs.pop("op_col", None)
        sub_col = ingest_kwargs.pop("sub_col", None)

        def build(seq):
            return self._log_projection(df, seq, key_col, value_col,
                                        op_col, sub_col), None

        return self._append_with_retry(
            build,
            skip_if=lambda ver: ver.streams.get(stream_id, -1) >= batch_id,
            streams_update=lambda ver: {**ver.streams, stream_id: batch_id})

    def _append_with_retry(self, build, *, skip_if=None, streams_update=None,
                           retries: int = 8, sync: bool = True) -> int | None:
        """Run one append commit, retrying on CommitConflict (another
        writer won the seq). Each retry re-reads the live version and
        re-stamps the batch at the new seq — ``build(seq)`` must return
        (df, n_rows|None) and be safe to re-evaluate. Mirrors losing a
        round of the reference's writer queue and re-queueing
        (kv/db/db_impl.cpp:1398-1414)."""
        last = None
        for _ in range(retries):
            ver = self.manifest.current()
            if skip_if is not None and skip_if(ver):
                return None
            seq = ver.last_seq + 1
            df, n_rows = build(seq)
            try:
                streams = streams_update(ver) if streams_update else None
                if isinstance(df, tuple):  # driver-side small batch:
                    rows, arrow_schema = df  # (rows, schema) from build
                    self._commit_append_rows(ver, rows, seq, arrow_schema,
                                             streams=streams, sync=sync)
                else:
                    self._commit_append(ver, df, seq, n_rows=n_rows,
                                        streams=streams)
                if self.auto_compact:
                    self.maybe_compact()
                return seq
            except CommitConflict as e:
                last = e
        raise CommitConflict(
            f"gave up after {retries} retries: {last}") from last

    def _flush_unsynced(self) -> None:
        """fsync (file bytes + dirents) every batch dir this handle
        wrote with ``sync=False``, then forget them. Called before any
        DURABLE manifest commit, so a durable CURRENT can never
        reference an earlier unsynced (possibly torn after power loss)
        file — reference parity: WriteOptions::sync=true on the single
        shared log makes all PRECEDING unsynced writes durable too
        (kv/include/options.h:149-155; one log, one fsync). Here each
        batch is its own file, so the pending set is flushed
        explicitly. Unsynced writes by OTHER handles/processes are out
        of scope, as in the reference (each process owns its log)."""
        if not self._unsynced_dirs:
            return
        parents = set()
        for d in self._unsynced_dirs:
            try:
                names = os.listdir(d)
            except FileNotFoundError:
                continue  # compacted/vacuumed away — nothing to flush
            for fn in names:
                fp = os.path.join(d, fn)
                # another PROCESS of this multi-writer store can
                # compact/vacuum a file between listdir and open — the
                # file being gone means it was superseded by a DURABLE
                # compaction commit, so skipping it keeps the flush
                # contract (ADVICE r14 #5: this must never fail a
                # put()/snapshot() whose commit would succeed)
                try:
                    fd = os.open(fp, os.O_RDONLY)
                except (FileNotFoundError, IsADirectoryError):
                    continue
                try:
                    os.fsync(fd)
                finally:
                    os.close(fd)
            parents.add(d)
            parents.add(os.path.dirname(d))
        for p in sorted(parents, reverse=True):  # leaves before parents
            try:
                fd = os.open(p, os.O_RDONLY)
            except FileNotFoundError:
                continue  # the whole dir was vacuumed mid-flush
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        self._unsynced_dirs.clear()

    def _meta_commit(self, mutate, retries: int = 16) -> Version:
        """Metadata-only commit with conflict retry: ``mutate(ver)``
        returns commit kwargs (or None to no-op)."""
        last = None
        for _ in range(retries):
            ver = self.manifest.current()
            kwargs = mutate(ver)
            if kwargs is None:
                return ver
            try:
                if kwargs.get("durable", True):
                    self._flush_unsynced()
                self.manifest.commit(ver, **kwargs)
                return ver
            except CommitConflict as e:
                last = e
        raise CommitConflict(
            f"gave up after {retries} retries: {last}") from last

    def _arrow_log_schema(self):
        """The log schema as pyarrow types, or None when a value type
        has no mapping (the driver write path then defers to Spark).
        TimestampType is deliberately unmapped: Spark interprets naive
        datetimes in the SESSION timezone before storing UTC micros,
        pyarrow would assume UTC — identical only when the session tz
        is UTC, so timestamp-valued stores always write AND read via
        Spark (the same gate guards the driver read path — pyarrow
        would also read those types back differently: tz-aware
        datetimes, maps as list-of-pairs). Memoized per store config
        since every fast-path get consults it."""
        import pyarrow as pa
        from pyspark.sql import types as T

        cache_key = self.log_schema.simpleString()
        if getattr(self, "_arrow_schema_key", None) == cache_key:
            return self._arrow_schema_val

        mapping = {T.StringType: pa.string(), T.BinaryType: pa.binary(),
                   T.LongType: pa.int64(), T.IntegerType: pa.int32(),
                   T.DoubleType: pa.float64(), T.FloatType: pa.float32(),
                   T.BooleanType: pa.bool_()}
        fields = []
        result = None
        for f in self.log_schema.fields:
            at = mapping.get(type(f.dataType))
            if at is None:
                fields = None
                break
            fields.append(pa.field(f.name, at))
        if fields is not None:
            result = pa.schema(fields)
        self._arrow_schema_key = cache_key
        self._arrow_schema_val = result
        return result

    # Batches at or below this row count are written by the DRIVER
    # (pyarrow, no Spark job) — the Put()/WriteBatch cost model of the
    # reference (kv/db/db_impl.cpp:1396: an interactive write is a
    # memtable insert, not a cluster job). Above it, the Spark path
    # writes in parallel and adds the adaptive key bloom; the
    # thresholds deliberately coincide so every Spark-written batch
    # dir carries a bloom and every driver-written one is too small
    # to want it.
    _DRIVER_WRITE_MAX_ROWS: int = 4096

    def _commit_append_rows(self, ver: Version, rows: list, seq: int,
                            arrow_schema,
                            streams: dict[str, int] | None = None,
                            sync: bool = True) -> int:
        """Driver-side small-batch append: sort by key, write ONE
        parquet file with pyarrow (same log schema Spark reads back),
        commit the manifest entry. Milliseconds instead of a Spark
        job round trip; identical on-disk contract (sorted file,
        footer min/max stats, manifest FileEntry)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rel = os.path.join("data", f"b{seq:015d}-{uuid.uuid4().hex[:8]}")
        full = os.path.join(self.path, rel)
        os.makedirs(full)
        names = [f.name for f in self.log_schema.fields]
        ordered = sorted(rows, key=lambda r: r[0])
        table = pa.Table.from_pydict(
            {n: [r[i] for r in ordered] for i, n in enumerate(names)},
            schema=arrow_schema)
        try:
            fpath = os.path.join(full, "part-00000.parquet")
            pq.write_table(table, fpath,
                           compression="NONE" if self.compression == "none"
                           else self.compression)
            # durability order: data bytes reach disk BEFORE the
            # manifest commit that references them — otherwise a power
            # loss can leave a durable manifest pointing at torn
            # parquet (review r12; the manifest side fsyncs its own
            # renames in _atomic_write). And the DIRECTORY ENTRIES:
            # the file's bytes being durable doesn't make its dirent
            # durable, nor the new batch dir's dirent in data/ — fsync
            # both so a durable manifest can never reference a missing
            # file (ADVICE r12). sync=False (WriteOptions::sync=false
            # parity) skips all of it — atomic but not power-loss
            # durable; see write_batch.
            if sync:
                # earlier sync=False batches FIRST: this durable commit
                # installs a CURRENT that references them too
                self._flush_unsynced()
                dfd = os.open(fpath, os.O_RDONLY)
                try:
                    os.fsync(dfd)
                finally:
                    os.close(dfd)
                for d in (full, os.path.dirname(full)):
                    ddir = os.open(d, os.O_RDONLY)
                    try:
                        os.fsync(ddir)
                    finally:
                        os.close(ddir)
            stats = self._dir_stats(full)
            entry = FileEntry(path=rel, seq_lo=seq, seq_hi=seq,
                              rows=len(rows), bytes=stats["bytes"],
                              min_key=stats["min_key"],
                              max_key=stats["max_key"], level=0)
            self.manifest.commit(ver, add=[entry], last_seq=seq,
                                 streams=streams, durable=sync)
            if not sync:
                self._unsynced_dirs.append(full)
        except CommitConflict:
            import shutil

            shutil.rmtree(full, ignore_errors=True)
            raise
        return len(rows)

    def _commit_append(self, ver: Version, df: DataFrame, seq: int,
                       n_rows: int | None = None,
                       streams: dict[str, int] | None = None) -> int:
        rel = os.path.join("data", f"b{seq:015d}-{uuid.uuid4().hex[:8]}")
        full = os.path.join(self.path, rel)
        # Sort within partitions by key: gives each Parquet file tight
        # min/max row-group stats for later range pruning (the SSTable
        # sorted-order analogue) without a global shuffle.
        w = df.sortWithinPartitions("key").write \
              .option("compression", self.compression)
        # Key bloom on LARGE fresh batches (reference parity: every
        # SSTable carries a filter block, kv/table/filter_block.cpp:9-24)
        # so point gets on recent, not-yet-compacted data skip row
        # groups too — a read-hot store with ingest/compaction lag
        # otherwise pays full row-group reads on its newest data.
        # parquet-mr's ADAPTIVE bloom sizes the filter from the ACTUAL
        # NDV observed while writing (smallest candidate that fits), so
        # no row-count estimate is needed for bulk ingests; the gate
        # only skips small interactive write_batches, where the
        # adaptive filter's ~16 KB smallest candidate would dwarf the
        # data (measured: a 3-row dir grows 710 B -> 17 KB with it).
        if n_rows is None or n_rows >= self._FRESH_BLOOM_MIN_ROWS:
            w = (w.option("parquet.bloom.filter.enabled#key", "true")
                  .option("parquet.bloom.filter.adaptive.enabled", "true")
                  .option("parquet.bloom.filter.max.bytes",
                          str(1024 * 1024)))
        w.mode("errorifexists").parquet(full)
        stats = self._dir_stats(full)
        entry = FileEntry(path=rel, seq_lo=seq, seq_hi=seq,
                          rows=n_rows if n_rows is not None else stats["rows"],
                          bytes=stats["bytes"], min_key=stats["min_key"],
                          max_key=stats["max_key"], level=0)
        try:
            # durable commit — earlier sync=False driver batches first
            self._flush_unsynced()
            self.manifest.commit(ver, add=[entry], last_seq=seq, streams=streams)
        except CommitConflict:
            # the data dir was never installed — remove it so the retry
            # (which re-stamps at a new seq) doesn't leak orphans
            import shutil

            shutil.rmtree(full, ignore_errors=True)
            raise
        return entry.rows

    def _dir_stats(self, full_path: str) -> dict:
        """Per-dir (rows, bytes, min_key, max_key) from Parquet footers.

        ADVICE r1 / VERDICT #10: never a serial O(files) driver walk —
        small dirs read footers on a driver thread pool (I/O-bound,
        no job-scheduling latency); dirs above _DIST_STATS_MIN_FILES
        fan the footer reads out as a tiny Spark job so a bulk ingest
        writing thousands of files scales with the cluster, not the
        driver.
        """
        paths = []
        for root, _dirs, files in os.walk(full_path):
            paths.extend(os.path.join(root, fn) for fn in files
                         if fn.endswith(".parquet"))
        if len(paths) >= _DIST_STATS_MIN_FILES and self._dist_stats_safe():
            per_file = (self.spark.sparkContext
                        .parallelize(sorted(paths),
                                     min(len(paths) // 4 + 1, 64))
                        .map(_footer_stats).collect())
        elif len(paths) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(min(8, len(paths))) as pool:
                per_file = list(pool.map(_footer_stats, sorted(paths)))
        else:
            per_file = [_footer_stats(p) for p in paths]
        rows = sum(r for r, _b, _mn, _mx, _sl, _sh in per_file)
        nbytes = sum(b for _r, b, _mn, _mx, _sl, _sh in per_file)
        mins = [mn for _r, _b, mn, _mx, _sl, _sh in per_file if mn is not None]
        maxs = [mx for _r, _b, _mn, mx, _sl, _sh in per_file if mx is not None]
        slos = [sl for _r, _b, _mn, _mx, sl, _sh in per_file if sl is not None]
        shis = [sh for _r, _b, _mn, _mx, _sl, sh in per_file if sh is not None]
        if self.binary:
            # JSON-safe, order-preserving representation of byte keys
            as_str = lambda x: bytes(x).hex()
        else:
            as_str = lambda x: x.decode() if isinstance(x, bytes) else x
        return {"rows": rows, "bytes": nbytes,
                "min_key": as_str(min(mins)) if mins else None,
                "max_key": as_str(max(maxs)) if maxs else None,
                "seq_lo": min(slos) if slos else None,
                "seq_hi": max(shis) if shis else None}

    def _dist_stats_safe(self) -> bool:
        """Whether tasks may read the store's files by driver-local
        path (the distributed footer-stats fan-out)."""
        if self.dist_stats == "always":
            return True
        if self.dist_stats == "never":
            return False
        try:
            master = self.spark.conf.get("spark.master", "")
        except Exception:
            master = ""
        return master.startswith("local")

    # -------------------------------------------------------------- reads
    def _surviving_files(self, ver: Version, *, lo_stat=None, hi_stat=None,
                         key_stats=None, asof: int | None = None) -> list:
        """Manifest pruning shared by the Spark scan (log_df) and the
        driver point-read path — ONE implementation so the two engines
        cannot diverge (the reference's FindFile level pruning,
        kv/db/version_set.cpp:96-119). ``key_stats`` must be sorted;
        a file survives a key_stats prune only if some requested key
        falls inside its [min_key, max_key]."""
        out = []
        for f in ver.files:
            if asof is not None and f.seq_lo > asof:
                continue
            if lo_stat is not None and f.max_key is not None \
                    and f.max_key < lo_stat:
                continue
            if hi_stat is not None and f.min_key is not None \
                    and f.min_key >= hi_stat:
                continue
            if (key_stats is not None and f.min_key is not None
                    and f.max_key is not None):
                i = bisect.bisect_left(key_stats, f.min_key)
                if i >= len(key_stats) or key_stats[i] > f.max_key:
                    continue
            out.append(f)
        return out

    def log_df(self, *, key_from=None, key_to=None,
               asof: int | None = None, keys: list | None = None) -> DataFrame:
        """Raw op-log DataFrame over manifest-pruned files. Bounds are
        in STORED key space (encoded; bytes for binary stores).

        Manifest-level pruning by (min_key, max_key) and seq mirrors the
        reference's FindFile level pruning (kv/db/version_set.cpp:96-119);
        Parquet stats prune row groups inside the surviving files.

        ``keys`` (stored space) prunes PER KEY: a file survives only if
        at least one requested key falls inside its [min_key, max_key]
        — two scattered keys no longer keep every file between them
        alive, the way a single min→max envelope would (the reference
        probes each table's range per key too, version_set FindFile per
        Get). ``key_from``/``key_to`` still apply as the read filter.
        """
        ver = self.manifest.current()
        survivors = self._surviving_files(
            ver, lo_stat=self._stat_key(key_from),
            hi_stat=self._stat_key(key_to),
            key_stats=(sorted(self._stat_key(k) for k in keys)
                       if keys else None),
            asof=asof)
        paths = [os.path.join(self.path, f.path) for f in survivors]
        if key_from is not None or key_to is not None:
            self._record_seeks(survivors)
        if not paths:
            return self.spark.createDataFrame([], self.log_schema)
        df = self.spark.read.schema(self.log_schema).parquet(*paths)
        if key_from is not None:
            df = df.where(F.col("key") >= F.lit(key_from))
        if key_to is not None:
            df = df.where(F.col("key") < F.lit(key_to))
        if asof is not None:
            df = df.where(F.col("seq") <= asof)
        return df

    def state(self, asof: int | None = None, *, key_from=None,
              key_to=None, keys: list | None = None) -> DataFrame:
        """The live (key, value) map at ``asof`` (DBIter semantics).
        Bounds and returned keys are in STORED key space; the public
        ``scan`` surface handles user-space encode/decode."""
        log = self.log_df(key_from=key_from, key_to=key_to, asof=asof,
                          keys=keys)
        return state_view(log, None).select("key", *self.value_cols)

    def _row_value(self, row):
        """A result row's user-facing value: bytes (binary), a dict of
        typed fields (typed store), or the plain string."""
        if self.value_schema is not None:
            return {f: row[f] for f in self.value_cols}
        v = row["value"]
        return bytes(v) if self.binary and v is not None else v

    # Point-read engine: "driver" answers get()/multi_get() with a
    # pyarrow footer-pruned read on the DRIVER — no Spark job, so a
    # point get costs milliseconds like the reference's embedded Get()
    # (kv/db/db_impl.cpp:1292-1349) instead of a job-scheduling round
    # trip. "spark" forces the distributed path (same results — pinned
    # by test). Range SCANS always stay in Spark: they return
    # DataFrames and scale with the cluster; only single-key/IN
    # lookups, whose result is driver-sized by definition, take the
    # driver path. The store's data contract is a DRIVER-VISIBLE
    # filesystem (same assumption _dir_stats/os.walk already make
    # everywhere, SCALE.md §3) so no path-scheme guard is needed; the
    # schema gate below defers stores whose value types pyarrow would
    # read back differently from Spark (timestamps: session-tz vs
    # naive-UTC; maps: list-of-pairs vs dict) to the Spark path.
    point_read_engine: str = "driver"

    def _driver_reads_ok(self) -> bool:
        if self.point_read_engine != "driver":
            return False
        if self._arrow_log_schema() is not None:
            return True
        # typed stores whose value columns pyarrow reads back
        # DIFFERENTLY from Spark (timestamps: tz-aware vs session-naive;
        # maps: pair-lists vs dicts; structs: dicts vs Rows) are served
        # through a read-side normalizer (_value_normalizer) that makes
        # the driver engine's python values bit-identical to a Spark
        # collect under the engine's pinned UTC session — closing the
        # workers=N fail-fast for builtin typed codecs (VERDICT r13 #8).
        # The WRITE side stays gated on _arrow_log_schema: those types
        # still write through Spark.
        return (self.value_schema is not None
                and all(_read_normalizable(f.dataType)
                        for f in self.value_schema.fields))

    def _value_normalizer(self):
        """Row-dict converter for driver-engine reads of typed stores
        outside the plain arrow mapping, or None when pyarrow already
        returns Spark-identical values. Memoized per store config
        (every point get consults it)."""
        cache_key = self.log_schema.simpleString()
        if getattr(self, "_norm_key", None) == cache_key:
            return self._norm_val
        result = None
        if self._arrow_log_schema() is None and self.value_schema is not None:
            convs = {f.name: _arrow_to_spark_conv(f.dataType)
                     for f in self.value_schema.fields}
            convs = {n: c for n, c in convs.items() if c is not None}
            if convs:
                def normalize(row: dict) -> dict:
                    for n, c in convs.items():
                        if n in row and row[n] is not None:
                            row[n] = c(row[n])
                    return row
                result = normalize
        self._norm_key = cache_key
        self._norm_val = result
        return result

    def _dir_parquet_files(self, rel: str) -> list:
        """Parquet files under a committed data dir, via the footer
        cache's dir listing (committed dirs are immutable — ingest
        writes with errorifexists, compaction outputs a fresh dir)."""
        return _FOOTER_CACHE.list_dir(os.path.join(self.path, rel))

    def _driver_point_winners(self, encs: list, asof: int | None) -> dict:
        """LWW winner row per stored key via pyarrow (driver-side, no
        Spark job): the SAME manifest pruning as log_df
        (_surviving_files), then per-file row-group reads whose key/seq
        stats prune like the dataset scan did. Tombstone winners are
        dropped (NotFound). Tie-break mirrors state_view's
        max_by(struct(seq, sub)): null sub orders below any integer.

        Two serving-loop refinements over a flat dataset scan
        (reference parity noted on each):
        - NEWEST-FIRST EARLY STOP (version_set.cpp:391-473 search
          order: newest file first, first hit wins): survivors are
          consulted in descending seq_hi order and a key leaves the
          probe set once its best-so-far seq strictly exceeds every
          remaining dir's seq_hi — a hot key with thousands of
          uncompacted versions reads only the newest dir that contains
          it instead of shipping every version to the driver.
        - FOOTER CACHE (table_cache.cpp:39-131 + the FIFO block cache,
          cache.cpp:152-445): parsed Parquet footers and dir listings
          are cached in a bounded FIFO keyed by (path, size, mtime), so
          a repeated-key serving loop pays ~one row-group read per get,
          not a footer parse per file per request.

        Seek-stats accounting charges only the dirs actually CONSULTED
        (the reference charges allowed_seeks on files probed, not files
        that merely overlap), so a get answered entirely by the newest
        dir drains no budget."""
        stat_pairs = sorted((self._stat_key(k), k) for k in set(encs))
        ver = self.manifest.current()
        survivors = self._surviving_files(
            ver, key_stats=[s for s, _ in stat_pairs], asof=asof)
        if not survivors:
            return {}
        order = sorted(survivors, key=lambda f: f.seq_hi, reverse=True)
        # suffix_max[i] = max seq_hi over order[i+1:] — the resolution
        # bar after consulting dir i
        suffix_max = [0] * len(order)
        run = -1
        for i in range(len(order) - 1, 0, -1):
            run = max(run, order[i].seq_hi)
            suffix_max[i - 1] = run
        pending = dict(stat_pairs)  # stat key -> enc key, still unresolved
        best: dict = {}
        consulted = []
        for i, f in enumerate(order):
            if not pending:
                break
            if f.min_key is not None and f.max_key is not None:
                wanted = [e for s, e in pending.items()
                          if f.min_key <= s <= f.max_key]
            else:
                wanted = list(pending.values())
            if not wanted:
                continue
            consulted.append(f)
            for r in self._read_point_rows(f.path, sorted(wanted), asof):
                sub = r.get("sub")
                o = (r["seq"], 0 if sub is None else 1,
                     0 if sub is None else sub)
                k = r["key"]
                if k not in best or o > best[k][0]:
                    best[k] = (o, r)
            bar = suffix_max[i]
            for s in [s for s, e in pending.items()
                      if e in best and best[e][0][0] > bar]:
                del pending[s]
        self._record_seeks(consulted)  # charges nothing below 2 dirs
        return {k: r for k, (_, r) in best.items() if r["op"] != DEL}

    def _read_point_rows(self, rel: str, wanted: list,
                         asof: int | None) -> list:
        """Rows matching ``wanted`` keys (sorted) in one data dir:
        cached-footer row-group pruning on key min/max + seq min, then
        read-and-filter of the surviving groups only. Parquet stats may
        be truncated for long strings — stored min <= true min and
        stored max >= true max, so the interval check stays
        conservative; groups without stats are always read."""
        import pyarrow as pa
        import pyarrow.compute as pc

        out = []
        for path in self._dir_parquet_files(rel):
            pf = _FOOTER_CACHE.open(path)
            try:
                names = pf.schema_arrow.names
                ki, si = names.index("key"), names.index("seq")
                groups = []
                for g in range(pf.metadata.num_row_groups):
                    ks = pf.metadata.row_group(g).column(ki).statistics
                    if ks is not None and ks.has_min_max:
                        j = bisect.bisect_left(wanted, ks.min)
                        if j >= len(wanted) or wanted[j] > ks.max:
                            continue
                    if asof is not None:
                        ss = pf.metadata.row_group(g).column(si).statistics
                        if ss is not None and ss.has_min_max \
                                and ss.min > asof:
                            continue
                    groups.append(g)
                if not groups:
                    continue
                tbl = pf.read_row_groups(groups)
            finally:
                pf.close()
            mask = pc.is_in(tbl.column("key"), value_set=pa.array(
                wanted, type=tbl.schema.field("key").type))
            if asof is not None:
                mask = pc.and_(mask, pc.less_equal(
                    tbl.column("seq"), pa.scalar(asof, pa.int64())))
            out.extend(tbl.filter(mask).to_pylist())
        norm = self._value_normalizer()
        if norm is not None:
            out = [norm(r) for r in out]
        return out

    def get(self, key, asof: int | None = None):
        """Point lookup (kv/db/db_impl.cpp:1292-1349). Returns None for
        missing/deleted keys (NotFound convention → None)."""
        enc = self._enc(key)
        if self._driver_reads_ok():
            win = self._driver_point_winners([enc], asof).get(enc)
            return None if win is None else self._row_value(win)
        rows = (self.state(asof, key_from=enc, key_to=self._next_key(enc))
                .where(F.col("key") == F.lit(enc)).limit(1).collect())
        if not rows:
            return None
        return self._row_value(rows[0])

    def multi_get(self, keys: list, asof: int | None = None) -> dict:
        """Batched point lookup: ONE pruned scan with an IN filter
        (vs N get() round trips). Missing/deleted keys are absent from
        the result (NotFound convention). Manifest pruning is PER KEY
        (log_df ``keys``/the driver dataset scan): two scattered keys
        scan only the dirs whose [min_key, max_key] actually contains
        one of them, not every dir between them; Parquet stats/bloom
        then prune inside the survivors."""
        if not keys:
            return {}
        encs = sorted(set(self._enc(k) for k in keys))
        if self._driver_reads_ok():
            wins = self._driver_point_winners(encs, asof)
            return {self._dec(k): self._row_value(r)
                    for k, r in wins.items()}
        lo, hi = encs[0], self._next_key(encs[-1])
        st = self.state(asof, key_from=lo, key_to=hi, keys=encs) \
                 .where(F.col("key").isin(encs))
        return {self._dec(r["key"]): self._row_value(r) for r in st.collect()}

    def _driver_range_winners(self, lo, hi, *, asof: int | None,
                              reverse: bool, limit: int) -> list:
        """Bounded range scan on the DRIVER (no Spark job): the
        reference's NewIterator two-level heap merge
        (kv/db/db_impl.cpp:1351-1362; kv/table/two_level_iterator.cc)
        re-expressed over Parquet row groups.

        Manifest-pruned dirs contribute their row groups overlapping
        [lo, hi) as merge units ordered by key stats (cached footers —
        no data read to plan the merge). Units are consumed in key
        order; a buffered key FINALIZES once every unread unit's
        key-range provably starts past it (truncated Parquet string
        stats stay conservative: stored min <= true min), at which
        point its LWW winner — max_by(seq, sub), the same contract as
        state_view and _driver_point_winners — is emitted (tombstone
        winners drop the key). The scan STOPS after ``limit`` live
        keys, so it reads only the row groups needed to fill the page,
        not the range: a bounded /scan costs ~one row-group read, the
        Get() cost model extended to Seek+Next*limit.

        Memory is bounded by row-group overlap (sorted ingest/compact
        output overlaps little) plus one decoded row group. Seek-stats
        accounting matches the Spark path (log_df): survivors are
        charged when the scan is key-bounded, so alternating engines
        can't drift the compaction pressure.

        Execution is Arrow-vectorized with LATE MATERIALIZATION: the
        merge reads only (key, seq, sub, op) — never the value columns
        — resolves winners with one vectorized sort + last-per-key
        mask per finalization (ascending (key, seq, sub) with nulls
        first IS the max_by(seq, sub)/null-sub-below contract), and
        only the <= limit EMITTED winner rows fetch their values, by
        row position from the cached-footer row group. On an
        L0-heavy store (every file spans the key range — the regime
        compaction exists to fix) this is ~15x faster than row-wise
        resolution: 50-row pages over a 150k-row uncompacted store
        dropped p50 282 ms -> 18 ms (profile: to_pylist + a Python
        dict loop were 95% of the page); compacted pages read
        p50 2.5 ms."""
        units = []   # (order_key, path, group_idx)
        ver = self.manifest.current()
        survivors = self._surviving_files(
            ver, lo_stat=self._stat_key(lo), hi_stat=self._stat_key(hi),
            asof=asof)
        if lo is not None or hi is not None:
            self._record_seeks(survivors)
        for f in survivors:
            for path in self._dir_parquet_files(f.path):
                pf = _FOOTER_CACHE.open(path)
                try:
                    names = pf.schema_arrow.names
                    ki, si = names.index("key"), names.index("seq")
                    for g in range(pf.metadata.num_row_groups):
                        md = pf.metadata.row_group(g)
                        ks = md.column(ki).statistics
                        kmin = kmax = None
                        if ks is not None and ks.has_min_max:
                            kmin, kmax = ks.min, ks.max
                            # stats may be truncated: stored min <=
                            # true min and stored max >= true max, so
                            # both prunes below stay conservative
                            if hi is not None and kmin >= hi:
                                continue
                            if lo is not None and kmax < lo:
                                continue
                        if asof is not None:
                            ss = md.column(si).statistics
                            if ss is not None and ss.has_min_max \
                                    and ss.min > asof:
                                continue
                        units.append((kmin if not reverse else kmax,
                                      path, g))
                finally:
                    pf.close()
        # stat-less units sort FIRST (they could contain anything, so
        # nothing finalizes until they are read)
        units.sort(key=lambda u: ((u[0] is not None, u[0])
                                  if not reverse else
                                  (u[0] is None, u[0] or b"" if self.binary
                                   else u[0] or "")),
                   reverse=reverse)
        import pyarrow as pa
        import pyarrow.compute as pc

        buffered: list = []   # merge-column tables w/ provenance
        out: list = []
        for i, (_, path, g) in enumerate(units):
            t = self._read_range_merge(path, g, i, lo, hi, asof)
            if t is not None:
                buffered.append(t)
            frontier = units[i + 1][0] if i + 1 < len(units) else None
            done = i + 1 >= len(units)
            if (not done and frontier is None) or not buffered:
                continue  # a stat-less unit is still unread
            merged = pa.concat_tables(buffered).combine_chunks()
            if done:
                ready, keep = merged, None
            else:
                cut = (pc.greater(merged["key"], frontier) if reverse
                       else pc.less(merged["key"], frontier))
                ready = merged.filter(cut)
                keep = merged.filter(pc.invert(cut))
            buffered = [keep] if keep is not None and len(keep) else []
            if not len(ready):
                continue
            # vectorized LWW: ascending (key, seq, sub) with nulls
            # first == max_by(struct(seq, sub)) with null sub below
            # any integer; the LAST row of each key run is the winner
            s = ready.take(pc.sort_indices(
                ready, sort_keys=[("key", "ascending"),
                                  ("seq", "ascending"),
                                  ("sub", "ascending")],
                null_placement="at_start")).combine_chunks()
            keys = s["key"].combine_chunks()
            n = len(s)
            if n > 1:
                neq = pc.not_equal(keys.slice(0, n - 1), keys.slice(1, n))
                last = pa.chunked_array([neq, pa.array([True])])
            else:
                last = pa.array([True] * n)
            winners = s.filter(last)
            live = winners.filter(pc.not_equal(winners["op"], DEL))
            if reverse:
                live = live.take(pa.array(range(len(live) - 1, -1, -1),
                                          type=pa.int64()))
            take_n = min(limit - len(out), len(live))
            out.extend(self._materialize_winners(
                live.slice(0, take_n), units))
            if len(out) >= limit:
                return out
        return out

    def _materialize_winners(self, winners, units) -> list:
        """LATE value fetch for emitted winner rows: group by source
        row group, read ONLY the value columns from the cached footer,
        take by row position — the merge itself never decodes
        values."""
        import pyarrow.compute as pc

        if not len(winners):
            return []
        rows: list = [None] * len(winners)
        uids = winners["_uid"].to_pylist()
        poss = winners["_pos"].to_pylist()
        keys = winners["key"].to_pylist()
        by_unit: dict = {}
        for i, u in enumerate(uids):
            by_unit.setdefault(u, []).append(i)
        for u, idxs in by_unit.items():
            _, path, g = units[u]
            pf = _FOOTER_CACHE.open(path)
            try:
                vt = pf.read_row_groups([g], columns=self.value_cols)
            finally:
                pf.close()
            picked = vt.take(pc.cast(
                winners["_pos"].take(idxs), "int64"))
            vals = picked.to_pylist()
            norm = self._value_normalizer()
            if norm is not None:
                vals = [norm(r) for r in vals]
            for j, i in enumerate(idxs):
                r = vals[j]
                k = keys[i]
                if self.binary:
                    k = bytes(k)
                rows[i] = (k, r)
        return [(k, r) for k, r in rows]

    def _read_range_merge(self, path: str, group: int, uid: int, lo, hi,
                          asof: int | None):
        """One row group's MERGE columns (key, seq, sub, op) inside
        [lo, hi) at ``asof`` (pyarrow, cached footer), plus provenance
        (_uid = merge-unit index, _pos = row position inside the row
        group) so winners can late-fetch their values. Returns None
        when nothing survives the filter."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        pf = _FOOTER_CACHE.open(path)
        try:
            tbl = pf.read_row_groups([group],
                                     columns=["key", "seq", "sub", "op"])
        finally:
            pf.close()
        kt = tbl.schema.field("key").type
        mask = None
        if lo is not None:
            mask = pc.greater_equal(tbl.column("key"), pa.scalar(lo, kt))
        if hi is not None:
            m2 = pc.less(tbl.column("key"), pa.scalar(hi, kt))
            mask = m2 if mask is None else pc.and_(mask, m2)
        if asof is not None:
            m3 = pc.less_equal(tbl.column("seq"), pa.scalar(asof, pa.int64()))
            mask = m3 if mask is None else pc.and_(mask, m3)
        if mask is None:
            pos = pa.array(np.arange(len(tbl), dtype=np.int64))
            sub = tbl
        else:
            pos = pc.indices_nonzero(mask)
            if not len(pos):
                return None
            sub = tbl.take(pos)
            pos = pc.cast(pos, "int64")
        # normalize to NULLABLE merge fields: Spark-ingested dirs carry
        # required (non-null) parquet fields where driver-written dirs
        # are optional, and concat_tables in the heap merge refuses the
        # mix (r13: surfaced by the first store to interleave a bulk
        # ingest with embedded write_batches and then scan_rows it)
        merge_schema = pa.schema([
            pa.field("key", kt), pa.field("seq", pa.int64()),
            pa.field("sub", pa.int64()), pa.field("op", pa.string())])
        sub = pa.Table.from_arrays(
            [sub.column(n).cast(merge_schema.field(n).type)
             for n in merge_schema.names], schema=merge_schema)
        return (sub.append_column("_uid", pa.array(
                    np.full(len(sub), uid, dtype=np.int64)))
                .append_column("_pos", pos))

    def scan_rows(self, key_from=None, key_to=None, *,
                  asof: int | None = None, reverse: bool = False,
                  limit: int = 1000, prefix=None) -> list:
        """Bounded range scan returning DRIVER-LOCAL [(key, value)]
        rows — the serving surface behind /scan. With the driver read
        engine (point_read_engine='driver' and a pyarrow-safe schema)
        this never launches a Spark job: manifest-pruned heap merge
        over cached-footer row groups with early stop at ``limit``
        (_driver_range_winners — single-digit-ms pages, like get()).
        Other stores fall back to the Spark scan; both engines return
        IDENTICAL rows (pinned by tests/test_serving.py). Unbounded
        result sets belong on the DataFrame surface (``scan``), which
        scales with the cluster instead of the driver."""
        if limit is None or limit <= 0:
            raise ValueError("scan_rows is the BOUNDED scan surface: "
                             "pass a positive limit (use scan() for "
                             "unbounded DataFrame results)")
        if prefix is not None:
            if self.binary:
                lo, hi = prefix, prefix_successor_bytes(prefix)
            else:
                enc_p = self.codec.encode_prefix(prefix)
                lo, hi = enc_p, prefix_successor(enc_p)
        else:
            lo, hi = self._enc_bound(key_from), self._enc_bound(key_to)
        if self._driver_reads_ok():
            wins = self._driver_range_winners(lo, hi, asof=asof,
                                              reverse=reverse,
                                              limit=limit)
            return [(self._dec(k), self._row_value(r)) for k, r in wins]
        rows = self._scan_stored(lo, hi, asof=asof, reverse=reverse,
                                 limit=limit).collect()
        return [(self._dec(r["key"]), self._row_value(r)) for r in rows]

    def scan_iter(self, key_from: str | None = None,
                  key_to: str | None = None, *, asof: int | None = None,
                  reverse: bool = False, page_size: int = 10000):
        """Keyset-paginated iterator over scan results — the cursor
        surface (Seek/Next, S3/S5) for driver-side consumers that want
        bounded memory. Each page is one TakeOrderedAndProject job.
        ``reverse=True`` walks the range backwards (DBIter::Prev parity,
        kv/db/db_iter.cpp:230-314): same [key_from, key_to) bounds and
        the same pinned snapshot, pages ordered descending, the cursor
        tightening the EXCLUSIVE upper bound page by page.

        Snapshot consistency across pages: when no ``asof`` is given, a
        snapshot is REGISTERED at the current seq (and released when the
        iterator is exhausted or closed), so a compaction running
        mid-iteration must retain every version this cursor reads — the
        reference's iterator-pins-a-snapshot semantics
        (kv/db/db_impl.cpp:1351-1362). Physical file safety comes from
        deferred vacuum (see compact). Abandoned cursors (a generator
        the caller never exhausts or closes) are reaped by vacuum's
        scan-snapshot janitor after ``scan_snapshot_ttl`` seconds."""
        import time as _time

        pinned = None
        if asof is None:
            pinned = f"scan-{int(_time.time())}-{uuid.uuid4().hex[:8]}"
            asof = self.snapshot(pinned)
        # the cursor lives in STORED key space: an exclusive-start bound
        # (last_stored + "\0") is always valid there even when it is not
        # itself a decodable key; the reverse cursor needs no successor
        # trick at all because the upper bound is already exclusive
        lo, hi = self._enc_bound(key_from), self._enc_bound(key_to)
        try:
            while True:
                # pages ride the driver heap-merge engine when the
                # store supports it (r11: same rows as the Spark page,
                # pinned by the engines-agree/randomized tests, at
                # ms cost instead of a Spark job per page); the cursor
                # math below is engine-independent stored-key space
                if self._driver_reads_ok():
                    wins = self._driver_range_winners(
                        lo, hi, asof=asof, reverse=reverse,
                        limit=page_size)
                    rows = [{"key": k, **r} for k, r in wins]
                else:
                    rows = self._scan_stored(lo, hi, asof=asof,
                                             reverse=reverse,
                                             limit=page_size).collect()
                if not rows:
                    return
                yield from ((self._dec(r["key"]), self._row_value(r))
                            for r in rows)
                if len(rows) < page_size:
                    return
                last = (bytes(rows[-1]["key"]) if self.binary
                        else rows[-1]["key"])
                if reverse:
                    hi = last
                else:
                    lo = self._next_key(last)
        finally:
            if pinned is not None:
                self.release_snapshot(pinned)

    def _scan_stored(self, key_from=None, key_to=None, *,
                     asof: int | None = None, reverse: bool = False,
                     limit: int | None = None) -> DataFrame:
        """Ordered scan in STORED key space (no decode)."""
        out = self.state(asof, key_from=key_from, key_to=key_to)
        out = out.orderBy(F.col("key").desc() if reverse else F.col("key").asc())
        if limit is not None:
            out = out.limit(limit)
        return out

    def scan(self, key_from=None, key_to=None, *,
             asof: int | None = None, reverse: bool = False,
             limit: int | None = None, prefix=None) -> DataFrame:
        """Ordered range scan [key_from, key_to) in COMPARATOR order —
        the NewIterator + Seek/Next/Prev surface
        (kv/db/db_impl.cpp:1351-1362). Reverse scan = ORDER BY key DESC
        (DBIter::Prev, kv/db/db_iter.cpp:230-314). ``limit`` turns the
        global sort into TakeOrderedAndProject. Under a codec, bounds
        and ordering follow the codec's total order (comparator changes
        every ordering op, kv/include/comparator.h:14-52); returned keys
        are decoded after ordering/limit."""
        if prefix is not None:
            if self.binary:
                key_from, key_to = prefix, prefix_successor_bytes(prefix)
                return self._scan_stored(key_from, key_to, asof=asof,
                                         reverse=reverse, limit=limit)
            # prefix match commutes with per-char codecs: k startswith p
            # iff encode(k) startswith encode_prefix(p)
            enc_p = self.codec.encode_prefix(prefix)
            out = self._scan_stored(enc_p, prefix_successor(enc_p),
                                    asof=asof, reverse=reverse, limit=limit)
            return self._decode_keys(out)
        out = self._scan_stored(self._enc_bound(key_from),
                                self._enc_bound(key_to),
                                asof=asof, reverse=reverse, limit=limit)
        return self._decode_keys(out)

    def versions(self, key, asof: int | None = None) -> DataFrame:
        """All versions of a key, newest first (debug/introspection)."""
        enc = self._enc(key)
        log = self.log_df(key_from=enc, key_to=self._next_key(enc), asof=asof)
        return self._decode_keys(
            state_view_window(log.where(F.col("key") == F.lit(enc)), None,
                              keep_versions=1 << 30))

    # --------------------------------------------------------- snapshots
    def snapshot(self, name: str | None = None) -> int:
        """GetSnapshot (kv/db/db_impl.cpp:1373-1383): registers the
        current last_seq so compaction retains visibility at it. Returns
        the seq to pass as ``asof``. Unregistered as-of reads also work
        (data is immutable until compaction drops old versions)."""
        out = {}

        def mutate(ver):
            snap_name = name or f"s{ver.last_seq}-{uuid.uuid4().hex[:6]}"
            out["seq"] = ver.last_seq
            return {"snapshots": {**ver.snapshots, snap_name: ver.last_seq}}

        self._meta_commit(mutate)
        return out["seq"]

    def release_snapshot(self, name_or_seq: str | int) -> None:
        """ReleaseSnapshot: by NAME releases exactly that snapshot; by
        SEQ (all an anonymous ``snapshot()`` caller holds) releases the
        user snapshots registered at that seq but NEVER a scan cursor's
        pinned snapshot (``scan-…``, released by the iterator itself or
        the vacuum janitor) — a live iterator must not lose retention
        because an unrelated snapshot at the same seq was released
        (review r12 finding)."""
        def mutate(ver):
            if isinstance(name_or_seq, str):
                snaps = {n: s for n, s in ver.snapshots.items()
                         if n != name_or_seq}
            else:
                snaps = {n: s for n, s in ver.snapshots.items()
                         if s != name_or_seq or n.startswith("scan-")}
            return None if snaps == ver.snapshots else {"snapshots": snaps}

        self._meta_commit(mutate)

    # -------------------------------------------------------- maintenance
    def compaction_score(self) -> tuple[float, int]:
        """Size-TIERED compaction picking (the bounded-amplification
        analogue of VersionSet::Finalize + MaxBytesForLevel,
        kv/db/version_set.cpp:41-54, 1217-1259): dirs carry a
        GENERATION (FileEntry.level — 0 = fresh batch, g+1 = output of
        folding generation-g dirs). Each generation is scored by dir
        count over its trigger; the fullest tier (lowest generation on
        ties) is the pick.

        Why count, not bytes: our outputs overlap in key space until
        re-folded, so dir count is exactly what degrades manifest
        pruning and scan fan-in — the reference's L0 special-casing,
        generalized to every tier.

        Amplification contract: folding tier g touches ONLY tier-g
        dirs, and a generation-(g+1) dir holds ~trigger generation-g
        dirs, so a record is rewritten at most once per generation and
        generations grow geometrically — per-record write amplification
        is O(log_trigger(store/batch)), independent of store size
        (VERDICT r4: one-level rewrites made each compaction touch the
        whole keyspace scope).

        Returns (score, generation): score >= 1.0 means fold
        ``generation`` now."""
        ver = self.manifest.current()
        counts: dict[int, int] = {}
        for f in ver.files:
            counts[f.level] = counts.get(f.level, 0) + 1
        best_score, best_gen = 0.0, 0
        for g in sorted(counts):
            trig = (self.l0_compaction_trigger if g == 0
                    else self.level_compaction_trigger)
            s = counts[g] / trig
            if s > best_score:
                best_score, best_gen = s, g
        return best_score, best_gen

    def _record_seeks(self, survivors: list) -> None:
        """Seek-stats accounting (R3, version_set.cpp:475-489): a
        bounded read that still has to merge MULTIPLE dirs pays a
        fragmentation tax — charge one seek to every surviving dir.
        A well-compacted range (one dir survives pruning) charges
        nothing, so budgets only drain where reads actually suffer.
        When a dir's budget (max(floor, bytes/bytes_per_seek) — the
        reference's "one seek costs ~16 KB of compaction" model)
        hits zero, its key range is queued; the next maybe_compact()
        tick runs a range-scoped compaction there ("this file keeps
        getting probed — compact it"). State is in-memory per handle,
        exactly like the reference's allowed_seeks."""
        if len(survivors) < 2:
            return
        for f in survivors:
            left = self._seek_budget.get(f.path)
            if left is None:
                left = max(self.seek_budget_floor,
                           f.bytes // self.seek_budget_bytes_per_seek)
            left -= 1
            if left <= 0:
                self._seek_budget.pop(f.path, None)
                if self._seek_pending is None and f.min_key is not None:
                    self._seek_pending = (f.min_key, f.max_key)
            else:
                self._seek_budget[f.path] = left

    def maybe_compact(self) -> dict | None:
        """Auto-compaction maintenance hook (M2): when the pick score
        reaches 1.0, fold the picked GENERATION's dirs (only) into one
        next-generation dir, then vacuum unreferenced dirs older than
        ``vacuum_grace`` seconds (open readers keep working inside the
        grace window). No-op below the trigger. Invoked automatically
        after every append when ``auto_compact`` is set (the streaming
        ingest default — background_compaction_ analogue,
        kv/db/db_impl.cpp:658-740). Cost is bounded by the picked
        tier's bytes — never the store's (see compaction_score)."""
        score, gen = self.compaction_score()
        try:
            if score >= 1.0:
                if self._spark is None:
                    # the embedded rewriter is full-scope only; a tier
                    # fold is a strict subset of that, so full scope
                    # stands in (row-bounded either way)
                    stats = self.compact()
                    stats["scope"] = "embedded-full"
                else:
                    stats = self.compact(levels={gen})
                    stats["scope"] = f"tier{gen}"
            elif self._seek_pending is not None:
                # seek-triggered (R3): a hot range kept paying multi-dir
                # merge cost — fold the dirs overlapping the exhausted
                # dir's key range ("self-healing" for read-hot ranges the
                # size triggers never reach, version_set.cpp:475-489)
                if self._spark is None:
                    stats = self.compact()
                    stats["scope"] = "embedded-full"
                else:
                    lo, hi = self._seek_pending
                    stats = self.compact(_lo_stat=lo,
                                         _hi_stat=None if hi is None
                                         else hi + "\0")
                    stats["scope"] = "seek"
            else:
                return None
        except EmbeddedCompactionUnsupported:
            # the tick runs AFTER a write already committed — a store
            # past the embedded row bound (or with a Spark-only value
            # schema) defers maintenance to a Spark handle instead of
            # failing the committed write (ADVICE r13)
            self._seek_pending = None
            return None
        self._seek_pending = None
        self.vacuum(self.vacuum_grace)
        return stats

    def vacuum(self, grace_seconds: float | None = None) -> list[str]:
        """Physically delete data dirs no longer referenced by the
        current version (RemoveObsoleteFiles, kv/db/db_impl.cpp:248-320).
        Deletion is decoupled from compaction commits so lazy DataFrames
        and pinned cursors keep working until the operator opts in.
        ``grace_seconds`` defaults to ``vacuum_grace`` (600 s): besides
        the reader grace window, the grace is what protects a CONCURRENT
        writer's data dir that is written but not yet manifest-committed
        — at grace 0 this vacuum could delete it between its write and
        its commit, leaving a committed manifest pointing at nothing
        (review r12 finding). Pass an explicit 0.0 only when no other
        writer can be in flight. Also reaps expired scan-cursor
        snapshots (see ``scan_snapshot_ttl``)."""
        self.reap_scan_snapshots()
        if grace_seconds is None:
            grace_seconds = self.vacuum_grace
        return self.manifest.vacuum(grace_seconds)

    def reap_scan_snapshots(self, ttl: float | None = None) -> list[str]:
        """Release scan_iter snapshots older than ``ttl`` seconds
        (default: ``scan_snapshot_ttl``). Cursor snapshots embed their
        creation epoch in the name (scan-<epoch>-<id>); an abandoned
        iterator would otherwise pin compaction retention forever."""
        import time as _time

        ttl = self.scan_snapshot_ttl if ttl is None else ttl
        now = _time.time()

        def expired(name: str) -> bool:
            if not name.startswith("scan-"):
                return False
            parts = name.split("-")
            try:
                born = int(parts[1])
            except (IndexError, ValueError):
                return False
            return now - born > ttl

        reaped: list[str] = []

        def mutate(ver):
            stale = [n for n in ver.snapshots if expired(n)]
            if not stale:
                return None
            reaped[:] = stale
            return {"snapshots": {n: s for n, s in ver.snapshots.items()
                                  if n not in set(stale)}}

        self._meta_commit(mutate)
        return reaped

    def compact(self, *, target_files: int | None = None,
                key_from: str | None = None,
                key_to: str | None = None, vacuum: bool = False,
                levels: set[int] | None = None,
                drop_where=None, _lo_stat=None, _hi_stat=None) -> dict:
        """Major compaction (DoCompactionWork, kv/db/db_impl.cpp:1031-1220);
        pass key_from/key_to for manual range compaction (CompactRange),
        ``levels`` to fold only the given input levels (auto-compaction
        uses {0} so the cost is bounded by fresh data, not store size).

        ``drop_where`` (a Column over the stored log schema) physically
        purges matching rows during the rewrite — the retention-policy
        surface (DELETE WHERE; TSStore.drop_before builds on it). It
        applies AFTER snapshot retention, i.e. it overrides snapshot
        protection for the purged rows — by design: a retention purge
        must actually destroy the data. Only rows in the selected scope
        are affected.

        Rewrites the whole log keeping, per key, (a) the newest version
        and (b) the newest version <= each registered snapshot seq; when
        no snapshots are registered, tombstone rows are dropped entirely
        (obsolete-tombstone purge, kv/db/db_impl.cpp:1113-1130). Output is
        range-partitioned by key and sorted, restoring pruning power.
        State views at the latest seq and at every registered snapshot
        are bitwise-identical before and after (compaction-invariance,
        tested).

        EMBEDDED handles (KVStore.open_embedded / KVStore(None, path))
        run a bounded Spark-free compaction instead — see
        ``_compact_embedded``. Scoped options (key bounds, drop_where,
        target_files) need the parallel rewriter and raise there.
        """
        if self._spark is None:
            if (target_files is not None or key_from is not None
                    or key_to is not None or drop_where is not None
                    or _lo_stat is not None or _hi_stat is not None):
                raise EmbeddedCompactionUnsupported(
                    "embedded compaction supports only full-scope "
                    "compact() — open the store with "
                    "KVStore.open(spark, path) for range/drop_where/"
                    "sized maintenance")
            # a ``levels`` scope (auto-compaction's tier fold) is a
            # strict subset of the full-scope rewrite; the embedded
            # path is row-bounded anyway, so full scope stands in
            return self._compact_embedded(vacuum=vacuum)
        ver = self.manifest.current()
        if not ver.files:
            return {"files_before": 0, "files_after": 0}
        # Scoped compaction (CompactRange, kv/db/db_impl.cpp:646-740):
        # select whole input dirs overlapping [key_from, key_to) — rows
        # outside the range stay because their dirs are rewritten intact,
        # mirroring the reference's whole-file inputs. At 100 TB this is
        # the operational mode: compact hot key ranges incrementally
        # instead of rewriting the world.
        # _lo_stat/_hi_stat: internal stat-space bounds (seek-triggered
        # compaction passes manifest stats directly — they are already
        # in stored/stat space, so they must not be re-encoded)
        lo_stat = (_lo_stat if _lo_stat is not None
                   else self._stat_key(self._enc_bound(key_from)))
        hi_stat = (_hi_stat if _hi_stat is not None
                   else self._stat_key(self._enc_bound(key_to)))
        selected = []
        for f in ver.files:
            if levels is not None and f.level not in levels:
                continue
            if lo_stat is not None and f.max_key is not None and f.max_key < lo_stat:
                continue
            if hi_stat is not None and f.min_key is not None and f.min_key >= hi_stat:
                continue
            selected.append(f)
        if not selected:
            return {"files_before": len(ver.files), "files_after": len(ver.files)}
        full_scope = (len(selected) == len(ver.files)
                      and key_from is None and key_to is None
                      and _lo_stat is None and _hi_stat is None)
        paths = [os.path.join(self.path, f.path) for f in selected]
        log = self.spark.read.schema(self.log_schema).parquet(*paths)
        snaps = sorted(set(ver.snapshots.values()))
        # Tombstones may only be purged on a FULL-keyspace compaction:
        # a partial scope can't prove no older version hides in an
        # unselected dir (the reference's IsBaseLevelForKey check,
        # kv/db/db_impl.cpp:1113-1130; here the proof is scope totality).
        keep = self._retention_filter(log, snaps, ver.last_seq,
                                      purge_tombstones=full_scope)
        if drop_where is not None:
            keep = keep.where(~drop_where)

        # Output file-count: size outputs at ~128 MB of INPUT bytes
        # each (the M5 ShouldStopBefore analogue — the reference splits
        # at 2 MB because SSTables are point-get units; Parquet scan
        # units want HDFS-block-sized files). Byte-based, so a 100 TB
        # scope yields thousands of right-sized files while a tiny
        # local store folds to one — the previous dir-count heuristic
        # tracked neither. Compaction typically shrinks data (shadowed
        # versions drop), so input bytes over-estimate safely.
        target_bytes = 128 * 1024 * 1024
        in_bytes = sum(f.bytes for f in selected)
        n_out = target_files or max(1, -(-in_bytes // target_bytes))
        # output joins the NEXT generation after its newest input —
        # the tier ladder compaction_score picks from; the generation
        # is also encoded in the dir name so RepairDB can recover it
        out_level = max(f.level for f in selected) + 1
        rel = os.path.join(
            "data",
            f"compact-g{out_level}-{ver.version:06d}-{uuid.uuid4().hex[:8]}")
        full = os.path.join(self.path, rel)
        # Bloom filter on key: a point get skips row groups whose bloom
        # provably lacks the key — the SSTable bloom-filter analogue
        # (kv/util/bloom.cpp, kv/table/filter_block.cpp). Sized from the
        # manifest's known input row count (upper bound on NDV) so tiny
        # stores don't pay the default 1M-NDV bloom footprint.
        ndv = max(64, sum(f.rows for f in selected) // max(1, n_out))
        (keep.repartitionByRange(n_out, "key")
             .sortWithinPartitions("key", "seq", "sub")
             .write.option("compression", self.compression)
             .option("parquet.bloom.filter.enabled#key", "true")
             .option("parquet.bloom.filter.expected.ndv#key", str(ndv))
             .option("parquet.bloom.filter.max.bytes", str(1024 * 1024))
             .mode("errorifexists").parquet(full))
        stats = self._dir_stats(full)
        seq_hi = max(f.seq_hi for f in selected)
        entry = FileEntry(path=rel, seq_lo=0, seq_hi=seq_hi,
                          rows=stats["rows"], bytes=stats["bytes"],
                          min_key=stats["min_key"], max_key=stats["max_key"],
                          level=out_level)
        old_paths = {f.path for f in selected}
        # Conflict-retrying commit: a concurrent ingest only ADDS dirs,
        # so re-basing the same add/remove set is safe — input rows all
        # have seq <= the retention pass's last_seq, and later snapshots
        # can only be registered at seqs >= that, where the winner among
        # input rows is unchanged. A concurrent COMPACTION of the same
        # inputs is NOT safe to rebase over: if any input dir is already
        # gone from the live set, another compactor beat us and
        # installing our output would DUPLICATE every row it carries —
        # no-op instead and let the orphaned output dir be vacuumed
        # (review r12 finding; pinned by
        # test_concurrent_compaction_single_winner).
        committed = {"done": False}

        def _install(v):
            # Reset per attempt: _meta_commit re-invokes this callback on
            # CommitConflict, and a later attempt may lose the inputs to a
            # rival compactor and no-op — the flag must reflect only the
            # attempt whose kwargs actually committed (ADVICE r12).
            committed["done"] = False
            if not old_paths <= {f.path for f in v.files}:
                return None
            committed["done"] = True
            return {"add": [entry], "remove": old_paths}

        self._meta_commit(_install)
        if not committed["done"]:
            return {"files_before": len(ver.files),
                    "files_after": len(ver.files),
                    "bytes_before": sum(f.bytes for f in selected),
                    "bytes_after": 0, "dirs_removed": 0,
                    "lost_to_concurrent_compaction": True}
        # Physical deletion is deferred (ADVICE r1): the old dirs stay on
        # disk — invisible to new reads, still readable by already-built
        # DataFrames and pinned cursors — until vacuum() is called.
        # inline vacuum honors the same writer-grace window as the
        # public surface — never grace 0 implicitly (review r12)
        gone = self.manifest.vacuum(self.vacuum_grace) if vacuum else []
        before = sum(f.bytes for f in selected)
        return {"files_before": len(ver.files),
                "files_after": len(ver.files) - len(selected) + 1,
                "bytes_before": before, "bytes_after": stats["bytes"],
                "dirs_removed": len(gone)}

    _EMBEDDED_COMPACT_MAX_ROWS: int = 250_000

    def _compact_embedded(self, vacuum: bool = False,
                          max_rows: int | None = None) -> dict:
        """Bounded Spark-free major compaction for embedded handles
        (VERDICT r12 missing #3: the reference's embedded DB compacts
        itself, kv/db/db_impl.cpp:770-775 — an open_embedded store
        must not accumulate dirs unboundedly under interactive write
        load). Same semantics as the Spark path — multi-point snapshot
        retention, tombstone purge when no snapshots, sorted output,
        single-winner commit under the concurrent-compaction guard —
        built from the pieces the driver engine already has: pyarrow
        reads of the live dirs, the vectorized (key, seq, sub)-sort
        LWW winner pass (_driver_range_winners' contract: ascending
        sort with nulls FIRST makes null sub lose to any integer, the
        null-safe analogue of the Spark path's eqNullSafe retention),
        one fsynced pyarrow write, flock-CAS manifest swap.

        ROW-BOUNDED by contract (default 250k): an embedded handle is
        a driver-scale object; stores past the bound raise with
        instructions to run maintenance through a Spark session —
        that bound is the honest line between "the reference's
        single-node background compaction" and "a rewrite that needs
        the cluster". No blooms on the output (pyarrow's writer; the
        bound keeps row-group stats sufficient)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        arrow_schema = self._arrow_log_schema()
        if arrow_schema is None:
            raise EmbeddedCompactionUnsupported(
                "embedded compaction needs a pyarrow-safe value schema "
                "(timestamp/map values defer the driver engine) — run "
                "maintenance through KVStore.open(spark, path)")
        if max_rows is None:
            max_rows = self._EMBEDDED_COMPACT_MAX_ROWS
        ver = self.manifest.current()
        if len(ver.files) <= 1:
            return {"files_before": len(ver.files),
                    "files_after": len(ver.files)}
        total = sum(f.rows for f in ver.files)
        if total > max_rows:
            raise EmbeddedCompactionUnsupported(
                f"embedded compaction is bounded to {max_rows} rows; "
                f"this store holds {total} — run maintenance through "
                "KVStore.open(spark, path)")
        def normalize(t):
            # rebuild on the canonical NULLABLE log schema: Spark
            # writes non-null literals as required fields, the driver
            # writer as optional — cast() preserves that flag and
            # concat_tables refuses the mix
            return pa.Table.from_arrays(
                [t.column(n).cast(arrow_schema.field(n).type)
                 for n in arrow_schema.names], schema=arrow_schema)

        tables = []
        for f in ver.files:
            for path in self._dir_parquet_files(f.path):
                tables.append(normalize(
                    pq.read_table(path).select(arrow_schema.names)))
        log = pa.concat_tables(tables).combine_chunks()
        log = log.append_column(
            "_uid", pa.array(range(len(log)), type=pa.int64()))
        snaps = sorted(set(ver.snapshots.values()))
        points = sorted(set(snaps + [ver.last_seq]))
        sort_keys = [("key", "ascending"), ("seq", "ascending"),
                     ("sub", "ascending")]
        keep_uids: set[int] = set()
        for p in points:
            vis = log.filter(pc.less_equal(log["seq"], p))
            if not len(vis):
                continue
            s = vis.take(pc.sort_indices(vis, sort_keys=sort_keys,
                                         null_placement="at_start"))
            keys = s["key"].combine_chunks()
            n = len(s)
            if n > 1:
                neq = pc.not_equal(keys.slice(0, n - 1),
                                   keys.slice(1, n))
                last = pa.chunked_array([neq, pa.array([True])])
            else:
                last = pa.array([True] * n)
            keep_uids.update(s.filter(last)["_uid"].to_pylist())
        kept = log.filter(pc.is_in(
            log["_uid"],
            value_set=pa.array(sorted(keep_uids), type=pa.int64())))
        if not snaps:
            # latest-only retention: obsolete-tombstone purge, same
            # condition as the Spark path's _retention_filter
            kept = kept.filter(pc.not_equal(kept["op"], DEL))
        kept = kept.take(pc.sort_indices(kept, sort_keys=sort_keys,
                                         null_placement="at_start"))
        kept = normalize(kept.drop_columns(["_uid"]))

        out_level = max(f.level for f in ver.files) + 1
        rel = os.path.join(
            "data",
            f"compact-g{out_level}-{ver.version:06d}-"
            f"{uuid.uuid4().hex[:8]}")
        full = os.path.join(self.path, rel)
        os.makedirs(full)
        fpath = os.path.join(full, "part-00000.parquet")
        pq.write_table(kept, fpath,
                       compression="NONE" if self.compression == "none"
                       else self.compression)
        # durability order: output bytes + dirents before the manifest
        # commit that references them (same as _commit_append_rows)
        dfd = os.open(fpath, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        for d in (full, os.path.dirname(full)):
            ddir = os.open(d, os.O_RDONLY)
            try:
                os.fsync(ddir)
            finally:
                os.close(ddir)
        stats = self._dir_stats(full)
        entry = FileEntry(path=rel, seq_lo=0,
                          seq_hi=max(f.seq_hi for f in ver.files),
                          rows=stats["rows"], bytes=stats["bytes"],
                          min_key=stats["min_key"],
                          max_key=stats["max_key"], level=out_level)
        old_paths = {f.path for f in ver.files}
        committed = {"done": False}

        def _install(v):
            committed["done"] = False
            if not old_paths <= {f.path for f in v.files}:
                return None  # rival compactor won; orphan awaits vacuum
            committed["done"] = True
            return {"add": [entry], "remove": old_paths}

        self._meta_commit(_install)
        if not committed["done"]:
            return {"files_before": len(ver.files),
                    "files_after": len(ver.files),
                    "bytes_before": sum(f.bytes for f in ver.files),
                    "bytes_after": 0, "dirs_removed": 0,
                    "lost_to_concurrent_compaction": True}
        gone = self.manifest.vacuum(self.vacuum_grace) if vacuum else []
        return {"files_before": len(ver.files),
                "files_after": 1,
                "bytes_before": sum(f.bytes for f in ver.files),
                "bytes_after": stats["bytes"],
                "dirs_removed": len(gone)}

    @staticmethod
    def _retention_filter(log: DataFrame, snaps: list[int], last_seq: int,
                          purge_tombstones: bool = True) -> DataFrame:
        """Rows visible at any retained point {snaps..., latest}.

        Implemented as: explode each row to the retained points it is
        visible at (seq <= point), keep rows that win max_by(seq, sub)
        for at least one point. Retained points are few (a broadcast-able
        literal array), so this is one map-side explode + one partial-agg
        groupBy — no O(versions) window sort.
        """
        points = sorted(set(snaps + [last_seq]))
        pts = F.array(*[F.lit(p).cast("long") for p in points])
        ex = log.withColumn("_pt", F.explode(F.filter(pts, lambda p: p >= F.col("seq"))))
        winners = (ex.groupBy("key", "_pt")
                     .agg(F.max(F.struct("seq", "sub")).alias("_w"))
                     .select("key", F.col("_w.seq").alias("seq"),
                             F.col("_w.sub").alias("sub"))
                     .distinct())
        # NULL-SAFE on sub: rows ingested without a sub column carry
        # sub=NULL, and a NULL=NULL equi-join silently drops their
        # winning versions — compaction would physically destroy every
        # such key (review r12 finding; pinned by
        # test_compaction_preserves_null_sub_rows)
        kept = log.alias("l").join(
            winners.alias("w"),
            (F.col("l.key") == F.col("w.key"))
            & (F.col("l.seq") == F.col("w.seq"))
            & F.col("l.sub").eqNullSafe(F.col("w.sub")),
            "left_semi")
        if not snaps and purge_tombstones:
            # no snapshots: only latest state is retained → tombstones
            # whose older versions are all gone can be purged too
            kept = kept.where(F.col("op") != F.lit(DEL))
        return kept

    def checkpoint(self, dest: str) -> "KVStore":
        """Consistent zero-copy clone of the store at the current
        version (the RocksDB Checkpoint idea — the reference declares
        no equivalent; charter extension). Every live data file is
        HARD-LINKED into ``dest`` (copy fallback across filesystems),
        then a fresh manifest referencing the same relative paths is
        committed there. Cost is O(files) metadata ops, zero data
        bytes; the clone is immune to the source's later compactions
        and vacuums (links pin the inodes). Snapshots and streaming
        positions are carried over so the clone is a faithful restore
        point; scan-cursor snapshots are dropped (their iterators
        can't follow the clone)."""
        import shutil

        dest = os.path.abspath(dest)
        clone = KVStore(self.spark, dest)
        if clone.manifest.exists():
            raise FileExistsError(f"store already exists at {dest}")
        ver = self.manifest.current()
        for f in ver.files:
            src_dir = os.path.join(self.path, f.path)
            dst_dir = os.path.join(dest, f.path)
            os.makedirs(dst_dir, exist_ok=True)
            for root, _dirs, files in os.walk(src_dir):
                rel_root = os.path.relpath(root, src_dir)
                for fn in files:
                    src = os.path.join(root, fn)
                    dst = os.path.join(dst_dir, rel_root, fn) \
                        if rel_root != "." else os.path.join(dst_dir, fn)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    try:
                        os.link(src, dst)
                    except OSError:
                        shutil.copy2(src, dst)
        clone.manifest.init(schema=dict(ver.schema))
        snaps = {n: s for n, s in ver.snapshots.items()
                 if not n.startswith("scan-")}
        clone._meta_commit(lambda v: {
            "add": list(ver.files), "last_seq": ver.last_seq,
            "snapshots": snaps, "streams": dict(ver.streams)})
        clone._load_config()
        return clone

    # ------------------------------------------------------ introspection
    def approximate_sizes(self, ranges: list[tuple]) -> list[int]:
        """GetApproximateSizes (kv/db/db_impl.cpp:1699-1717): estimate
        the stored bytes each [start, limit) range covers, no data read.

        Sub-file interpolation (Table::ApproximateOffsetOf parity,
        kv/table/table.cpp:287-319 — the reference walks its index
        blocks to locate the offset of a key WITHIN a table): dirs fully
        inside the range count whole-dir manifest bytes; dirs that only
        PARTIALLY overlap are interpolated from Parquet row-group
        offsets — only row groups whose key [min,max] stats intersect
        the range contribute, at their compressed byte size, plus a
        pro-rata share of the file's framing overhead. A narrow range
        inside one big compacted file therefore reports ≈ the row
        groups it touches, not the whole file. Granularity: one row
        group (the reference's is one index-block entry — same idea).
        Footer-only reads, boundary dirs only. Ranges are in comparator
        order."""
        ver = self.manifest.current()
        out = []
        for start, limit in ranges:
            lo = self._stat_key(self._enc(start))
            hi = self._stat_key(self._enc(limit))
            total = 0
            for f in ver.files:
                if f.max_key is not None and f.max_key < lo:
                    continue
                if f.min_key is not None and f.min_key >= hi:
                    continue
                if (f.min_key is not None and f.max_key is not None
                        and f.min_key >= lo and f.max_key < hi):
                    total += f.bytes  # fully contained: no footer read
                else:
                    total += self._range_bytes_in_dir(
                        os.path.join(self.path, f.path), lo, hi)
            out.append(total)
        return out

    def _range_bytes_in_dir(self, full_path: str, lo, hi) -> int:
        """Bytes of ``full_path``'s row groups whose key stats intersect
        [lo, hi) (stat-key space), from footers only. Row groups without
        key stats are counted in (over-estimate, never under). Footers
        come through the process-wide _FOOTER_CACHE like every other
        driver-side footer read — a serving loop calling
        approximate_sizes repeatedly must not re-parse the same
        boundary dirs' footers per call (review r12)."""
        total = 0
        for root, _dirs, files in os.walk(full_path):
            for name in files:
                if not name.endswith(".parquet"):
                    continue
                fpath = os.path.join(root, name)
                fsize = os.path.getsize(fpath)
                with _FOOTER_CACHE.open(fpath) as pf:  # close promptly
                    md = pf.metadata
                    idx = md.schema.to_arrow_schema() \
                            .get_field_index("key")
                    groups = [md.row_group(rg)
                              for rg in range(md.num_row_groups)]
                    sizes = [sum(g.column(c).total_compressed_size
                                 for c in range(g.num_columns))
                             for g in groups]
                    data_bytes = sum(sizes)
                    # footer/header framing, spread over selected groups
                    overhead = max(0, fsize - data_bytes)
                    for g, gb in zip(groups, sizes):
                        st = g.column(idx).statistics
                        if st is not None and st.has_min_max:
                            g_min = self._stat_key(st.min)
                            g_max = self._stat_key(st.max)
                            if g_max < lo or g_min >= hi:
                                continue
                        frac = (gb / data_bytes if data_bytes
                                else 1.0 / len(groups))
                        total += gb + int(overhead * frac)
        return total

    def dump(self) -> dict:
        """DumpFile analogue (M11, kv/db/dumpfile.cpp:134-264):
        human-inspectable view of the store — current manifest version
        as a dict and the raw op-log as a DataFrame."""
        ver = self.manifest.current()
        import dataclasses

        return {
            "manifest": dataclasses.asdict(ver),
            "log": self.log_df(),
        }

    def history(self) -> DataFrame:
        """Commit history as a DataFrame — the MANIFEST read the other
        way (one row per retained version, newest first): version id,
        last_seq, file/level/byte totals, registered snapshots and
        stream watermarks. The observability face of M7 (every commit
        is a version) — what `DESCRIBE HISTORY` is to a Delta table.
        Versions already removed by vacuum are simply absent; the log
        is driver-side tiny (one JSON per commit), so this is a local
        read, no Spark job."""
        from quasdb_spark.manifest import Version as _V

        m = self.manifest
        if m.backend is not None:
            names = m._backend_versions()
            read = m.backend.read
        else:
            names = sorted((n for n in os.listdir(m.dir)
                            if n.endswith(".json") and n[:-5].isdigit()),
                           key=lambda n: int(n[:-5]))

            def read(n):
                with open(os.path.join(m.dir, n)) as f:
                    return f.read()
        rows = []
        for name in names:
            try:
                v = _V.from_json(read(name))
            except (OSError, ValueError):
                continue  # vacuumed or torn — never fail history()
            rows.append((v.version, v.last_seq, len(v.files),
                         int(sum(f.bytes for f in v.files)),
                         int(sum(f.rows for f in v.files)),
                         max((f.level for f in v.files), default=0),
                         len(v.snapshots), len(v.streams)))
        schema = ("version long, last_seq long, n_files int, "
                  "total_bytes long, total_rows long, max_level int, "
                  "n_snapshots int, n_streams int")
        return (self.spark.createDataFrame(rows, schema)
                .orderBy(F.col("version").desc()))

    def properties(self) -> dict:
        """GetProperty surface (kv/db/db_impl.cpp:1621-1697)."""
        ver = self.manifest.current()
        by_level: dict[int, list[FileEntry]] = {}
        for f in ver.files:
            by_level.setdefault(f.level, []).append(f)
        # approximate-memory-usage (kv/db/db_impl.cpp:1686-1692): the
        # reference reports memtable arena bytes; our analogue is the
        # executor storage memory actually pinned by cached views.
        # On an EMBEDDED handle there is no executor memory to report —
        # properties() must still answer (it is the /props surface the
        # worker processes serve), so the whole probe is best-effort.
        mem_used = 0
        try:
            tracker = (self.spark.sparkContext._jsc.sc()
                       .getExecutorMemoryStatus())
            it = tracker.values().iterator()
            while it.hasNext():
                tot, free = (lambda t: (t._1(), t._2()))(it.next())
                mem_used += int(tot) - int(free)
        except Exception:
            mem_used = None
        return {
            "quasdb.version": ver.version,
            "quasdb.last-seq": ver.last_seq,
            "quasdb.num-files": len(ver.files),
            "quasdb.total-bytes": sum(f.bytes for f in ver.files),
            "quasdb.total-rows": sum(f.rows for f in ver.files),
            "quasdb.snapshots": dict(ver.snapshots),
            "quasdb.approximate-memory-usage": mem_used,
            "quasdb.seek-compaction-pending": self._seek_pending is not None,
            # driver point-read footer cache (table_cache analogue) —
            # process-wide, like the reference's shared block cache
            "quasdb.footer-cache-hits": _FOOTER_CACHE.hits,
            "quasdb.footer-cache-misses": _FOOTER_CACHE.misses,
            "quasdb.stats": {
                lvl: {"files": len(fs), "bytes": sum(f.bytes for f in fs),
                      "rows": sum(f.rows for f in fs)}
                for lvl, fs in sorted(by_level.items())
            },
        }
