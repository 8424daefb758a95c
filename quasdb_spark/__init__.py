"""quasdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Quasrain/QuasDB (a LevelDB-lineage ordered
KV / tiny time-series engine), redesigned Spark-first.

The reference (read-only at /root/reference) is an embedded C++ LSM-tree:
a persistent ordered map with MVCC snapshots, range scans, atomic write
batches, WAL recovery, and leveled compaction (kv/include/db.h:38-110).
This package reproduces those *observable semantics* on Spark:

- storage: sorted Parquet data files + a tiny JSON manifest transaction log
  (the analogue of SSTables + MANIFEST, SURVEY.md §1.3)
- write path: atomic batch append with monotonic sequence allocation
  (the analogue of WriteBatch + group commit, kv/db/db_impl.cpp:1396-1538)
- read path: a declarative "state view" — seq<=asof filter, last-writer-wins
  dedup, tombstone mask (the analogue of DBIter, kv/db/db_iter.cpp:146-355)
- maintenance: a compaction job that rewrites the log keeping only versions
  visible to retained snapshots (kv/db/db_impl.cpp:1031-1220)
- plus the charter extensions with no reference counterpart: time-series
  windowing, dedup (exact/MinHash/SimHash), similarity search, text
  analysis, and multimodal column plumbing.

Everything is DataFrame-first: Catalyst gets the whole logical plan, so
predicate pushdown, partition pruning, AQE, and whole-stage codegen apply
without any hand-scheduling.
"""

from quasdb_spark.session import get_spark
from quasdb_spark.store import KVStore, WriteBatch
from quasdb_spark.plans.lww import state_view, state_view_window

__version__ = "0.1.0"

__all__ = ["get_spark", "KVStore", "WriteBatch", "state_view", "state_view_window", "__version__"]
