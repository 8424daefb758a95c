"""Structured Streaming ingest into a KVStore.

The Spark-side realization of the reference's entire write pipeline
(SURVEY.md §2.1 W6-W9, §3.2):

  WAL append + fsync          → streaming checkpoint/commit log
  group commit (1MB batches)  → micro-batch trigger interval
  memtable insert             → in-flight micro-batch state
  flush to L0 SSTable         → per-batch sorted-Parquet append
  crash recovery              → checkpoint restart + idempotent
                                per-batch manifest commit
                                (store.ingest_batch deduplicates
                                replayed batch ids)

Each micro-batch becomes ONE atomic store commit with its own seq —
exactly the reference's "a WriteBatch gets consecutive seqs and lands
atomically" contract (kv/db/db_impl.cpp:1423-1446), at micro-batch
granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from quasdb_spark.store import KVStore


def stream_ingest(store: KVStore, stream_df: DataFrame, checkpoint_dir: str,
                  *, stream_id: str = "ingest", key_col: str = "key",
                  value_col: str = "value", op_col: str | None = None,
                  sub_col: str | None = None,
                  trigger: dict | None = None,
                  auto_compact: bool = True) -> StreamingQuery:
    """Start a streaming ingest query writing ``stream_df`` into the
    store. ``trigger`` defaults to availableNow (drain-and-stop), pass
    e.g. {"processingTime": "5 seconds"} for continuous micro-batches.

    Exactly-once: the checkpoint gives at-least-once batch delivery;
    store.ingest_batch drops replayed batch ids at manifest-commit
    time, so every batch lands exactly once no matter how the query
    dies and restarts.

    ``auto_compact`` (default ON here — a long-running stream commits
    one data dir per micro-batch forever): after each committed batch,
    the store's size-score picker (M2) folds batch dirs once the L0
    trigger is hit, bounding manifest size and restoring pruning power;
    obsolete dirs are vacuumed after the store's grace window.
    """
    def commit(batch_df: DataFrame, batch_id: int) -> None:
        store.ingest_batch(batch_df, stream_id, batch_id,
                           key_col=key_col, value_col=value_col,
                           op_col=op_col, sub_col=sub_col)
        if auto_compact:
            store.maybe_compact()

    writer = (stream_df.writeStream
              .foreachBatch(commit)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
