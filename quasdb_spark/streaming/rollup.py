"""Continuous aggregates: a streaming rollup maintained incrementally
in a KVStore — the hypertable-rollup / materialized-continuous-view
shape (charter extension; the reference has no streaming semantics,
SURVEY.md §2.7).

Each micro-batch upserts the windows it touched (update mode), keyed
``window_start|key...``; the store's LWW state view therefore IS the
current rollup at any moment — late data inside the watermark re-emits
its window and simply overwrites the previous aggregate row. Replayed
micro-batches after a crash are dropped by the store's per-batch-id
manifest dedup, so the rollup is exactly-once end to end.

Scale: the stream side is a watermark-bounded stateful aggregation
(state ~ live windows × keys); the store side appends one tiny sorted
batch per trigger and auto-compacts by size score. Reads are the
store's normal pruned scan — a dashboard query for one day touches one
key range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from quasdb_spark.store import KVStore

_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss"


def continuous_rollup(store: KVStore, stream_df: DataFrame,
                      checkpoint_dir: str, *, ts_col: str = "ts",
                      keys: list[str] | None = None,
                      duration: str = "1 hour",
                      watermark: str = "10 minutes",
                      aggs=None, stream_id: str = "rollup",
                      trigger: dict | None = None,
                      auto_compact: bool = True) -> StreamingQuery:
    """Start the continuous aggregate. ``aggs`` are named aggregate
    columns (default: row count ``n``); the rollup row for a window is
    stored as JSON under ``window_start|key...``."""
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    from quasdb_spark.streaming.windows import ensure_event_time
    win = (ensure_event_time(stream_df, ts_col).withWatermark(ts_col, watermark)
           .groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
           .agg(*aggs))
    agg_names = [c for c in win.columns if c != "w" and c not in keys]
    key_expr = F.concat_ws("|", F.date_format("w.start", _TS_FMT),
                           *[F.col(k).cast("string") for k in keys])
    if store.value_schema is not None:
        # typed store (create(value_schema=...)): aggregates land as
        # native Parquet columns — no JSON round-trip, and rollup reads
        # get column pruning + predicate pushdown on the agg fields
        missing = [f for f in store.value_cols if f not in agg_names]
        if missing:
            raise ValueError(f"store value_schema fields {missing} not "
                             f"produced by aggs {agg_names}")
        kv = win.select(key_expr.alias("key"), *store.value_cols)
    else:
        kv = win.select(key_expr.alias("key"),
                        F.to_json(F.struct(*agg_names)).alias("value"))

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        store.ingest_batch(batch_df, stream_id, batch_id)
        if auto_compact:
            store.maybe_compact()

    writer = (kv.writeStream.foreachBatch(commit)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def rollup_state(store: KVStore, keys: list[str],
                 value_schema: str | None = None, *,
                 window_from=None, window_to=None) -> DataFrame:
    """Current rollup as a typed DataFrame: splits the composite key
    back into (window_start, keys...) plus the aggregate columns.

    On a typed store (created with ``value_schema=...``) the aggregates
    are already native columns — read as-is, with column pruning and
    value-predicate pushdown straight to the Parquet scan (no JSON
    parse anywhere in the plan). On a classic string store, pass
    ``value_schema`` (e.g. ``"n long, total double"``) to parse the
    stored JSON.

    ``window_from``/``window_to`` (datetimes, [from, to)) become a KEY
    RANGE on the time-prefixed rollup keys — the store's manifest +
    row-group pruning then touch only the requested window span, so a
    one-day dashboard query over a year of rollups reads one key range,
    not the table."""
    lo = window_from.strftime("%Y-%m-%dT%H:%M:%S") if window_from else None
    hi = window_to.strftime("%Y-%m-%dT%H:%M:%S") if window_to else None
    parts = F.split("key", r"\|")
    head = [F.to_timestamp(F.element_at(parts, 1), _TS_FMT).alias("window_start"),
            *[F.element_at(parts, i + 2).alias(k) for i, k in enumerate(keys)]]
    st = store.state(key_from=lo, key_to=hi)
    if store.value_schema is not None:
        return st.select(*head, *store.value_cols)
    if value_schema is None:
        raise ValueError("value_schema is required for string stores "
                         "(JSON-encoded rollup values)")
    out = st.select(*head, F.from_json("value", value_schema).alias("_v"))
    return out.select("window_start", *keys, "_v.*")
