"""KV op-log semantics over the driver's ``events`` table.

The engine's core custom semantic is the LWW/MVCC state view
(plans/lww.py — the DBIter analogue, kv/db/db_iter.cpp:191-314). The
KVStore exercises it over its own manifest-managed Parquet; this module
exercises the SAME view logic over a driver-provided table so the
DuckDB oracle can verify it row-for-row:

    key   = zero-padded user_id      (ordered keyspace, 'u%06d')
    seq   = event_id                 (unique, monotone)
    op    = 'del' if event_type='error' else 'put'   (tombstones)
    value = integer cents of value, as string

This is exactly the deployment story in SURVEY.md §1: time-series keys
encoded into an ordered keyspace, newest-version-wins from sequence
numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quasdb_spark.plans.lww import state_view, state_view_window

# Shared with the DuckDB oracle (see suite.py): keep in sync.
KEY_EXPR = "concat('u', lpad(cast(user_id as string), 6, '0'))"
OP_EXPR = "case when event_type = 'error' then 'del' else 'put' end"
# integer cents as string: double→string formatting differs between
# engines, but round()→bigint is exact on both
VAL_EXPR = "cast(cast(round(value * 100) as bigint) as string)"


def events_as_oplog(events: DataFrame) -> DataFrame:
    """Project events into the engine's log schema (key, seq, op, value)."""
    return events.select(
        F.expr(KEY_EXPR).alias("key"),
        F.col("event_id").cast("long").alias("seq"),
        F.expr(OP_EXPR).alias("op"),
        F.expr(VAL_EXPR).alias("value"),
    )


def kv_state(events: DataFrame, asof: int | None = None) -> DataFrame:
    """Live (key, value) state of the events op-log — S1/S2 semantics."""
    log = events_as_oplog(events)
    return state_view(log, asof, sub_col=None).select("key", "value")


def kv_versions(events: DataFrame, key: str, *, keep: int = 1 << 30) -> DataFrame:
    """Version history of one key, newest first (debug surface)."""
    log = events_as_oplog(events).where(F.col("key") == key)
    return state_view_window(log, None, sub_col=None, keep_versions=keep)


def events_as_typed_oplog(events: DataFrame) -> DataFrame:
    """The TYPED-value projection (KVStore.create(value_schema=...)
    storage model): value FIELDS are native columns — amount double,
    etype string — not an encoded string. state_view carries arbitrary
    payload columns unchanged, and value predicates on the result push
    down to the scan (tests/test_typed_store.py asserts the plan)."""
    return events.select(
        F.expr(KEY_EXPR).alias("key"),
        F.col("event_id").cast("long").alias("seq"),
        F.expr(OP_EXPR).alias("op"),
        (F.round(F.col("value"), 6) + F.lit(0.0)).alias("amount"),
        F.col("event_type").alias("etype"),
    )


def kv_typed_state(events: DataFrame, asof: int | None = None,
                   min_amount: float | None = None) -> DataFrame:
    """Live typed state: latest (amount, etype) per key, tombstones
    masked, optionally filtered on a typed VALUE field — the read shape
    the typed store exists for (filter reaches the scan instead of
    parsing strings)."""
    log = events_as_typed_oplog(events)
    out = state_view(log, asof, sub_col=None).select("key", "amount",
                                                     "etype")
    if min_amount is not None:
        out = out.where(F.col("amount") >= min_amount)
    return out
