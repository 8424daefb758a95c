"""Custom stateful streaming operators (applyInPandasWithState).

The streaming counterpart of the LWW state view: instead of
recomputing winners from the log, state is maintained incrementally
per key as micro-batches arrive — the reference's memtable-updating
write path (kv/db/write_batch.cpp:137-162 InsertInto), expressed as a
Spark stateful operator.

State is partitioned by key across executors and checkpointed with
the query, so it scales horizontally and survives restarts — bounded
per-key state (a single (seq, sub, op, value) tuple), unbounded keys
handled by Spark's state store (RocksDB-backed in production confs).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

LWW_OUTPUT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("seq", LongType()),
    StructField("sub", LongType()),
    StructField("op", StringType()),
    StructField("value", StringType()),
])

LWW_STATE_SCHEMA = StructType([
    StructField("seq", LongType()),
    StructField("sub", LongType()),
    StructField("op", StringType()),
    StructField("value", StringType()),
])


def running_lww(ops_stream: DataFrame) -> DataFrame:
    """Incrementally maintained last-writer-wins state over an op
    stream with columns (key, seq, sub, op, value).

    Emits, per micro-batch, the new winner row for every key that
    changed (outputMode=update semantics downstream). Late/replayed
    rows with a lower (seq, sub) than the stored winner are ignored —
    exactly the MVCC newest-wins rule (kv/db/db_iter.cpp:191-228).
    """
    import pandas as pd

    def update(key: tuple[Any, ...],
               pdfs: Iterator["pd.DataFrame"],
               state: GroupState) -> Iterator["pd.DataFrame"]:
        if state.exists:
            cur_seq, cur_sub, cur_op, cur_val = state.get
        else:
            cur_seq, cur_sub, cur_op, cur_val = -1, -1, None, None
        changed = False
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                ver = (int(r.seq), int(r.sub))
                if ver > (cur_seq, cur_sub):
                    cur_seq, cur_sub = ver
                    cur_op, cur_val = r.op, r.value
                    changed = True
        if changed:
            state.update((cur_seq, cur_sub, cur_op, cur_val))
            yield pd.DataFrame({"key": [key[0]], "seq": [cur_seq],
                                "sub": [cur_sub], "op": [cur_op],
                                "value": [cur_val]})

    return (ops_stream
            .groupBy("key")
            .applyInPandasWithState(update, LWW_OUTPUT_SCHEMA,
                                    LWW_STATE_SCHEMA, "update",
                                    GroupStateTimeout.NoTimeout))
