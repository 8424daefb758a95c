"""Per-key streaming ingest quotas (charter extension; the reference
has no streaming semantics, SURVEY.md §2.7).

Training-data ingest wants per-source caps: a handful of domains can
dominate a crawl, and capping AT INGEST (before storage) is the only
shape that works at 100 TB/day — post-hoc down-sampling pays to store
and shuffle the overflow first. ``quota_limit`` passes the first
``quota`` rows per key through and drops (and counts) the rest; state
is ONE counter per key — bounded by distinct keys, held in Spark's
state store (RocksDB-backed in production confs) and checkpointed
with the query.

Built on applyInPandasWithState (the arbitrary-stateful API that runs
on this PySpark build; transformWithStateInPandas is the drop-in
successor once its protobuf runtime is available). A processing-time
timeout turns the lifetime cap into a ROLLING quota: state for a key
is dropped after ``ttl_ms`` of silence and its quota refreshes.

Scale: one shuffle on the key columns (the stateful exchange); the
per-key work is O(rows); hot keys cost a single counter regardless of
row volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def quota_limit(stream: DataFrame, key_cols: list[str], quota: int, *,
                ttl_ms: int | None = None) -> DataFrame:
    """Pass through at most ``quota`` rows per key — over the stream's
    lifetime, or per rolling TTL window when ``ttl_ms`` is set.

    Output schema == input schema. Intra-batch row order is arbitrary
    (documented): quotas cap VOLUME, they don't rank rows.
    """
    import pandas as pd

    schema = stream.schema
    state_schema = "seen long"
    cols = [f.name for f in schema.fields]

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # rolling quota: the key went quiet for ttl_ms — refresh
            state.remove()
            yield pd.DataFrame(columns=cols)
            return
        (seen,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            if seen < quota:
                take = min(len(pdf), quota - seen)
                seen += len(pdf)
                yield pdf.iloc[:take]
            else:
                seen += len(pdf)
        state.update((seen,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None
               else GroupStateTimeout.NoTimeout)
    return (stream.groupBy(*key_cols)
            .applyInPandasWithState(fn, schema, state_schema,
                                    "append", timeout))
