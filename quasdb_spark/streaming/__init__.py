from quasdb_spark.streaming.ingest import stream_ingest
from quasdb_spark.streaming.rollup import continuous_rollup, rollup_state
from quasdb_spark.streaming.windows import (
    stream_dedup, stream_sessions, stream_stream_join, watermarked_sliding,
    watermarked_tumbling)

__all__ = ["stream_ingest", "watermarked_tumbling", "watermarked_sliding",
           "stream_sessions", "stream_stream_join", "stream_dedup",
           "continuous_rollup", "rollup_state"]
