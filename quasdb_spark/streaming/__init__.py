from quasdb_spark.streaming.ingest import stream_ingest
from quasdb_spark.streaming.windows import (
    watermarked_tumbling, watermarked_sliding, stream_sessions)

__all__ = ["stream_ingest", "watermarked_tumbling", "watermarked_sliding",
           "stream_sessions"]
