"""Streaming windowed aggregation with late-data handling.

The reference has no streaming window semantics (SURVEY.md §2.7) — this
is the charter's Structured-Streaming face of the time-series operators
(operators/timeseries.py): same window shapes, plus watermarks so state
is bounded on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_event_time(stream: DataFrame, ts_col: str) -> DataFrame:
    """Normalize the event-time column to TIMESTAMP (LTZ).

    Parquet written with session default TIMESTAMP_NTZ (the PySpark 4.x
    behavior for naive datetimes) is rejected by ``withWatermark``
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). The cast is a no-op when the
    column is already LTZ, so every watermark helper routes through here.
    """
    if dict(stream.dtypes).get(ts_col) != "timestamp":
        return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream


def watermarked_tumbling(stream: DataFrame, ts_col: str, duration: str,
                         watermark: str, *, keys: list[str] | None = None,
                         aggs: list[Column] | None = None) -> DataFrame:
    """Tumbling windows over an event-time stream; rows later than
    ``watermark`` behind the max seen event time are dropped and window
    state older than that is evicted (bounded state at any scale)."""
    keys = keys or []
    wm = ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
    out = (wm.groupBy(F.window(F.col(ts_col), duration).alias("w"), *keys)
             .agg(*(aggs or [F.count(F.lit(1)).alias("n")])))
    return (out.withColumn("window_start", F.col("w.start"))
               .withColumn("window_end", F.col("w.end")).drop("w"))


def watermarked_sliding(stream: DataFrame, ts_col: str, duration: str,
                        slide: str, watermark: str, *,
                        keys: list[str] | None = None,
                        aggs: list[Column] | None = None) -> DataFrame:
    keys = keys or []
    wm = ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
    out = (wm.groupBy(F.window(F.col(ts_col), duration, slide).alias("w"), *keys)
             .agg(*(aggs or [F.count(F.lit(1)).alias("n")])))
    return (out.withColumn("window_start", F.col("w.start"))
               .withColumn("window_end", F.col("w.end")).drop("w"))


def stream_sessions(stream: DataFrame, ts_col: str, gap: str, watermark: str,
                    *, keys: list[str] | None = None,
                    aggs: list[Column] | None = None) -> DataFrame:
    """Gap-based session windows (session_window) — the streaming
    counterpart of operators.timeseries.sessionize."""
    keys = keys or []
    wm = ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
    out = (wm.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *keys)
             .agg(*(aggs or [F.count(F.lit(1)).alias("n")])))
    return (out.withColumn("session_start", F.col("w.start"))
               .withColumn("session_end", F.col("w.end")).drop("w"))


def stream_stream_join(left: DataFrame, right: DataFrame, on: str,
                       left_ts: str, right_ts: str, *,
                       watermark: str = "10 minutes",
                       max_lag: str = "1 hour") -> DataFrame:
    """Watermarked stream-stream inner join: right rows match left rows
    on the key within [left_ts - max_lag, left_ts]. Both sides carry
    watermarks so join state is evicted once the range condition can no
    longer match — bounded state on unbounded streams."""
    lw = ensure_event_time(left, left_ts).withWatermark(left_ts, watermark)
    rw = ensure_event_time(right, right_ts).withWatermark(right_ts, watermark)
    cond = ((lw[on] == rw[on]) &
            (rw[right_ts] <= lw[left_ts]) &
            (rw[right_ts] >= lw[left_ts] - F.expr(f"interval {max_lag}")))
    return lw.join(rw, cond, "inner").drop(rw[on])


def stream_dedup(stream: DataFrame, key_cols: list[str], ts_col: str, *,
                 watermark: str = "10 minutes",
                 within_watermark: bool = True) -> DataFrame:
    """Streaming deduplication — the ingest-time face of the batch
    dedup family (training pipelines dedupe AT ingest so duplicates
    never hit storage).

    ``within_watermark=True`` uses dropDuplicatesWithinWatermark: state
    for a key is evicted once the watermark passes it, so memory is
    bounded by the duplicate-arrival window, not the stream's lifetime
    — the only sane shape for an unbounded 100 TB/day feed (duplicates
    arriving further apart than ``watermark`` are NOT caught; size the
    watermark to the real duplicate lag). ``False`` keeps exact
    all-time dedup with state growing in distinct keys.
    """
    wm = ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
    if within_watermark:
        return wm.dropDuplicatesWithinWatermark(key_cols)
    return wm.dropDuplicates(key_cols)
