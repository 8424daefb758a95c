"""Parallelism repair for CPU-bound map stages.

A small Parquet file arrives as ONE scan partition, so a CPU-heavy
expression chain (md5-per-shingle, per-bit simhash sums…) runs on one
core no matter how many the session has. At 100 TB inputs are
thousands of partitions and this is a no-op; the guard only kicks in
when the scan undershoots the session's parallelism — the analogue of
"don't let one SSTable serialize the whole compaction".
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism when
    its plan would execute in fewer partitions. Round-robin repartition
    (no key) — the downstream op decides its own shuffle keys."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current >= target:
        return df
    return df.repartition(target)
