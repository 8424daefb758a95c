"""Parquet table source with nanosecond-timestamp normalization.

The driver's testdata parquet (TESTDATA.md) stores event-time columns as
Parquet TIMESTAMP(NANOS), which Spark cannot map to a Catalyst type. We
read them as raw long nanos (``spark.sql.legacy.parquet.nanosAsLong``)
and convert with exact integer division to micros — ``timestamp_micros(
ns div 1000)`` — matching DuckDB's truncate-to-micros behavior for the
same files, so oracle comparisons agree bit-for-bit.

The conversion columns are discovered from the Parquet footer (pyarrow),
not hard-coded per table, so any new table with ns timestamps works.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@lru_cache(maxsize=256)
def _ns_timestamp_cols(parquet_path: str) -> tuple[str, ...]:
    """Column names stored as timestamp[ns] in the Parquet footer."""
    import pyarrow.dataset as ds
    import pyarrow as pa

    schema = ds.dataset(parquet_path, format="parquet").schema
    out = []
    for field in schema:
        t = field.type
        if pa.types.is_timestamp(t) and t.unit == "ns":
            out.append(field.name)
    return tuple(out)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with ns→timestamp normalization.

    Ensures the session can read ns columns (legacy conf), then converts
    each ns column long → timestamp via integer `div 1000` (exact — a
    double division would lose precision above 2^53 ns).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    for col in _ns_timestamp_cols(path):
        df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)
            if os.path.exists(os.path.join(sf_dir, f"{n}.parquet"))}


def register_temp_views(spark: SparkSession, sf_dir: str,
                        names: list[str] | None = None) -> None:
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
