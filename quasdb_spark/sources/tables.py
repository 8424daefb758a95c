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

# Open-handle memo: (app id, path, files signature) -> scan DataFrame.
# A DataFrame is a lazy plan — holding one caches NO data (every
# execution still scans the parquet); the memo only skips the per-call
# datasource resolution + ns-column projection rebuild (~0.1 s each on
# the driver, paid by EVERY suite query, guide §1.2 driver-side
# overhead). The signature covers (size, mtime_ns, file count), so a
# rewritten table takes the fresh-read branch.
_DF_MEMO: dict[tuple, DataFrame] = {}


def _path_sig(path: str) -> tuple:
    try:
        if os.path.isfile(path):
            st = os.stat(path)
            return (st.st_size, st.st_mtime_ns, 1)
        tot = mt = n = 0
        for root, dirs, files in os.walk(path):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                st = os.stat(os.path.join(root, f))
                tot += st.st_size
                mt = max(mt, st.st_mtime_ns)
                n += 1
        return (tot, mt, n)
    except OSError:
        return None


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
    sig = _path_sig(path)
    key = None
    if sig is not None:
        try:
            key = (spark.sparkContext.applicationId, path, sig)
        except Exception:
            key = None
        if key is not None:
            hit = _DF_MEMO.get(key)
            if hit is not None:
                return hit
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(path)
    for col in _ns_timestamp_cols(path):
        df = df.withColumn(col, F.expr(f"timestamp_micros(`{col}` div 1000)"))
    if key is not None:
        _DF_MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)
            if os.path.exists(os.path.join(sf_dir, f"{n}.parquet"))}


def register_temp_views(spark: SparkSession, sf_dir: str,
                        names: list[str] | None = None) -> None:
    for n, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
