"""Bucketed (pre-shuffled) table layout — the co-located-join lever.

At 100 TB the dominant cost of a repeated fact-fact equi-join
(lineitem ⋈ orders on orderkey; any star-schema fact pair) is the
shuffle of BOTH sides on every query. Spark's bucketing writes each
table pre-hash-partitioned into a fixed number of buckets on the join
key, recorded in the catalog; a join of two tables bucketed on the
same key with the same bucket count then reads bucket i of each side
into the same task and NEVER exchanges — the shuffle is paid once at
write time and amortized over every subsequent join/aggregation on
that key (the same trade the reference makes by keeping SSTables
sorted: organize on write so reads don't re-sort).

Usage:

    write_bucketed(orders,  "orders_b",  by="o_orderkey", n_buckets=64)
    write_bucketed(lineitem, "lineitem_b", by="l_orderkey", n_buckets=64)
    j = co_located_join(spark, "lineitem_b", "orders_b",
                        left_on="l_orderkey", right_on="o_orderkey")
    # j's physical plan has NO Exchange on either join side
    # (pinned in tests/test_bucketing.py)

Notes for a real cluster:
- Bucket metadata lives in the session catalog. local/in-memory
  catalogs are session-scoped; production points
  ``spark.sql.warehouse.dir`` + a shared metastore at durable storage
  so every job sees the spec. The parquet files themselves carry the
  bucket id in their names and survive either way.
- ``n_buckets`` sizes the per-task work: pick
  ``table_bytes / n_buckets`` ≈ 128-512 MB at the TARGET scale, and
  use the same count for every table you intend to co-join (unequal
  counts fall back to shuffling the smaller side; Spark reads
  bucket-count ratios only when
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is set).
- Buckets also serve groupBy/distinct on the bucket key without a
  shuffle, and sorted buckets (``sort=True``) let the join skip its
  per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, *, by: str | list[str],
                   n_buckets: int, sort: bool = True,
                   path: str | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a parquet table bucketed (and by default
    bucket-sorted) on ``by`` with ``n_buckets`` buckets, registered in
    the session catalog as ``table``. ``path`` makes it an external
    table (data at a location you own — object store at scale)."""
    cols = [by] if isinstance(by, str) else list(by)
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = (df.write.format("parquet").mode(mode)
           .bucketBy(n_buckets, *cols))
    if sort:
        w = w.sortBy(*cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int] | None:
    """(bucket columns, bucket count) for ``table``, or None if the
    table is not bucketed. Read from the catalog — the same metadata
    the planner consults when it decides a join needs no exchange."""
    row = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    cols: list[str] | None = None
    n: int | None = None
    for r in row:
        if r["col_name"] == "Num Buckets":
            n = int(r["data_type"])
        elif r["col_name"] == "Bucket Columns":
            cols = [c.strip(" `") for c in
                    r["data_type"].strip("[]").split(",")]
    return (cols, n) if cols is not None and n is not None else None


def co_located_join(spark: SparkSession, left: str, right: str, *,
                    left_on: str, right_on: str,
                    how: str = "inner") -> DataFrame:
    """Join two BUCKETED tables on their bucket keys. Validates up
    front that both sides are bucketed on the join key with the same
    bucket count — the precondition for an exchange-free plan — and
    raises with the actual specs if not (silently shuffling 100 TB is
    the failure mode this guard exists for)."""
    ls, rs = bucket_spec(spark, left), bucket_spec(spark, right)
    if ls is None or rs is None:
        raise ValueError(
            f"co_located_join needs both sides bucketed: "
            f"{left}={ls}, {right}={rs} (write with write_bucketed)")
    if ls[0] != [left_on] or rs[0] != [right_on]:
        raise ValueError(
            f"bucket columns must be the join keys: {left} bucketed on "
            f"{ls[0]} vs join key [{left_on}]; {right} on {rs[0]} vs "
            f"[{right_on}]")
    if ls[1] != rs[1]:
        raise ValueError(
            f"bucket counts differ ({left}: {ls[1]}, {right}: {rs[1]}); "
            "equal counts are required for an exchange-free join")
    ldf, rdf = spark.table(left), spark.table(right)
    return ldf.join(rdf, ldf[left_on] == rdf[right_on], how)
