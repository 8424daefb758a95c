"""JSONL / CSV sources and sinks for pipeline interchange.

Training-data pipelines ingest and emit newline-delimited JSON (and
occasionally CSV) at least as often as Parquet. These wrappers keep the
scale discipline explicit:

- **Schema is required (or derived), never inferred by scanning.**
  ``spark.read.json`` without a schema reads the whole input once just
  to infer types — at 100 TB that doubles the job. Callers pass a DDL
  string / StructType, or use ``schema_of_table`` to derive one from an
  existing DataFrame.
- **Writes are partitionable and compressed** (gzip default for JSONL:
  splittable formats matter less for line-JSON because each file is a
  split unit — many medium files from many tasks, not one giant file).
- **Reads push down**: a column-pruned, filtered scan of JSONL still
  has to parse every line (text formats have no row-group statistics),
  which is exactly why ``to_parquet`` exists here as the
  one-hop conversion a pipeline should do first.

No reference counterpart (the reference stores opaque bytes; SURVEY.md
§2 sources are its file formats) — this is charter-extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as ST


def schema_of_table(df: DataFrame) -> str:
    """DDL schema string of ``df`` — pass to read_jsonl/read_csv so the
    reader never runs an inference scan."""
    return ", ".join(f"{f.name} {f.dataType.simpleString()}"
                     for f in df.schema.fields)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite",
                partition_by: list[str] | None = None,
                compression: str = "gzip") -> None:
    """Write newline-delimited JSON; one file per task (parallel), hive
    partition directories when ``partition_by`` is given."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: str | ST.StructType, *,
               multiline: bool = False) -> DataFrame:
    """Read JSONL with an explicit schema (no inference scan).

    Corrupt lines land in ``_corrupt_record`` if the caller includes
    that column in the schema (Spark PERMISSIVE default) instead of
    failing the 100-TB job on one bad line.
    """
    return (spark.read.schema(schema)
            .option("multiLine", multiline).json(path))


def write_csv(df: DataFrame, path: str, *, mode: str = "overwrite",
              header: bool = True, sep: str = ",",
              compression: str = "gzip",
              partition_by: list[str] | None = None) -> None:
    w = (df.write.mode(mode).option("header", header)
         .option("sep", sep).option("compression", compression))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.csv(path)


def read_csv(spark: SparkSession, path: str,
             schema: str | ST.StructType, *, header: bool = True,
             sep: str = ",") -> DataFrame:
    return (spark.read.schema(schema)
            .option("header", header).option("sep", sep).csv(path))


def to_parquet(df: DataFrame, path: str, *, mode: str = "overwrite",
               partition_by: list[str] | None = None) -> None:
    """The first hop every text-format ingest should take: convert to
    Parquet so later passes get row-group pruning, column projection
    and statistics instead of re-parsing text."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
