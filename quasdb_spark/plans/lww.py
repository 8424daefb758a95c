"""The LWW/MVCC state view — THE core custom semantic of the engine.

Reproduces the reference's read-path semantics (DBIter,
kv/db/db_iter.cpp:191-314): at snapshot ``asof``,

  1. ignore records with seq > asof            (snapshot visibility)
  2. per key, the record with the highest (seq, sub) wins   (LWW dedup)
  3. if the winner is a tombstone, the key is absent (tombstone masking)

Two physical strategies, same logical result:

- ``state_view`` (default): groupBy(key).agg(max_by(...)). This compiles
  to a hash aggregate with **map-side partial aggregation** — each input
  partition is reduced to (distinct keys) rows *before* the shuffle, so
  shuffled bytes scale with key cardinality, not record count. On a
  100 TB log with heavy overwrites this is the plan you want; it is also
  skew-tolerant (partial aggs absorb hot keys) and AQE-coalescible.

- ``state_view_window``: row_number() OVER (PARTITION BY key ORDER BY
  seq DESC) == 1. A full shuffle+sort of every record — strictly worse
  for the winner-only read path, but it is the shape you need when the
  query wants the top-N *versions* per key rather than just the winner,
  so it's kept as a named alternative (and used by version-history ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def state_view(log: DataFrame, asof: int | None = None, *,
               key_cols: list[str] | None = None, seq_col: str = "seq",
               sub_col: str | None = "sub", op_col: str = "op",
               tombstone: str = "del") -> DataFrame:
    """Latest visible (key -> row) state of an op-log DataFrame.

    ``log`` must contain key column(s), a monotonically-allocated
    ``seq`` (batch-level), an optional intra-batch ``sub`` order, an
    ``op`` column ('put'/'del'), and any value columns. Returns one row
    per live key with all non-bookkeeping columns, ordered arbitrarily.
    """
    key_cols = key_cols or ["key"]
    cols = log.columns
    if asof is not None:
        # A plain comparison the Parquet scan can push down — this is the
        # snapshot's entire read cost (kv/db/snapshot.h analogue).
        log = log.where(F.col(seq_col) <= F.lit(asof))
    ver = _version_order(log, seq_col, sub_col)
    payload = [c for c in cols if c not in key_cols]
    winner = F.max_by(F.struct(*[F.col(c) for c in payload]), ver).alias("_w")
    out = log.groupBy(*[F.col(k) for k in key_cols]).agg(winner)
    out = out.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])
    return out.where(F.col(op_col) != F.lit(tombstone))


def state_view_window(log: DataFrame, asof: int | None = None, *,
                      key_cols: list[str] | None = None, seq_col: str = "seq",
                      sub_col: str | None = "sub", op_col: str = "op",
                      tombstone: str = "del", keep_versions: int = 1) -> DataFrame:
    """Window-based variant; ``keep_versions`` > 1 returns version history
    (newest first per key, rank column ``_version_rank``)."""
    key_cols = key_cols or ["key"]
    order = [F.col(seq_col).desc()]
    if sub_col and sub_col in log.columns:
        order.append(F.col(sub_col).desc())
    if asof is not None:
        log = log.where(F.col(seq_col) <= F.lit(asof))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = log.withColumn("_version_rank", F.row_number().over(w))
    out = out.where(F.col("_version_rank") <= keep_versions)
    if keep_versions == 1:
        out = out.drop("_version_rank").where(F.col(op_col) != F.lit(tombstone))
    return out


def _version_order(log: DataFrame, seq_col: str, sub_col: str | None) -> Column:
    """Total version order: (seq, sub) packed into a sortable struct.
    Mirrors the reference's internal-key ordering where ties on user key
    break by decreasing sequence (kv/db/dbformat.cpp:48)."""
    if sub_col and sub_col in log.columns:
        return F.struct(F.col(seq_col), F.col(sub_col))
    return F.struct(F.col(seq_col))
