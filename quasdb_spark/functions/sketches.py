"""Approximate (sketch) aggregates — charter extension; the reference
has no aggregate surface at all (SURVEY.md §2.7).

At 100 TB, exact distinct counts and exact percentiles are shuffle
monsters (count-distinct re-shuffles every distinct value; exact
percentiles need a global sort). The sketch versions are one map-side
pass + a tiny mergeable state per group — HyperLogLog++ for NDV,
Greenwald-Khanna/KLL-style quantile summaries, Count-Min for frequency
— all Spark built-ins, all mergeable across partitions by construction.

These are intentionally NOT oracle-checked by hash (sketch estimates
are engine-specific); correctness is pinned by error-bound tests
against exact answers (tests/test_sketches.py) — the honest contract
for approximate operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ndv_by(df: DataFrame, keys: list[str], col: str, *,
           rsd: float = 0.05) -> DataFrame:
    """Approximate distinct count per group (HyperLogLog++,
    relative std dev ``rsd``). Map-side partial sketches merge at
    reduce — shuffle bytes per group are the sketch size (~1.5 KB at
    5% rsd), independent of cardinality."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias(f"ndv_{col}"))


def quantiles_by(df: DataFrame, keys: list[str], col: str,
                 probs: list[float], *, accuracy: int = 10000) -> DataFrame:
    """Approximate quantiles per group (percentile_approx). Error is
    bounded by 1/accuracy of the rank, state is O(accuracy) per group
    — no global sort at any scale."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(col, probs, accuracy).alias("quantiles"))


def freq_sketch(df: DataFrame, keys: list[str], col: str, *,
                eps: float = 0.001, confidence: float = 0.99,
                seed: int = 42) -> DataFrame:
    """Count-Min frequency sketch per group (binary, mergeable) — the
    shippable heavy-hitter state: estimate any item's frequency within
    eps·N with the given confidence, from a fixed-size table."""
    return df.groupBy(*keys).agg(
        F.count_min_sketch(F.col(col), F.lit(eps), F.lit(confidence),
                           F.lit(seed)).alias("cms"))


def sketch_profile(df: DataFrame, keys: list[str], ndv_col: str,
                   num_col: str) -> DataFrame:
    """One-pass approximate profile per group: HLL distinct count of
    ``ndv_col`` + p50/p95/p99 of ``num_col`` — the monitoring-dashboard
    aggregate over an unbounded table."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(ndv_col, 0.05).alias(f"ndv_{ndv_col}"),
        F.percentile_approx(num_col, [0.5, 0.95, 0.99], 10000)
         .alias("pcts"),
        F.count(F.lit(1)).alias("n"))
