"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``quasdb_spark/suite.py`` (one callable +
oracle per operator from SURVEY.md §2 and the charter extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quasdb_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the engine's core custom semantic — the LWW/MVCC
    state view (SURVEY.md §2.3 S1-S2, kv/db/db_iter.cpp:191-314) over
    the sf0.001 events op-log."""
    return suite.q_kv_state_latest(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + extensions)."""
    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names)."""
    return dict(suite.ORACLES)
