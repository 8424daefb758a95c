"""Skew tooling: deterministic salted equi-join.

AQE's skew-join splitting (on by default, session.py) handles most
skew at runtime; this helper is the explicit-control variant for the
case AQE can't fix: a large×medium join where one join key holds a
double-digit percentage of the left side, so even a split partition
re-shuffles the same hot key to one reducer's successors. Salting
rewrites the key space itself: left rows fan out over ``n_salts``
sub-keys (deterministic content hash — reproducible plans, no rand()),
the right side is replicated ``n_salts``× (explode, map-side), and the
hot key's work lands on ``n_salts`` reducers.

Cost model: right side inflates n_salts× through the shuffle — use
when the right side is too big to broadcast but far smaller than the
left (the classic mid-size dimension), and size n_salts to the hot
key's skew factor, not higher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, on: list[str], *,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join ``left`` and ``right`` on ``on`` with the left side
    salted into ``n_salts`` sub-partitions per key. Result is
    row-identical to ``left.join(right, on, how)`` (tested); only the
    physical distribution changes. Supported ``how``: inner/left —
    semantics needing the full right-side key set per partition
    (right/full/semi/anti) are not salted here."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                  F.lit(n_salts)).cast("int")
    l = left.withColumn("_salt", salt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return l.join(r, [*on, "_salt"], how).drop("_salt")
