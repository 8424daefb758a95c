"""Lineage-cutting materialization shared by the iterative/fan-out
operators (BPE training, packing, connected components) and the suite's
terminal release points.

One policy, stated once (r16 — VERDICT r15 #7 unification):

- RELIABLE ``checkpoint()`` when the SparkContext has a checkpoint dir
  configured: localCheckpoint blocks live non-reliably on executors, so
  with lineage truncated a single executor loss (spot nodes, dynamic
  allocation) kills the job on a real cluster. Superseded checkpoint
  FILES are cleaned by the ContextCleaner only under
  ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (this
  engine's get_spark sets it).
- ``localCheckpoint`` otherwise (local mode: the only JVM IS the
  driver, nothing to survive).

``release``: frames whose persisted blocks are dead once ``df``'s
blocks exist (the cluster_assign discipline, guide §5
unpersist-when-done) — unpersisted after an EAGER materialization.
Passing ``release`` with ``eager=False`` is refused: the caches would
be dropped before the deferred materialization ever read them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame, *, eager: bool = True,
                release: list | None = None) -> DataFrame:
    if release and not eager:
        raise ValueError("materialize: release requires eager=True — "
                         "a non-eager checkpoint still READS the "
                         "caches at its first action")
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        out = df.checkpoint(eager=eager)
    else:
        out = df.localCheckpoint(eager=eager)
    for c in (release or []):
        c.unpersist(False)
    return out
