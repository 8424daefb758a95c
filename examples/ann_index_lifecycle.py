"""ANN index lifecycle end to end — the round-11 additions:

  train quantizer (persisted artifact) -> build inverted lists ->
  serve top-k with the staleness guard -> APPEND new vectors ->
  DELETE vectors (bounded partition rewrite) -> prove the deleted
  ids never come back as neighbors -> show the guard trip when the
  corpus fingerprint moves on without index maintenance.

This is the FAISS train()/add()/remove_ids()/search() split with the
reference's artifact-GC discipline (kv/db/db_impl.cpp:248-320: never
serve files the manifest dropped) applied to index artifacts.

Run: python examples/ann_index_lifecycle.py [sf_dir]
(defaults to /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from quasdb_spark import get_spark
from quasdb_spark.operators import quantizer as QZ
from quasdb_spark.operators.similarity import ivf_topk, kmeans_centroids
from quasdb_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = tempfile.mkdtemp(prefix="quasdb-ann-lifecycle-")
    spark = get_spark("ann-index-lifecycle")

    e = load_table(spark, sf_dir, "embeddings")
    base = e.where(F.col("vec_id") % 5 != 0)
    fresh = e.where(F.col("vec_id") % 5 == 0)
    queries = e.where(F.col("vec_id") % 100 == 0)

    # --- train() + add(): persisted artifacts, queries only load ---
    fp = "corpus-v1"
    cents = kmeans_centroids(base, 10, n_iter=2)
    lists = QZ.get_or_build_lists(base, cents, fingerprint=fp,
                                  n_clusters=10, root=root)
    hits = ivf_topk(base, queries, 5, nprobe=2, centroids=cents,
                    lists=lists, corpus_fingerprint=fp).collect()
    print(f"serve v1: {len(hits)} (query, neighbor) rows")

    # --- append: only the new vectors are assigned ---
    lists = QZ.append_to_lists(fresh, cents, fingerprint=fp,
                               n_clusters=10, root=root,
                               new_fingerprint="corpus-v2")
    hits = ivf_topk(e, queries, 5, nprobe=2, centroids=cents,
                    lists=lists, corpus_fingerprint="corpus-v2").collect()
    print(f"serve v2 (after append): {len(hits)} rows")

    # --- the guard: the corpus moved on, the index did not ---
    try:
        ivf_topk(e, queries, 5, nprobe=2, centroids=cents, lists=lists,
                 corpus_fingerprint="corpus-v3-after-compaction")
        raise AssertionError("stale index served silently!")
    except QZ.StaleIndexError as ex:
        print(f"stale guard: {str(ex)[:88]}…")

    # --- remove_ids(): bounded rewrite of the affected lists only ---
    doomed = sorted({r.neighbor_id for r in hits})[:5]
    lists = QZ.drop_from_lists(spark, doomed, fingerprint=fp,
                               n_clusters=10, root=root,
                               new_fingerprint="corpus-v3-after-compaction")
    after = ivf_topk(e, queries, 5, nprobe=2, centroids=cents,
                     lists=lists,
                     corpus_fingerprint="corpus-v3-after-compaction"
                     ).collect()
    assert not {r.neighbor_id for r in after} & set(doomed)
    meta = QZ.read_artifact_meta(
        QZ.lists_path(QZ._key(fp, 10, 2, None, 6), root))
    print(f"dropped {doomed}: gone from results; artifact ops = "
          f"{meta['ops']}")

    # --- maybe_retrain: the compaction-picking analogue ---
    health = QZ.index_health(lists, cents, n_clusters=10)
    print(f"index health: {health}")
    out = QZ.maybe_retrain(e, cents, lists, fingerprint=fp,
                           n_clusters=10, root=root,
                           max_size_skew=1e9, min_avg_cos=-1.0)
    print(f"healthy thresholds -> retrained={out['retrained']} "
          "(artifacts untouched)")

    spark.stop()
    print("done")


if __name__ == "__main__":
    main()
