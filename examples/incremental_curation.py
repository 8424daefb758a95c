"""Incremental corpus maintenance — the daily-batch production loop:

1. build the near-dup index of the existing corpus ONCE (maintenance),
2. each new batch: check against the index (no corpus rescan),
   drop near-dups, run quality gates (Gopher rules) on the survivors,
3. fold the accepted batch into the index (append, no rebuild),
4. embeddings side: assign the batch's vectors into the existing IVF
   inverted lists (append_to_lists — queries keep probing warm).

Run: python examples/incremental_curation.py [sf_dir]
(defaults to /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from quasdb_spark import get_spark
from quasdb_spark.functions.text import GOPHER_STOPWORDS, gopher_rules
from quasdb_spark.operators.dedup import (append_to_index,
                                          build_dedup_index,
                                          check_against_index,
                                          load_dedup_index)
from quasdb_spark.sources.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("incremental-curation", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 4 != 3)
    batch = docs.where(F.col("doc_id") % 4 == 3)

    # --- 1. maintenance: materialize the corpus index -----------------
    idx_path = os.path.join(tempfile.mkdtemp(prefix="curation_"), "idx")
    meta = build_dedup_index(corpus, idx_path, n_bands=2)
    print(f"index built at {idx_path} ({meta})")

    # --- 2. the daily batch: near-dup check + quality gates -----------
    index, meta = load_dedup_index(spark, idx_path)
    dups = check_against_index(batch, index, meta, min_est_jaccard=0.75)
    print("near-dups of the batch against the corpus:")
    dups.show(5, truncate=False)

    survivors = batch.join(dups.select("new_id").distinct(),
                           batch.doc_id == F.col("new_id"), "left_anti")
    gated = (gopher_rules(survivors, stopwords=GOPHER_STOPWORDS + ["a"])
             .where(F.col("gopher_pass")))
    n_batch, n_surv, n_pass = batch.count(), survivors.count(), gated.count()
    print(f"batch {n_batch} docs -> {n_surv} after dedup "
          f"-> {n_pass} after Gopher gates")

    # --- 3. fold the accepted docs into the index ---------------------
    append_to_index(gated.select("doc_id", "text"), idx_path)
    idx2, _ = load_dedup_index(spark, idx_path)
    n_entries = idx2.count()
    print(f"index now holds {n_entries} band entries")

    # a doc near-identical to an accepted batch doc now matches it too
    probe = gated.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    hits = check_against_index(probe, idx2, meta, min_est_jaccard=0.75)
    print("re-probe of an accepted doc's clone:")
    hits.show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
