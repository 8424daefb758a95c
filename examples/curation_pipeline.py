"""End-to-end training-data curation demo over the synthetic corpus:

  quality/repetition/PII filters → exact dedup → near-dup clustering →
  keep-one → token budget report → int8-quantized embeddings

Run: python examples/curation_pipeline.py [sf_dir]
(defaults to /root/testdata/sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from quasdb_spark import get_spark
from quasdb_spark.functions.text import (bpe_token_count, pii_redact,
                                         pii_scan, quality_score,
                                         repetition_stats)
from quasdb_spark.operators.dedup import cluster_assign, near_dup_pairs
from quasdb_spark.operators.similarity import dequantize_error, semantic_dedup
from quasdb_spark.sources.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("curation-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. map-only filter signals (one codegen pass) + repetition agg
    feats = pii_scan(quality_score(docs))
    rep = repetition_stats(docs).select("doc_id", "rep_flagged")
    surv = (feats.join(rep, "doc_id")
            .where((F.col("quality_score") >= 0.5)
                   & ~F.col("rep_flagged") & ~F.col("pii_flagged")))
    n1 = surv.count()

    # 2. near-dup clustering over LSH candidate pairs, keep canonical
    pairs = near_dup_pairs(docs, threshold=0.35)
    labels = cluster_assign(pairs, docs.select("doc_id"), n_iter=3)
    drop = (labels.where(F.col("cluster_id") != F.col("doc_id"))
            .select("doc_id"))
    kept = surv.join(drop, "doc_id", "left_anti")
    n2 = kept.count()

    # 3. token budget of the surviving corpus
    budget = kept.agg(
        F.sum(bpe_token_count("text")).alias("bpe_tokens")).first()

    # 4. embedding storage check: int8 quantization error
    emb = load_table(spark, sf_dir, "embeddings")
    err = dequantize_error(emb).agg(
        F.round(F.avg("mae"), 6).alias("avg_mae")).first()

    print(f"corpus: {n0} docs -> {n1} after filters "
          f"-> {n2} after near-dup removal")
    print(f"surviving BPE token budget: {budget['bpe_tokens']:,}")
    print(f"int8 embedding reconstruction MAE: {err['avg_mae']}")

    # 5. redact (not just flag) PII in the survivors — the text a
    # training run would actually consume. The synthetic corpus is
    # PII-free, so plant two dirty docs to show the transform firing.
    dirty = spark.createDataFrame(
        [(10**6, "mail me: eve@example.com or call 5551234567890"),
         (10**6 + 1, "mirror at https://data.example.org/dump")],
        "doc_id long, text string")
    red = pii_redact(kept.select("doc_id", "text").unionByName(dirty))
    n_redacted = red.where(F.col("redacted") != F.col("text")).count()

    # 6. semantic dedup over embeddings (SemDeDup): drops paraphrase
    # duplicates that shingle-based near-dup can't see
    sem = semantic_dedup(emb, threshold=0.4)
    n_sem_dropped = sem.where(~F.col("is_kept")).count()

    print(f"PII-redacted docs: {n_redacted}; "
          f"semantic-dup embeddings dropped: {n_sem_dropped}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
