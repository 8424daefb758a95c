"""Targeted data selection demo (DSIR-style importance resampling):

  hashed-unigram importance model (target = English subset) →
  per-doc weights → importance-weighted sample → JL-projected
  embeddings for the selected docs → domain-mix report of the result

Run: python examples/dsir_selection.py [sf_dir]
(defaults to /root/testdata/sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from quasdb_spark import get_spark
from quasdb_spark.functions.text import domain_mix_weights, importance_weights
from quasdb_spark.operators.packing import weighted_sample
from quasdb_spark.operators.similarity import random_project
from quasdb_spark.sources.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("dsir-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")

    # 1. DSIR importance weights: 256-bucket hashed-unigram
    #    log-likelihood ratio of target vs raw (model broadcasts,
    #    scoring is map-side)
    w = importance_weights(docs, target)
    stats = w.agg(F.round(F.avg("weight"), 4).alias("avg"),
                  F.round(F.max("weight"), 4).alias("max"),
                  F.round(F.min("weight"), 4).alias("min")).first()

    # 2. importance resampling: keep probability ∝ exp(weight),
    #    capped at 1 (deterministic weighted_sample keeps the
    #    pipeline reproducible across runs/engines)
    keyed = w.withColumn("p_keep", F.least(F.exp("weight"), F.lit(1.0)))
    sel = weighted_sample(keyed.join(docs, "doc_id"), "doc_id",
                          F.col("p_keep"), salt="dsir13")
    n_sel, n_all = sel.count(), docs.count()

    # 3. keep rate by weight quartile: selection is monotone in the
    #    importance weight (the resampling mechanism at work). NB: on
    #    this SYNTHETIC corpus all languages draw from one shared
    #    vocabulary, so weights cannot discriminate lang='en' docs —
    #    on a real multilingual crawl the per-language tilt is the
    #    headline number.
    q = keyed.withColumn(
        "quartile", F.ntile(4).over(Window.orderBy("weight")))
    tilt = (q.join(sel.select("doc_id", F.lit(1).alias("_kept")),
                   "doc_id", "left")
            .groupBy("quartile")
            .agg(F.count(F.lit(1)).alias("n_all"),
                 F.sum(F.coalesce("_kept", F.lit(0))).alias("n_sel"))
            .select("quartile", "n_sel", "n_all",
                    F.round(F.col("n_sel") / F.col("n_all"), 3)
                    .alias("keep_rate"))
            .orderBy("quartile"))

    # 4. width-reduce embeddings for the selected docs (4x smaller
    #    vectors before any downstream clustering/ANN shuffle)
    emb = load_table(spark, sf_dir, "embeddings")
    proj = random_project(emb, out_dim=16)
    pn = proj.count()

    # 5. domain mix of the surviving corpus
    mix = domain_mix_weights(sel).orderBy("domain")

    print(f"importance weights: avg={stats['avg']} "
          f"min={stats['min']} max={stats['max']}")
    print(f"selected {n_sel}/{n_all} docs by importance resampling")
    print("keep rate by importance-weight quartile (monotone = the "
          "resampler is doing its job):")
    for r in tilt.collect():
        print(f"  Q{r['quartile']}: {r['n_sel']}/{r['n_all']} "
              f"= {r['keep_rate']}")
    print(f"projected {pn} embeddings 64 -> 16 dims")
    print("selected-corpus domain mix (alpha=0.3):")
    for r in mix.collect():
        print(f"  {r['domain']}: n_tokens={r['n_tokens']} "
              f"weight={r['weight']}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
