"""Tokenizer-prep pipeline over the synthetic corpus — the round-10
additions end to end:

  paragraph-level dedup (CCNet shape: explode -> keep-first ->
  reconstruct) -> BPE merge-table training (persisted per corpus
  fingerprint, the quantizer train()/load split) -> segmentation of
  the deduplicated vocabulary -> shipped vocabulary histogram.

Run: python examples/tokenizer_prep.py [sf_dir]
(defaults to /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from quasdb_spark import get_spark
from quasdb_spark.functions.text import (bpe_segment, get_or_train_bpe,
                                         tokens)
from quasdb_spark.operators.dedup import paragraph_dedup
from quasdb_spark.operators.quantizer import corpus_fingerprint
from quasdb_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("tokenizer-prep", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    # 1. paragraph dedup: drop every paragraph that duplicates an
    #    earlier one corpus-wide, rebuild documents from what's left
    deduped = paragraph_dedup(docs, para_tokens=10)
    stats = deduped.agg(
        F.sum("n_paras").alias("paras"),
        F.sum("n_kept").alias("kept")).collect()[0]
    print(f"paragraph dedup: kept {stats['kept']}/{stats['paras']} "
          f"paragraphs")
    clean = deduped.select("doc_id", F.col("new_text").alias("text"))

    # 2. train the tokenizer ONCE per corpus state (artifact keyed by
    #    fingerprint + params; a warm artifact loads instead)
    fp = corpus_fingerprint(os.path.join(sf_dir, "documents.parquet"))
    merges = get_or_train_bpe(clean, fingerprint=fp + "-pdedup",
                              n_merges=8,
                              root=os.path.join(tempfile.gettempdir(),
                                                "tokenizer_prep_demo"))
    print("merge table:")
    for rank, lhs, rhs, merged, n in merges:
        print(f"  {rank}: {lhs!r} + {rhs!r} -> {merged!r}  (count {n})")

    # 3. segment the deduplicated vocabulary with the trained table
    #    and ship the symbol histogram (the tokenizer's vocab file)
    words = (clean.select(F.explode(tokens("text")).alias("w"))
             .where(F.col("w").rlike("^[a-z]{2,}$"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    vocab = (words.select(F.explode(bpe_segment("w", merges))
                          .alias("sym"), "freq")
             .groupBy("sym").agg(F.sum("freq").alias("n"))
             .orderBy(F.col("n").desc(), F.col("sym").asc()))
    print("top symbols:")
    for r in vocab.limit(10).collect():
        print(f"  {r['sym']!r}: {r['n']}")
    spark.stop()


if __name__ == "__main__":
    main()
