"""BPE merge-count scale study on a Zipf-realistic corpus.

VERDICT r11 #4: the only large batched-BPE measurement was the
tie-saturated synthetic documents corpus, which exhausts its whole
vocabulary at 89 merges with batch sizes 1-3 — by design the worst
case for batching (equal-count chained candidates refuse to batch).
This tool builds a corpus with the statistics real tokenizer training
sees — Zipf word frequencies (P(rank r) ~ 1/r), a large vocabulary
(default 50k types), frequent words short, rare words long — and
trains >=1k merges with the batched trainer, recording
rounds-vs-merges, the batch-size histogram, and wall clock.

The corpus is generated DISTRIBUTED and deterministically (xxhash64 of
the token index drives both the Zipf rank draw and nothing else — no
driver-side materialization of the token stream): rank = V**u maps a
uniform u to a 1/r law; the rank's word is built from a fixed
letter-frequency table, with length growing ~log(rank) so the merge
frontier looks like natural text (short frequent stems, long rare
tails). Only the VOCAB (n_types rows) is built driver-side and joined
broadcast onto the token stream.

Usage:
    python tools/bpe_zipf_bench.py [--tokens 25000000] [--types 50000]
        [--merges 1000] [--docs-tokens 200]

Prints one JSON line with the study results (paste into SCALE.md).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from quasdb_spark.functions.text import bpe_train  # noqa: E402
from quasdb_spark.session import get_spark  # noqa: E402

# English-ish letter pool: sampling with these multiplicities gives
# frequent letters frequent use, so subword structure (th/er/in...)
# actually exists for BPE to find — a uniform alphabet would make
# every pair count flat and the study tie-saturated again.
_LETTER_POOL = ("eeeeeeeeeeee" "ttttttttt" "aaaaaaaa" "oooooooo"
                "iiiiiii" "nnnnnnn" "ssssss" "rrrrrr" "hhhhh"
                "dddd" "llll" "ccc" "uuu" "mm" "ff" "pp" "gg"
                "ww" "yy" "b" "v" "k" "x" "j" "q" "z")


def zipf_word(rank: int) -> str:
    """Deterministic word for a Zipf rank: length ~ 2 + log2(rank)
    capped at 12 (frequent words short, like natural vocabularies),
    letters drawn from the md5 of the rank through the weighted
    pool. Collisions across ranks are fine (they just merge two ranks'
    mass, keeping the law Zipf-ish)."""
    ln = min(12, 2 + int(math.log2(rank + 1)))
    d = hashlib.md5(f"zipfw|{rank}".encode()).digest()
    # md5 gives 16 bytes; stretch deterministically if needed
    while len(d) < ln:
        d += hashlib.md5(d).digest()
    return "".join(_LETTER_POOL[b % len(_LETTER_POOL)] for b in d[:ln])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=25_000_000,
                    help="corpus size in tokens (sf1 documents scale)")
    ap.add_argument("--types", type=int, default=50_000,
                    help="vocabulary size (distinct word types)")
    ap.add_argument("--merges", type=int, default=1000)
    ap.add_argument("--doc-tokens", type=int, default=200,
                    help="tokens per synthetic document row")
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    spark = get_spark("bpe-zipf", master=f"local[{args.cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions":
                                  args.cpus})
    spark.sparkContext.setLogLevel("ERROR")

    # vocab: rank -> word, driver-built (n_types rows), broadcast
    vocab = spark.createDataFrame(
        [(r, zipf_word(r)) for r in range(1, args.types + 1)],
        "rank int, word string")

    # token stream: uniform u from a hash of the token index;
    # rank = V**u realizes P(rank<=r) = ln r / ln V, i.e. p(r) ~ 1/r
    n_docs = args.tokens // args.doc_tokens
    toks = (spark.range(args.tokens)
            .withColumn("u", (F.abs(F.xxhash64("id")) % F.lit(10 ** 9))
                        / F.lit(10 ** 9))
            .withColumn("rank", F.least(
                F.lit(args.types),
                F.greatest(F.lit(1), F.pow(F.lit(float(args.types)),
                                           F.col("u")).cast("int"))))
            .withColumn("doc_id", F.col("id") % n_docs))
    docs = (toks.join(F.broadcast(vocab), "rank")
            .groupBy("doc_id")
            .agg(F.concat_ws(" ", F.collect_list("word")).alias("text")))

    t0 = time.perf_counter()
    stats: dict = {}
    merges = bpe_train(docs, n_merges=args.merges, stats=stats)
    n = merges.count()
    wall = round(time.perf_counter() - t0, 1)

    sizes = stats.get("batch_sizes", [])
    hist: dict[str, int] = {}
    for s in sizes:
        b = ("1" if s == 1 else "2-4" if s <= 4 else "5-8" if s <= 8
             else "9-16" if s <= 16 else "17-32" if s <= 32 else ">32")
        hist[b] = hist.get(b, 0) + 1
    top = [(r.merge_rank, r.merged, r.pair_count)
           for r in merges.orderBy("merge_rank").limit(8).collect()]
    out = {
        "corpus_tokens": args.tokens, "vocab_types": args.types,
        "merges_requested": args.merges, "merges_trained": n,
        "rounds": stats.get("n_rounds"),
        "merges_per_round": round(n / max(1, stats.get("n_rounds", 1)), 2),
        "batch_size_hist": hist,
        "max_batch": max(sizes) if sizes else None,
        "wall_sec": wall,
        "first_merges": [f"{m} (n={c})" for _, m, c in top],
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
