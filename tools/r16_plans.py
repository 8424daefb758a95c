"""Capture .explain("formatted") for round-16 optimization evidence.

Writes plans/r16/<query>_<tag>.txt for each named query at
$SPARK_GRAFT_SF_DIR (default sf0.1).  Usage:

    python tools/r16_plans.py before [query ...]
    python tools/r16_plans.py after  [query ...]

With no query list, dumps the queries this round examines.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quasdb_spark import suite  # noqa: E402
from quasdb_spark.session import get_spark  # noqa: E402

DEFAULT = [
    # r16 targets (VERDICT r15 "next round" list)
    "dedup_clusters_cc", "dedup_clusters_cc_xxh", "dedup_clusters",
    "emb_semdedup", "sim_ivfpq_topk", "text_lm_score",
    "dedup_minhash_pairs", "dedup_minhash_wide", "dedup_minhash_xxh",
    "text_bm25_search", "doc_token_packing", "rel_customer_quartiles",
    "text_bigram_topk", "ts_trailing_1h_sum", "emb_hard_negatives",
    "dedup_paragraphs",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r16-plans", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions": cpus})
    spark.sparkContext.setLogLevel("ERROR")
    import io
    from contextlib import redirect_stdout

    for name in names:
        fn = suite.QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
