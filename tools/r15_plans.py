"""Capture .explain("formatted") for round-15 optimization evidence.

Writes plans/r15/<query>_<tag>.txt for each named query at
$SPARK_GRAFT_SF_DIR (default sf0.1).  Usage:

    python tools/r15_plans.py before [query ...]
    python tools/r15_plans.py after  [query ...]

With no query list, dumps the full headline bench set plus the heavy
extras this round examines.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quasdb_spark import suite  # noqa: E402
from quasdb_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "kv_state_latest", "kv_state_asof",
    "ts_tumbling_hourly", "ts_sliding_1h_15m", "ts_asof_join",
    "ts_sessionize", "ts_downsample_10m_last", "ts_gapfill_hourly",
    "rel_pricing_summary", "rel_top_orders", "rel_region_revenue",
    "rel_promo_share", "text_quality", "dedup_minhash_pairs",
    "dedup_simhash", "sim_cosine_topk", "sim_ivf_topk",
    "doc_token_packing", "text_bigram_topk", "ts_trailing_1h_sum",
    # heavy extras examined this round
    "emb_semdedup", "dedup_clusters_cc", "dedup_substring_spans",
    "emb_hard_negatives", "emb_pq_quantization", "sim_ivfpq_topk",
    "emb_rp_recall", "emb_decontaminate", "doc_importance",
    "text_lm_score", "text_bm25_search", "dedup_incremental",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r15-plans", master=f"local[{cpus}]",
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
