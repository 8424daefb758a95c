"""Benchmark harness (BASELINE.md §3 protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation, no
driver collect). KV-store benches (B1-B8) run against a store built in
a temp dir from the events table.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quasdb_spark import suite  # noqa: E402
from quasdb_spark.session import get_spark  # noqa: E402
from quasdb_spark.sources.tables import load_table  # noqa: E402
from quasdb_spark.store import KVStore  # noqa: E402

SUITE_BENCH = [
    "kv_state_latest", "kv_state_asof",
    "ts_tumbling_hourly", "ts_sliding_1h_15m", "ts_asof_join",
    "ts_sessionize", "ts_downsample_10m_last", "ts_gapfill_hourly",
    "rel_pricing_summary", "rel_top_orders", "rel_region_revenue",
    "rel_promo_share",
    "text_quality", "dedup_minhash_pairs", "dedup_simhash",
    "sim_cosine_topk", "sim_ivf_topk", "doc_token_packing",
    "text_bigram_topk", "ts_trailing_1h_sum",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("quasdb-bench", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions": cpus})
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        times[name] = round(time.perf_counter() - t0, 3)

    # ---- KV store lifecycle benches (B1, B3-B5, B8) ----
    tmp = tempfile.mkdtemp(prefix="quasdb-bench-")
    store_path = os.path.join(tmp, "store")
    try:
        ev = load_table(spark, sf_dir, "events")
        st = KVStore.create(spark, store_path)
        df = ev.selectExpr("concat('u', lpad(cast(user_id as string), 6, '0')) as key",
                           "cast(event_id as long) as sub",
                           "case when event_type = 'error' then 'del' else 'put' end as op",
                           "cast(value as string) as value")
        timed("kv_ingest", lambda: st.ingest(df, op_col="op", sub_col="sub"))
        timed("kv_full_state", lambda: _force(st.state()))
        timed("kv_range_scan", lambda: _force(st.scan("u000020", "u000080")))
        timed("kv_point_get", lambda: st.get("u000042"))
        timed("kv_compact", lambda: st.compact())
        timed("kv_full_state_postcompact", lambda: _force(st.state()))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # ---- declarative suite benches ----
    for name in SUITE_BENCH:
        fn = suite.QUERIES[name]
        timed(name, lambda fn=fn: _force(fn(spark, sf_dir)))

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_total_wall",
        "value": total, "unit": "sec", "queries": times, "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
