"""Third-decade evidence for the dedup index maintenance tick
(ensure_banded, r15): against the persisted sf100 indexes (5M docs,
7.5M banded entries), measure

- the ONE-TIME bucket-stats measuring pass the first post-upgrade
  probe pays (index_bucket_stats over the full index, persisted to
  the sidecar),
- the warm tick after stats are recorded (sidecar + mtime memo —
  the steady-state cost every probe pays), and
- the dedup_index_health aggregation itself (the suite row's shape).

Updates BENCH_sf100.json in place under ``dedup_index_health_r15``
(timings + the measured bucket shape). Usage:
    python tools/sf100_health_probe.py [sf100_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF100_DIR = os.environ.get("SPARK_GRAFT_SF100_DIR",
                           os.path.join(ROOT, ".sf100"))


def main() -> None:
    from quasdb_spark import suite
    from quasdb_spark.operators import dedup as D
    from quasdb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF100_DIR
    spark = get_spark("sf100-health", master="local[32]",
                      extra_conf={"spark.sql.shuffle.partitions": "32"})
    spark.sparkContext.setLogLevel("ERROR")
    rec: dict = {"sf_dir": sf_dir}
    for label, loader in [("md5", suite._dedup_idx),
                          ("xxh", suite._dedup_idx_xxh)]:
        t0 = time.time()
        idx, meta = loader(spark, sf_dir)
        load_s = round(time.time() - t0, 1)
        cold = meta.get("bucket_stats") is None
        t0 = time.time()
        tick1 = D.ensure_banded(idx, meta)
        tick1_s = round(time.time() - t0, 2)
        t0 = time.time()
        tick2 = D.ensure_banded(tick1["index"], tick1["meta"])
        tick2_s = round(time.time() - t0, 4)
        rec[label] = {
            "artifact_load_s": load_s,
            "tick_first_s": tick1_s,
            "tick_first_measured_stats": cold,
            "tick_warm_s": tick2_s,
            "stats": tick1["stats"],
            "rebanded": tick1["rebanded"],
        }
        print(label, rec[label], flush=True)
    t0 = time.time()
    out = suite.QUERIES["dedup_index_health"](spark, sf_dir).collect()
    rec["health_query_s"] = round(time.time() - t0, 2)
    rec["health_rows"] = sorted(
        (int(r["band"]), int(r["n_keys"]), int(r["max_bucket"]),
         int(r["n_entries"])) for r in out)
    print("health query:", rec["health_query_s"], "s",
          rec["health_rows"], flush=True)
    art_path = os.path.join(ROOT, "BENCH_sf100.json")
    try:
        art = json.load(open(art_path))
    except (OSError, ValueError):
        art = {}
    art["dedup_index_health_r15"] = rec
    with open(art_path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(f"updated {art_path}")
    spark.stop()


if __name__ == "__main__":
    main()
