"""sf100 (1000x) third-decade spot runner (VERDICT r12 #5).

Runs the named suite queries one-shot against the .sf100 dataset
(tools/gen_sf.py factor 1000 — ~16 GB, 100M-row events, 2M-vector
embeddings), bracketed by host calibration probes, and MERGES the
readings into BENCH_sf100.json (existing rows are preserved so the
artifact accumulates decades of evidence across rounds; a re-run of a
named query overwrites its row).

Maintenance (IVF quantizer/lists, PQ artifacts, dedup index) runs
untimed first, exactly like bench.py's contract: production schedules
index builds, queries only probe.

Usage: python tools/sf100_spot.py [query ...]
  (default: the r13 heavy-extras set)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT_QUERIES = [
    # the heavy extras whose 100 TB claims carried one decade of
    # evidence (VERDICT r12 missing #2) ...
    "dedup_substring_spans", "dedup_clusters_cc", "emb_hard_negatives",
    "sim_ivfpq_topk", "sim_cosine_topk_blocked",
    # ... plus the r13-changed pipelines next to r12's 978 s md5 row
    "dedup_minhash_pairs", "dedup_minhash_xxh",
]

# Bounded-query-subset protocol (VERDICT r13 next #3): the blocked
# exact top-k is LINEAR in queries by construction (independent query
# chunks over the same corpus pass), so the standing third-decade
# evidence runs 1/SUBSET_FACTOR of the suite's query sample one-shot
# and records both the measured time and the documented linear
# extrapolation to the full 20k-query row. A full one-shot needs
# ~1.5-2 h on this box; the subset keeps the evidence refreshable
# every round.
SUBSET_FACTOR = 10


def _blocked_subset(spark, sf_dir):
    from pyspark.sql import functions as F

    from quasdb_spark.operators import similarity as SIM
    from quasdb_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    # suite sample is vec_id % 100 == 0; take every SUBSET_FACTOR-th
    q = e.where(F.col("vec_id") % (100 * SUBSET_FACTOR) == 0)
    return SIM.cosine_topk_blocked(e, q, 10)

SF100_DIR = os.environ.get("SPARK_GRAFT_SF100_DIR",
                           os.path.join(ROOT, ".sf100"))
OUT = os.path.join(ROOT, "BENCH_sf100.json")


def probe() -> dict:
    import numpy as np

    a = (np.arange(1_000_000, dtype=np.int64) * 2654435761) % 1000003
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        b = a
        for _ in range(20):
            b = (b * 6364136223846793005 + 1442695040888963407) \
                % 9223372036854775783
        ts.append(time.perf_counter() - t0)
    return {"loadavg": [round(x, 2) for x in os.getloadavg()],
            "calib_int_ms": round(statistics.median(ts) * 1000, 2)}


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    if not os.path.isdir(SF100_DIR):
        sys.exit(f"no sf100 dataset at {SF100_DIR} — generate with "
                 f"tools/gen_sf.py <sf0.1> {SF100_DIR} 1000")
    try:
        with open(OUT) as f:
            art = json.load(f)
    except (OSError, ValueError):
        art = {"sf_dir": ".sf100", "factor_vs_bench": 1000,
               "queries": {}}
    from quasdb_spark import suite
    from quasdb_spark.session import get_spark

    spark = get_spark("sf100-spot",
                      master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
                      extra_conf={"spark.sql.shuffle.partitions": "32"})
    spark.sparkContext.setLogLevel("ERROR")
    art["driver_memory"] = spark.conf.get("spark.driver.memory", None)
    art["host_start_r14"] = probe()
    maint = {}
    t0 = time.perf_counter()
    try:
        suite._ivf_cents(spark, SF100_DIR)
        cents, lists = suite._ivf_lists(spark, SF100_DIR)
        maint["ivf"] = round(time.perf_counter() - t0, 1)
        # pre-fire the AUTO index maintenance the search path would
        # otherwise run inside the first timed query (quantizer.
        # ensure_tuned, VERDICT r13 #1): production schedules the
        # retrain, queries only pay the (free) shape check + artifact
        # load. The retuned artifact is keyed+cached, so the timed
        # sim_ivf*/sim_ivfpq* queries below hit it instantly.
        t0 = time.perf_counter()
        from quasdb_spark.operators import quantizer as QZ
        fp = QZ.corpus_fingerprint(
            os.path.join(SF100_DIR, "embeddings.parquet"))
        tuned = QZ.ensure_tuned(cents, lists, fingerprint=fp)
        maint["ivf_retune_train_s"] = round(time.perf_counter() - t0, 1)
        maint["ivf_retuned"] = tuned["retuned"]
        maint["ivf_retuned_nlist"] = tuned["n_clusters"]
        t0 = time.perf_counter()
        suite._pq_artifacts(spark, SF100_DIR)
        maint["pq"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        suite._dedup_idx(spark, SF100_DIR)
        maint["dedup_idx"] = round(time.perf_counter() - t0, 1)
        t0 = time.perf_counter()
        suite._dedup_idx_xxh(spark, SF100_DIR)
        maint["dedup_idx_xxh"] = round(time.perf_counter() - t0, 1)
    except Exception as ex:
        maint["error"] = str(ex)[:300]
    art["maintenance_untimed_r14"] = maint
    for name in names:
        if name == "sim_cosine_topk_blocked":
            # bounded-subset protocol (see SUBSET_FACTOR above): run
            # 1/10 of the query sample one-shot, record measured +
            # linear extrapolation, and REPLACE the error row the
            # capped full run left
            try:
                t0 = time.perf_counter()
                _blocked_subset(spark, SF100_DIR) \
                    .write.format("noop").mode("overwrite").save()
                took = round(time.perf_counter() - t0, 1)
                # measured-only discipline (ADVICE r14 #4): the
                # subset time is the MEASUREMENT and goes under
                # ``queries``; the linear extrapolation to the full
                # query set is a PROJECTION and lives in
                # ``queries_projected`` so a reader can never mistake
                # it for a wall-clock reading
                art["queries"][name + "_subset"] = took
                art["queries"].pop(name, None)
                art.setdefault("queries_projected", {})[name] = \
                    round(took * SUBSET_FACTOR, 1)
                art.setdefault("protocols", {})[name] = {
                    "measured_s": took,
                    "query_subset": f"1/{SUBSET_FACTOR} of the suite's "
                                    "20k-query sample (vec_id % 1000 "
                                    "== 0), one-shot",
                    "recorded": f"queries.{name}_subset = measured; "
                                f"queries_projected.{name} = measured "
                                "x SUBSET_FACTOR — the blocked scan "
                                "is linear in queries by construction "
                                "(independent query chunks over one "
                                "corpus pass)"}
                (art.get("errors") or {}).pop(name, None)
                print(f"{name}: {took} s measured (subset) -> "
                      f"{art['queries_projected'][name]} s projected",
                      file=sys.stderr)
            except Exception as ex:
                art["queries"][name] = None
                art.setdefault("errors", {})[name] = str(ex)[:300]
                print(f"{name}: ERROR {ex}", file=sys.stderr)
            with open(OUT, "w") as f:
                json.dump(art, f, indent=1)
                f.write("\n")
            continue
        fn = suite.QUERIES[name]
        try:
            t0 = time.perf_counter()
            fn(spark, SF100_DIR).write.format("noop") \
                .mode("overwrite").save()
            art["queries"][name] = round(time.perf_counter() - t0, 1)
            (art.get("errors") or {}).pop(name, None)  # stale failure
            print(f"{name}: {art['queries'][name]} s", file=sys.stderr)
        except Exception as ex:
            art["queries"][name] = None
            art.setdefault("errors", {})[name] = str(ex)[:300]
            print(f"{name}: ERROR {ex}", file=sys.stderr)
        with open(OUT, "w") as f:   # persist after EVERY query — a
            json.dump(art, f, indent=1)  # crash keeps prior readings
            f.write("\n")
    art["host_end_r14"] = probe()
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    spark.stop()
    print(json.dumps({k: v for k, v in art["queries"].items()
                      if k in names}))


if __name__ == "__main__":
    main()
