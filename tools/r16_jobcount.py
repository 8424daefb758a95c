"""Per-query Spark JOB counts + wall time (round-16 evidence).

At sf0.1 the CC-family queries are job-latency bound (VERDICT r15:
~44 AQE stage-jobs per dedup_clusters_cc execution), so the job count
per execution is the number to move. Usage:

    python tools/r16_jobcount.py [query ...]    # default: CC family

Prints one line per rep: query, wall seconds, jobs launched.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quasdb_spark import suite  # noqa: E402
from quasdb_spark.session import get_spark  # noqa: E402

DEFAULT = ["dedup_clusters_cc", "dedup_clusters_cc_xxh",
           "dedup_clusters", "emb_semdedup", "sim_ivfpq_topk"]

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("r16-jobcount", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions": cpus})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # untimed maintenance, as bench.py does
    suite._ivf_cents(spark, sf_dir)
    suite._ivf_lists(spark, sf_dir)
    suite._pq_artifacts(spark, sf_dir)
    tracker = sc.statusTracker()
    for name in names:
        fn = suite.QUERIES[name]
        for rep in range(REPS):
            group = f"jc-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            n_jobs = len(tracker.getJobIdsForGroup(group))
            print(f"{name} rep{rep}: {wall:.3f}s jobs={n_jobs}",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
