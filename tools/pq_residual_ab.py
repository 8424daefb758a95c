"""Recall/cost A/B: raw-vector PQ vs residual PQ inside IVF-PQ search
(VERDICT r8 #6). FAISS IndexIVFPQ encodes residuals x − c_list by
default; this repo's sim_ivfpq_topk quantizes raw vectors. Measures
recall@10 of both against the brute-force cosine ground truth on the
same coarse quantizer / lists / nprobe / m / pq_k, plus warm wall
time with PERSISTED artifacts for both paths (queries never train).

Usage: python tools/pq_residual_ab.py [sf_dir] [reps] [m] [pq_k]
Prints one JSON object and appends nothing — record the table in
SCALE.md by hand.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from quasdb_spark import suite  # noqa: E402
from quasdb_spark.operators import quantizer as QZ  # noqa: E402
from quasdb_spark.operators import similarity as SIM  # noqa: E402
from quasdb_spark.session import get_spark  # noqa: E402


def recall_at_k(approx, brute, k=10):
    hits = (brute.join(approx.select("query_id", "neighbor_id",
                                     F.lit(1).alias("_hit")),
                       ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg((F.sum(F.coalesce("_hit", F.lit(0)))
                  / F.count(F.lit(1))).alias("recall")))
    row = hits.agg(F.avg("recall").alias("mean"),
                   F.min("recall").alias("min")).collect()[0]
    return round(row["mean"], 4), round(row["min"], 4)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    pq_k = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    spark = get_spark("pq-residual-ab", master="local[32]",
                      extra_conf={"spark.sql.shuffle.partitions": "32"})
    spark.sparkContext.setLogLevel("ERROR")
    e = suite._t(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") % 100 == 0)
    cents, lists = suite._ivf_lists(spark, sf_dir)

    fp = QZ.corpus_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    t0 = time.perf_counter()
    if (m, pq_k) == (4, 8):
        cbs_raw, codes_raw = suite._pq_artifacts(spark, sf_dir)
    else:
        cbs_raw = QZ.get_or_train_pq(e, fingerprint=fp, m=m, k=pq_k)
        codes_raw = QZ.get_or_build_codes(e, cbs_raw, fingerprint=fp,
                                          m=m, k=pq_k)
    t_raw_art = time.perf_counter() - t0
    res = SIM.residual_frame(cents, lists)
    t0 = time.perf_counter()
    cbs_res = QZ.get_or_train_pq(res, fingerprint=fp + "-res", m=m,
                                 k=pq_k, vec_col="_rv")
    codes_res = QZ.get_or_build_codes(res, cbs_res,
                                      fingerprint=fp + "-res", m=m,
                                      k=pq_k, vec_col="_rv")
    t_res_art = time.perf_counter() - t0

    brute = SIM.cosine_topk(e, queries, 10).select("query_id",
                                                   "neighbor_id")
    brute = brute.cache()
    brute.count()

    def run(fn):
        out = None
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            out.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        return out, round(statistics.median(times), 3)

    raw_df, t_raw = run(lambda: SIM.ivfpq_topk(
        e, queries, 10, nprobe=2, m=m, pq_k=pq_k, centroids=cents,
        lists=lists, codebooks=cbs_raw, codes=codes_raw))
    res_df, t_res = run(lambda: SIM.ivfpq_topk_residual(
        queries, 10, nprobe=2, m=m, pq_k=pq_k, centroids=cents,
        lists=lists, codebooks=cbs_res, codes=codes_res))
    ivf_df, t_ivf = run(lambda: SIM.ivf_topk(
        e, queries, 10, nprobe=2, centroids=cents, lists=lists))

    raw_mean, raw_min = recall_at_k(raw_df, brute)
    res_mean, res_min = recall_at_k(res_df, brute)
    ivf_mean, ivf_min = recall_at_k(ivf_df, brute)
    # IVF-limit recall: PQ can never beat the float-vector scoring of
    # the same probed lists — the gap vs this line is what PQ costs.
    print(json.dumps({
        "sf_dir": sf_dir, "reps": reps, "nprobe": 2, "m": m, "pq_k": pq_k,
        "recall_at_10_mean": {"ivfpq_raw": raw_mean,
                              "ivfpq_residual": res_mean,
                              "ivf_float_limit": ivf_mean},
        "recall_at_10_min": {"ivfpq_raw": raw_min,
                             "ivfpq_residual": res_min,
                             "ivf_float_limit": ivf_min},
        "warm_query_sec": {"ivfpq_raw": t_raw,
                           "ivfpq_residual": t_res,
                           "ivf_float": t_ivf},
        "artifact_build_or_load_sec": {"raw": round(t_raw_art, 3),
                                       "residual": round(t_res_art, 3)},
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
