"""Scale the driver testdata by an integer factor for local scale
spot-checks (VERDICT r5 #8): sf1 = 10 similarity-preserving replicas
of sf0.1.

Replica construction keeps every query's asymptotics honest at the
bigger SF instead of degenerating them:

- All BIGINT entity keys shift by ``replica * OFFSET`` so keys stay
  unique and FK joins stay valid WITHIN a replica (orders reference
  the same replica's shifted customers — dims scale with SF, like
  TPC-H).
- ``region``/``nation`` stay fixed (constant-size dims at any SF).
- ``documents.text`` gets a per-replica token suffix (every
  whitespace token ``t`` -> ``t~i``): a bijective shingle map, so
  WITHIN-replica MinHash/Jaccard structure is preserved exactly while
  CROSS-replica shingle sets are disjoint — naive copying would make
  every doc a 10-way exact duplicate and blow pair counts
  quadratically, which is a different workload, not a bigger one.
- ``embeddings.embedding`` gets a per-replica dimension permutation:
  within-replica cosines are exactly preserved (same permutation on
  both sides), cross-replica cosines decorrelate to ~0 — same
  reasoning as the text transform.
- Timestamps are left alone: windows get factor-times density, which
  is what a bigger cluster day looks like.

Usage: python tools/gen_sf.py /root/testdata/sf0.1 /root/repo/.sf1 10
"""

from __future__ import annotations

import random
import sys

OFFSET = 100_000_000  # far above any key in the driver testdata

KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_DIMS = ["region", "nation"]


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from pyspark.sql import functions as F

    from quasdb_spark.session import get_spark
    from quasdb_spark.sources.tables import load_table

    spark = get_spark("gen_sf")
    for t in FIXED_DIMS:
        load_table(spark, src, t).write.mode("overwrite") \
            .parquet(f"{out}/{t}.parquet")
        print(t, "copied")
    for t, keys in KEY_SHIFTS.items():
        base = load_table(spark, src, t)
        dims = None
        if t == "embeddings":
            dims = len(base.select("embedding").first()[0])
        reps = []
        for i in range(factor):
            df = base
            for k in keys:
                df = df.withColumn(k, F.col(k) + F.lit(i * OFFSET))
            if i > 0 and t == "documents":
                df = df.withColumn(
                    "text",
                    F.regexp_replace("text", r"(\S+)", rf"$1~{i}"))
                df = df.withColumn("n_chars", F.length("text"))
            if i > 0 and t == "embeddings":
                perm = list(range(dims))
                random.Random(1000 + i).shuffle(perm)
                df = df.withColumn(
                    "embedding",
                    F.array(*[F.col("embedding")[p] for p in perm]))
            reps.append(df)
        full = reps[0]
        for r in reps[1:]:
            full = full.unionAll(r)
        full.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(t, "x", factor, "written")
    spark.stop()


if __name__ == "__main__":
    main()
