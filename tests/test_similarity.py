"""Banded sign-LSH near-dup: plan shape (no cross join) and recall
against the brute-force oracle on planted near-duplicates.

The brute-force ``neardup_pairs_cosine`` stays in the tree as the exact
recall oracle only — the suite's scale path is ``neardup_pairs_banded``.
"""

import math
import random

import pyspark.sql.functions as F

from quasdb_spark.operators.similarity import (neardup_pairs_banded,
                                               neardup_pairs_cosine)
from quasdb_spark.sources.tables import load_table


def test_banded_plan_has_no_cross_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    plan = neardup_pairs_banded(e, threshold=0.4)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_banded_subset_of_brute_force(spark, sf_dir):
    """Every banded pair is a true pair (precision = 1.0): blocking only
    prunes candidates, never invents them."""
    e = load_table(spark, sf_dir, "embeddings")
    banded = {(r.id_a, r.id_b, r.score)
              for r in neardup_pairs_banded(e, threshold=0.4).collect()}
    brute = {(r.id_a, r.id_b, r.score)
             for r in neardup_pairs_cosine(e, threshold=0.4).collect()}
    assert banded <= brute
    assert banded  # finds something at this threshold on the testdata


def test_banded_recall_on_planted_neardups(spark):
    """Plant genuine near-duplicates (cos >= ~0.95) in a random corpus:
    banded LSH at 8x8 must recover nearly all of them. This is the
    regime near-dup detection is for; recall at weak thresholds
    (cos ~ 0.4, the random-similarity regime) is the LSH curve and is
    intentionally partial."""
    rng = random.Random(42)
    dims = 64
    rows = []
    for i in range(200):
        v = [rng.gauss(0, 1) for _ in range(dims)]
        rows.append((i, v))
    # 40 planted near-dups: base + small noise
    for j in range(40):
        base = rows[j][1]
        noise = [rng.gauss(0, 0.08) for _ in range(dims)]
        nrm = math.sqrt(sum(x * x for x in base))
        rows.append((1000 + j, [b + n * nrm / 8 for b, n in zip(base, noise)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = {(r.id_a, r.id_b)
             for r in neardup_pairs_cosine(df, threshold=0.9).collect()}
    banded = {(r.id_a, r.id_b)
              for r in neardup_pairs_banded(df, threshold=0.9).collect()}
    assert banded <= brute
    assert len(brute) >= 30  # the plant worked
    recall = len(banded) / len(brute)
    assert recall >= 0.85, f"recall {recall:.2f} below banded-LSH expectation"
