"""Plan-doctor lint: each rule fires on a deliberately bad plan and
stays quiet on the repo's own (pinned-clean) suite queries."""

import pyspark.sql.functions as F
import pytest

from quasdb_spark import suite
from quasdb_spark.plans.doctor import check_plan, lint_plan


def _rules(df):
    return {f["rule"] for f in lint_plan(df)}


def test_cartesian_detected(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    rules = _rules(a.crossJoin(b))
    assert "cartesian_product" in rules or "broadcast_nested_loop" in rules
    with pytest.raises(ValueError, match="plan fails scale lint"):
        check_plan(a.crossJoin(b))


def test_python_row_udf_detected(spark):
    bad = F.udf(lambda x: x + 1, "long")
    df = spark.range(10).select(bad("id").alias("y"))
    assert "python_row_udf" in _rules(df)
    # pandas path is info, not error
    check_plan(df, allow={"python_row_udf"})


def test_global_sort_detected(spark):
    # sort on a derived key (Range's natural order would let Catalyst
    # elide an orderBy("id") entirely)
    df = spark.range(1000).withColumn("k", F.col("id") % 7).orderBy("k")
    assert "global_sort" in _rules(df)
    # sort+limit fuses into TakeOrdered: no finding
    assert "global_sort" not in _rules(
        spark.range(1000).withColumn("k", F.col("id") % 7)
        .orderBy("k").limit(5))


def test_single_partition_window_detected(spark):
    from pyspark.sql import Window

    df = spark.range(1000).withColumn(
        "rn", F.row_number().over(Window.orderBy("id")))
    sev = {f["rule"]: f["severity"] for f in lint_plan(df)}
    # a global window over UNBOUNDED input is the scale-killer shape —
    # error severity, so check_plan (and the suite-wide gate) rejects it
    assert sev.get("single_partition_exchange") == "error"
    with pytest.raises(ValueError, match="single_partition_exchange"):
        check_plan(df)


def test_single_partition_bounded_is_warn(spark):
    """The two legitimate shapes stay warnings: a rank window AFTER a
    limit (input statically bounded), and the per-partition-totals
    cumulative-offsets window inside the distributed global rank."""
    from pyspark.sql import Window

    post_limit = (spark.range(1000).orderBy(F.col("id").desc()).limit(5)
                  .withColumn("rn", F.row_number().over(Window.orderBy("id"))))
    sev = {f["rule"]: f["severity"] for f in lint_plan(post_limit)}
    # TakeOrderedAndProject output is already a single partition, so the
    # window may need no exchange at all; if one appears it is bounded
    assert sev.get("single_partition_exchange") in (None, "warn")
    check_plan(post_limit)

    from quasdb_spark.operators.packing import global_ranks
    ranked = global_ranks(spark.range(1000).withColumn("k", F.col("id") % 7),
                          [F.col("k").asc(), F.col("id").asc()])
    sev2 = {f["rule"]: f["severity"] for f in lint_plan(ranked)}
    assert sev2.get("single_partition_exchange") in (None, "warn")
    check_plan(ranked)


def test_user_pid_column_does_not_silence_lint(spark):
    """The `_pid`-keyed-aggregate exemption is anchored to
    SPARK_PARTITION_ID() provenance: a USER column that merely shares
    the name has data-dependent cardinality, so an unbounded
    single-partition window over it must still be an error."""
    from pyspark.sql import Window

    df = (spark.range(100000)
          .withColumn("_pid", F.col("id") % 50000)   # user data, not
          .groupBy("_pid").count()                   # partition ids
          .withColumn("rn", F.row_number().over(Window.orderBy("_pid"))))
    sev = {f["rule"]: f["severity"] for f in lint_plan(df)}
    assert sev.get("single_partition_exchange") == "error"
    with pytest.raises(ValueError, match="single_partition_exchange"):
        check_plan(df)


def test_suite_queries_pass_error_lint(spark, sf_dir):
    """EVERY suite query's plan must carry no error-severity findings
    (cartesian products, broadcast nested loops, row-at-a-time Python
    UDFs) — the doctor agrees with the pinned plan tests across the
    whole 100-query surface, not a sample. Stream-driving queries are
    excluded (building their DataFrame executes a streaming drain;
    their plans are stateful-agg shapes covered by their own gates)."""
    skip = {n for n in suite.QUERIES if n.startswith("stream_")}
    skip |= {"kv_stream_state", "kv_state_postcompact"}
    # By-design brute-force crosses, each with a documented scale path:
    # - sim_cosine_topk / crossmodal_neighbors: the exact-cosine
    #   BASELINE (query batch x corpus). Production bounds the query
    #   batch per serving call; the scale paths are sim_bucket_topk /
    #   sim_probe_topk / sim_ivf_topk.
    # - emb_label_separation: centroid side is one row per LABEL
    #   (bounded by the label vocabulary, not the corpus) — the lint
    #   cannot prove a keyed aggregate's cardinality statically.
    # - sim_ivf_recall / emb_rp_recall: embed the brute cross ON
    #   PURPOSE — recall is measured against the exact ground truth,
    #   so the baseline's cost model (bounded query batch) is
    #   inherited by construction (emb_rp_recall's approx side is the
    #   projected-space brute baseline for the same reason).
    allow_bnlj = {"sim_cosine_topk", "crossmodal_neighbors",
                  "emb_label_separation", "sim_ivf_recall",
                  "emb_rp_recall"}
    failures = {}
    for name, fn in suite.QUERIES.items():
        if name in skip:
            continue
        allow = {"broadcast_nested_loop"} if name in allow_bnlj \
            else frozenset()
        try:
            check_plan(fn(spark, sf_dir), allow=allow)
        except ValueError as ex:
            failures[name] = str(ex)
    assert not failures, failures


def test_bnlj_bounded_broadcast_downgrades_to_warn(spark):
    """A cross against a statically bounded side (keyless global
    aggregate / LIMIT / driver-local table) is a constant-size
    broadcast and must NOT be an error; an unbounded cross must."""
    big = spark.range(1000).withColumnRenamed("id", "a")
    total = big.agg(F.count(F.lit(1)).alias("n"))       # keyless agg
    sev = {f["rule"]: f["severity"]
           for f in lint_plan(big.crossJoin(total))}
    assert sev.get("broadcast_nested_loop") == "warn"

    other = spark.range(500).withColumnRenamed("id", "b")
    unbounded = big.join(other, F.col("a") > F.col("b"))
    sev2 = {f["rule"]: f["severity"] for f in lint_plan(unbounded)}
    assert sev2.get("broadcast_nested_loop") == "error"
