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
    assert "single_partition_exchange" in _rules(df)


def test_suite_queries_pass_error_lint(spark, sf_dir):
    """The engine's own headline queries must carry no error-severity
    findings — the lint agrees with the pinned plan tests."""
    for name in ("rel_region_revenue", "dedup_minhash_pairs",
                 "sim_neardup_cosine", "emb_semdedup",
                 "text_pii_redact", "ts_asof_join"):
        check_plan(suite.QUERIES[name](spark, sf_dir))
