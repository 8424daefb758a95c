"""Bucketed-layout plan guards: a join of two tables bucketed on the
join key with equal counts must read bucket-aligned and NEVER
exchange — the pay-shuffle-once-at-write lever that makes repeated
100 TB fact-fact joins affordable (SCALE.md §2)."""

import pytest

from quasdb_spark.plans.bucketing import (bucket_spec, co_located_join,
                                          write_bucketed)
from quasdb_spark.sources.tables import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture
def bucketed_pair(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "orders_b", by="o_orderkey", n_buckets=4,
                   path=str(tmp_path / "orders_b"))
    write_bucketed(li, "lineitem_b", by="l_orderkey", n_buckets=4,
                   path=str(tmp_path / "lineitem_b"))
    yield o, li
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b8")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    o, li = bucketed_pair
    assert bucket_spec(spark, "orders_b") == (["o_orderkey"], 4)

    # force the non-broadcast regime (at 100 TB neither side fits)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = co_located_join(spark, "lineitem_b", "orders_b",
                            left_on="l_orderkey", right_on="o_orderkey")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan

        # same join over the raw (unbucketed) parquet shuffles BOTH
        # sides — the cost bucketing eliminates
        raw = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        assert _plan(raw).count("Exchange hashpartitioning") == 2

        # and the answers agree
        assert j.count() == raw.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key also rides the layout: no
    exchange before the final agg."""
    import pyspark.sql.functions as F

    g = (spark.table("lineitem_b").groupBy("l_orderkey")
         .agg(F.sum("l_quantity").alias("q")))
    assert "Exchange" not in _plan(g)


def test_co_located_join_guards(spark, bucketed_pair):
    o, _ = bucketed_pair
    write_bucketed(o, "orders_b8", by="o_orderkey", n_buckets=8)
    with pytest.raises(ValueError, match="bucket counts differ"):
        co_located_join(spark, "lineitem_b", "orders_b8",
                        left_on="l_orderkey", right_on="o_orderkey")
    with pytest.raises(ValueError, match="join keys"):
        co_located_join(spark, "lineitem_b", "orders_b",
                        left_on="l_partkey", right_on="o_orderkey")
    o.limit(10).createOrReplaceTempView("orders_plain")
    try:
        with pytest.raises(ValueError, match="both sides bucketed"):
            co_located_join(spark, "lineitem_b", "orders_plain",
                            left_on="l_orderkey", right_on="o_orderkey")
    finally:
        spark.catalog.dropTempView("orders_plain")
