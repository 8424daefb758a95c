"""Catalog + numpy-cosine alternative path tests."""

import pytest

from quasdb_spark.catalog import Catalog


def test_catalog_lifecycle(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    assert cat.list() == []
    a = cat.create("alpha")
    a.put("k", "v")
    cat.create("beta")
    cat.create_ts("gamma")
    assert cat.list() == ["alpha", "beta", "gamma"]
    assert cat.open("alpha").get("k") == "v"
    props = cat.properties()
    assert props["alpha"]["quasdb.last-seq"] == 1
    cat.drop("beta")
    assert cat.list() == ["alpha", "gamma"]
    with pytest.raises(ValueError):
        cat.create("../evil")
    with pytest.raises(FileNotFoundError):
        cat.open("nope")


def test_cosine_pandas_matches_expression(spark, sf_dir):
    """The numpy mapInPandas ANN path returns the same neighbors as the
    pure-expression path (scores rounded identically)."""
    import pyspark.sql.functions as F

    from quasdb_spark.operators.similarity import (cosine_topk,
                                                   cosine_topk_pandas)
    from quasdb_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 250 == 0)
    a = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
         for r in cosine_topk(e, q, 5).collect()}
    b = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
         for r in cosine_topk_pandas(e, q, 5).collect()}
    assert a == b
