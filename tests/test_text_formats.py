"""JSONL/CSV source-sink round-trips on the driver testdata."""

import os

import pytest
from pyspark.sql import functions as F

from quasdb_spark.sources.tables import load_table
from quasdb_spark.sources.text_formats import (
    read_csv, read_jsonl, schema_of_table, write_csv, write_jsonl)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents")


def _sorted_rows(df, cols):
    return [tuple(r) for r in
            df.select(*cols).orderBy("doc_id").collect()]


def test_jsonl_roundtrip_preserves_rows(spark, tmp_path):
    d = _docs(spark)
    p = str(tmp_path / "docs_jsonl")
    write_jsonl(d, p)
    back = read_jsonl(spark, p, schema_of_table(d))
    cols = d.columns
    assert _sorted_rows(back, cols) == _sorted_rows(d, cols)
    # gzip-compressed part files, one per task
    parts = [f for f in os.listdir(p) if f.startswith("part-")]
    assert parts and all(f.endswith(".json.gz") for f in parts)


def test_jsonl_partitioned_write_prunes(spark, tmp_path):
    d = _docs(spark)
    p = str(tmp_path / "docs_by_lang")
    write_jsonl(d, p, partition_by=["lang"])
    langs = {f.split("=")[1] for f in os.listdir(p) if f.startswith("lang=")}
    assert langs == {r["lang"] for r in d.select("lang").distinct().collect()}
    # schema minus the partition column, which comes from the dir name
    base = schema_of_table(d.drop("lang")) + ", lang string"
    back = read_jsonl(spark, p, base)
    got = back.where(F.col("lang") == "en")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan  # dir-level pruning
    assert (got.count()
            == d.where(F.col("lang") == "en").count())


def test_csv_roundtrip_simple_columns(spark, tmp_path):
    # CSV can't carry nested/ns-timestamp types; use the flat columns
    d = _docs(spark).select("doc_id", "lang", "source", "n_chars")
    p = str(tmp_path / "docs_csv")
    write_csv(d, p)
    back = read_csv(spark, p, schema_of_table(d))
    assert _sorted_rows(back, d.columns) == _sorted_rows(d, d.columns)


def test_corrupt_jsonl_line_is_isolated_not_fatal(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "a.json").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        'THIS IS NOT JSON\n'
        '{"doc_id": 2, "text": "also ok"}\n')
    back = read_jsonl(
        spark, str(p),
        "doc_id long, text string, _corrupt_record string").cache()
    try:
        good = back.where(F.col("_corrupt_record").isNull())
        bad = back.where(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2 and bad.count() == 1
        assert bad.first()["_corrupt_record"].startswith("THIS IS NOT")
    finally:
        back.unpersist()


def test_jsonl_roundtrip_array_column(spark, tmp_path):
    """Array-typed columns (embeddings) survive the JSONL hop with an
    explicit DDL schema."""
    e = load_table(spark, SF, "embeddings")
    p = str(tmp_path / "emb_jsonl")
    write_jsonl(e, p)
    back = read_jsonl(spark, p, schema_of_table(e))
    assert back.schema == e.schema
    a = sorted((r["vec_id"], tuple(r["embedding"]))
               for r in back.select("vec_id", "embedding").collect())
    b = sorted((r["vec_id"], tuple(r["embedding"]))
               for r in e.select("vec_id", "embedding").collect())
    assert a == b
