"""Typed per-store value schemas (SURVEY §1.4 create_store(path, schema)).

The reference's contract is byte-string values (kv/include/slice.h:13-26);
the typed face stores value FIELDS as native Parquet columns instead, so
reads get column pruning and value-predicate pushdown. Semantics (LWW,
tombstones, snapshots, compaction invariance) must be identical to the
string store — checked here by a randomized model test against a plain
dict, mirroring test_store's model tests.
"""

import random

import pytest
from pyspark.sql import functions as F

from quasdb_spark.store import KVStore

SCHEMA = "n long, total double, tag string"


def _mk(spark, tmp_path, name="typed"):
    return KVStore.create(spark, str(tmp_path / name), value_schema=SCHEMA)


def test_typed_create_persists_schema_across_open(spark, tmp_path):
    st = _mk(spark, tmp_path)
    assert st.value_cols == ["n", "total", "tag"]
    st.put("a", {"n": 1, "total": 2.5, "tag": "x"})
    st2 = KVStore.open(spark, st.path)
    assert st2.value_cols == ["n", "total", "tag"]
    assert st2.get("a") == {"n": 1, "total": 2.5, "tag": "x"}


def test_typed_put_get_delete_and_partial_fields(spark, tmp_path):
    st = _mk(spark, tmp_path)
    st.put("k1", {"n": 10, "total": 1.0, "tag": "a"})
    st.put("k2", {"n": 20})  # missing fields -> NULL
    assert st.get("k2") == {"n": 20, "total": None, "tag": None}
    st.delete("k1")
    assert st.get("k1") is None
    assert st.multi_get(["k1", "k2"]) == {
        "k2": {"n": 20, "total": None, "tag": None}}


def test_typed_rejects_bad_values(spark, tmp_path):
    st = _mk(spark, tmp_path)
    with pytest.raises(TypeError):
        st.put("k", "not-a-dict")
    with pytest.raises(ValueError):
        st.put("k", {"nope": 1})
    with pytest.raises(ValueError):
        KVStore.create(spark, str(tmp_path / "bad"),
                       value_schema="key string, n long")  # reserved name
    with pytest.raises(ValueError):
        KVStore.create(spark, str(tmp_path / "bad2"), binary=True,
                       value_schema=SCHEMA)


def test_typed_value_predicate_pushdown(spark, tmp_path):
    """The typed store's whole point: a filter on a value FIELD reaches
    the Parquet scan as a pushed filter (impossible on JSON strings)."""
    st = _mk(spark, tmp_path)
    st.ingest(spark.range(2000).select(
        F.format_string("k%07d", "id").alias("key"),
        F.col("id").alias("n"), (F.col("id") * 1.5).alias("total"),
        F.lit("t").alias("tag")))
    plan = (st.log_df().where(F.col("n") > 1900)._jdf
            .queryExecution().executedPlan().toString())
    assert "PushedFilters: [" in plan and "GreaterThan(n,1900" in plan


def test_typed_randomized_model(spark, tmp_path):
    """Randomized ops vs a dict model, with compaction + as-of checks —
    the same harness contract as the string/binary model tests."""
    rng = random.Random(1234)
    st = _mk(spark, tmp_path)
    model: dict = {}
    keys = [f"k{i:03d}" for i in range(40)]
    snap_seq, snap_model = None, None
    for step in range(45):
        k = rng.choice(keys)
        r = rng.random()
        if r < 0.5:
            v = {"n": rng.randrange(1000), "total": rng.randrange(100) / 4,
                 "tag": rng.choice(["a", "b", None])}
            st.put(k, v)
            model[k] = v
        elif r < 0.7:
            st.delete(k)
            model.pop(k, None)
        elif r < 0.8 and snap_seq is None and step > 10:
            snap_seq = st.snapshot("model-snap")
            snap_model = dict(model)
        else:
            k2 = rng.choice(keys)
            v = {"n": step, "total": None, "tag": "batch"}
            st.write_batch([("put", k, v), ("del", k2, None)])
            model[k] = v
            model.pop(k2, None)  # replay order: del is the later sub

    def observed(asof=None):
        return {r["key"]: {"n": r["n"], "total": r["total"], "tag": r["tag"]}
                for r in st.state(asof).collect()}

    assert observed() == model
    if snap_seq is not None:
        assert observed(snap_seq) == snap_model
    st.compact()
    assert observed() == model
    if snap_seq is not None:
        assert observed(snap_seq) == snap_model


def test_typed_continuous_rollup_no_json(spark, tmp_path, sf_dir):
    """continuous_rollup on a typed store lands aggregates as native
    columns; rollup_state reads them back without any from_json, and a
    value predicate pushes down to the scan."""
    from quasdb_spark.sources.tables import load_table
    from quasdb_spark.streaming.rollup import continuous_rollup, rollup_state

    ev = load_table(spark, sf_dir, "events").limit(5000)
    src = str(tmp_path / "src")
    ev.select("ts", "event_type", "value").write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)

    st = KVStore.create(spark, str(tmp_path / "roll"),
                        value_schema="n long, total double")
    q = continuous_rollup(
        st, stream, str(tmp_path / "ck"), ts_col="ts",
        keys=["event_type"], duration="1 hour", watermark="10 minutes",
        aggs=[F.count(F.lit(1)).alias("n"),
              F.round(F.sum("value"), 6).alias("total")])
    q.awaitTermination(120)

    got = rollup_state(st, ["event_type"])
    assert dict(got.dtypes)["n"] == "bigint"
    assert "from_json" not in got._jdf.queryExecution().executedPlan().toString().lower()

    batch = (spark.read.parquet(src)
             .withColumn("ts", F.col("ts").cast("timestamp"))
             .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 6).alias("total")))
    exp = {(r["w"]["start"], r["event_type"]): (r["n"], r["total"])
           for r in batch.collect()}
    obs = {(r["window_start"], r["event_type"]): (r["n"], r["total"])
           for r in got.collect()}
    assert obs == exp
