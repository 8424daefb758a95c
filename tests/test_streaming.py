"""Streaming ingest + recovery tests (the reference's WAL/recovery
semantics, kv/test/recovery_test.cpp:184-382, re-expressed as
Structured Streaming checkpoint recovery + idempotent batch commits).
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

from quasdb_spark.store import KVStore
from quasdb_spark.streaming import stream_ingest, watermarked_tumbling

OPS_SCHEMA = StructType([
    StructField("key", StringType()), StructField("value", StringType()),
    StructField("op", StringType()), StructField("sub", LongType())])


_MTIME_BASE = 1_700_000_000


def _write_ops_file(dir_path, name, ops, order: int = 0):
    """Write one micro-batch file with an explicit mtime: Spark's file
    source orders by modification time, and sub-second writes can tie —
    pin distinct mtimes so batch order is deterministic in the test."""
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, name)
    with open(path, "w") as f:
        for i, (op, k, v) in enumerate(ops):
            f.write(json.dumps({"key": k, "value": v, "op": op, "sub": i}) + "\n")
    os.utime(path, (_MTIME_BASE + order, _MTIME_BASE + order))


def test_stream_ingest_and_recovery(spark, tmp_path):
    """File-source micro-batches land as atomic store commits; a second
    run from the same checkpoint ingests only new files; replaying an
    already-committed batch id is a no-op."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    st = KVStore.create(spark, str(tmp_path / "store"))

    _write_ops_file(src, "b0.json", [("put", "a", "1"), ("put", "b", "2")], order=0)
    _write_ops_file(src, "b1.json", [("del", "a", None), ("put", "c", "3")], order=1)

    stream = (spark.readStream.schema(OPS_SCHEMA)
              .option("maxFilesPerTrigger", "1").json(src))
    q = stream_ingest(st, stream, ckpt, op_col="op", sub_col="sub")
    q.awaitTermination(120)

    assert st.get("a") is None
    assert st.get("b") == "2"
    assert st.get("c") == "3"
    seq_after_first = st.manifest.current().last_seq
    assert seq_after_first >= 2  # at least two micro-batch commits

    # restart from the same checkpoint with one new file: only it lands
    _write_ops_file(src, "b2.json", [("put", "b", "9")], order=2)
    stream2 = (spark.readStream.schema(OPS_SCHEMA)
               .option("maxFilesPerTrigger", "1").json(src))
    q2 = stream_ingest(st, stream2, ckpt, op_col="op", sub_col="sub")
    q2.awaitTermination(120)
    assert st.get("b") == "9"
    assert st.get("c") == "3"

    # idempotence: replaying an old batch id directly is a no-op
    ver = st.manifest.current()
    df = spark.createDataFrame([("zz", "boom", "put", 0)], OPS_SCHEMA)
    out = st.ingest_batch(df, "ingest", 0, op_col="op", sub_col="sub")
    assert out is None
    assert st.get("zz") is None
    assert st.manifest.current().version == ver.version


def test_stream_windowed_agg(spark, tmp_path, sf_dir):
    """Watermarked tumbling agg over a bounded stream of the events
    table equals the batch tumbling agg (complete drain, no late
    drops)."""
    from quasdb_spark.operators.timeseries import tumbling
    from quasdb_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    # stage events as a file stream
    src = str(tmp_path / "events_stream")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)

    agg = watermarked_tumbling(
        stream, "ts", "1 hour", "1 minute", keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n")])
    out_dir = str(tmp_path / "agg_out")
    q = (agg.writeStream.format("memory").queryName("winagg")
         .outputMode("complete")
         .option("checkpointLocation", out_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["window_start"], r["event_type"]): r["n"]
           for r in spark.sql("select * from winagg").collect()}
    expect = {(r["window_start"], r["event_type"]): r["n"]
              for r in tumbling(ev, "ts", "1 hour", keys=["event_type"],
                                aggs=[F.count(F.lit(1)).alias("n")]).collect()}
    assert got == expect


def test_stateful_running_lww(spark, tmp_path):
    """applyInPandasWithState LWW: incrementally maintained winners
    equal the batch state view; lower-version replays are ignored."""
    from pyspark.sql.types import LongType as L

    from quasdb_spark.streaming.stateful import running_lww

    src = str(tmp_path / "lww_src")
    schema = StructType([
        StructField("key", StringType()), StructField("seq", L()),
        StructField("sub", L()), StructField("op", StringType()),
        StructField("value", StringType())])

    def write_batch_file(name, rows, order):
        os.makedirs(src, exist_ok=True)
        path = os.path.join(src, name)
        with open(path, "w") as f:
            for k, seq, sub, op, v in rows:
                f.write(json.dumps({"key": k, "seq": seq, "sub": sub,
                                    "op": op, "value": v}) + "\n")
        os.utime(path, (_MTIME_BASE + order, _MTIME_BASE + order))

    write_batch_file("b0.json", [("a", 1, 0, "put", "1"), ("b", 1, 1, "put", "2")], 0)
    write_batch_file("b1.json", [("a", 2, 0, "del", None), ("c", 2, 1, "put", "3"),
                                 ("b", 0, 0, "put", "stale")], 1)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").json(src))
    out = running_lww(stream)
    q = (out.writeStream.format("memory").queryName("lwwstate")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "lww_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    rows = spark.sql("select * from lwwstate").collect()
    # final state per key = last emitted update for that key
    final = {}
    for r in rows:
        if r["key"] not in final or (r["seq"], r["sub"]) > \
                (final[r["key"]]["seq"], final[r["key"]]["sub"]):
            final[r["key"]] = r
    assert final["a"]["op"] == "del" and final["a"]["seq"] == 2
    assert final["b"]["value"] == "2"  # stale (0,0) replay ignored
    assert final["c"]["value"] == "3"


def test_stream_stream_join(spark, tmp_path, sf_dir):
    """Watermarked stream-stream join: purchases joined to same-user
    signups within a 2h lag equals the equivalent batch join."""
    from quasdb_spark.sources.tables import load_table
    from quasdb_spark.streaming.windows import stream_stream_join

    ev = load_table(spark, sf_dir, "events").limit(400)
    src = str(tmp_path / "ssj_src")
    ev.write.mode("overwrite").parquet(src)

    def mk_stream():
        return spark.readStream.schema(ev.schema).parquet(src)

    p = (mk_stream().where("event_type = 'purchase'")
         .selectExpr("user_id", "event_id as p_id", "ts as p_ts"))
    s = (mk_stream().where("event_type = 'signup'")
         .selectExpr("user_id as s_user", "event_id as s_id", "ts as s_ts"))
    joined = stream_stream_join(p, s.withColumnRenamed("s_user", "user_id"),
                                "user_id", "p_ts", "s_ts",
                                watermark="1 minute", max_lag="2 hours")
    q = (joined.writeStream.format("memory").queryName("ssj")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["p_id"], r["s_id"]) for r in spark.sql("select * from ssj").collect()}

    pb = ev.where("event_type = 'purchase'").selectExpr("user_id", "event_id as p_id", "ts as p_ts")
    sb = ev.where("event_type = 'signup'").selectExpr("user_id", "event_id as s_id", "ts as s_ts")
    import pyspark.sql.functions as F
    expect = {(r["p_id"], r["s_id"]) for r in
              pb.join(sb, "user_id")
                .where((F.col("s_ts") <= F.col("p_ts")) &
                       (F.col("s_ts") >= F.col("p_ts") - F.expr("interval 2 hours")))
                .collect()}
    assert got == expect and len(got) > 0


def test_stream_dedup_drops_replayed_events(spark, tmp_path, sf_dir):
    """Ingest-time dedup: a stream carrying every event TWICE (staged
    as two identical parquet writes) drains to exactly the distinct
    event set."""
    from quasdb_spark.sources.tables import load_table
    from quasdb_spark.streaming.windows import stream_dedup

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type")
    src = str(tmp_path / "dup_stream")
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src)  # replay: every event twice
    stream = spark.readStream.schema(ev.schema).parquet(src)

    deduped = stream_dedup(stream, ["event_id"], "ts",
                           watermark="1 hour", within_watermark=True)
    q = (deduped.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.sql("select count(*) n, count(distinct event_id) d "
                    "from dedup_out").collect()[0]
    assert got["n"] == ev.count()
    assert got["d"] == got["n"]


def test_continuous_rollup_matches_batch(spark, tmp_path, sf_dir):
    """Continuous aggregate drained over the events stream == the batch
    hourly rollup, read back typed through rollup_state. Late windows
    overwrite via LWW; replayed batches are deduped by batch id."""
    from quasdb_spark.sources.tables import load_table
    from quasdb_spark.store import KVStore
    from quasdb_spark.streaming.rollup import continuous_rollup, rollup_state

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    src = str(tmp_path / "roll_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)

    st = KVStore.create(spark, str(tmp_path / "roll_store"))
    q = continuous_rollup(
        st, stream, str(tmp_path / "roll_ck"),
        ts_col="ts", keys=["event_type"], duration="1 hour",
        aggs=[F.count(F.lit(1)).alias("n"),
              F.round(F.sum("value"), 4).alias("total")])
    q.awaitTermination(180)

    got = {(r["window_start"], r["event_type"]): (r["n"], r["total"])
           for r in rollup_state(st, ["event_type"],
                                 "n long, total double").collect()}
    expect = {(r["ws"], r["event_type"]): (r["n"], r["total"])
              for r in ev.groupBy(
                  F.window("ts", "1 hour").alias("w"), "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.sum("value"), 4).alias("total"))
              .select(F.col("w.start").alias("ws"), "event_type",
                      "n", "total").collect()}
    assert got == expect
    assert len(got) > 10


def test_continuous_rollup_incremental_update(spark, tmp_path):
    """Second drain with late rows for an ALREADY-WRITTEN window must
    overwrite that window's aggregate in the store (LWW upsert), not
    duplicate it — the incremental-maintenance contract."""
    import datetime as dt

    from quasdb_spark.store import KVStore
    from quasdb_spark.streaming.rollup import continuous_rollup, rollup_state

    src = str(tmp_path / "inc_src")
    ck = str(tmp_path / "inc_ck")
    schema = "ts timestamp, k string"
    t0 = dt.datetime(2024, 3, 1, 10, 0)
    first = [(t0 + dt.timedelta(minutes=m), "a") for m in range(3)]
    spark.createDataFrame(first, schema).write.mode("overwrite").parquet(src)

    st = KVStore.create(spark, str(tmp_path / "inc_store"))

    def drain():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema).parquet(src)
        q = continuous_rollup(st, stream, ck, ts_col="ts", keys=["k"],
                              duration="1 hour", watermark="10 minutes")
        q.awaitTermination(120)

    drain()
    before = {(r["window_start"], r["k"]): r["n"]
              for r in rollup_state(st, ["k"], "n long").collect()}
    assert before == {(t0, "a"): 3}

    # two more rows in the SAME hour window, appended later
    more = [(t0 + dt.timedelta(minutes=30 + m), "a") for m in range(2)]
    spark.createDataFrame(more, schema).write.mode("append").parquet(src)
    drain()
    after = {(r["window_start"], r["k"]): r["n"]
             for r in rollup_state(st, ["k"], "n long").collect()}
    assert after == {(t0, "a"): 5}  # overwritten, not duplicated
    # version history shows both aggregate versions (LWW, not in-place)
    assert st.state().count() == 1


def test_rollup_state_window_range_prunes(spark, tmp_path):
    """Time-range reads of the rollup are key-range scans: only the
    requested window span comes back (and the range reaches the scan
    as a pushed key predicate)."""
    import datetime as dt

    from quasdb_spark.store import KVStore
    from quasdb_spark.streaming.rollup import continuous_rollup, rollup_state

    src = str(tmp_path / "rng_src")
    t0 = dt.datetime(2024, 5, 1)
    rows = [(t0 + dt.timedelta(hours=h, minutes=m), "a")
            for h in range(12) for m in (0, 30)]
    spark.createDataFrame(rows, "ts timestamp, k string") \
        .write.parquet(src)
    st = KVStore.create(spark, str(tmp_path / "rng_store"))
    q = continuous_rollup(
        st, spark.readStream.schema("ts timestamp, k string").parquet(src),
        str(tmp_path / "rng_ck"), ts_col="ts", keys=["k"])
    q.awaitTermination(120)

    sub = rollup_state(st, ["k"], "n long",
                       window_from=t0 + dt.timedelta(hours=3),
                       window_to=t0 + dt.timedelta(hours=6))
    got = sorted(r["window_start"] for r in sub.collect())
    assert got == [t0 + dt.timedelta(hours=h) for h in (3, 4, 5)]
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(key" in plan


def test_streaming_curation_filters_match_batch(spark, tmp_path, sf_dir):
    """The curation pipeline's map-only filter stage (quality + PII +
    fingerprint) applies unchanged to a document stream — same
    expressions, no stateful ops — and drains to exactly the batch
    survivor set. This is the shape of a continuously-ingesting
    training-data pipeline: filters run on arrival, dedup runs as a
    later batch/stateful stage."""
    import pyspark.sql.functions as SF
    from quasdb_spark.functions.text import (exact_fingerprint, pii_scan,
                                             quality_score)
    from quasdb_spark.sources.tables import load_table

    def curate(df):
        scored = pii_scan(quality_score(df))
        return (scored.where((SF.col("quality_score") >= 0.5)
                             & ~SF.col("pii_flagged"))
                .select("doc_id", "quality_score",
                        exact_fingerprint("text").alias("exact_fp")))

    docs = load_table(spark, sf_dir, "documents") \
        .select("doc_id", "text")
    src = str(tmp_path / "doc_stream")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (curate(stream).writeStream.format("memory")
         .queryName("curated_stream").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_cur"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = sorted(tuple(r) for r in
                 spark.sql("select * from curated_stream").collect())
    want = sorted(tuple(r) for r in curate(docs).collect())
    assert got == want and len(got) > 0


def test_stream_curate_into_store_end_to_end(spark, tmp_path, sf_dir):
    """Full pipeline integration: document stream -> map-only curation
    filters -> streaming ingest into a KVStore (exactly-once batch
    commits, auto-compaction) -> LWW state read-back equals the batch
    survivor set. This is the deployment shape: filters at ingest,
    store as the curated-corpus sink."""
    import pyspark.sql.functions as SF
    from quasdb_spark.functions.text import pii_scan, quality_score
    from quasdb_spark.sources.tables import load_table
    from quasdb_spark.store import KVStore
    from quasdb_spark.streaming.ingest import stream_ingest

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    docs.write.mode("overwrite").parquet(src)

    def curate(df):
        scored = pii_scan(quality_score(df))
        return (scored.where((SF.col("quality_score") >= 0.5)
                             & ~SF.col("pii_flagged"))
                .select(SF.format_string("d%06d", "doc_id").alias("key"),
                        SF.col("text").alias("value")))

    store = KVStore.create(spark, str(tmp_path / "curated_store"))
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = stream_ingest(store, curate(stream), str(tmp_path / "ck_pipe"),
                      stream_id="curation")
    q.awaitTermination(180)

    state = store.state().collect()
    want = {r["key"]: r["value"] for r in curate(docs).collect()}
    assert {r["key"]: r["value"] for r in state} == want
    assert len(state) == len(want) > 0


def test_stream_sessions_match_batch_session_window(spark, tmp_path, sf_dir):
    """Streaming gap-based sessions drained with availableNow must
    equal the batch session_window aggregation on the same events."""
    import pyspark.sql.functions as SF
    from quasdb_spark.sources.tables import load_table
    from quasdb_spark.streaming.windows import stream_sessions

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    src = str(tmp_path / "sess_src")
    ev.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)

    q = (stream_sessions(stream, "ts", "30 minutes", "1 hour",
                         keys=["user_id"])
         .writeStream.format("memory").queryName("sess_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_sess"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = sorted(tuple(r) for r in spark.sql(
        "select user_id, session_start, session_end, n "
        "from sess_out").collect())
    batch = (ev.groupBy(SF.session_window("ts", "30 minutes").alias("w"),
                        "user_id")
             .agg(SF.count(SF.lit(1)).alias("n"))
             .select("user_id", SF.col("w.start").alias("session_start"),
                     SF.col("w.end").alias("session_end"), "n"))
    want = sorted(tuple(r) for r in batch.collect())
    # append mode only FINALIZES sessions older than the watermark at
    # drain end; the tail sessions stay in state. Everything emitted
    # must match batch, and every batch session past the watermark
    # horizon must have been emitted.
    import datetime as dtm
    horizon = ev.agg(SF.max("ts")).first()[0] - dtm.timedelta(hours=1)
    finalized = [t for t in want if t[2] <= horizon]
    assert set(got) <= set(want)
    assert set(finalized) <= set(got)
    assert len(got) > 0.99 * len(want) and len(got) > 0


def test_quota_limit_caps_per_key_across_batches(spark, tmp_path):
    """Per-domain ingest quota: state persists across micro-batches
    (the same key keeps counting), under-quota keys pass through
    untouched, output schema is the input schema."""
    from quasdb_spark.streaming.quota import quota_limit

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("a", i) for i in range(6)] + [("b", i) for i in range(2)],
        "domain string, doc_id long").coalesce(1).write.parquet(src)
    spark.createDataFrame(
        [("a", 100 + i) for i in range(6)] + [("c", i) for i in range(3)],
        "domain string, doc_id long").coalesce(1).write.mode(
        "append").parquet(src)

    stream = (spark.readStream.schema("domain string, doc_id long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    capped = quota_limit(stream, ["domain"], 4)
    assert capped.schema == stream.schema
    q = (capped.writeStream.format("memory").queryName("tq_out")
         .outputMode("append").trigger(availableNow=True)
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.awaitTermination(120)
    got = {r["domain"]: r["n"] for r in spark.sql(
        "select domain, count(*) n from tq_out group by domain").collect()}
    # 'a' wrote 12 rows over two micro-batches -> capped at 4 TOTAL
    # (proves the counter survives between batches); b/c under quota
    assert got == {"a": 4, "b": 2, "c": 3}
