"""Typed time-series store tests: key codec ordering, range scans as
key ranges, LWW upsert per point, snapshots, downsampling."""

import datetime as dt

from quasdb_spark.tsstore import TSStore, encode_key


def _ts(h, m=0, s=0, us=0):
    return dt.datetime(2024, 1, 1, h, m, s, us)


def test_key_codec_order_preserving():
    pts = [("cpu", _ts(0)), ("cpu", _ts(0, 0, 0, 1)), ("cpu", _ts(12)),
           ("cpu", _ts(23, 59, 59, 999999)), ("mem", _ts(0))]
    keys = [encode_key(s, t) for s, t in pts]
    assert keys == sorted(keys)


def test_append_query_upsert_snapshot(spark, tmp_path):
    ts = TSStore.create(spark, str(tmp_path / "ts"))
    ts.append([("cpu", _ts(0, i), float(i), None) for i in range(10)])
    ts.append([("mem", _ts(0, i), 100.0 + i, {"host": "a"}) for i in range(5)])

    # typed range scan: series + time range
    got = ts.points("cpu", t0=_ts(0, 2), t1=_ts(0, 5)).orderBy("ts").collect()
    assert [r["value"] for r in got] == [2.0, 3.0, 4.0]
    assert all(r["series_id"] == "cpu" for r in got)

    # LWW upsert of one point; snapshot isolation of the old value
    snap = ts.snapshot("before-fix")
    ts.append([("cpu", _ts(0, 3), 999.0, None)])
    assert [r["value"] for r in
            ts.points("cpu", t0=_ts(0, 3), t1=_ts(0, 4)).collect()] == [999.0]
    assert [r["value"] for r in
            ts.points("cpu", t0=_ts(0, 3), t1=_ts(0, 4), asof=snap).collect()] == [3.0]

    # latest / delete
    assert ts.latest("cpu")["value"] == 9.0
    ts.delete_point("cpu", _ts(0, 9))
    assert ts.latest("cpu")["value"] == 8.0

    # series isolation: 'mem' untouched
    assert ts.points("mem").count() == 5


def test_downsample_and_compaction(spark, tmp_path):
    ts = TSStore.create(spark, str(tmp_path / "ts2"))
    ts.append([("cpu", _ts(h, m), float(h * 60 + m), None)
               for h in range(3) for m in range(0, 60, 5)])
    ds = ts.downsample("1 hour")
    rows = {r["window_start"].hour: r for r in ds.collect()}
    assert rows[0]["n"] == 12 and rows[1]["n"] == 12
    assert rows[0]["min_value"] == 0.0 and rows[0]["max_value"] == 55.0

    before = sorted((r["series_id"], r["ts"], r["value"])
                    for r in ts.points().collect())
    ts.compact()
    after = sorted((r["series_id"], r["ts"], r["value"])
                   for r in ts.points().collect())
    assert before == after


def test_bulk_ingest_df(spark, tmp_path, sf_dir):
    from quasdb_spark.sources.tables import load_table

    ts = TSStore.create(spark, str(tmp_path / "ts3"))
    ev = load_table(spark, sf_dir, "events").limit(200)
    df = ev.selectExpr("concat('u', cast(user_id as string)) as series_id",
                       "ts", "value")
    ts.ingest_df(df)
    n_distinct = df.selectExpr("series_id", "ts").distinct().count()
    assert ts.points().count() == n_distinct


def test_asof_point(spark, tmp_path):
    ts = TSStore.create(spark, str(tmp_path / "asofp"))
    ts.append([("cpu", _ts(0, m), float(m), None) for m in (0, 10, 20)])
    # exactly at a sample
    assert ts.asof_point("cpu", _ts(0, 10))["value"] == 10.0
    # between samples -> previous
    assert ts.asof_point("cpu", _ts(0, 15))["value"] == 10.0
    # before first sample -> None
    assert ts.asof_point("cpu", _ts(0, 0) - dt.timedelta(minutes=5)) is None
    # snapshot-pinned
    snap = ts.snapshot()
    ts.append([("cpu", _ts(0, 15), 99.0, None)])
    assert ts.asof_point("cpu", _ts(0, 15))["value"] == 99.0
    assert ts.asof_point("cpu", _ts(0, 15), asof=snap)["value"] == 10.0


def test_drop_before_purges_old_points(spark, tmp_path):
    """Retention: drop_before physically removes pre-cutoff points for
    every series (and only those), shrinking stored bytes; post-cutoff
    history and LWW behavior are untouched."""
    import datetime as dt

    from quasdb_spark.tsstore import TSStore

    st = TSStore.create(spark, str(tmp_path / "ret"))
    t0 = dt.datetime(2024, 1, 1)
    pts = [(s, t0 + dt.timedelta(hours=h), float(h), None)
           for s in ("cpu", "mem") for h in range(48)]
    st.append(pts)
    before = st.store.properties()["quasdb.total-rows"]
    cutoff = t0 + dt.timedelta(hours=24)
    st.drop_before(cutoff)
    remaining = st.points().collect()
    assert len(remaining) == 2 * 24
    assert all(r["ts"] >= cutoff for r in remaining)
    assert {r["series_id"] for r in remaining} == {"cpu", "mem"}
    assert st.store.properties()["quasdb.total-rows"] == before / 2
    # store still fully functional after the purge
    st.append([("cpu", t0 + dt.timedelta(hours=100), 1.5, None)])
    assert st.latest("cpu")["value"] == 1.5


def test_typed_and_legacy_stores_equivalent(spark, tmp_path):
    """Typed (default) and legacy-JSON TSStores expose identical
    points(); the typed plan contains no JSON parse and its value
    column is a native pushdown-able Parquet column."""
    import datetime as dt

    pts = [("s1", dt.datetime(2024, 1, 1, 0, 0, i), float(i), {"k": str(i)})
           for i in range(5)]
    typed = TSStore.create(spark, str(tmp_path / "typed"))
    legacy = TSStore.create(spark, str(tmp_path / "legacy"), typed=False)
    typed.append(pts)
    legacy.append(pts)

    t_rows = {(r["series_id"], r["ts"], r["value"])
              for r in typed.points().collect()}
    l_rows = {(r["series_id"], r["ts"], r["value"])
              for r in legacy.points().collect()}
    assert t_rows == l_rows and len(t_rows) == 5

    plan = typed.points()._jdf.queryExecution().executedPlan().toString()
    assert "get_json_object" not in plan
    filtered_plan = (typed.store.log_df().where("v > 2.0")._jdf
                     .queryExecution().executedPlan().toString())
    assert "GreaterThan(v,2.0" in filtered_plan  # pushed to the scan


def test_point_queries_driver_and_spark_engines_agree(spark, tmp_path):
    """latest/asof_point ride the driver heap-merge engine on typed
    stores (no Spark job); every field — ts included — must match the
    Spark path, across upserts, deletes, and as-of snapshots."""
    ts = TSStore.create(spark, str(tmp_path / "pp"))
    base = _ts(0, 0)
    ts.append([("cpu", base + dt.timedelta(minutes=m), float(m), None)
               for m in range(10)])
    snap = ts.store.manifest.current().last_seq
    ts.append([("cpu", base + dt.timedelta(minutes=9), 99.0, {"r": "b"})])
    ts.delete_point("cpu", base + dt.timedelta(minutes=8))

    assert ts._points_fast_ok()

    def both(fn):
        driver = fn()
        ts.store.point_read_engine = "spark"
        try:
            spark_row = fn()
        finally:
            ts.store.point_read_engine = "driver"
        if driver is None or spark_row is None:
            assert driver is None and spark_row is None
        else:
            for f in ("series_id", "ts", "value", "tags_json"):
                assert driver[f] == spark_row[f], f
            # both engines return a pyspark Row: attribute-style
            # access (row.value) must work identically — callers must
            # not behave differently depending on point_read_engine
            from pyspark.sql import Row
            assert isinstance(driver, Row) and isinstance(spark_row, Row)
            assert driver.value == spark_row.value
            assert driver.ts == spark_row.ts
        return driver

    assert both(lambda: ts.latest("cpu"))["value"] == 99.0
    assert both(lambda: ts.latest("cpu", asof=snap))["value"] == 9.0
    assert both(lambda: ts.asof_point(
        "cpu", base + dt.timedelta(minutes=8, seconds=30)))["value"] == 7.0
    assert both(lambda: ts.asof_point(
        "cpu", base - dt.timedelta(minutes=1))) is None
    assert both(lambda: ts.latest("nope")) is None
    # no Spark job on the driver path
    ts.latest("cpu")
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    assert ts.latest("cpu")["value"] == 99.0
    assert tracker.getJobIdsForGroup(None) == before


def test_randomized_points_interleaved_maintenance(spark, tmp_path):
    """Randomized TSStore stress (VERDICT r11 #6): appends, point
    upserts, deletes, compactions, and registered snapshots interleave
    while latest/asof_point answer on BOTH engines — checked against a
    dict model (and each other) at every step."""
    import random

    rng = random.Random(4242)
    ts = TSStore.create(spark, str(tmp_path / "rndts"))
    base = _ts(0, 0)
    series = ["cpu", "mem", "io"]
    # model: {series: {ts: value}} snapshots at registered seqs
    state: dict[str, dict] = {s: {} for s in series}
    history: list[tuple[int, dict]] = []
    snaps: list[int] = []

    def both(fn, ctx):
        driver = fn()
        ts.store.point_read_engine = "spark"
        try:
            spark_row = fn()
        finally:
            ts.store.point_read_engine = "driver"
        if driver is None or spark_row is None:
            assert driver is None and spark_row is None, ctx
        else:
            for f in ("series_id", "ts", "value", "tags_json"):
                assert driver[f] == spark_row[f], (ctx, f)
        return driver

    def model_latest(state_at, s, t_max=None):
        live = {t: v for t, v in state_at[s].items()
                if t_max is None or t <= t_max}
        if not live:
            return None
        t = max(live)
        return t, live[t]

    def check(step):
        for s in series:
            ctx = (step, s)
            want = model_latest(state, s)
            got = both(lambda s=s: ts.latest(s), ctx)
            if want is None:
                assert got is None, ctx
            else:
                assert (got["ts"], got["value"]) == want, ctx
            # as-of-time point at a random cut
            cut = base + dt.timedelta(minutes=rng.randrange(40))
            want_p = model_latest(state, s, t_max=cut)
            got_p = both(lambda s=s, cut=cut: ts.asof_point(s, cut),
                         (step, s, "asof_point", cut))
            if want_p is None:
                assert got_p is None, (ctx, cut)
            else:
                assert (got_p["ts"], got_p["value"]) == want_p, (ctx, cut)
        # snapshot reads survive compaction (registered seqs only)
        if snaps:
            seq = rng.choice(snaps)
            state_at = {s: {} for s in series}
            for sq, snap_state in history:
                if sq <= seq:
                    state_at = snap_state
            for s in series:
                want = model_latest(state_at, s)
                got = both(lambda s=s, seq=seq: ts.latest(s, asof=seq),
                           (step, s, "asof-seq", seq))
                if want is None:
                    assert got is None, (step, s, seq)
                else:
                    assert (got["ts"], got["value"]) == want, (step, s, seq)

    for b in range(8):
        pts = []
        for _ in range(12):
            s = rng.choice(series)
            t = base + dt.timedelta(minutes=rng.randrange(40))
            v = round(rng.uniform(0, 100), 3)
            pts.append((s, t, v, None))
            state[s][t] = v
        seq = ts.append(pts)
        if rng.random() < 0.5:
            s = rng.choice(series)
            if state[s]:
                t = rng.choice(sorted(state[s]))
                seq = ts.delete_point(s, t)
                del state[s][t]
        history.append((seq, {s: dict(d) for s, d in state.items()}))
        if rng.random() < 0.5:
            snaps.append(ts.snapshot(f"ts-snap-{b}"))
            history.append((snaps[-1],
                            {s: dict(d) for s, d in state.items()}))
        if rng.random() < 0.35:
            ts.compact()
        check(b)


def test_tsstore_open_embedded_point_queries(spark, tmp_path):
    """TSStore.open_embedded: append + latest/asof_point work with no
    SparkSession (typed schema is arrow-safe; ts lives in the key),
    identical to the session-backed handle; DataFrame analytics raise
    the named embedded error."""
    import datetime as dt

    import pytest

    from quasdb_spark.tsstore import TSStore

    path = str(tmp_path / "embts")
    ts = TSStore.create(spark, path)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    ts.append([("s1", t0 + dt.timedelta(minutes=i), float(i), None)
               for i in range(10)])

    emb = TSStore.open_embedded(path)
    assert emb.latest("s1") == ts.latest("s1")
    probe = t0 + dt.timedelta(minutes=4, seconds=30)
    assert emb.asof_point("s1", probe) == ts.asof_point("s1", probe)
    # embedded append, visible through the Spark handle
    emb.append([("s1", t0 + dt.timedelta(hours=1), 99.0, None)])
    assert ts.latest("s1").value == 99.0
    assert emb.latest("s1").value == 99.0
    with pytest.raises(RuntimeError, match="EMBEDDED|embedded"):
        emb.points("s1").count()


def test_points_rows_matches_points_df(spark, tmp_path):
    """points_rows (bounded driver page) must return exactly the rows
    points() (the DataFrame surface) returns for the same bounds —
    on BOTH handles, including time-bounded, reversed and limited
    pages, and after an upsert + delete."""
    import datetime as dt

    import pytest

    from quasdb_spark.tsstore import TSStore

    path = str(tmp_path / "tsrows")
    ts = TSStore.create(spark, path)
    t0 = dt.datetime(2026, 2, 1, 8, 0, 0)
    ts.append([("a", t0 + dt.timedelta(minutes=i), float(i),
                {"q": i % 3}) for i in range(30)])
    ts.append([("b", t0, 1.0, None)])        # other series: never leaks
    ts.append([("a", t0 + dt.timedelta(minutes=5), 55.0, None)])  # upsert
    ts.delete_point("a", t0 + dt.timedelta(minutes=7))

    emb = TSStore.open_embedded(path)
    lo, hi = t0 + dt.timedelta(minutes=3), t0 + dt.timedelta(minutes=20)
    want = [(r["ts"], r["value"]) for r in
            ts.points("a", t0=lo, t1=hi).orderBy("ts").collect()]
    for handle in (ts, emb):
        got = [(r.ts, r.value)
               for r in handle.points_rows("a", t0=lo, t1=hi)]
        assert got == want and (t0 + dt.timedelta(minutes=5), 55.0) in got
        assert all(p[0] != t0 + dt.timedelta(minutes=7) for p in got)
        rev = handle.points_rows("a", reverse=True, limit=3)
        assert [r.ts for r in rev] == sorted(
            (r.ts for r in rev), reverse=True) and len(rev) == 3
    with pytest.raises(ValueError, match="typed store"):
        TSStore.create(spark, str(tmp_path / "legacy"),
                       typed=False).points_rows("a")
