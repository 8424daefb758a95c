"""Edge-path tests for time-series operators not exercised by the
oracle suite (tolerance windows, left as-of, gapfill zero-fill)."""

import datetime as dt

import pyspark.sql.functions as F

from quasdb_spark.operators.timeseries import (asof_join, gapfill,
                                               moving_agg, rate)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_tolerance_and_left(spark):
    left = _df(spark, [(1, _ts(10), "p1"), (1, _ts(40), "p2"), (2, _ts(5), "p3")],
               "user_id long, ts timestamp, tag string")
    right = _df(spark, [(1, _ts(9), "s1"), (1, _ts(12), "s2")],
                "user_id long, rts timestamp, rtag string")

    # inner, no tolerance: nearest right at-or-before
    out = asof_join(left, right, ["user_id"], "ts", "rts",
                    right_cols=["rtag", "rts"])
    got = {(r["tag"], r["right_rtag"]) for r in out.collect()}
    assert got == {("p1", "s1"), ("p2", "s2")}  # p3: no match dropped

    # tolerance 60s: p2's match (28min stale) rejected
    out_tol = asof_join(left, right, ["user_id"], "ts", "rts",
                        right_cols=["rtag", "rts"], tolerance_seconds=60)
    got_tol = {(r["tag"], r["right_rtag"]) for r in out_tol.collect()}
    assert got_tol == {("p1", "s1")}

    # how="left": unmatched lefts kept with null match
    out_l = asof_join(left, right, ["user_id"], "ts", "rts",
                      right_cols=["rtag", "rts"], how="left")
    by_tag = {r["tag"]: r["right_rtag"] for r in out_l.collect()}
    assert by_tag == {"p1": "s1", "p2": "s2", "p3": None}


def test_asof_equal_timestamp_right_visible(spark):
    """A right row at exactly left_ts matches (<= semantics)."""
    left = _df(spark, [(1, _ts(10), "p")], "k long, ts timestamp, tag string")
    right = _df(spark, [(1, _ts(10), "s")], "k long, rts timestamp, rtag string")
    out = asof_join(left, right, ["k"], "ts", "rts", right_cols=["rtag"])
    assert out.collect()[0]["right_rtag"] == "s"


def test_asof_tolerance_without_right_ts_in_cols(spark):
    """tolerance_seconds must not require right_ts in right_cols —
    the ts rides along internally (ADVICE r1)."""
    left = _df(spark, [(1, _ts(10), "p1"), (1, _ts(40), "p2")],
               "user_id long, ts timestamp, tag string")
    right = _df(spark, [(1, _ts(9), "s1")],
                "user_id long, rts timestamp, rtag string")
    out = asof_join(left, right, ["user_id"], "ts", "rts",
                    right_cols=["rtag"], tolerance_seconds=120)
    assert {(r["tag"], r["right_rtag"]) for r in out.collect()} == {("p1", "s1")}
    assert "right_rts" not in out.columns  # output shape unchanged


def test_asof_right_tiebreak_deterministic(spark):
    """Equal (keys, right_ts) rights: greatest tiebreak wins, every run."""
    left = _df(spark, [(1, _ts(10), "p")], "k long, ts timestamp, tag string")
    right = _df(spark, [(1, _ts(5), "lo", 1), (1, _ts(5), "hi", 9),
                        (1, _ts(5), "mid", 5)],
                "k long, rts timestamp, rtag string, pri long")
    for _ in range(3):
        out = asof_join(left, right, ["k"], "ts", "rts",
                        right_cols=["rtag"], right_tiebreak="pri")
        assert out.collect()[0]["right_rtag"] == "hi"


def test_gapfill_fills_interior_holes(spark):
    rows = [(1, _ts(0), 1.0), (1, _ts(30), 2.0)]  # 10-min buckets: 0,30 -> holes 10,20
    df = _df(spark, rows, "k long, ts timestamp, v double")
    out = gapfill(df, "ts", 600, ["k"], F.count(F.lit(1)), fill_value=0)
    got = sorted((r["bucket_start"].minute, r["agg_value"]) for r in out.collect())
    assert got == [(0, 1), (10, 0), (20, 0), (30, 1)]


def test_moving_and_rate_edges(spark):
    rows = [(1, _ts(0), 10.0, 1), (1, _ts(1), 20.0, 2), (1, _ts(1), 30.0, 3)]
    df = _df(spark, rows, "k long, ts timestamp, v double, id long")
    mv = moving_agg(df, "ts", ["k"], "v", 1, "id", "avg").orderBy("id").collect()
    assert [r["mov_avg"] for r in mv] == [10.0, 15.0, 25.0]
    # same-second events: dt=0 -> rate null (guarded division)
    rt = rate(df, "ts", ["k"], "v", "id").orderBy("id").collect()
    assert rt[0]["rate"] is None and rt[2]["rate"] is None
    assert rt[1]["rate"] == (20.0 - 10.0) / 60


def test_gapfill_chunked_span_matches_unchunked(spark):
    """Two-level chunked grid == single-sequence grid: a span crossing
    many tiny chunks (chunk_buckets=4) produces exactly the same dense
    buckets as one covering chunk."""
    rows = [(1, _ts(0), 1.0), (1, _ts(59), 2.0),   # 10-min buckets, 6 buckets
            (2, _ts(5), 3.0)]                       # single-bucket key
    df = _df(spark, rows, "k long, ts timestamp, v double")
    small = gapfill(df, "ts", 600, ["k"], F.count(F.lit(1)), chunk_buckets=4)
    big = gapfill(df, "ts", 600, ["k"], F.count(F.lit(1)), chunk_buckets=10000)
    a = sorted((r["k"], r["bucket_start"], r["agg_value"]) for r in small.collect())
    b = sorted((r["k"], r["bucket_start"], r["agg_value"]) for r in big.collect())
    assert a == b
    assert len(a) == 7  # key 1: 6 buckets (0..50), key 2: 1 bucket


def test_gapfill_interpolate_lines_and_edges(spark):
    from quasdb_spark.operators.timeseries import gapfill_interpolate
    import datetime as dt

    H = 3600
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [  # key a: observed at hours 0 and 4 (gap of 3), value 10 -> 30
        ("a", t0, 10.0),
        ("a", t0 + dt.timedelta(hours=4), 30.0),
        # key b: single point -> no interpolation, just itself
        ("b", t0 + dt.timedelta(hours=2), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = gapfill_interpolate(df, "ts", H, ["k"], F.avg("value"))
    got = {(r["k"], r["bucket_start"].hour): r["value_interp"]
           for r in out.collect()}
    assert got[("a", 0)] == 10.0 and got[("a", 4)] == 30.0
    assert got[("a", 1)] == 15.0 and got[("a", 2)] == 20.0 \
        and got[("a", 3)] == 25.0
    assert got[("b", 2)] == 7.0
    assert len(got) == 6


def test_anomaly_zscore_detects_planted_spike(spark):
    """A 10x spike in an otherwise tame series must be the sole |z|>3
    anomaly (suite query logic on a synthetic frame)."""
    from quasdb_spark.suite import q_ts_anomaly_zscore  # noqa: F401
    import quasdb_spark.suite as suite_mod

    rows = []
    for i in range(120):
        v = 10.0 + (i % 7) * 0.1          # tame noise around 10
        rows.append((i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
                     1, "view", 100.0 if i == 100 else v, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.createOrReplaceTempView("_anom_events")
    # reuse the query body by monkey-loading the table
    orig = suite_mod._t
    try:
        suite_mod._t = lambda sp, sf, name: df
        out = suite_mod.q_ts_anomaly_zscore(spark, "ignored").collect()
    finally:
        suite_mod._t = orig
    assert [r["event_id"] for r in out] == [100]
    assert out[0]["z"] > 3


def test_interval_join_bounds_buckets_and_guard(spark):
    import pytest
    from quasdb_spark.operators.timeseries import interval_join

    left = _df(spark, [(1, _ts(10), "p1"), (2, _ts(30), "p2")],
               "user_id long, ts timestamp, tag string")
    right = _df(spark, [(1, _ts(4), "c1"),    # 6 min before p1: in
                        (1, _ts(10), "c2"),   # same second: in (inclusive)
                        (1, _ts(11), "c3"),   # after p1: out
                        (2, _ts(19), "c4"),   # 11 min before p2: out
                        (2, _ts(21), "c5")],  # 9 min before p2: in
                "user_id long, cts timestamp, ctag string")

    # [-600s, 0]: clicks in the 10 minutes before each left row
    out = interval_join(left, right, ["user_id"], "ts", "cts",
                        lower_seconds=-600, upper_seconds=0,
                        right_cols=["ctag"])
    got = {(r["tag"], r["right_ctag"]) for r in out.collect()}
    assert got == {("p1", "c1"), ("p1", "c2"), ("p2", "c5")}

    # each qualifying pair appears exactly once (right row occupies
    # exactly one bucket), with finer buckets too
    out_fine = interval_join(left, right, ["user_id"], "ts", "cts",
                             lower_seconds=-600, upper_seconds=0,
                             right_cols=["ctag"], bucket_seconds=60)
    rows = [(r["tag"], r["right_ctag"]) for r in out_fine.collect()]
    assert sorted(rows) == sorted(got)

    # forward-looking window works (right rows AFTER the left row)
    fwd = interval_join(left, right, ["user_id"], "ts", "cts",
                        lower_seconds=1, upper_seconds=120,
                        right_cols=["ctag"])
    assert {(r["tag"], r["right_ctag"]) for r in fwd.collect()} \
        == {("p1", "c3")}

    # degenerate intervals and the explode guard fail fast
    with pytest.raises(ValueError, match="empty interval"):
        interval_join(left, right, ["user_id"], "ts", "cts",
                      lower_seconds=0, upper_seconds=-1,
                      right_cols=["ctag"])
    with pytest.raises(ValueError, match="max_explode"):
        interval_join(left, right, ["user_id"], "ts", "cts",
                      lower_seconds=-86400, upper_seconds=0,
                      right_cols=["ctag"], bucket_seconds=1)


def test_interval_join_randomized_vs_brute_force(spark):
    """Randomized oracle: interval_join over seeded random data must
    equal the quadratic brute force for several window/bucket shapes
    (the bucketized rewrite must never drop or duplicate a pair)."""
    import random

    from quasdb_spark.operators.timeseries import interval_join

    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    lrows = [(rng.randrange(5), base + dt.timedelta(seconds=rng.randrange(7200)),
              f"L{i}") for i in range(120)]
    rrows = [(rng.randrange(5), base + dt.timedelta(seconds=rng.randrange(7200)),
              f"R{i}") for i in range(150)]
    left = _df(spark, lrows, "k long, ts timestamp, lid string")
    right = _df(spark, rrows, "k long, rts timestamp, rid string")

    for lo, hi, bucket in [(-600, 0, None), (0, 600, None), (-300, 300, None),
                           (-600, 0, 60), (-45, 45, 7), (0, 0, None)]:
        got = {(r["lid"], r["right_rid"])
               for r in interval_join(left, right, ["k"], "ts", "rts",
                                      lower_seconds=lo, upper_seconds=hi,
                                      right_cols=["rid"],
                                      bucket_seconds=bucket).collect()}
        # brute force at second resolution (the operator contract)
        want = {(l[2], r[2]) for l in lrows for r in rrows
                if l[0] == r[0]
                and int(l[1].timestamp()) + lo <= int(r[1].timestamp())
                <= int(l[1].timestamp()) + hi}
        assert got == want, (lo, hi, bucket, len(got), len(want))


def test_interval_join_left_outer(spark):
    """how='left' keeps unmatched left rows with NULL right columns;
    requires a unique left id; matched rows identical to inner."""
    import pytest
    from quasdb_spark.operators.timeseries import interval_join

    left = _df(spark, [(1, _ts(10), "p1"), (1, _ts(50), "p2"),
                       (2, _ts(30), "p3")],
               "user_id long, ts timestamp, tag string")
    right = _df(spark, [(1, _ts(4), "c1"), (1, _ts(9), "c2")],
                "user_id long, cts timestamp, ctag string")

    out = interval_join(left, right, ["user_id"], "ts", "cts",
                        lower_seconds=-600, upper_seconds=0,
                        right_cols=["ctag"], how="left",
                        left_id_col="tag")
    rows = {(r["tag"], r["right_ctag"]) for r in out.collect()}
    assert rows == {("p1", "c1"), ("p1", "c2"),
                    ("p2", None), ("p3", None)}

    with pytest.raises(ValueError, match="left_id_col"):
        interval_join(left, right, ["user_id"], "ts", "cts",
                      lower_seconds=-600, upper_seconds=0,
                      right_cols=["ctag"], how="left")
    with pytest.raises(ValueError, match="how must be"):
        interval_join(left, right, ["user_id"], "ts", "cts",
                      lower_seconds=-600, upper_seconds=0,
                      right_cols=["ctag"], how="full")


def test_asof_direction_forward_and_nearest(spark):
    left = _df(spark, [(1, _ts(10)), (1, _ts(30)), (2, _ts(5))],
               "k long, ts timestamp")
    right = _df(spark, [(1, _ts(8), "a"), (1, _ts(12), "b"),
                        (1, _ts(50), "c"), (2, _ts(40), "d")],
                "k long, rts timestamp, rtag string")

    fwd = {(r["k"], r["ts"]): r["right_rtag"]
           for r in asof_join(left, right, ["k"], "ts", "rts",
                              right_cols=["rtag"],
                              direction="forward").collect()}
    # earliest right with rts >= ts
    assert fwd[(1, _ts(10))] == "b"
    assert fwd[(1, _ts(30))] == "c"
    assert fwd[(2, _ts(5))] == "d"

    near = {(r["k"], r["ts"]): r["right_rtag"]
            for r in asof_join(left, right, ["k"], "ts", "rts",
                               right_cols=["rtag"],
                               direction="nearest").collect()}
    # ts=10: back a(8) dist 2 == fwd b(12) dist 2 -> tie prefers back
    assert near[(1, _ts(10))] == "a"
    # ts=30: back b(12) dist 18 < fwd c(50) dist 20
    assert near[(1, _ts(30))] == "b"
    # k=2 has no backward match at all -> forward d
    assert near[(2, _ts(5))] == "d"

    # forward tolerance: c is 20 min ahead of ts=30 -> dropped at 600 s
    fwd_tol = asof_join(left, right, ["k"], "ts", "rts",
                        right_cols=["rtag"], direction="forward",
                        tolerance_seconds=600, how="inner").collect()
    assert {(r["k"], r["ts"]) for r in fwd_tol} == {(1, _ts(10))}

    # forward equal-timestamp inclusivity + tiebreak
    r2 = _df(spark, [(1, _ts(10), "x", 1), (1, _ts(10), "y", 2)],
             "k long, rts timestamp, rtag string, pri long")
    eq = asof_join(left.where("ts = timestamp'2024-01-01 00:10:00'"),
                   r2, ["k"], "ts", "rts", right_cols=["rtag"],
                   right_tiebreak="pri", direction="forward").collect()
    assert eq[0]["right_rtag"] == "y"


def test_asof_directions_randomized_vs_brute_force(spark):
    """Randomized oracle for all three as-of directions: seeded random
    (key, µs-timestamp) data; the window implementation must pick the
    same right row as the quadratic brute force (backward: max rts <=
    lt; forward: min rts >= lt; nearest: closer side, tie -> backward;
    within each: greatest tiebreak id wins)."""
    import random

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)

    def t(us):
        return base + dt.timedelta(microseconds=us)

    # coarse grid so exact ties (same instant, equidistant sides) occur
    lrows = [(rng.randrange(4), t(rng.randrange(40) * 500_000), i)
             for i in range(80)]
    rrows = [(rng.randrange(4), t(rng.randrange(40) * 500_000), i)
             for i in range(90)]
    left = _df(spark, lrows, "k long, ts timestamp, lid long")
    right = _df(spark, rrows, "k long, rts timestamp, rid long")

    def brute(direction, tol=None):
        out = {}
        for k, lt, lid in lrows:
            # tolerance contract: whole FLOORED seconds (the operator
            # compares unix_timestamp values, which floor to seconds)
            def fl(x):
                return int(x.timestamp())

            back = [(rt, rid) for rk, rt, rid in rrows
                    if rk == k and rt <= lt
                    and (tol is None or fl(lt) - fl(rt) <= tol)]
            fwd = [(rt, rid) for rk, rt, rid in rrows
                   if rk == k and rt >= lt
                   and (tol is None or fl(rt) - fl(lt) <= tol)]
            # newest backward / earliest forward; greatest rid on ties
            b = max(back, key=lambda x: (x[0], x[1])) if back else None
            f = min(fwd, key=lambda x: (x[0], -x[1])) if fwd else None
            if direction == "backward":
                pick = b
            elif direction == "forward":
                pick = f
            else:
                if b is None or (f is not None
                                 and (f[0] - lt) < (lt - b[0])):
                    pick = f
                else:
                    pick = b
            if pick is not None:
                out[(k, lid)] = pick[1]
        return out

    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 3):
            got = {(r["k"], r["lid"]): r["right_rid"]
                   for r in asof_join(left, right, ["k"], "ts", "rts",
                                      right_cols=["rid"],
                                      right_tiebreak="rid",
                                      tolerance_seconds=tol,
                                      direction=direction).collect()}
            assert got == brute(direction, tol), (direction, tol)
