"""Error-bound tests for the sketch aggregates: approximate answers
must land within their advertised bounds of the exact answers on the
driver testdata — the honest correctness contract for sketches (their
values are engine-specific, so no cross-engine hash oracle)."""

import pyspark.sql.functions as F

from quasdb_spark.functions.sketches import (freq_sketch, ndv_by,
                                             quantiles_by, sketch_profile)
from quasdb_spark.sources.tables import load_table


def test_hll_ndv_within_rsd(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    approx = {r["event_type"]: r["ndv_user_id"]
              for r in ndv_by(ev, ["event_type"], "user_id").collect()}
    exact = {r["event_type"]: r["d"]
             for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("d")).collect()}
    assert approx.keys() == exact.keys()
    for k in exact:
        rel = abs(approx[k] - exact[k]) / exact[k]
        assert rel < 0.15, (k, approx[k], exact[k])  # 3x the 5% rsd


def test_quantiles_close_to_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = quantiles_by(ev, ["event_type"], "value", [0.5, 0.95]).collect()
    exact = {r["event_type"]: r["q"]
             for r in ev.groupBy("event_type")
             .agg(F.expr("percentile(value, array(0.5, 0.95))").alias("q"))
             .collect()}
    for r in got:
        lo, hi = ev.agg(F.min("value"), F.max("value")).collect()[0]
        span = hi - lo
        for a, e in zip(r["quantiles"], exact[r["event_type"]]):
            assert abs(a - e) <= 0.05 * span + 1e-9, (r["event_type"], a, e)


def test_freq_sketch_is_mergeable_binary(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = freq_sketch(ev, ["event_type"], "user_id").collect()
    assert all(isinstance(bytes(r["cms"]), bytes) and len(r["cms"]) > 0
               for r in out)


def test_sketch_profile_shape(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = sketch_profile(ev, ["event_type"], "user_id", "value").collect()
    assert len(rows) >= 3
    for r in rows:
        p50, p95, p99 = r["pcts"]
        assert p50 <= p95 <= p99
        assert r["n"] > 0 and r["ndv_user_id"] > 0
