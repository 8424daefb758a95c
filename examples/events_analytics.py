"""Event-analytics tour over the synthetic stream table: the round-5
query surface driven as a user would — attribution via interval join,
purchase-cohort retention, gap-session stats, and a continuous hourly
rollup maintained incrementally in a typed KVStore.

Run: python examples/events_analytics.py [sf_dir]
(defaults to /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from quasdb_spark import get_spark
from quasdb_spark.operators.timeseries import interval_join, session_stats
from quasdb_spark.sources.tables import load_table
from quasdb_spark.store import KVStore
from quasdb_spark.streaming.rollup import continuous_rollup, rollup_state


def main(sf_dir: str = "/root/testdata/sf0.001"):
    spark = get_spark("events-analytics", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")

    # 1. Attribution: clicks in the hour before each purchase
    #    (bucketized interval join — equi-join on (user, time-bucket))
    purchases = (ev.where(F.col("event_type") == "purchase")
                   .select("user_id", "event_id", "ts"))
    clicks = (ev.where(F.col("event_type") == "click")
                .select("user_id", F.col("ts").alias("c_ts"),
                        F.col("event_id").alias("click_id")))
    attributed = interval_join(purchases, clicks, ["user_id"], "ts", "c_ts",
                               lower_seconds=-3600, upper_seconds=0,
                               right_cols=["click_id"])
    n_pairs = attributed.count()
    print(f"attribution pairs (click<=1h before purchase): {n_pairs}")

    # 2. Cohort retention: distinct repeat purchasers by days since
    #    the user's first purchase day
    buys = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    first = (buys.groupBy("user_id")
                 .agg(F.date_trunc("day", F.min("ts")).alias("cohort_day")))
    days_since = F.floor(
        (F.unix_timestamp(F.date_trunc("day", F.col("ts")))
         - F.unix_timestamp("cohort_day")) / 86400).cast("long")
    retention = (buys.join(first, "user_id")
                     .groupBy("cohort_day", days_since.alias("days_since"))
                     .agg(F.countDistinct("user_id").alias("n_users")))
    print("retention grid (first 5 cells):")
    retention.orderBy("cohort_day", "days_since").show(5, False)

    # 3. Gap sessions: 30-minute-inactivity session stats per user
    sessions = session_stats(ev, "ts", ["user_id"], 1800, "event_id")
    sessions.agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.round(F.avg("n_events"), 2).alias("avg_events"),
                 F.max("duration_s").alias("longest_s")).show()

    # 4. Continuous hourly rollup into a typed KVStore: stream the
    #    events file, upsert per-window aggregate rows, read back typed
    root = tempfile.mkdtemp(prefix="events_rollup_")
    src = os.path.join(root, "src")
    ev.select("ts", "event_type", "value").write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    st = KVStore.create(spark, os.path.join(root, "store"),
                        value_schema="n long, vc long")
    q = continuous_rollup(
        st, stream, os.path.join(root, "ckpt"),
        ts_col="ts", keys=["event_type"], duration="1 hour",
        aggs=[F.count(F.lit(1)).alias("n"),
              F.sum(F.round(F.col("value") * 100).cast("long")).alias("vc")])
    q.awaitTermination()
    roll = rollup_state(st, ["event_type"])
    print("continuous rollup rows:", roll.count())
    (roll.orderBy("window_start", "event_type")
         .select("window_start", "event_type", "n",
                 (F.col("vc") / 100.0).alias("sum_value"))
         .show(5, False))


if __name__ == "__main__":
    main(*sys.argv[1:])
