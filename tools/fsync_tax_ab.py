"""A/B the durability tax: the r12 power-loss-safety fsyncs, measured.

Round 12 added fsync ordering to the write path (data bytes + dirents
before the manifest commit that references them; manifest directory
fsync after each rename — store.py:_commit_append_rows,
manifest.py:_atomic_write). VERDICT r12 "What's wrong" #2 notes
kv_ingest/kv_compact sit at the top of the round-over-round band and
asks for the fsync share as a RECORDED number, not a guess.

Protocol: the bench kv lifecycle (Spark bulk ingest -> state -> compact)
plus an interactive-writer loop (N driver-path write_batches — the path
that fsyncs file + 2 dirents per batch), run REPS times each way:
  A) stock (fsyncs live)
  B) os.fsync monkeypatched to a no-op in THIS process (covers the
     manifest and driver-writer fsyncs; Spark's JVM parquet writes never
     fsynced in either arm, so the delta isolates exactly the r12 tax)
Prints one JSON line; paste the numbers into SCALE.md.

Usage: python tools/fsync_tax_ab.py  [$SPARK_GRAFT_SF_DIR, default sf0.1]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quasdb_spark.session import get_spark  # noqa: E402
from quasdb_spark.sources.tables import load_table  # noqa: E402
from quasdb_spark.store import KVStore  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
N_INTERACTIVE = 200


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_cycle(spark, df) -> dict[str, float]:
    out = {}
    tmp = tempfile.mkdtemp(prefix="fsync-ab-")
    try:
        st = KVStore.create(spark, os.path.join(tmp, "store"))
        t0 = time.perf_counter()
        st.ingest(df, op_col="op", sub_col="sub")
        out["kv_ingest"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        st.compact()
        out["kv_compact"] = time.perf_counter() - t0
        # interactive driver-path writes: fsync(file)+fsync(dir)x2 each
        t0 = time.perf_counter()
        for i in range(N_INTERACTIVE):
            st.write_batch([("put", f"i{i:06d}", "v")])
        out["interactive_200_batches"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("fsync-ab", master=f"local[{cpus}]",
                      extra_conf={"spark.sql.shuffle.partitions": cpus})
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")
    df = ev.selectExpr(
        "concat('u', lpad(cast(user_id as string), 6, '0')) as key",
        "cast(event_id as long) as sub",
        "case when event_type = 'error' then 'del' else 'put' end as op",
        "cast(value as string) as value")
    _force(df)  # warm the scan once

    real_fsync = os.fsync
    arms: dict[str, dict[str, list[float]]] = {"fsync_on": {},
                                               "fsync_off": {}}
    # interleave arms A/B per rep so host drift hits both equally
    for _ in range(REPS):
        for arm in ("fsync_on", "fsync_off"):
            os.fsync = real_fsync if arm == "fsync_on" \
                else (lambda fd: None)
            try:
                for k, v in run_cycle(spark, df).items():
                    arms[arm].setdefault(k, []).append(v)
            finally:
                os.fsync = real_fsync

    result = {"sf_dir": sf_dir, "reps": REPS,
              "n_interactive": N_INTERACTIVE}
    for stage in arms["fsync_on"]:
        on = statistics.median(arms["fsync_on"][stage])
        off = statistics.median(arms["fsync_off"][stage])
        result[stage] = {
            "fsync_on_s": round(on, 3), "fsync_off_s": round(off, 3),
            "tax_s": round(on - off, 3),
            "tax_pct": round(100.0 * (on - off) / on, 1) if on else None}
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
