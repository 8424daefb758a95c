"""Embedded (Spark-free) store access + multi-process serving — the
round-12 additions:

  create a store with a SparkSession (once) -> reopen it EMBEDDED
  (KVStore.open_embedded: no session, no JVM work) -> point reads,
  bounded scans, cursor pages, snapshots and interactive writes at
  driver cost -> serve it from N worker PROCESSES sharing one port
  (RawStoreServer(workers=N), SO_REUSEPORT) -> prove a commit from
  any handle is visible to every process on the next request.

This is the reference's embedded-library model (kv/include/db.h:41:
a DB handle is a library object, not a cluster client) — the Spark
session is only needed for what genuinely needs a cluster: DataFrame
scans, bulk ingest, scoped/drop_where compaction. Round 14: no
janitor loop needed anymore — embedded handles schedule their OWN
bounded compaction from the write path (MakeRoomForWrite parity,
kv/db/db_impl.cpp:1542-1619; opt out with
open_embedded(..., auto_compact=False)), so a write-heavy embedded
store stays at <= l0_compaction_trigger live dirs by itself.

Run: python examples/embedded_store.py
"""

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quasdb_spark import KVStore, get_spark  # noqa: E402
from quasdb_spark.server import RawStoreServer  # noqa: E402


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="quasdb-embedded-")
    path = os.path.join(tmp, "store")

    # --- create + bulk-populate with a session (the cluster half) ---
    spark = get_spark("embedded-demo")
    st = KVStore.create(spark, path)
    st.write_batch([("put", f"user:{i:05d}", f"profile-{i}")
                    for i in range(2000)])
    print(f"created {path} with 2000 keys (Spark handle)")

    # --- reopen EMBEDDED: no session touched from here on ---------
    emb = KVStore.open_embedded(path)
    print("embedded get user:00042 ->", emb.get("user:00042"))
    page = emb.scan_rows("user:00100", "user:00105")
    print("embedded scan_rows ->", page)
    snap = emb.snapshot()
    emb.put("user:00042", "UPDATED")            # driver pyarrow write
    print("after embedded put:", emb.get("user:00042"),
          "| as-of snapshot:", emb.get("user:00042", asof=snap))
    emb.release_snapshot(snap)
    try:
        emb.state()                              # needs a cluster
    except RuntimeError as ex:
        print("distributed surface correctly refused:",
              str(ex).split(".")[0])

    # --- embedded MAINTENANCE: automatic since round 14 -----------
    # interactive writes land one dir per batch; the handle's own
    # write-path tick folds them (bounded Spark-free compaction +
    # vacuum) whenever the dir count crosses the trigger — no janitor
    # loop, no explicit compact() call
    for i in range(50):
        emb.put(f"hot:{i:03d}", str(i))
    n_dirs = emb.properties()["quasdb.num-files"]
    print(f"after 50 interactive puts: {n_dirs} live dirs "
          f"(trigger {emb.l0_compaction_trigger}) — self-compacted")
    assert n_dirs <= emb.l0_compaction_trigger
    assert emb.get("hot:007") == "7" and emb.get("user:00042") == "UPDATED"

    # --- serve from 4 worker processes (embedded readers) ---------
    srv = RawStoreServer(st, workers=4).start()
    time.sleep(3.0)                              # workers import+bind
    print(f"serving on :{srv.port} from 1+{srv.workers_alive()} processes")
    for _ in range(3):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/get?key=user:00042") as r:
            print("  GET /get?key=user:00042 ->", json.loads(r.read()))
    st.put("user:99999", "late-commit")          # commit via Spark handle
    with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/get?key=user:99999") as r:
        print("  cross-process freshness ->", json.loads(r.read()))
    srv.stop()
    print("done")


if __name__ == "__main__":
    main()
