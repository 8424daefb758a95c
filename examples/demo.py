"""The reference demo workload (demo.cpp:5-40: open, Put, Get,
overwrite, Delete, get-missing) plus a taste of everything the Spark
engine adds on top. Run: python examples/demo.py
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quasdb_spark import KVStore, WriteBatch, get_spark


def main():
    spark = get_spark("quasdb-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="quasdb-demo-")
    try:
        db = KVStore.create(spark, os.path.join(root, "db"))

        # demo.cpp round trip
        db.put("name", "quasdb")
        print("get name ->", db.get("name"))
        db.put("name", "quasdb-on-spark")
        print("after overwrite ->", db.get("name"))
        db.delete("name")
        print("after delete ->", db.get("name"))

        # atomic batch + snapshot + as-of
        b = WriteBatch().put("a", "1").put("b", "2").put("c", "3")
        db.write(b)
        snap = db.snapshot("demo")
        db.write(WriteBatch().delete("b").put("a", "99"))
        print("scan now  ->", [(r.key, r.value) for r in db.scan().collect()])
        print("scan asof ->", [(r.key, r.value) for r in db.scan(asof=snap).collect()])

        # compaction keeps both views intact
        stats = db.compact()
        print("compacted:", stats["files_before"], "->", stats["files_after"], "dirs")
        print("asof still ->", [(r.key, r.value) for r in db.scan(asof=snap).collect()])
        print("properties:", db.properties()["quasdb.stats"])
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
