"""Round-4 surface tour: typed value schemas, reverse cursors,
object-store manifest commits, and checkpoint clones.

Run: python examples/typed_store_and_checkpoint.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quasdb_spark import KVStore, get_spark
from quasdb_spark.manifest import LocalConditionalPut, Manifest


def main() -> None:
    spark = get_spark("typed-demo", master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "4"})
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="quasdb-demo-")

    # --- typed value schema: value FIELDS are native Parquet columns
    st = KVStore.create(spark, os.path.join(root, "metrics"),
                        value_schema="n long, total double, tag string")
    st.put("svc-a", {"n": 10, "total": 1.5, "tag": "prod"})
    st.put("svc-b", {"n": 3, "total": 0.25, "tag": "canary"})
    st.put("svc-a", {"n": 11, "total": 2.0, "tag": "prod"})  # LWW upsert
    print("typed get:", st.get("svc-a"))
    # value predicates push down to the Parquet scan:
    st.state().where("n > 5").show()

    # --- reverse paged cursor over a pinned snapshot
    for key, val in st.scan_iter(reverse=True, page_size=1):
        print("reverse cursor:", key, val)

    # --- consistent zero-copy clone (hard links); source keeps moving
    clone = st.checkpoint(os.path.join(root, "metrics-backup"))
    st.put("svc-a", {"n": 99, "total": 9.9, "tag": "mutated"})
    st.compact()
    st.vacuum(0.0)
    print("clone still sees:", clone.get("svc-a"))

    # --- object-store commit protocol (no flock/rename/CURRENT):
    # put-if-absent of the next manifest object IS the CAS. Swap
    # LocalConditionalPut for an S3/GCS adapter in production
    # (SCALE.md §5).
    os_path = os.path.join(root, "object-store-kv")
    os_st = KVStore(spark, os_path)
    os_st.manifest = Manifest(os_path, backend=LocalConditionalPut(
        os.path.join(os_path, "_manifest")))
    os_st.manifest.init(schema=KVStore._schema_dict(False, None))
    os_st._load_config()
    os_st.put("k", "v")
    print("object-store protocol get:", os_st.get("k"))

    spark.stop()


if __name__ == "__main__":
    main()
