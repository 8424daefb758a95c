"""Serve a store over HTTP with the raw-socket frontend (H1): open a
KV store, ingest a batch, start RawStoreServer, and exercise the JSON
endpoints over a keep-alive connection. Interactive ops ride the
driver fast paths (ms-latency puts/gets, and — r11 — bounded /scan
pages through the driver heap merge), so the HTTP surface behaves
like an embedded KV service end to end; unbounded scans stay on the
DataFrame surface.
Run: python examples/serving_kv_api.py
"""

import json
import os
import shutil
import socket
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quasdb_spark import KVStore, get_spark
from quasdb_spark.server import RawStoreServer


def main():
    spark = get_spark("quasdb-serving", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="quasdb-serve-")
    try:
        db = KVStore.create(spark, os.path.join(root, "db"))
        db.write_batch([("put", f"user:{i:04d}", f"profile-{i}")
                        for i in range(500)])
        db.delete("user:0042")

        srv = RawStoreServer(db).start()
        print(f"serving on 127.0.0.1:{srv.port}")

        # urllib over the raw frontend
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(f"{base}/get?key=user:0007") as r:
            print("GET /get?key=user:0007 ->", json.loads(r.read()))
        with urllib.request.urlopen(
                f"{base}/scan?from=user:0040&to=user:0045") as r:
            print("GET /scan 0040-0045  ->", json.loads(r.read())["rows"])

        # two pipelined requests on ONE keep-alive socket — the
        # incremental parser answers them in order
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            s.sendall(b"GET /health HTTP/1.1\r\nHost: x\r\n\r\n"
                      b"GET /props HTTP/1.1\r\nHost: x\r\n\r\n")
            buf = b""
            while buf.count(b"HTTP/1.1 200") < 2:
                buf += s.recv(65536)
            print("pipelined: 2 responses,",
                  buf.count(b"Connection: keep-alive"), "keep-alive")
        srv.stop()
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
