"""HTTP serving shim (reference H1: http_server/ — a Boost.Asio static
HTTP server, ~1.2k LoC, NOT wired to the KV engine;
http_server/request_handler.cpp:18-69 serves files from a doc root).

Parity plus one step further: the reference serves only static files,
so a thin stdlib ``http.server`` handler covers H1; we additionally
expose the store's introspection and point/range reads as JSON
endpoints, which is what a Spark-backed store can meaningfully serve
(sub-second lookups thanks to manifest + Parquet pruning — not an
OLTP path, and documented as such).

Endpoints:
  GET /health                     -> {"status": "ok"}
  GET /props                      -> store properties (S11)
  GET /get?key=K[&asof=N]         -> {"key":..., "value":...} | 404
  GET /scan?from=A&to=B[&limit=N][&asof=N][&reverse=1]
                                  -> {"rows": [[key, value], ...]}
  GET /<file>                     -> static file from doc_root (H1)
"""

from __future__ import annotations

import json
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from quasdb_spark.store import KVStore

MIME = {".html": "text/html", ".css": "text/css", ".js": "text/javascript",
        ".json": "application/json", ".png": "image/png",
        ".jpg": "image/jpeg", ".gif": "image/gif", ".txt": "text/plain"}


def _make_handler(store: KVStore | None, doc_root: str | None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            url = urllib.parse.urlparse(self.path)
            q = {k: v[0] for k, v in urllib.parse.parse_qs(url.query).items()}
            try:
                if url.path == "/health":
                    return self._json(200, {"status": "ok"})
                if store is not None and url.path == "/props":
                    return self._json(200, store.properties())
                if store is not None and url.path == "/get":
                    key = q.get("key")
                    if key is None:
                        return self._json(400, {"error": "missing key"})
                    asof = int(q["asof"]) if "asof" in q else None
                    val = store.get(key, asof=asof)
                    if val is None:
                        return self._json(404, {"error": "not found", "key": key})
                    return self._json(200, {"key": key, "value": val})
                if store is not None and url.path == "/scan":
                    asof = int(q["asof"]) if "asof" in q else None
                    limit = min(int(q.get("limit", "100")), 10000)
                    df = store.scan(q.get("from"), q.get("to"), asof=asof,
                                    reverse=q.get("reverse") == "1",
                                    limit=limit)
                    rows = [[r["key"], store._row_value(r)]
                            for r in df.collect()]
                    return self._json(200, {"rows": rows})
                if doc_root is not None:
                    # static files (H1), with traversal protection
                    rel = urllib.parse.unquote(url.path.lstrip("/")) or "index.html"
                    full = os.path.realpath(os.path.join(doc_root, rel))
                    if not full.startswith(os.path.realpath(doc_root) + os.sep):
                        return self._json(403, {"error": "forbidden"})
                    if not os.path.isfile(full):
                        return self._json(404, {"error": "not found"})
                    ext = os.path.splitext(full)[1].lower()
                    with open(full, "rb") as f:
                        body = f.read()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     MIME.get(ext, "application/octet-stream"))
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                return self._json(404, {"error": "not found"})
            except Exception as e:  # pragma: no cover - defensive
                return self._json(500, {"error": str(e)[:500]})

    return Handler


class StoreServer:
    """Threaded HTTP server over a store and/or a static doc root."""

    def __init__(self, store: KVStore | None = None,
                 doc_root: str | None = None,
                 host: str = "127.0.0.1", port: int = 0):
        self.httpd = ThreadingHTTPServer((host, port),
                                         _make_handler(store, doc_root))
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "StoreServer":
        self._thread = threading.Thread(target=self.httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
