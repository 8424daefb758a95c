"""HTTP serving (reference H1: http_server/ — a Boost.Asio HTTP
server: request_parser.cpp state machine, connection.cpp /
connection_manager.cpp keep-alive + stop-all lifecycle,
request_handler.cpp:18-69 static files from a doc root, reply.cpp
canned status replies).

Parity plus one step further: the reference serves only static files;
we additionally expose the store's introspection and point/range reads
as JSON endpoints, which is what a Spark-backed store can meaningfully
serve (point lookups answer in single-digit milliseconds via the
store's driver-side pyarrow read path; range scans are pruned Spark
jobs — not an OLTP path, and documented as such).

Two server frontends share ONE routing function (``handle_request``):

- ``StoreServer`` — stdlib ``ThreadingHTTPServer`` (parsing by
  stdlib; the pragmatic deployment default).
- ``RawStoreServer`` — our own socket loop over
  ``httpparse.RequestParser`` (the reference's request_parser.cpp
  re-expressed): incremental parsing with good/bad/indeterminate,
  request pipelining via consumed-byte offsets, HTTP/1.0-vs-1.1
  keep-alive defaults, 400 on malformed bytes, and a connection
  manager that tracks live sockets and closes them all on ``stop()``
  (connection_manager.cpp:16-35 semantics).

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
import re
import socket
import socketserver
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from quasdb_spark.httpparse import RequestParser, Result
from quasdb_spark.store import KVStore

MIME = {".html": "text/html", ".css": "text/css", ".js": "text/javascript",
        ".json": "application/json", ".png": "image/png",
        ".jpg": "image/jpeg", ".gif": "image/gif", ".txt": "text/plain"}

# reply.cpp's canned status lines (the subset this server emits)
STATUS = {200: "OK", 400: "Bad Request", 403: "Forbidden",
          404: "Not Found", 405: "Method Not Allowed",
          500: "Internal Server Error"}


class _BadParam(ValueError):
    """A malformed client-supplied parameter — answered 400, never
    500 through the catch-all."""


def handle_request(store: KVStore | None, doc_root: str | None,
                   method: str, target: str
                   ) -> tuple[int, str, bytes, int]:
    """Route one request to (status, content_type, body, content_len).
    Shared by both server frontends, so routing behavior can't drift.
    For HEAD on static files the body stays EMPTY but content_len is
    the file's true size (never read a multi-GB file just to discard
    it); everywhere else content_len == len(body)."""
    def jdefault(v):
        # typed-store values now reach serving (VERDICT r13 #8):
        # timestamps/dates -> ISO strings, Decimal -> str (exact),
        # Rows (struct columns) -> field dicts, bytes -> hex
        import datetime as _dt
        import decimal as _dec

        from pyspark.sql import Row as _Row

        if isinstance(v, (_dt.datetime, _dt.date)):
            return v.isoformat()
        if isinstance(v, _dec.Decimal):
            return str(v)
        if isinstance(v, _Row):
            return v.asDict()
        if isinstance(v, (bytes, bytearray)):
            return bytes(v).hex()
        raise TypeError(f"unserializable value type {type(v).__name__}")

    def jsan(v):
        # Rows subclass tuple, so json.dumps lists them before the
        # default hook ever fires — walk them into field dicts first
        from pyspark.sql import Row as _Row

        if isinstance(v, _Row):
            return {k: jsan(x) for k, x in v.asDict().items()}
        if isinstance(v, dict):
            return {k: jsan(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [jsan(x) for x in v]
        return v

    def jbody(obj) -> tuple[str, bytes]:
        return ("application/json",
                json.dumps(jsan(obj), default=jdefault).encode())

    def reply(code: int, ctype: str, body: bytes,
              clen: int | None = None) -> tuple[int, str, bytes, int]:
        return (code, ctype, body,
                len(body) if clen is None else clen)

    try:
        if method not in ("GET", "HEAD"):
            return reply(405, *jbody({"error": "method not allowed"}))
        url = urllib.parse.urlparse(target)
        q = {k: v[0] for k, v in
             urllib.parse.parse_qs(url.query,
                                   keep_blank_values=True).items()}

        def qbytes(name: str) -> bytes | None:
            # BINARY-store keys (VERDICT r14 board #8): parse_qs
            # decodes percent-escapes through UTF-8 and corrupts raw
            # bytes (%FF -> U+FFFD), so byte keys are re-extracted
            # from the RAW query: either `<name>hex=<hex>` (exact,
            # preferred) or `<name>=%XX..` percent-encoded raw bytes.
            # Empty bytes are a valid key (the hostile keyspace).
            for part in url.query.split("&"):
                if part.startswith(name + "hex="):
                    try:
                        return bytes.fromhex(part.split("=", 1)[1])
                    except ValueError:
                        raise _BadParam(name + "hex")
                if part.startswith(name + "="):
                    return urllib.parse.unquote_to_bytes(
                        part.split("=", 1)[1].replace("+", "%20"))
            return None
        if url.path == "/health":
            return reply(200, *jbody({"status": "ok"}))
        if store is not None and url.path == "/props":
            return reply(200, *jbody(store.properties()))
        if store is not None and url.path in ("/get", "/scan") \
                and "asof" in q \
                and not re.fullmatch(r"-?\d+", q["asof"]):
            # client error, not a server fault: same contract as the
            # limit parameter below
            return reply(400, *jbody({"error": "bad asof",
                                      "asof": q["asof"]}))
        if store is not None and url.path == "/get":
            if getattr(store, "binary", False):
                key = qbytes("key")
            else:
                key = q.get("key")
            if key is None:
                return reply(400, *jbody({"error": "missing key"}))
            asof = int(q["asof"]) if "asof" in q else None
            val = store.get(key, asof=asof)
            if val is None:
                return reply(404, *jbody({"error": "not found",
                                          "key": key}))
            return reply(200, *jbody({"key": key, "value": val}))
        if store is not None and url.path == "/scan":
            asof = int(q["asof"]) if "asof" in q else None
            try:
                limit = int(q.get("limit", "100"))
            except ValueError:
                return reply(400, *jbody({"error": "bad limit",
                                          "limit": q.get("limit")}))
            if limit <= 0:
                # a client-supplied empty page is a valid request, not
                # a server error (the pre-driver-engine Spark path
                # answered it with an empty rows array — keep that)
                return reply(200, *jbody({"rows": []}))
            limit = min(limit, 10000)
            # bounded pages answer on the DRIVER (pyarrow heap merge,
            # no Spark job — store.scan_rows; single-digit ms like
            # /get); stores the driver engine defers fall back to the
            # Spark scan inside scan_rows, same rows either way
            if getattr(store, "binary", False):
                lo, hi = qbytes("from"), qbytes("to")
            else:
                lo, hi = q.get("from"), q.get("to")
            rows = [[k, v] for k, v in
                    store.scan_rows(lo, hi,
                                    asof=asof,
                                    reverse=q.get("reverse") == "1",
                                    limit=limit)]
            return reply(200, *jbody({"rows": rows}))
        if doc_root is not None:
            # static files (H1), with traversal protection
            rel = urllib.parse.unquote(url.path.lstrip("/")) or "index.html"
            full = os.path.realpath(os.path.join(doc_root, rel))
            if not full.startswith(os.path.realpath(doc_root) + os.sep):
                return reply(403, *jbody({"error": "forbidden"}))
            if not os.path.isfile(full):
                return reply(404, *jbody({"error": "not found"}))
            ext = os.path.splitext(full)[1].lower()
            ctype = MIME.get(ext, "application/octet-stream")
            if method == "HEAD":  # size only, never read the file
                return reply(200, ctype, b"", os.path.getsize(full))
            with open(full, "rb") as f:
                body = f.read()
            return reply(200, ctype, body)
        return reply(404, *jbody({"error": "not found"}))
    except _BadParam as e:
        # malformed client parameter (e.g. odd-length keyhex): the
        # client's fault, same contract as bad asof/limit
        return reply(400, *jbody({"error": f"bad {e.args[0]}"}))
    except Exception as e:  # pragma: no cover - defensive
        return reply(500, *jbody({"error": str(e)[:500]}))


def _make_handler(store: KVStore | None, doc_root: str | None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _respond(self, method: str) -> None:
            code, ctype, body, clen = handle_request(store, doc_root,
                                                     method, self.path)
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(clen))
            self.end_headers()
            if method != "HEAD":
                self.wfile.write(body)

        def do_GET(self):  # noqa: N802
            self._respond("GET")

        def do_HEAD(self):  # noqa: N802
            self._respond("HEAD")

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


def _wire_reply(code: int, ctype: str, body: bytes, clen: int,
                keep_alive: bool, head_only: bool) -> bytes:
    head = (f"HTTP/1.1 {code} {STATUS.get(code, 'Unknown')}\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {clen}\r\n"
            f"Connection: {'keep-alive' if keep_alive else 'close'}\r\n"
            "\r\n").encode("ascii")
    return head if head_only else head + body


class _RawConnection(socketserver.BaseRequestHandler):
    """One client connection: feed bytes through RequestParser,
    answer each GOOD head, honor keep-alive, 400-and-close on BAD.
    Pipelined requests in one buffer are served in order (the parser
    reports consumed bytes; the remainder re-feeds after reset)."""

    def handle(self) -> None:
        srv = self.server
        srv.track(self.request)
        parser = RequestParser()
        pending = b""
        try:
            self.request.settimeout(srv.idle_timeout)
            while True:
                if pending:
                    data, pending = pending, b""
                else:
                    data = self.request.recv(65536)
                    if not data:
                        return
                result, used = parser.feed(data)
                pending = data[used:]
                if result is Result.BAD:
                    body = b'{"error": "malformed request"}'
                    self.request.sendall(_wire_reply(
                        400, "application/json", body, len(body),
                        False, False))
                    return
                if result is Result.INDETERMINATE:
                    continue
                req = parser.request
                # A request advertising a NON-EMPTY body (any method —
                # GET/HEAD may legally carry Content-Length too) leaves
                # bytes this server never reads; keeping the connection
                # would desync the parser on them (they'd be parsed as
                # the next request head). Close after answering
                # instead. "Content-Length: 0" leaves nothing unread,
                # so clients that always emit it keep their connection.
                keep = (req.keep_alive
                        and req.method in ("GET", "HEAD")
                        and req.header("Content-Length") in (None, "0")
                        and req.header("Transfer-Encoding") is None)
                code, ctype, body, clen = handle_request(
                    srv.store, srv.doc_root, req.method, req.uri)
                self.request.sendall(_wire_reply(
                    code, ctype, body, clen, keep,
                    req.method == "HEAD"))
                if not keep:
                    return
                parser.reset()
        except (TimeoutError, OSError):
            pass
        finally:
            srv.untrack(self.request)


def _worker_main(store_path: str | None, doc_root: str | None,
                 host: str, port: int, idle_timeout: float) -> None:
    """One serving worker process (a fresh interpreter via
    ``python -m quasdb_spark.server`` — never forked over a live JVM,
    and no re-import of the parent's __main__, so any parent context
    works: scripts, notebooks, stdin): opens its OWN embedded store
    handle (own GIL, own footer cache, no SparkSession) and binds the
    SHARED port with SO_REUSEPORT, so the kernel load-balances
    accepted connections across processes. Manifest commits from any
    writer process are visible on the next request (current()
    re-reads CURRENT; data dirs are immutable)."""
    store = KVStore.open_embedded(store_path) if store_path else None
    srv = RawStoreServer(store=store, doc_root=doc_root, host=host,
                         port=port, idle_timeout=idle_timeout,
                         reuse_port=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover - parent terminates us
        pass


class RawStoreServer(socketserver.ThreadingTCPServer):
    """The reference-parity frontend: our own HTTP parsing and
    connection lifecycle on a raw socket loop. ``stop()`` closes the
    listener AND every live connection (connection_manager stop_all
    semantics) so shutdown never hangs on an idle keep-alive peer.

    ``workers=N`` spawns N extra serving PROCESSES, each an embedded
    (Spark-free) reader of the same store sharing the port via
    SO_REUSEPORT — the scale-out answer to the single-process ceiling
    the concurrent bench measures (parse + driver reads all contend
    on one GIL; the reference's thread-per-connection model scales on
    real threads, kv/include/db.h:39-40). Requires the store's driver
    read engine (pyarrow-safe schema) and built-in codecs — a worker
    process recovers store config from the manifest alone."""

    daemon_threads = True
    allow_reuse_address = True

    def __init__(self, store: KVStore | None = None,
                 doc_root: str | None = None,
                 host: str = "127.0.0.1", port: int = 0,
                 idle_timeout: float = 30.0,
                 workers: int = 0, reuse_port: bool = False):
        # must be set BEFORE super().__init__ binds the socket
        self._reuse_port = reuse_port or workers > 0
        super().__init__((host, port), _RawConnection)
        self.store, self.doc_root = store, doc_root
        self.idle_timeout = idle_timeout
        self.workers = workers
        self.port = self.server_address[1]
        self._live: set[socket.socket] = set()
        self._lock = threading.Lock()
        self._thread: threading.Thread | None = None
        self._procs: list = []

    def server_bind(self) -> None:
        if self._reuse_port:
            self.socket.setsockopt(socket.SOL_SOCKET,
                                   socket.SO_REUSEPORT, 1)
        super().server_bind()

    def track(self, sock: socket.socket) -> None:
        with self._lock:
            self._live.add(sock)

    def untrack(self, sock: socket.socket) -> None:
        with self._lock:
            self._live.discard(sock)

    def start(self) -> "RawStoreServer":
        if self.workers and self.store is not None:
            # fail FAST, not per-request: a worker is an embedded
            # reader in a fresh interpreter — it needs the driver
            # read engine (pyarrow-safe schema; otherwise ~N/(N+1)
            # of requests would 500 nondeterministically as the
            # kernel load-balances onto workers) and a codec it
            # can resolve without user registration. Validate BEFORE
            # the serve thread starts: on the raise path the caller
            # holds no handle to stop(), so nothing may leak — close
            # the bound listener too (ADVICE r12).
            from quasdb_spark.codec import BUILTIN_CODECS

            err = None
            if not self.store._driver_reads_ok():
                err = ("RawStoreServer(workers=N): this store's value "
                       "schema defers the driver read engine (builtin "
                       "typed codecs — timestamp/date/decimal/map/"
                       "array/struct — are served since r14; anything "
                       "else needs workers=0)")
            elif self.store.codec.name not in BUILTIN_CODECS:
                err = (f"RawStoreServer(workers=N): store codec "
                       f"{self.store.codec.name!r} is not a built-in "
                       "— a worker process cannot re-register it; "
                       "run workers=0")
            if err is not None:
                self.server_close()
                raise ValueError(err)
        self._thread = threading.Thread(target=self.serve_forever,
                                        daemon=True)
        self._thread.start()
        if self.workers:
            import subprocess
            import sys

            spath = self.store.path if self.store is not None else "-"
            argv = [sys.executable, "-m", "quasdb_spark.server",
                    "--serve-worker", spath, self.doc_root or "-",
                    self.server_address[0], str(self.port),
                    str(self.idle_timeout)]
            # the child must resolve `-m quasdb_spark.server` even when
            # the parent imported the package off a sys.path insert
            pkg_parent = os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))
            env = dict(os.environ)
            env["PYTHONPATH"] = pkg_parent + os.pathsep \
                + env.get("PYTHONPATH", "")
            for _ in range(self.workers):
                self._procs.append(subprocess.Popen(argv, env=env))
        return self

    def workers_alive(self) -> int:
        return sum(1 for p in self._procs if p.poll() is None)

    def stop(self) -> None:
        for p in self._procs:
            p.terminate()
        for p in self._procs:
            try:
                p.wait(timeout=10)
            except Exception:
                p.kill()
        self._procs.clear()
        self.shutdown()
        self.server_close()
        with self._lock:
            live = list(self._live)
        for s in live:  # stop_all: drop idle keep-alive peers too
            try:
                s.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            try:
                s.close()
            except OSError:
                pass


if __name__ == "__main__":  # pragma: no cover - exercised as subprocess
    import sys as _sys

    if len(_sys.argv) == 7 and _sys.argv[1] == "--serve-worker":
        _, _, _sp, _dr, _host, _port, _to = _sys.argv
        _worker_main(None if _sp == "-" else _sp,
                     None if _dr == "-" else _dr,
                     _host, int(_port), float(_to))
    else:
        print("usage: python -m quasdb_spark.server --serve-worker "
              "<store_path|-> <doc_root|-> <host> <port> <idle_timeout>",
              file=_sys.stderr)
        _sys.exit(2)
