"""Incremental HTTP request parser (H1 parity with the reference's
request_parser.cpp state machine: good/bad/indeterminate results,
consumed-byte offsets for pipelining, strict token/ctl validation,
obs-fold header continuations) and the RawStoreServer connection
lifecycle built on it."""

import socket

import pytest

from quasdb_spark.httpparse import Request, RequestParser, Result

GET = b"GET /health HTTP/1.1\r\nHost: x\r\nAccept: */*\r\n\r\n"


def test_parse_whole_buffer():
    p = RequestParser()
    res, used = p.feed(GET)
    assert res is Result.GOOD and used == len(GET)
    r = p.request
    assert (r.method, r.uri, r.version_major, r.version_minor) == \
        ("GET", "/health", 1, 1)
    assert r.headers == [("Host", "x"), ("Accept", "*/*")]
    assert r.header("host") == "x"  # case-insensitive


def test_parse_byte_at_a_time():
    """Any delivery split must parse identically (the reference's
    parse() loops consume() per byte for exactly this)."""
    p = RequestParser()
    for b in GET[:-1]:
        res, used = p.feed(bytes([b]))
        assert res is Result.INDETERMINATE and used == 1
    res, _ = p.feed(GET[-1:])
    assert res is Result.GOOD
    assert p.request.method == "GET"


def test_pipelined_requests_report_consumed():
    """Two requests in one buffer: the first GOOD stops at its blank
    line; the remainder parses as the second request after reset()."""
    buf = GET + b"GET /props HTTP/1.0\r\n\r\n"
    p = RequestParser()
    res, used = p.feed(buf)
    assert res is Result.GOOD and used == len(GET)
    assert p.request.uri == "/health"
    p.reset()
    res, used2 = p.feed(buf[used:])
    assert res is Result.GOOD and used + used2 == len(buf)
    assert p.request.uri == "/props"
    assert (p.request.version_major, p.request.version_minor) == (1, 0)


def test_obs_fold_continuation():
    raw = (b"GET / HTTP/1.1\r\n"
           b"X-Long: part one\r\n"
           b"   and part two\r\n"
           b"Host: h\r\n\r\n")
    p = RequestParser()
    res, _ = p.feed(raw)
    assert res is Result.GOOD
    assert p.request.header("X-Long") == "part one and part two"
    assert p.request.header("Host") == "h"


def test_empty_header_value_and_leading_space_skip():
    raw = b"GET / HTTP/1.1\r\nX-Empty:\r\nX-Sp:   v\r\n\r\n"
    p = RequestParser()
    res, _ = p.feed(raw)
    assert res is Result.GOOD
    assert p.request.header("X-Empty") == ""
    assert p.request.header("X-Sp") == "v"


@pytest.mark.parametrize("raw", [
    b"GE\x01T / HTTP/1.1\r\n\r\n",        # ctl in method
    b"GET /a\x00b HTTP/1.1\r\n\r\n",       # ctl in uri
    b"GET / XTTP/1.1\r\n\r\n",             # bad protocol name
    b"GET / HTTP/1.\r\n\r\n",              # missing minor digit
    b"GET / HTTP/11\r\n\r\n",              # no dot
    b"GET / HTTP/1.1\r\nBad(Name): v\r\n\r\n",  # tspecial in name
    b"GET / HTTP/1.1\rX\r\n\r\n",          # CR not followed by LF
    b"GET / HTTP/1.1\r\n  folded-without-header\r\n\r\n",
    b"GET  / HTTP/1.1\r\n\r\n",            # empty uri (double SP)
])
def test_bad_requests(raw):
    p = RequestParser()
    res, _ = p.feed(raw)
    assert res is Result.BAD


def test_keep_alive_defaults():
    assert Request(version_major=1, version_minor=1).keep_alive
    assert not Request(version_major=1, version_minor=1,
                       headers=[("Connection", "close")]).keep_alive
    assert not Request(version_major=1, version_minor=0).keep_alive
    assert Request(version_major=1, version_minor=0,
                   headers=[("Connection", "Keep-Alive")]).keep_alive


# ---------------------------------------------------------------- raw server


def _roundtrip(sock, req: bytes) -> bytes:
    sock.sendall(req)
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += sock.recv(65536)
    head, _, rest = buf.partition(b"\r\n\r\n")
    length = 0
    for line in head.split(b"\r\n"):
        if line.lower().startswith(b"content-length:"):
            length = int(line.split(b":", 1)[1])
    while len(rest) < length:
        rest += sock.recv(65536)
    return head + b"\r\n\r\n" + rest


def test_raw_server_keep_alive_and_store_endpoints(spark, tmp_path):
    from quasdb_spark.server import RawStoreServer
    from quasdb_spark.store import KVStore

    st = KVStore.create(spark, str(tmp_path / "s"))
    st.write_batch([("put", "a", "1"), ("put", "b", "2")])
    srv = RawStoreServer(st).start()
    try:
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            # two requests on ONE keep-alive connection
            r1 = _roundtrip(s, b"GET /health HTTP/1.1\r\nHost: x\r\n\r\n")
            assert r1.startswith(b"HTTP/1.1 200") and b'"ok"' in r1
            assert b"Connection: keep-alive" in r1
            r2 = _roundtrip(s, b"GET /get?key=a HTTP/1.1\r\nHost: x\r\n\r\n")
            assert b'"value": "1"' in r2
            # pipelined pair arrives in order on the same connection
            s.sendall(b"GET /get?key=a HTTP/1.1\r\nHost: x\r\n\r\n"
                      b"GET /get?key=b HTTP/1.1\r\nHost: x\r\n\r\n")
            buf = b""
            while buf.count(b"HTTP/1.1 200") < 2:
                buf += s.recv(65536)
            assert buf.index(b'"value": "1"') < buf.index(b'"value": "2"')
    finally:
        srv.stop()


def test_raw_server_http10_closes_and_bad_request(spark, tmp_path):
    from quasdb_spark.server import RawStoreServer
    from quasdb_spark.store import KVStore

    st = KVStore.create(spark, str(tmp_path / "s2"))
    srv = RawStoreServer(st).start()
    try:
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            r = _roundtrip(s, b"GET /health HTTP/1.0\r\n\r\n")
            assert b"Connection: close" in r
            assert s.recv(65536) == b""  # server closed (HTTP/1.0 default)
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            r = _roundtrip(s, b"BROKEN\x01 / HTTP/1.1\r\n\r\n")
            assert r.startswith(b"HTTP/1.1 400")
            assert s.recv(65536) == b""  # BAD closes the connection
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            r = _roundtrip(s, b"POST /health HTTP/1.1\r\nHost: x\r\n\r\n")
            assert r.startswith(b"HTTP/1.1 405")
    finally:
        srv.stop()


def test_raw_server_stop_closes_idle_keepalive_peer(spark, tmp_path):
    """connection_manager stop_all semantics: shutdown must not hang
    on (and must actively close) an idle keep-alive connection."""
    from quasdb_spark.server import RawStoreServer

    srv = RawStoreServer().start()
    s = socket.create_connection(("127.0.0.1", srv.port))
    try:
        _roundtrip(s, b"GET /health HTTP/1.1\r\nHost: x\r\n\r\n")
        srv.stop()  # must return promptly and kill the idle peer
        s.settimeout(5)
        assert s.recv(65536) == b""
    finally:
        s.close()


def test_connection_header_token_list_and_caps():
    """'Connection: close, TE' must close (token-list membership, not
    string equality); unbounded fields hit BAD instead of growing the
    parser's buffers forever."""
    p = RequestParser()
    res, _ = p.feed(b"GET / HTTP/1.1\r\nConnection: close, TE\r\n\r\n")
    assert res is Result.GOOD and not p.request.keep_alive
    p.reset()
    res, _ = p.feed(b"GET /" + b"a" * (64 * 1024 + 10))  # URI cap
    assert res is Result.BAD
    p.reset()
    res, _ = p.feed(b"X" * 100)  # method cap
    assert res is Result.BAD


def test_raw_server_post_closes_connection(spark, tmp_path):
    """A request that may carry a body (anything but GET/HEAD) gets
    405 AND a connection close — keeping it alive would desync the
    parser on the unread body bytes (they'd parse as the next
    request's method)."""
    from quasdb_spark.server import RawStoreServer

    srv = RawStoreServer().start()
    try:
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            r = _roundtrip(s, b"POST /x HTTP/1.1\r\nHost: h\r\n"
                              b"Content-Length: 5\r\n\r\nhello")
            assert r.startswith(b"HTTP/1.1 405")
            assert b"Connection: close" in r
            assert s.recv(65536) == b""  # server closed; no desync
    finally:
        srv.stop()


def test_head_static_reports_size_without_body(spark, tmp_path):
    """HEAD on a static file returns the true Content-Length with an
    empty body — the file is never read (stat only)."""
    from quasdb_spark.server import RawStoreServer

    www = tmp_path / "www"
    www.mkdir()
    (www / "big.txt").write_bytes(b"z" * 4096)
    srv = RawStoreServer(doc_root=str(www)).start()
    try:
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            s.sendall(b"HEAD /big.txt HTTP/1.1\r\nHost: h\r\n\r\n")
            buf = b""
            while b"\r\n\r\n" not in buf:
                buf += s.recv(65536)
            assert b"HTTP/1.1 200" in buf
            assert b"Content-Length: 4096" in buf
            head, _, rest = buf.partition(b"\r\n\r\n")
            assert rest == b""  # no body follows a HEAD reply
    finally:
        srv.stop()


def test_obs_fold_total_value_cap():
    """Folded continuation lines must count against MAX_HEADER_VALUE
    on the ACCUMULATED value, not per fold line — otherwise unlimited
    64KB-1 fold lines grow one header value without bound."""
    from quasdb_spark.httpparse import MAX_HEADER_VALUE

    p = RequestParser()
    res, _ = p.feed(b"GET / HTTP/1.1\r\nX-A: start\r\n")
    assert res is Result.INDETERMINATE
    # feed fold lines each under the per-line cap; the total must BAD
    chunk = b" " + b"v" * 32 * 1024 + b"\r\n"
    total, res = 0, Result.INDETERMINATE
    while total <= 4 * MAX_HEADER_VALUE:
        res, _ = p.feed(chunk)
        if res is Result.BAD:
            break
        total += len(chunk)
    assert res is Result.BAD
    # and the accumulated value never exceeded the cap + one line
    assert len(p.request.headers[-1][1]) <= MAX_HEADER_VALUE + len(chunk)


def test_obs_fold_within_cap_still_parses():
    p = RequestParser()
    res, _ = p.feed(b"GET / HTTP/1.1\r\nX-A: one\r\n two\r\n\tthree\r\n\r\n")
    assert res is Result.GOOD
    assert p.request.header("X-A") == "one two three"


def test_raw_server_get_with_body_closes_connection(spark, tmp_path):
    """A GET that advertises a body (Content-Length) must not keep
    the connection alive: the server never reads bodies, so the body
    bytes would desync the parser as the next request's head."""
    from quasdb_spark.server import RawStoreServer

    srv = RawStoreServer().start()
    try:
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            r = _roundtrip(s, b"GET /health HTTP/1.1\r\nHost: h\r\n"
                              b"Content-Length: 5\r\n\r\nhello")
            assert r.startswith(b"HTTP/1.1 200")
            assert b"Connection: close" in r
            assert s.recv(65536) == b""  # closed, body never misparsed
    finally:
        srv.stop()


def test_raw_server_content_length_zero_keeps_alive(spark, tmp_path):
    """'Content-Length: 0' leaves nothing unread, so clients that
    always emit it must keep their keep-alive connection."""
    from quasdb_spark.server import RawStoreServer

    srv = RawStoreServer().start()
    try:
        with socket.create_connection(("127.0.0.1", srv.port)) as s:
            r1 = _roundtrip(s, b"GET /health HTTP/1.1\r\nHost: h\r\n"
                               b"Content-Length: 0\r\n\r\n")
            assert r1.startswith(b"HTTP/1.1 200")
            assert b"Connection: keep-alive" in r1
            r2 = _roundtrip(s, b"GET /health HTTP/1.1\r\nHost: h\r\n\r\n")
            assert r2.startswith(b"HTTP/1.1 200")  # same connection
    finally:
        srv.stop()
