"""Incremental HTTP/1.x request parser (reference H1 parity:
http_server/request_parser.{h,cpp} — a byte-at-a-time state machine
returning good/bad/indeterminate plus how much input it consumed, and
http_server/request.h — the parsed-request record).

Semantics mirrored from the reference, re-expressed as idiomatic
Python rather than a char-switch translation:

- ``feed(data)`` may be called with ANY split of the request bytes
  (one byte at a time, or several pipelined requests in one buffer);
  it returns ``(result, n_consumed)`` where result is GOOD as soon as
  one complete head (request line + headers + blank line) is parsed,
  BAD on the first protocol violation, INDETERMINATE if more bytes
  are needed. Unconsumed bytes after GOOD are the start of the next
  pipelined request — the caller re-feeds them after ``reset()``.
- Strict token validation: control characters and HTTP tspecials are
  rejected in the method and header names; CTLs are rejected in the
  URI; the version must literally be ``HTTP/<digits>.<digits>``.
- Header continuation lines (obs-fold: a line starting with SP/HTAB
  appends to the previous header's value) are accepted, matching the
  reference's ``header_lws`` state.
- Bodies are out of scope exactly as in the reference: its server
  routes GET/HEAD only and its parser stops at the blank line.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class Result(enum.Enum):
    GOOD = "good"
    BAD = "bad"
    INDETERMINATE = "indeterminate"


@dataclass
class Request:
    """Parsed request head (request.h parity)."""

    method: str = ""
    uri: str = ""
    version_major: int = 0
    version_minor: int = 0
    headers: list[tuple[str, str]] = field(default_factory=list)

    def header(self, name: str, default: str | None = None) -> str | None:
        """Case-insensitive single-header lookup (first match)."""
        lname = name.lower()
        for k, v in self.headers:
            if k.lower() == lname:
                return v
        return default

    @property
    def keep_alive(self) -> bool:
        """Connection persistence per RFC 9112 defaults: HTTP/1.1
        persists unless ``close`` appears in the Connection option
        list; HTTP/1.0 closes unless ``keep-alive`` does. Connection
        is a comma-separated token LIST ("close, TE" must close), so
        membership, not string equality."""
        opts = {t.strip() for t in
                (self.header("Connection") or "").lower().split(",")}
        if (self.version_major, self.version_minor) >= (1, 1):
            return "close" not in opts
        return "keep-alive" in opts


_TSPECIALS = set(b'()<>@,;:\\"/[]?={} \t')

# Field-size caps: a peer that never sends the terminating SP/CRLF
# must hit BAD, not grow a buffer without bound (the raw server feeds
# this parser straight off the socket). Generous for real traffic.
MAX_METHOD = 64
MAX_URI = 64 * 1024
MAX_HEADER_NAME = 256
MAX_HEADER_VALUE = 64 * 1024
MAX_HEADERS = 100


def _is_ctl(b: int) -> bool:
    return b < 32 or b == 127


def _is_token_char(b: int) -> bool:
    return 32 < b < 127 and b not in _TSPECIALS


class _S(enum.Enum):
    METHOD_START = enum.auto()
    METHOD = enum.auto()
    URI = enum.auto()
    VERSION = enum.auto()        # collecting "HTTP/<maj>.<min>"
    LINE_LF = enum.auto()        # after the request-line CR
    HEADER_START = enum.auto()   # start of a header line
    HEADER_LWS = enum.auto()     # continuation-line whitespace
    HEADER_NAME = enum.auto()
    HEADER_SPACE = enum.auto()   # after ':', skipping leading SP/HTAB
    HEADER_VALUE = enum.auto()
    HEADER_LF = enum.auto()      # after a header line's CR
    FINAL_LF = enum.auto()       # after the blank line's CR


class RequestParser:
    """Byte-incremental request-head parser. One instance per
    connection; ``reset()`` between pipelined requests."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.request = Request()
        self._state = _S.METHOD_START
        self._buf = bytearray()
        self._name = ""
        self._version = bytearray()
        self._fold = False

    def feed(self, data: bytes) -> tuple[Result, int]:
        """Consume bytes until one request head completes or fails.
        Returns (result, n_consumed); with GOOD, ``self.request`` is
        the parsed head and ``data[n_consumed:]`` belongs to the next
        request."""
        for i, b in enumerate(data):
            r = self._consume(b)
            if r is not Result.INDETERMINATE:
                return r, i + 1
        return Result.INDETERMINATE, len(data)

    # ------------------------------------------------------------------
    def _consume(self, b: int) -> Result:
        s = self._state
        req = self.request
        if s is _S.METHOD_START:
            if not _is_token_char(b):
                return Result.BAD
            self._buf.append(b)
            self._state = _S.METHOD
        elif s is _S.METHOD:
            if b == 0x20:  # SP
                req.method = self._buf.decode("ascii")
                self._buf.clear()
                self._state = _S.URI
            elif _is_token_char(b) and len(self._buf) < MAX_METHOD:
                self._buf.append(b)
            else:
                return Result.BAD
        elif s is _S.URI:
            if b == 0x20:
                if not self._buf:
                    return Result.BAD
                req.uri = self._buf.decode("latin-1")
                self._buf.clear()
                self._state = _S.VERSION
            elif _is_ctl(b) or len(self._buf) >= MAX_URI:
                return Result.BAD
            else:
                self._buf.append(b)
        elif s is _S.VERSION:
            if b == 0x0D:  # CR ends the request line
                try:
                    text = self._version.decode("ascii")
                    proto, ver = text.split("/", 1)
                    maj, minor = ver.split(".", 1)
                    if proto != "HTTP" or not maj.isdigit() \
                            or not minor.isdigit():
                        return Result.BAD
                    req.version_major = int(maj)
                    req.version_minor = int(minor)
                except ValueError:
                    return Result.BAD
                self._version.clear()
                self._state = _S.LINE_LF
            elif _is_ctl(b) or len(self._version) > 16:
                return Result.BAD
            else:
                self._version.append(b)
        elif s is _S.LINE_LF:
            if b != 0x0A:
                return Result.BAD
            self._state = _S.HEADER_START
        elif s is _S.HEADER_START:
            if b == 0x0D:  # blank line: head complete after LF
                self._state = _S.FINAL_LF
            elif b in (0x20, 0x09):  # obs-fold continuation
                if not req.headers:
                    return Result.BAD
                self._state = _S.HEADER_LWS
            elif _is_token_char(b):
                if len(req.headers) >= MAX_HEADERS:
                    return Result.BAD
                self._buf.append(b)
                self._state = _S.HEADER_NAME
            else:
                return Result.BAD
        elif s is _S.HEADER_LWS:
            if b in (0x20, 0x09):
                pass  # swallow leading fold whitespace
            elif b == 0x0D:
                self._state = _S.HEADER_LF
            elif _is_ctl(b):
                return Result.BAD
            else:
                # folded continuation appends to the previous value.
                # The size cap applies to the ACCUMULATED value, not
                # the per-line buffer — otherwise unlimited fold lines
                # grow one header value without bound.
                name, value = req.headers[-1]
                if len(value) + 2 > MAX_HEADER_VALUE:
                    return Result.BAD
                req.headers[-1] = (name, value + " " + chr(b))
                self._state = _S.HEADER_VALUE
                self._fold = True
                return Result.INDETERMINATE
        elif s is _S.HEADER_NAME:
            if b == 0x3A:  # ':'
                self._name = self._buf.decode("ascii")
                self._buf.clear()
                self._state = _S.HEADER_SPACE
            elif _is_token_char(b) and len(self._buf) < MAX_HEADER_NAME:
                self._buf.append(b)
            else:
                return Result.BAD
        elif s is _S.HEADER_SPACE:
            if b in (0x20, 0x09):
                pass
            elif b == 0x0D:
                req.headers.append((self._name, ""))
                self._state = _S.HEADER_LF
            elif _is_ctl(b):
                return Result.BAD
            else:
                self._buf.append(b)
                self._state = _S.HEADER_VALUE
                self._fold = False
        elif s is _S.HEADER_VALUE:
            if b == 0x0D:
                if self._fold:
                    name, value = self.request.headers[-1]
                    req.headers[-1] = (
                        name, value + self._buf.decode("latin-1"))
                else:
                    req.headers.append(
                        (self._name, self._buf.decode("latin-1")))
                self._buf.clear()
                self._state = _S.HEADER_LF
            elif _is_ctl(b) or len(self._buf) + (
                    len(req.headers[-1][1]) if self._fold else 0
            ) >= MAX_HEADER_VALUE:
                return Result.BAD
            else:
                self._buf.append(b)
        elif s is _S.HEADER_LF:
            if b != 0x0A:
                return Result.BAD
            self._state = _S.HEADER_START
        elif s is _S.FINAL_LF:
            return Result.GOOD if b == 0x0A else Result.BAD
        return Result.INDETERMINATE
