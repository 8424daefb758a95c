"""Hypothesis property tests for the pure-Python invariants the whole
ordering machinery rests on (no SparkSession needed — fast)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from quasdb_spark.codec import ReverseCodec, decode_u64, encode_u64
from quasdb_spark.store import prefix_successor

keys = st.text(alphabet=st.characters(min_codepoint=0x20, max_codepoint=0xD7FF),
               max_size=24)


@given(keys, keys)
@settings(max_examples=300)
def test_reverse_codec_inverts_order(a, b):
    ea, eb = ReverseCodec.encode(a), ReverseCodec.encode(b)
    assert (a < b) == (ea > eb)
    assert (a == b) == (ea == eb)
    assert ReverseCodec.decode(ea) == a


@given(keys.filter(lambda s: s != ""), keys)
@settings(max_examples=300)
def test_prefix_successor_bounds(prefix, suffix):
    succ = prefix_successor(prefix)
    assert succ is not None and succ > prefix
    # every string with the prefix is < successor
    assert (prefix + suffix) < succ


@given(st.integers(min_value=0, max_value=10**19 - 1),
       st.integers(min_value=0, max_value=10**19 - 1))
@settings(max_examples=200)
def test_u64_codec_order(a, b):
    ea, eb = encode_u64(a), encode_u64(b)
    assert (a < b) == (ea < eb)
    assert decode_u64(ea) == a


# ---------------------------------------------------------------- httpparse

_token = st.text(
    alphabet=st.sampled_from(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_"),
    min_size=1, max_size=12)
_uri = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E,
                           exclude_characters=" "),
    min_size=1, max_size=40)
_hval = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    max_size=40).map(lambda s: s.strip())
_headers = st.lists(st.tuples(_token, _hval), max_size=6)


@given(_token, _uri, _headers, st.randoms())
@settings(max_examples=200, deadline=None)
def test_httpparse_roundtrip_any_split(method, uri, headers, rnd):
    """Any serialized request head parses back to exactly (method,
    uri, headers) REGARDLESS of how the bytes are split into feed()
    calls — the incremental-parser contract the raw server relies on
    (reference request_parser.h: parse() consumes per byte)."""
    from quasdb_spark.httpparse import RequestParser, Result

    raw = (f"{method} {uri} HTTP/1.1\r\n"
           + "".join(f"{k}: {v}\r\n" for k, v in headers)
           + "\r\n").encode("latin-1")
    # random split points
    cuts = sorted(rnd.sample(range(1, len(raw)), min(5, len(raw) - 1)))
    parts = [raw[a:b] for a, b in zip([0] + cuts, cuts + [len(raw)])]
    p = RequestParser()
    consumed = 0
    for part in parts[:-1]:
        res, used = p.feed(part)
        consumed += used
        if res is Result.GOOD:
            break
    else:
        res, used = p.feed(parts[-1])
        consumed += used
    assert res is Result.GOOD
    assert consumed == len(raw)
    assert p.request.method == method
    assert p.request.uri == uri
    assert p.request.headers == headers
    assert (p.request.version_major, p.request.version_minor) == (1, 1)


# ------------------------------------------------------------- chunk bounds


@given(st.integers(0, 400), st.integers(2, 64), st.integers(0, 63),
       st.integers(0, 10**6))
@settings(max_examples=200, deadline=None)
def test_chunk_boundary_math_reassembles(n_tokens, max_tokens, overlap,
                                         seed):
    """Pure re-statement of chunk_by_tokens' boundary math (chunk i =
    tokens[i*stride : i*stride+max]): chunks cover the doc exactly,
    each chunk has 1..max tokens, consecutive chunks share exactly
    ``overlap`` tokens, and dropping each chunk's overlap prefix
    reassembles the doc byte-for-byte. The Spark implementation is
    pinned to this same formula by the suite oracle + unit tests."""
    if overlap >= max_tokens:
        return
    import math as m

    stride = max_tokens - overlap
    words = [f"w{seed}_{i}" for i in range(n_tokens)] or [""]
    n = len(words)
    n_chunks = max(1, m.ceil((n - overlap) / stride))
    chunks = [words[i * stride: i * stride + max_tokens]
              for i in range(n_chunks)]
    assert all(1 <= len(c) <= max_tokens for c in chunks)
    for a, b in zip(chunks, chunks[1:]):
        assert a[-overlap:] == b[:overlap] if overlap else True
    rebuilt = list(chunks[0])
    for c in chunks[1:]:
        rebuilt += c[overlap:]
    assert rebuilt == words
    # no chunk starts past the end (the ceil bound is tight)
    assert (n_chunks - 1) * stride < n


def test_driver_memory_default_is_host_sized():
    """ADVICE r12: the local-mode driver heap default derives from the
    host's RAM (min(24g, ~40% MemTotal), floor 2g) — never a constant
    that invites OOM-kill on small hosts."""
    import re

    from quasdb_spark.session import _driver_memory_default

    v = _driver_memory_default()
    m = re.fullmatch(r"(\d+)g", v)
    assert m, v
    assert 2 <= int(m.group(1)) <= 24


def test_local_scratch_default_precedence():
    """r15: shuffle scratch defaults to RAM-backed /dev/shm in LOCAL
    mode only (contended shared disks turn shuffle writes into 10-60x
    stalls; guide §2.1), and every explicit setting wins over it:
    spark.local.dir in conf, SPARK_LOCAL_DIRS env, or the
    SPARK_GRAFT_LOCAL_DIR override."""
    from quasdb_spark.session import _local_scratch_default

    # non-local master: never touched, cluster managers own scratch
    assert _local_scratch_default("yarn", {}, environ={}) is None
    assert _local_scratch_default("spark://h:7077", {}, environ={}) is None
    # explicit conf wins
    assert _local_scratch_default(
        "local[4]", {"spark.local.dir": "/x"}, environ={}) is None
    # standard Spark env wins
    assert _local_scratch_default(
        "local[4]", {}, environ={"SPARK_LOCAL_DIRS": "/y"}) is None
    # project override redirects the choice verbatim
    assert _local_scratch_default(
        "local[4]", {}, environ={"SPARK_GRAFT_LOCAL_DIR": "/z"}) == "/z"
    # default: /dev/shm-backed when present with headroom, else None —
    # both outcomes legal depending on the host, but a non-None result
    # must live under /dev/shm
    got = _local_scratch_default("local[4]", {}, environ={})
    assert got is None or got.startswith("/dev/shm/")
