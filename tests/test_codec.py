"""Custom-ordering codec tests (the reference's reverse-comparator
matrix, kv/test/table_test.cpp:41-71,438-460) + torn-commit recovery
(log-reader drop semantics: an uncommitted data dir is invisible)."""

import os
import random

from quasdb_spark.codec import (IdentityCodec, ReverseCodec, decode_u64,
                                encode_u64)
from quasdb_spark.store import KVStore


def test_reverse_codec_order_properties():
    """Property test over the FULL supported code-point range
    [U+0000, U+D7FF] (ADVICE r1: the naive complement mapped
    U+1FFF..U+27FE onto lone surrogates — unencodable in UTF-8)."""
    rng = random.Random(11)
    keys = ["", "a", "ab", "abc", "b", "key000001", "key0000010", "zzz"]
    keys += ["".join(rng.choice("abcxyz019:/") for _ in range(rng.randrange(1, 12)))
             for _ in range(200)]
    # full-range keys, deliberately covering the old surrogate trap
    # (U+1FFF..U+27FE), the mapping boundary pair, and high code points
    keys += [chr(0x1FFE), chr(0x1FFF), chr(0x2000), chr(0x27FE),
             chr(0x27FF), chr(0xD7FF),
             chr(0x1FFF) + "A", chr(0x27FE) + "zz", "a" + chr(0x2192)]
    keys += ["".join(chr(rng.randrange(0xD800)) for _ in range(rng.randrange(1, 8)))
             for _ in range(300)]
    enc = {k: ReverseCodec.encode(k) for k in keys}
    # every encoded key is UTF-8 encodable (no lone surrogates)
    for e in enc.values():
        e.encode("utf-8")
    # order is exactly reversed, including prefix ties ("ab" before "a")
    assert sorted(set(keys), key=lambda k: enc[k]) == sorted(set(keys), reverse=True)
    # round trip
    assert all(ReverseCodec.decode(e) == k for k, e in enc.items())


def test_store_wired_reverse_codec(spark, tmp_path):
    """A4: the codec is a store property (KVStore.create(codec=...)),
    applied to put/get/scan/prefix/compaction ordering — the
    comparator-changes-everything semantics of the reference
    (kv/include/comparator.h:14-52; reverse double,
    kv/test/table_test.cpp:41-71). Randomized scan mirrors a dict
    oracle sorted with the reversed order."""
    st = KVStore.create(spark, str(tmp_path / "rev"), codec=ReverseCodec)
    rng = random.Random(5)
    state = {}
    for _ in range(3):
        ops = []
        for _ in range(30):
            k = f"k{rng.randrange(20):03d}"
            if rng.random() < 0.2:
                ops.append(("del", k, None))
                state.pop(k, None)
            else:
                v = f"v{rng.randrange(100)}"
                ops.append(("put", k, v))
                state[k] = v
        st.write_batch(ops)

    # forward scan = codec order = reversed natural order
    got = [(r["key"], r["value"]) for r in st.scan().collect()]
    assert got == sorted(state.items(), reverse=True)
    # reverse scan = natural order
    got_rev = [(r["key"], r["value"]) for r in st.scan(reverse=True).collect()]
    assert got_rev == sorted(state.items())

    # range bounds are in COMPARATOR order: from k015 down to k005 excl
    got_rng = [(r["key"], r["value"])
               for r in st.scan("k015", "k005").collect()]
    expect = sorted(((k, v) for k, v in state.items() if "k005" < k <= "k015"),
                    reverse=True)
    assert got_rng == expect

    # prefix scan commutes with the per-char codec
    got_pfx = [r["key"] for r in st.scan(prefix="k01").collect()]
    assert got_pfx == sorted((k for k in state if k.startswith("k01")),
                             reverse=True)

    # point ops
    some = next(iter(sorted(state)))
    assert st.get(some) == state[some]
    assert st.get("nope") is None
    assert st.multi_get(list(state)[:5]) == {k: state[k] for k in list(state)[:5]}

    # codec survives reopen (persisted in the manifest schema)
    st2 = KVStore.open(spark, str(tmp_path / "rev"))
    assert st2.codec is ReverseCodec

    # compaction sorts/ranges in encoded space; state is invariant
    st2.compact()
    got_after = [(r["key"], r["value"]) for r in st2.scan().collect()]
    assert got_after == sorted(state.items(), reverse=True)


def test_reverse_codec_bulk_ingest(spark, tmp_path):
    """Bulk DataFrame ingest under a codec encodes keys in the job
    (Arrow-batched), so stored order == codec order."""
    st = KVStore.create(spark, str(tmp_path / "bulk"), codec=ReverseCodec)
    df = spark.createDataFrame([(f"k{i:02d}", str(i)) for i in range(20)],
                               "key string, value string")
    st.ingest(df)
    got = [r["key"] for r in st.scan(limit=5).collect()]
    assert got == [f"k{i:02d}" for i in (19, 18, 17, 16, 15)]
    # cursor iteration pages correctly through encoded space
    assert [k for k, _ in st.scan_iter(page_size=7)] == \
        [f"k{i:02d}" for i in range(19, -1, -1)]


def test_binary_with_codec_rejected(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        KVStore.create(spark, str(tmp_path / "bad"), binary=True,
                       codec=ReverseCodec)


def test_u64_codec():
    ns = [0, 1, 9, 10, 11, 99, 12345678901234567890 % 10**19]
    encs = [encode_u64(n) for n in ns]
    assert sorted(encs) == [encode_u64(n) for n in sorted(ns)]
    assert all(decode_u64(e) == n for e, n in zip(encs, ns))


def test_torn_commit_invisible_and_vacuumed(spark, tmp_path):
    """Crash between data write and manifest commit: the orphan dir is
    invisible to reads and removed by vacuum (RemoveObsoleteFiles,
    kv/db/db_impl.cpp:248-320; WAL torn-tail drop,
    kv/db/log_reader.cpp:114-190)."""
    st = KVStore.create(spark, str(tmp_path / "torn"))
    st.put("a", "1")
    # simulate: a batch's data landed but its manifest commit didn't
    orphan = os.path.join(st.path, "data", "b999999999999999-deadbeef")
    df = spark.createDataFrame([("ghost", 999, 0, "put", "boo")],
                               "key string, seq long, sub long, op string, value string")
    df.write.parquet(orphan)
    assert st.get("ghost") is None
    assert [r["key"] for r in st.scan().collect()] == ["a"]
    removed = st.manifest.vacuum()
    assert any("b999999999999999" in p for p in removed)
    assert not os.path.exists(orphan)
    assert st.get("a") == "1"


def _version_compare(a: str, b: str) -> int:
    ta = tuple(int(p) for p in a.split("."))
    tb = tuple(int(p) for p in b.split("."))
    return (ta > tb) - (ta < tb)


def _make_version_codec(register=True):
    from quasdb_spark.codec import make_codec

    return make_codec(
        "version",
        encode=lambda k: ".".join(p.zfill(8) for p in k.split(".")),
        decode=lambda e: ".".join(str(int(p)) for p in e.split(".")),
        register=register,
    )


def test_make_codec_comparator_port(spark, tmp_path):
    """A4 porting path: a user with a custom C++ comparator
    (kv/include/comparator.h:14-52) re-expresses Compare() as an
    order-preserving encode via make_codec, proves equivalence with
    validate_codec, and gets every ordering operator (scan, reverse,
    range, seek-limit, compaction) in comparator order — here a
    version-number ordering where '1.2.10' > '1.2.9' (lexicographic
    order gets this wrong, so the test is discriminating)."""
    import pytest

    from quasdb_spark.codec import CODECS, validate_codec

    ver = _make_version_codec()
    try:
        rng = random.Random(7)
        keys = list({f"{rng.randrange(3)}.{rng.randrange(12)}.{rng.randrange(30)}"
                     for _ in range(120)})
        keys += ["1.2", "1.2.0", "1.2.9", "1.2.10", "10.0", "9.9.9"]
        keys = sorted(set(keys))
        # the bridge: codec order == comparator order, proven on sample
        n_pairs = validate_codec(ver, _version_compare, keys)
        assert n_pairs == len(keys) * (len(keys) - 1) // 2

        st = KVStore.create(spark, str(tmp_path / "ver"), codec=ver)
        rng.shuffle(keys)
        st.write_batch([("put", k, f"v-{k}") for k in keys])
        st.write_batch([("del", "1.2.9", None)])
        live = sorted((k for k in keys if k != "1.2.9"),
                      key=lambda k: tuple(int(p) for p in k.split(".")))

        got = [r["key"] for r in st.scan().collect()]
        assert got == live
        # the discriminating pair: 1.2.10 after 1.2.9's neighbors, not
        # between 1.2.1 and 1.2.2 as plain string order would put it
        assert got != sorted(live)

        got_rev = [r["key"] for r in st.scan(reverse=True, limit=3).collect()]
        assert got_rev == live[::-1][:3]

        # range bounds [from, to) in comparator order
        got_rng = [r["key"] for r in st.scan("1.2", "2.0").collect()]
        assert got_rng == [k for k in live
                           if _version_compare(k, "1.2") >= 0
                           and _version_compare(k, "2.0") < 0]

        # no encode_prefix supplied -> prefix scans raise, ranges fine
        with pytest.raises(NotImplementedError):
            st.scan(prefix="1.")

        # compaction sorts in encoded space; state invariant
        st.compact()
        assert [r["key"] for r in st.scan().collect()] == live

        # reopen in a fresh process that forgot to register: LookupError
        del CODECS["version"]
        with pytest.raises(LookupError):
            KVStore.open(spark, str(tmp_path / "ver"))
        # after registering, reopen works and order persists
        ver2 = _make_version_codec()
        st2 = KVStore.open(spark, str(tmp_path / "ver"))
        assert st2.codec is ver2
        assert [r["key"] for r in st2.scan(limit=4).collect()] == live[:4]
    finally:
        CODECS.pop("version", None)


def test_validate_codec_catches_wrong_port():
    """validate_codec rejects a BROKEN port: plain identity encoding is
    not order-preserving for the version comparator ('1.10' < '1.9'
    lexicographically but > numerically) — and names the pair."""
    import pytest

    from quasdb_spark.codec import make_codec, validate_codec

    bad = make_codec("bad_version", encode=lambda k: k, decode=lambda e: e,
                     register=False)
    with pytest.raises(ValueError, match="order violation"):
        validate_codec(bad, _version_compare, ["1.9", "1.10", "2.0"])


def test_register_codec_guards():
    import pytest

    from quasdb_spark.codec import CODECS, make_codec, register_codec

    a = make_codec("dupname", encode=str, decode=str, register=True)
    try:
        # same class again: idempotent
        register_codec(a)
        b = make_codec("dupname", encode=str, decode=str, register=False)
        with pytest.raises(ValueError, match="already registered"):
            register_codec(b)
        register_codec(b, replace=True)
        assert CODECS["dupname"] is b
    finally:
        CODECS.pop("dupname", None)

    class NoName:
        encode = staticmethod(str)
        decode = staticmethod(str)

    with pytest.raises(ValueError):
        register_codec(NoName)
