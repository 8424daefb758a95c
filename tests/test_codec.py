"""Custom-ordering codec tests (the reference's reverse-comparator
matrix, kv/test/table_test.cpp:41-71,438-460) + torn-commit recovery
(log-reader drop semantics: an uncommitted data dir is invisible)."""

import os
import random

from quasdb_spark.codec import (IdentityCodec, ReverseCodec, decode_u64,
                                encode_u64)
from quasdb_spark.store import KVStore


def test_reverse_codec_order_properties():
    rng = random.Random(11)
    keys = ["", "a", "ab", "abc", "b", "key000001", "key0000010", "zzz"]
    keys += ["".join(rng.choice("abcxyz019:/") for _ in range(rng.randrange(1, 12)))
             for _ in range(200)]
    enc = {k: ReverseCodec.encode(k) for k in keys}
    # order is exactly reversed, including prefix ties ("ab" before "a")
    assert sorted(keys, key=lambda k: enc[k]) == sorted(keys, reverse=True)
    # round trip
    assert all(ReverseCodec.decode(e) == k for k, e in enc.items())


def test_store_scan_under_reverse_codec(spark, tmp_path):
    """All scan semantics hold under the alternate ordering: a forward
    scan over encoded keys is a reverse scan over logical keys."""
    st = KVStore.create(spark, str(tmp_path / "rev"))
    rng = random.Random(5)
    state = {}
    for _ in range(3):
        ops = []
        for _ in range(30):
            k = f"k{rng.randrange(20):03d}"
            if rng.random() < 0.2:
                ops.append(("del", ReverseCodec.encode(k), None))
                state.pop(k, None)
            else:
                v = f"v{rng.randrange(100)}"
                ops.append(("put", ReverseCodec.encode(k), v))
                state[k] = v
        st.write_batch(ops)

    got = [(ReverseCodec.decode(r["key"]), r["value"])
           for r in st.scan().collect()]
    assert got == sorted(state.items(), reverse=True)

    # range scan in encoded space = logical (lo, hi] reversed
    lo, hi = "k005", "k015"
    enc_from, enc_to = ReverseCodec.encode(hi), ReverseCodec.encode(lo)
    got_rng = [(ReverseCodec.decode(r["key"]), r["value"])
               for r in st.scan(enc_from, enc_to).collect()]
    expect = sorted(((k, v) for k, v in state.items() if lo < k <= hi),
                    reverse=True)
    assert got_rng == expect


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
