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
