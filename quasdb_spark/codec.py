"""Key codecs — the engine's answer to the reference's pluggable
Comparator (kv/include/comparator.h:14-52; reverse-comparator test
double kv/test/table_test.cpp:41-71).

Arbitrary Python comparators can't run inside Catalyst at scale
(SURVEY.md §7.4 risk 4), so custom orderings are expressed as
ORDER-PRESERVING KEY CODECS: encode keys so that the desired order is
the natural string order, then every ordering operator (range scan,
reverse scan, seek, min/max, compaction sort) works unchanged and
entirely JVM-side. KVStore.create(..., codec=...) wires a codec into
the whole store: keys are stored encoded, so ordering follows the
codec everywhere the reference's comparator would apply (A4), and
results are decoded only at the API surface.

Provided codecs:
- IdentityCodec: bytewise/codepoint order (the reference default).
- ReverseCodec: total order reversed. Complements each code point and
  appends a high terminator so that a proper prefix sorts AFTER its
  extensions (memcmp-reversed semantics, including the shorter-key
  tie rule).
- u64 helpers: fixed-width numeric encoding (numeric order == string
  order), the classic time-series key trick.
"""

from __future__ import annotations

_TERM = "￿"  # sorts after every complemented char
_BASE = 0xFFFE
# UTF-16 surrogate block — unencodable in UTF-8, must never appear in
# an encoded key (it would make the key unstorable in Parquet/Spark)
_SUR_LO, _SUR_HI = 0xD800, 0xDFFF
_GAP = _SUR_HI - _SUR_LO + 1  # 0x800


class IdentityCodec:
    name = "identity"

    @staticmethod
    def encode(key: str) -> str:
        return key

    @staticmethod
    def decode(enc: str) -> str:
        return enc

    @staticmethod
    def encode_prefix(prefix: str) -> str:
        """Encoded-space prefix such that user-key k starts with
        ``prefix`` iff encode(k) starts with encode_prefix(prefix)."""
        return prefix


class ReverseCodec:
    """Reverse total order for code points < U+D800 (covers ASCII and
    most practical key alphabets).

    Complement mapping, skipping the surrogate block (ADVICE r1: the
    naive 0xFFFE - c lands code points U+1FFF..U+27FE inside
    U+D800..U+DFFF, producing lone surrogates that are not UTF-8
    encodable):

        c in [0x0000, 0x1FFE] -> 0xFFFE - c           in [0xE000, 0xFFFE]
        c in [0x1FFF, 0xD7FF] -> 0xFFFE - c - 0x800   in [0x1FFF, 0xD7FF]

    Strictly decreasing across the boundary (0x1FFE -> 0xE000,
    0x1FFF -> 0xD7FF), injective, and the codomain never touches the
    surrogate block or U+FFFF (reserved for the terminator).
    """

    name = "reverse"

    @staticmethod
    def _enc_cp(c: int) -> int:
        if c >= _SUR_LO:
            raise ValueError("ReverseCodec supports code points < U+D800")
        raw = _BASE - c
        return raw if raw > _SUR_HI else raw - _GAP

    @staticmethod
    def _dec_cp(e: int) -> int:
        return _BASE - e if e > _SUR_HI else _BASE - _GAP - e

    @classmethod
    def encode(cls, key: str) -> str:
        return "".join(chr(cls._enc_cp(ord(c))) for c in key) + _TERM

    @classmethod
    def decode(cls, enc: str) -> str:
        if not enc.endswith(_TERM):
            raise ValueError("not a ReverseCodec key")
        return "".join(chr(cls._dec_cp(ord(c))) for c in enc[:-1])

    @classmethod
    def encode_prefix(cls, prefix: str) -> str:
        """Per-char encoding WITHOUT the terminator: encode(k) starts
        with encode_prefix(p) iff k starts with p."""
        return "".join(chr(cls._enc_cp(ord(c))) for c in prefix)


CODECS: dict[str, type] = {c.name: c for c in (IdentityCodec, ReverseCodec)}
# codecs available in a FRESH interpreter without user registration —
# what an embedded worker process (RawStoreServer workers) can open
BUILTIN_CODECS = frozenset(CODECS)


def register_codec(cls: type, *, replace: bool = False) -> type:
    """Register a custom codec class under ``cls.name`` so stores
    created with it can be REOPENED: the manifest persists only the
    codec's name (comparator.h:20-24 — the reference likewise persists
    the comparator Name() and refuses to open a DB with a different
    one), so the class must be findable by name at ``KVStore.open``
    time. Usable as a decorator. Idempotent for the same class;
    refuses to silently shadow a different class unless ``replace``."""
    name = getattr(cls, "name", None)
    if not isinstance(name, str) or not name:
        raise ValueError("codec class needs a non-empty string `name`")
    for attr in ("encode", "decode"):
        if not callable(getattr(cls, attr, None)):
            raise ValueError(f"codec {name!r} must define {attr}()")
    if name in CODECS and CODECS[name] is not cls and not replace:
        raise ValueError(f"codec name {name!r} already registered to a "
                         "different class (pass replace=True to override)")
    CODECS[name] = cls
    return cls


def make_codec(name: str, encode, decode, *, encode_prefix=None,
               register: bool = True) -> type:
    """THE porting path for a custom comparator (A4,
    kv/include/comparator.h:14-52): instead of Compare(a, b), supply an
    ORDER-PRESERVING key transform — ``encode`` such that
    Compare(a, b) < 0 iff encode(a) < encode(b) codepoint-wise — plus
    its inverse ``decode``. The encode runs once per key at write time
    (Arrow-batched inside the ingest job); every ordering operator
    (range/reverse scan, seek, min/max, compaction sort) then runs
    entirely JVM-side on the encoded column, which is exactly where the
    reference invokes its comparator on every key visit. Check the
    transform against the original comparator with
    :func:`validate_codec`.

    ``encode_prefix`` (optional): encoded-space prefix function with
    the contract ``k.startswith(p) iff encode(k).startswith(
    encode_prefix(p))``; omit it and prefix scans on the store raise
    (range scans still work — not every ordering admits prefix
    commutation)."""
    if encode_prefix is None:
        def encode_prefix(prefix: str):  # noqa: ANN001
            raise NotImplementedError(
                f"codec {name!r} was built without encode_prefix; "
                "prefix scans are unavailable (use key_from/key_to "
                "range bounds instead)")
    cls = type(f"FunctionCodec_{name}", (), {
        "name": name,
        "encode": staticmethod(encode),
        "decode": staticmethod(decode),
        "encode_prefix": staticmethod(encode_prefix),
    })
    if register:
        register_codec(cls)
    return cls


def validate_codec(codec: type, compare, keys, *,
                   check_roundtrip: bool = True) -> int:
    """Evidence bridge for comparator ports: verify on a key sample
    that the codec agrees with the original comparator. For every pair
    (a, b) in ``keys``, sign(compare(a, b)) must equal the sign of the
    codepoint comparison of the encoded keys (Spark's string order —
    UTF-8 byte order — equals codepoint order, so this is exactly the
    order every store operator will use). Also checks
    decode(encode(k)) == k and that encoded keys are UTF-8-storable
    (no lone surrogates). Returns the number of pairs checked; raises
    ValueError naming the first offending pair. O(n²) pairs — meant
    for a representative sample, not a corpus."""
    ks = list(keys)
    enc = {}
    for k in ks:
        e = codec.encode(k)
        try:
            e.encode("utf-8")
        except UnicodeEncodeError as exc:
            raise ValueError(
                f"encode({k!r}) produced a non-UTF-8-storable string "
                f"({exc}); encoded keys must avoid the surrogate "
                "block") from None
        if check_roundtrip and codec.decode(e) != k:
            raise ValueError(f"decode(encode({k!r})) != {k!r}")
        enc[k] = e
    n = 0
    for i, a in enumerate(ks):
        for b in ks[i + 1:]:
            want = compare(a, b)
            want = (want > 0) - (want < 0)
            got = (enc[a] > enc[b]) - (enc[a] < enc[b])
            if want != got:
                raise ValueError(
                    f"order violation: compare({a!r}, {b!r}) sign is "
                    f"{want} but encoded order sign is {got}")
            n += 1
    return n


def encode_u64(n: int, width: int = 20) -> str:
    """Zero-padded decimal: numeric order == lexicographic order."""
    if n < 0:
        raise ValueError("unsigned only")
    return str(n).zfill(width)


def decode_u64(s: str) -> int:
    return int(s, 10)
