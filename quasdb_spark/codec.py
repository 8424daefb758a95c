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


def encode_u64(n: int, width: int = 20) -> str:
    """Zero-padded decimal: numeric order == lexicographic order."""
    if n < 0:
        raise ValueError("unsigned only")
    return str(n).zfill(width)


def decode_u64(s: str) -> int:
    return int(s, 10)
