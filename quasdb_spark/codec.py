"""Key codecs — the engine's answer to the reference's pluggable
Comparator (kv/include/comparator.h:14-52; reverse-comparator test
double kv/test/table_test.cpp:41-71).

Arbitrary Python comparators can't run inside Catalyst at scale
(SURVEY.md §7.4 risk 4), so custom orderings are expressed as
ORDER-PRESERVING KEY CODECS: encode keys so that the desired order is
the natural string order, then every ordering operator (range scan,
reverse scan, seek, min/max, compaction sort) works unchanged and
entirely JVM-side.

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


class IdentityCodec:
    name = "identity"

    @staticmethod
    def encode(key: str) -> str:
        return key

    @staticmethod
    def decode(enc: str) -> str:
        return enc


class ReverseCodec:
    """Reverse total order for code points < U+D800 (covers ASCII and
    most practical key alphabets; complemented chars land in
    U+F800-U+FFFE, clear of the surrogate block)."""

    name = "reverse"

    @staticmethod
    def encode(key: str) -> str:
        for c in key:
            if ord(c) >= 0xD800:
                raise ValueError("ReverseCodec supports code points < U+D800")
        return "".join(chr(_BASE - ord(c)) for c in key) + _TERM

    @staticmethod
    def decode(enc: str) -> str:
        if not enc.endswith(_TERM):
            raise ValueError("not a ReverseCodec key")
        return "".join(chr(_BASE - ord(c)) for c in enc[:-1])


def encode_u64(n: int, width: int = 20) -> str:
    """Zero-padded decimal: numeric order == lexicographic order."""
    if n < 0:
        raise ValueError("unsigned only")
    return str(n).zfill(width)


def decode_u64(s: str) -> int:
    return int(s, 10)
