"""National-Archives soundex with dual encoding for surname prefixes.

Behavioral spec: /root/reference/src/rust/src/string/soundex.rs —
``soundex_na`` (:104-151), ``soundex_na_dual`` (:153-206, prefix handling
for De/La/Van/... with camel-case splitting :209-226), and the match rule
(:49-53): two names match iff primary==primary, alt_l==primary_r,
alt_r==primary_l, or alt_l==alt_r (both present). Distance is always 0.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

_DIGIT = {}
for _chars, _d in (
    ("BFPV", "1"),
    ("CGJKQSXZ", "2"),
    ("DT", "3"),
    ("L", "4"),
    ("MN", "5"),
    ("R", "6"),
):
    for _c in _chars:
        _DIGIT[_c] = _d

_PREFIXES = frozenset(
    ["DE", "LA", "LE", "VAN", "VON", "DI", "O", "CON", "BIN", "ABU", "AL", "SAN", "SANTA"]
)


def soundex_na(s: str) -> str:
    """cf. soundex.rs:104-151 (filter ascii-alpha, uppercase, dedupe codes
    with the last_was_ignored vowel-reset rule, truncate/pad to 4)."""
    chars = [c.upper() for c in s if c.isascii() and c.isalpha()]
    if not chars:
        return "0000"
    first = chars[0]
    result = [first]
    last_digit = _DIGIT.get(first, "0")
    last_was_ignored = False
    for c in chars[1:]:
        digit = _DIGIT.get(c, "0")
        if digit == "0":
            last_was_ignored = True
            continue
        if digit != last_digit or last_was_ignored:
            result.append(digit)
            last_digit = digit
        last_was_ignored = False
    code = "".join(result)[:4]
    return code + "0" * (4 - len(code))


def _split_double_capitals(s: str) -> list[str]:
    """Split camel-case like VanDeusen -> [Van, Deusen]; consecutive
    capitals are not split, cf. soundex.rs:209-226."""
    chars = list(s)
    tokens = []
    start = 0
    for i in range(1, len(chars)):
        if chars[i - 1].isupper() and chars[i].isupper():
            continue
        if chars[i].isupper() and chars[i - 1].islower():
            tokens.append("".join(chars[start:i]))
            start = i
    tokens.append("".join(chars[start:]))
    return tokens


@lru_cache(maxsize=65536)
def soundex_na_dual(name: str) -> tuple[str, str | None]:
    """(primary, alt) codes, cf. soundex.rs:153-206."""
    cleaned = "".join(c for c in name if (c.isascii() and c.isalpha()) or c.isspace())
    tokens = [
        t.upper()
        for part in cleaned.split()
        for t in _split_double_capitals(part)
        if t and all(c.isascii() and c.isalpha() for c in t)
    ]
    prefix_parts: list[str] = []
    root = None
    for token in tokens:
        if root is None and token in _PREFIXES:
            prefix_parts.append(token)
        elif root is None:
            root = token
    primary = soundex_na(root if root is not None else name.upper())
    alt = soundex_na(" ".join(prefix_parts)) if prefix_parts else None
    return primary, alt


def soundex_match(l: str, r: str) -> bool:
    sx_l, alt_l = soundex_na_dual(l)
    sx_r, alt_r = soundex_na_dual(r)
    return (
        sx_l == sx_r
        or alt_l == sx_r
        or alt_r == sx_l
        or (alt_l is not None and alt_r is not None and alt_l == alt_r)
    )


def soundex_match_pairs(a: list[str], b: list[str]) -> np.ndarray:
    """0.0 where the dual-code rule matches, inf otherwise."""
    return np.fromiter(
        (0.0 if soundex_match(x, y) else float("inf") for x, y in zip(a, b)),
        np.float64,
        count=len(a),
    )


def block_codes(s: str) -> list[str]:
    """Blocking keys for distributed soundex joins: both codes of the dual
    encoding. Two names can only match if they share at least one code
    (every clause of the match rule equates one of each side's codes)."""
    primary, alt = soundex_na_dual(s)
    return [primary] if alt is None or alt == primary else [primary, alt]
