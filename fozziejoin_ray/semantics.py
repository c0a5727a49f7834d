"""Shared threshold / NA / epsilon semantics (single source of truth).

Mirrors the reference's matching rules so every operator agrees:

- A pair matches iff ``dist <= max_distance`` (inclusive), cf.
  /root/reference/src/rust/src/string/edit/levenshtein.rs:31.
- Difference joins add one machine epsilon to the threshold, cf.
  /root/reference/src/rust/src/difference/mod.rs:28.
- Real-interval queries expand by ``maxgap + INTERVAL_EPS`` with
  INTERVAL_EPS = 1e-6, cf. /root/reference/src/rust/src/interval/real.rs:79.
- NA/null on a join key never matches anything, including another NA,
  cf. /root/reference/README.md:214. Null-key rows still appear as
  unmatched rows in left/right/full/anti output.
- Unmatched padding for distance columns is NaN, cf.
  /root/reference/src/rust/src/merge/left.rs:63.
"""

from __future__ import annotations

import numpy as np

# f64::EPSILON in Rust == np.finfo(np.float64).eps
F64_EPS: float = float(np.finfo(np.float64).eps)

# epsilon used by the reference when expanding real-interval queries
INTERVAL_EPS: float = 1e-6

JOIN_MODES = ("inner", "left", "right", "full", "anti", "semi")

STRING_METHODS = (
    "levenshtein",
    "osa",
    "damerau_levensthein",  # reference spelling, see joinmethod.rs:147-182
    "hamming",
    "lcs",
    "qgram",
    "cosine",
    "jaccard",
    "jaro_winkler",
    "soundex",
)

# method aliases, cf. /root/reference/src/rust/src/string/joinmethod.rs:147-182
METHOD_ALIASES = {
    "lv": "levenshtein",
    "dl": "damerau_levensthein",
    "damerau_levenshtein": "damerau_levensthein",
    "jw": "jaro_winkler",
}


def canon_method(method: str) -> str:
    m = METHOD_ALIASES.get(method, method)
    if m not in STRING_METHODS:
        raise ValueError(
            f"unknown string-distance method {method!r}; "
            f"expected one of {STRING_METHODS} or aliases {tuple(METHOD_ALIASES)}"
        )
    return m


def check_mode(how: str) -> str:
    if how not in JOIN_MODES:
        raise ValueError(f"unknown join mode {how!r}; expected one of {JOIN_MODES}")
    return how


def distance_col_names(distance_col: str | None, by: list[tuple[str, str]]) -> list[str]:
    """Distance-column naming: single key -> ``distance_col``; multi-key ->
    ``{distance_col}_{leftcol}_{rightcol}`` per key pair, cf.
    /root/reference/src/rust/src/merge/mod.rs:104-117."""
    if distance_col is None:
        return []
    if len(by) == 1:
        return [distance_col]
    return [f"{distance_col}_{l}_{r}" for l, r in by]
