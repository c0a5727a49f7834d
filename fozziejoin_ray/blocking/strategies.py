"""Recall-complete blocking strategies for distributed fuzzy string joins.

A strategy maps each key value to a set of block keys such that every pair
within ``max_distance`` shares at least one block, and defines an in-group
rule (``pair_ok``) that (a) enforces any residual validity check and (b)
dedups pairs that meet in more than one block, so every candidate pair is
scored exactly once across the whole shuffle.

Generalizes the reference's in-memory candidate generation:

- length window for edit distances (|len(a)-len(b)| <= d lower bound),
  cf. /root/reference/src/rust/src/string/edit/mod.rs:35-48;
- shared-q-gram inverted index for q-gram-family distances,
  cf. /root/reference/src/rust/src/string/ngram/jaccard.rs:118-158
  (extended here with the short-string block that the reference's
  all-pairs qgram scan covers implicitly);
- soundex dual codes, cf. soundex.rs:153-206;
- salted cross/triangle partitioning for methods the reference scans
  all-pairs (jaro-winkler), so the cross product distributes.

Completeness notes per method (inclusive threshold ``dist <= maxd``):

- lv/osa/dl/lcs: dist >= |len(a)-len(b)|, so a length window of
  ``floor(maxd)`` is recall-complete. hamming: unequal lengths never
  match -> window 0.
- jaccard (counted) & cosine: two values sharing no q-gram (or with an
  empty profile on either side) have distance exactly 1.0, so for
  maxd < 1 the shared-gram blocks are recall-complete; maxd >= 1
  degenerates to all-pairs and falls back to :class:`AllPairs`.
- qgram: values sharing no gram have dist = cnt(a)+cnt(b); pairs with
  cnt(a)+cnt(b) <= maxd are covered by the ``__small__`` block holding
  every value with cnt <= maxd.
- soundex: every clause of the match rule equates one code of each
  side, so sharing >= 1 dual code is necessary.
"""

from __future__ import annotations

import zlib

from functools import lru_cache

from ..kernels.soundex import soundex_na_dual
from ..kernels.strdist import get_qgrams
from ..semantics import canon_method

_cached_qgrams = lru_cache(maxsize=262144)(get_qgrams)

SMALL_BLOCK = "__small__"


def _stable_hash(s) -> int:
    return zlib.crc32(repr(s).encode())


class LengthWindow:
    """Block on right value's char length; left probes the +/-d window.
    Self-join: each value covers [len-d, len]; shared blocks are deduped by
    scoring only at block min(len_a, len_b)."""

    def __init__(self, max_distance: float, exact: bool = False):
        self.d = 0 if exact else int(max_distance)

    def emit(self, value: str, side: str) -> list[str]:
        l = len(value)
        if side == "right":
            return [f"L{l}"]
        if side == "left":
            return [f"L{m}" for m in range(max(0, l - self.d), l + self.d + 1)]
        return [f"L{m}" for m in range(max(0, l - self.d), l + 1)]  # self

    def pair_ok(self, va: str, vb: str, bk: str, selfjoin: bool) -> bool:
        la, lb = len(va), len(vb)
        if abs(la - lb) > self.d:
            return False
        if selfjoin:
            return bk == f"L{min(la, lb)}"
        return bk == f"L{lb}"  # meets only in right's home block anyway


class GramBlocks:
    """One block per distinct q-gram; pairs scored only in their smallest
    shared gram's block. ``with_small`` adds the short-string block needed
    for the qgram (count-L1) metric."""

    def __init__(self, q: int, max_distance: float, with_small: bool):
        self.q = q
        self.small_limit = max_distance if with_small else -1.0

    def _grams(self, value: str):
        return _cached_qgrams(value, self.q)

    def emit(self, value: str, side: str) -> list[str]:
        prof = self._grams(value)
        keys = [f"G{g}" for g in prof]
        if self.small_limit >= 0 and sum(prof.values()) <= self.small_limit:
            keys.append(SMALL_BLOCK)
        return keys

    def pair_ok(self, va: str, vb: str, bk: str, selfjoin: bool) -> bool:
        shared = sorted(set(self._grams(va)) & set(self._grams(vb)))
        if bk == SMALL_BLOCK:
            return not shared
        return bool(shared) and bk == f"G{shared[0]}"


class SoundexBlocks:
    def emit(self, value: str, side: str) -> list[str]:
        primary, alt = soundex_na_dual(value)
        keys = {primary} if alt is None else {primary, alt}
        return [f"S{k}" for k in sorted(keys)]

    def pair_ok(self, va: str, vb: str, bk: str, selfjoin: bool) -> bool:
        pa_, aa = soundex_na_dual(va)
        pb, ab = soundex_na_dual(vb)
        ca = {pa_} if aa is None else {pa_, aa}
        cb = {pb} if ab is None else {pb, ab}
        # the reference match rule (soundex.rs:49-53) == sharing >= 1 code
        match = (
            pa_ == pb
            or aa == pb
            or ab == pa_
            or (aa is not None and ab is not None and aa == ab)
        )
        shared = sorted(ca & cb)
        return match and bool(shared) and bk == f"S{shared[0]}"


class AllPairs:
    """Salted cross (two-table) / triangle (self-join) partitioning of the
    full cross product, for methods without a recall-safe key (jw). Each
    left value lands in ``sr`` blocks, each right value in ``sl``; a pair
    meets in exactly one block."""

    def __init__(self, sl: int = 1, sr: int = 1):
        self.sl = max(1, sl)
        self.sr = max(1, sr)

    def emit(self, value: str, side: str) -> list[str]:
        h = _stable_hash(value)
        if side == "left":
            i = h % self.sl
            return [f"X{i}_{j}" for j in range(self.sr)]
        if side == "right":
            j = h % self.sr
            return [f"X{i}_{j}" for i in range(self.sl)]
        # self-join triangle: k = sl salts
        s = h % self.sl
        return [f"X{min(s, t)}_{max(s, t)}" for t in range(self.sl)]

    def pair_ok(self, va: str, vb: str, bk: str, selfjoin: bool) -> bool:
        if not selfjoin:
            return True  # cross grid: a pair meets only in (left salt, right salt)
        # Self-join triangle: two values with the SAME salt s co-occur in
        # every block X{min(s,t)}_{max(s,t)} — restrict every pair (not just
        # identical values) to the single block named by both salts, i.e.
        # same-salt pairs score only on the diagonal.
        sa = _stable_hash(va) % self.sl
        sb = _stable_hash(vb) % self.sl
        return bk == f"X{min(sa, sb)}_{max(sa, sb)}"


def strategy_for(
    method: str,
    max_distance: float,
    q: int,
    *,
    allpairs_salts: tuple[int, int] = (1, 1),
):
    method = canon_method(method)
    if method in ("levenshtein", "osa", "damerau_levensthein", "lcs"):
        return LengthWindow(max_distance)
    if method == "hamming":
        return LengthWindow(max_distance, exact=True)
    if method == "qgram":
        return GramBlocks(q, max_distance, with_small=True)
    if method in ("cosine", "jaccard"):
        if max_distance >= 1.0:
            return AllPairs(*allpairs_salts)
        return GramBlocks(q, max_distance, with_small=False)
    if method == "soundex":
        return SoundexBlocks()
    if method == "jaro_winkler":
        return AllPairs(*allpairs_salts)
    raise AssertionError(method)
