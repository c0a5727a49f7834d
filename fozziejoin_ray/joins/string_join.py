"""Fuzzy string joins: fozziejoin semantics on Ray Data.

Two physical plans, chosen by ``strategy``:

- ``broadcast`` (default when the right side is small): the dedup'd right
  key index is built once, ``ray.put`` once, and read by an actor pool
  that streams left batches through vectorized scoring — the distributed
  analog of the reference's one-sided in-memory index design
  (/root/reference/src/rust/src/string/edit/mod.rs:32-48, utils.rs:7-20).
  The left side streams with backpressure; nothing materializes it.
- ``blocked`` (both sides large, or self-join): recall-complete block
  keys (blocking/strategies.py) are emitted per side, shuffled with one
  ``groupby(block_key)``, and candidate pairs are scored inside
  ``map_groups`` — see blocked.py.

Matching semantics (shared with the reference):

- a pair matches iff ``dist <= max_distance`` (inclusive);
- NA never matches anything (semantics.py);
- value-level dedup before scoring, row fanout after (utils.rs:7-20);
- multi-key ``by`` = AND of per-key thresholds under one shared
  ``max_distance``, per-key distance columns
  (string/mod.rs:95-127, merge/mod.rs:104-117);
- the jaccard refine pass is *set*-based while the first pass is
  counted — a reference quirk we reproduce (ngram/jaccard.rs:84-93).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..kernels.soundex import soundex_na_dual
from ..kernels.strdist import get_qgrams, jaccard_set_batch, score_pairs
from ..semantics import canon_method, check_mode, distance_col_names
from .modes import assemble, normalize_by
from .rowids import ensure_row_id, exceeds_rows

LID = "__fj_lid"
RID = "__fj_rid"


def refine_score(method: str, a: list, b: list, *, q: int, max_prefix: int, prefix_weight: float):
    """Pairwise re-scoring for by-keys 2..n (reference compare_pairs path)."""
    if canon_method(method) == "jaccard":
        return jaccard_set_batch(a, b, q)
    return score_pairs(method, a, b, q=q, max_prefix=max_prefix, prefix_weight=prefix_weight)


def dist_names(k: int) -> list[str]:
    return [f"__fj_d{i}" for i in range(k)]


class RightStringIndex:
    """Dedup'd right-side key index + method-specific candidate structure.

    Built on the driver from the (small) right table, broadcast once via
    ``ray.put``, shared read-only by every scorer actor.
    """

    def __init__(
        self,
        key_values: np.ndarray,
        rids: np.ndarray,
        extra: dict[str, np.ndarray],
        method: str,
        max_distance: float,
        q: int,
        rid_type: "pa.DataType | None" = None,
    ):
        self.method = canon_method(method)
        self.max_distance = max_distance
        self.q = q
        self.rids = rids
        self.rid_type = rid_type  # arrow type: empty batches must emit typed ids
        self.extra = extra

        uval_rows: dict[str, list[int]] = defaultdict(list)
        for i, v in enumerate(key_values):
            if v is not None:
                uval_rows[v].append(i)
        self.uvals: list[str] = list(uval_rows)
        self.uval_rows: list[np.ndarray] = [
            np.asarray(uval_rows[v], dtype=np.int64) for v in self.uvals
        ]

        m = self.method
        if m in ("levenshtein", "osa", "damerau_levensthein", "lcs", "hamming"):
            self.window = 0 if m == "hamming" else int(max_distance)
            self.by_len: dict[int, list[int]] = defaultdict(list)
            for i, v in enumerate(self.uvals):
                self.by_len[len(v)].append(i)
        elif m in ("qgram", "cosine", "jaccard"):
            self.gram_index: dict[str, list[int]] = defaultdict(list)
            self.small: list[int] = []
            self.allpairs = m in ("cosine", "jaccard") and max_distance >= 1.0
            for i, v in enumerate(self.uvals):
                prof = get_qgrams(v, q)
                for g in prof:
                    self.gram_index[g].append(i)
                if m == "qgram" and sum(prof.values()) <= max_distance:
                    self.small.append(i)
        elif m == "soundex":
            self.by_code: dict[str, list[int]] = defaultdict(list)
            for i, v in enumerate(self.uvals):
                primary, alt = soundex_na_dual(v)
                codes = {primary} if alt is None else {primary, alt}
                for c in codes:
                    self.by_code[c].append(i)
        # jaro_winkler: full scan of self.uvals (reference scans all pairs,
        # jaro_winkler.rs:26-33)

    def candidates(self, lval: str) -> list[int]:
        m = self.method
        if m in ("levenshtein", "osa", "damerau_levensthein", "lcs", "hamming"):
            l = len(lval)
            out: list[int] = []
            for ln in range(max(0, l - self.window), l + self.window + 1):
                out.extend(self.by_len.get(ln, ()))
            return out
        if m in ("qgram", "cosine", "jaccard"):
            if self.allpairs:
                return list(range(len(self.uvals)))
            prof = get_qgrams(lval, self.q)
            seen: set[int] = set()
            for g in prof:
                seen.update(self.gram_index.get(g, ()))
            if m == "qgram":
                seen.update(self.small)
            return sorted(seen)
        if m == "soundex":
            primary, alt = soundex_na_dual(lval)
            codes = {primary} if alt is None else {primary, alt}
            seen = set()
            for c in codes:
                seen.update(self.by_code.get(c, ()))
            return sorted(seen)
        return list(range(len(self.uvals)))  # jaro_winkler


class BroadcastStringScorer:
    """Actor-pool stage: streams left batches against the broadcast right
    index; emits the match-edge table (lid, rid, per-key distances)."""

    def __init__(self, index_ref, cfg: dict):
        self.idx: RightStringIndex = ray.get(index_ref) if not isinstance(
            index_ref, RightStringIndex
        ) else index_ref
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        idx = self.idx
        by = cfg["by"]
        method = idx.method
        maxd = idx.max_distance
        lkey0 = by[0][0]

        lvals = batch.column(lkey0).to_numpy(zero_copy_only=False)
        lids = batch.column(cfg["lid"]).to_numpy(zero_copy_only=False)

        # batch-level value dedup (reference dedups the whole frame;
        # same result, scoring cost amortized per batch here)
        lu_rows: dict[str, list[int]] = defaultdict(list)
        for i, v in enumerate(lvals):
            if v is not None:
                lu_rows[v].append(i)

        pair_l: list[str] = []
        pair_r: list[str] = []
        pair_lu: list[str] = []
        pair_ru: list[int] = []
        for lval in lu_rows:
            for rui in idx.candidates(lval):
                pair_l.append(lval)
                pair_r.append(idx.uvals[rui])
                pair_lu.append(lval)
                pair_ru.append(rui)

        empty = self._empty_result(batch, cfg)
        if not pair_l:
            return empty

        d0 = score_pairs(
            method,
            pair_l,
            pair_r,
            q=idx.q,
            max_prefix=cfg["max_prefix"],
            prefix_weight=cfg["prefix_weight"],
        )
        keep = d0 <= maxd
        if not keep.any():
            return empty

        # fan out surviving unique-value pairs to row pairs
        lrow_parts: list[np.ndarray] = []
        rrow_parts: list[np.ndarray] = []
        d0_parts: list[np.ndarray] = []
        for k in np.nonzero(keep)[0]:
            lr = np.asarray(lu_rows[pair_lu[k]], dtype=np.int64)
            rr = idx.uval_rows[pair_ru[k]]
            nl, nr = len(lr), len(rr)
            lrow_parts.append(np.repeat(lr, nr))
            rrow_parts.append(np.tile(rr, nl))
            d0_parts.append(np.full(nl * nr, d0[k]))
        lrow = np.concatenate(lrow_parts)
        rrow = np.concatenate(rrow_parts)
        dists = [np.concatenate(d0_parts)]

        # multi-key AND refinement (string/mod.rs:95-127)
        for lkey, rkey in by[1:]:
            lv = batch.column(lkey).to_numpy(zero_copy_only=False)[lrow]
            rv = idx.extra[rkey][rrow]
            ok = np.fromiter(
                ((a is not None and b is not None) for a, b in zip(lv, rv)),
                bool,
                count=len(lv),
            )
            dk = np.full(len(lv), np.inf)
            if ok.any():
                ii = np.nonzero(ok)[0]
                dk[ii] = refine_score(
                    method,
                    [lv[i] for i in ii],
                    [rv[i] for i in ii],
                    q=idx.q,
                    max_prefix=cfg["max_prefix"],
                    prefix_weight=cfg["prefix_weight"],
                )
            keep2 = dk <= maxd
            lrow = lrow[keep2]
            rrow = rrow[keep2]
            dists = [d[keep2] for d in dists] + [dk[keep2]]
            if not len(lrow):
                return empty

        cols: dict[str, pa.Array] = {
            LID: pa.array(lids[lrow]),
            RID: pa.array(idx.rids[rrow], type=idx.rid_type),
        }
        for name, d in zip(dist_names(len(by)), dists):
            cols[name] = pa.array(d, type=pa.float64())
        return pa.table(cols)

    def _empty_result(self, batch: pa.Table, cfg: dict) -> pa.Table:
        lid_type = batch.schema.field(cfg["lid"]).type
        rid_type = self.idx.rid_type or pa.int64()
        cols = {
            LID: pa.array([], type=lid_type),
            RID: pa.array([], type=rid_type),
        }
        for name in dist_names(len(cfg["by"])):
            cols[name] = pa.array([], type=pa.float64())
        return pa.table(cols)


def _collect_right(right: rd.Dataset, cols: list[str]) -> pa.Table:
    tables = [
        t if isinstance(t, pa.Table) else pa.Table.from_batches([t])
        for t in right.select_columns(cols).iter_batches(batch_size=None, batch_format="pyarrow")
    ]
    if not tables:
        return pa.table({c: pa.array([], type=pa.null()) for c in cols})
    return pa.concat_tables(tables)


def build_edges_lsh(
    left: rd.Dataset,
    right: rd.Dataset,
    by: list[tuple[str, str]],
    method: str,
    max_distance: float,
    q: int,
    max_prefix: int,
    prefix_weight: float,
    lid: str,
    rid: str,
    *,
    num_partitions: int = 32,
    num_perm: int = 64,
    bands: int = 64,
    shingle_k: int = 2,
) -> rd.Dataset:
    """Two-table LSH-blocked edges (see fuzzy_string_join strategy='lsh').
    Both sides emit banded-MinHash buckets over their key's shingles; the
    within-bucket left x right cross products are verified with the exact
    string kernel; edges that met in several bands dedup once. jw rides
    the recall-lossless SWAR char-bound prefilter.

    Default 64 bands x 1 row: a pair is missed only if NO single minhash
    agrees — miss probability (1-j)^64, i.e. < 1e-9 even at shingle
    jaccard 0.3 (short keys within small edit distances sit well above
    that). One-row bands admit more junk candidates than multi-row
    bands, but the prefilter + vectorized kernel make verification the
    cheap side of the trade at join selectivities."""
    from ..kernels.strdist import score_pairs
    from ..pipelines.dedup import lsh_fused_edges
    from ..pipelines.linkage import JaroCharBoundFilter

    lkey, rkey = by[0]

    def score_fn(a_list, b_list):
        d = score_pairs(
            method, list(a_list), list(b_list),
            q=q, max_prefix=max_prefix, prefix_weight=prefix_weight,
        )
        keep = d <= max_distance
        return keep, d[keep]

    scored = lsh_fused_edges(
        left.select_columns([lid, lkey]),
        lkey,
        lid,
        score_fn,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        num_partitions=num_partitions,
        prefilter=(
            JaroCharBoundFilter(max_distance) if method == "jaro_winkler" else None
        ),
        right=right.select_columns([rid, rkey]),
        right_text_col=rkey,
        right_id_col=rid,
    )
    return scored.map_batches(
        lambda t: pa.table({LID: t["a"], RID: t["b"], "__fj_d0": t["score"]}),
        batch_format="pyarrow",
    )


def build_edges_broadcast(
    left: rd.Dataset,
    right: rd.Dataset,
    by: list[tuple[str, str]],
    method: str,
    max_distance: float,
    q: int,
    max_prefix: int,
    prefix_weight: float,
    lid: str,
    rid: str,
    *,
    concurrency=(1, 8),
    batch_size: int = 8192,
) -> rd.Dataset:
    right_cols = [rid] + sorted({r for _, r in by})
    rt = _collect_right(right, right_cols)
    key0 = by[0][1]
    extra = {
        r: rt.column(r).to_numpy(zero_copy_only=False) for _, r in by[1:]
    }
    index = RightStringIndex(
        rt.column(key0).to_numpy(zero_copy_only=False),
        rt.column(rid).to_numpy(zero_copy_only=False),
        extra,
        method,
        max_distance,
        q,
        rid_type=rt.schema.field(rid).type,
    )
    index_ref = ray.put(index)
    cfg = {
        "by": by,
        "lid": lid,
        "max_prefix": max_prefix,
        "prefix_weight": prefix_weight,
    }
    left_cols = [lid] + sorted({l for l, _ in by})
    return left.select_columns(left_cols).map_batches(
        BroadcastStringScorer,
        fn_constructor_args=(index_ref, cfg),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def fuzzy_string_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by=None,
    *,
    method: str = "levenshtein",
    how: str = "inner",
    max_distance: float = 1.0,
    q: int = 2,
    distance_col: str | None = None,
    max_prefix: int = 0,
    prefix_weight: float = 0.0,
    left_id: str | None = None,
    right_id: str | None = None,
    strategy: str = "auto",
    broadcast_limit: int = 2_000_000,
    num_partitions: int = 16,
    validate_ids: bool = False,
) -> rd.Dataset:
    """Ray-Data-native analog of ``fozzie_string_join``
    (/root/reference/R/fozzie_string_join.R:59-77): join `left` and `right`
    where the string distance between the ``by`` key(s) is at most
    ``max_distance`` (inclusive), assembling the requested join mode with
    ``.x``/``.y`` suffixes on colliding names and optional distance
    column(s).
    """
    check_mode(how)
    method = canon_method(method)
    by = normalize_by(by, left, right)
    if strategy == "auto":
        strategy = "blocked" if exceeds_rows(right, broadcast_limit) else "broadcast"
    left, lid = ensure_row_id(left, left_id, "__fj_lid_src", validate_ids=validate_ids)
    right, rid = ensure_row_id(right, right_id, "__fj_rid_src", validate_ids=validate_ids)

    if strategy == "broadcast":
        edges = build_edges_broadcast(
            left, right, by, method, max_distance, q, max_prefix, prefix_weight, lid, rid
        )
    elif strategy == "blocked":
        from .blocked import build_edges_blocked

        edges = build_edges_blocked(
            left,
            right,
            by,
            method,
            max_distance,
            q,
            max_prefix,
            prefix_weight,
            lid,
            rid,
        )
    elif strategy == "lsh":
        # Two-huge-tables path for all-pairs metrics (jw, or any method
        # when the exact strategy's candidate space is prohibitive):
        # banded-MinHash buckets over key shingles generate candidates,
        # the exact kernel verifies dist <= max_distance. APPROXIMATE —
        # a matching pair is missed only if no band agrees (vanishing
        # for the high shingle overlap small string distances imply);
        # every emitted edge is exact (kernel-verified). Single-key only.
        if len(by) != 1:
            raise ValueError("strategy='lsh' supports exactly one by key pair")
        edges = build_edges_lsh(
            left, right, by, method, max_distance, q, max_prefix, prefix_weight, lid, rid,
            num_partitions=num_partitions,
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    return assemble(
        left,
        right,
        edges,
        how=how,
        lid=lid,
        rid=rid,
        distance_cols=distance_col_names(distance_col, by),
        num_partitions=num_partitions,
        drop_ids=[c for c in ("__fj_lid_src", "__fj_rid_src")],
        n_dist=len(by),
    )
