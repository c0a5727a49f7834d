"""Regex join: left string values matched against right-side patterns.

Mirrors /root/reference/src/rust/src/regex/mod.rs:7-63 — every right
pattern is compiled once (the reference builds one RegexSet; here the
compiled pattern list lives in actor state), each left value emits one
edge per matching pattern, an invalid pattern anywhere fails the whole
join, and ``ignore_case`` toggles case-insensitive compilation. NA on
either side never matches.

Divergence (documented): for multi-key regex joins the reference swaps
operands on keys 2..n (builds the regex from the LEFT value —
regex/mod.rs:93-109, flagged as a quirk in SURVEY.md §2.3); this engine
keeps the consistent orientation (left value, right pattern) on every
key.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..semantics import check_mode
from .modes import assemble, normalize_by
from .rowids import ensure_row_id
from .string_join import LID, RID


class RightPatternIndex:
    def __init__(self, patterns: np.ndarray, rids: np.ndarray, ignore_case: bool, rid_type=None):
        self.rid_type = rid_type  # arrow type: empty batches must emit typed ids
        import pyarrow.compute as pc

        flags = re.IGNORECASE if ignore_case else 0
        self.ignore_case = ignore_case
        # (pattern, compiled, rids, use_arrow): matching runs through Arrow's
        # vectorized RE2 kernel (match_substring_regex == unanchored search)
        # whenever RE2 accepts the pattern; Python-re-only syntax
        # (backreferences, lookaround) falls back to the per-value loop
        self.compiled: list[tuple[str, re.Pattern, np.ndarray, bool]] = []
        valid = [(p, rid) for p, rid in zip(patterns, rids) if p is not None]
        # one compiled regex per distinct pattern, with its row ids
        by_pattern: dict[str, list] = {}
        for p, rid in valid:
            by_pattern.setdefault(p, []).append(rid)
        probe = pa.array([], pa.string())
        for p, rids_p in by_pattern.items():
            try:
                cre = re.compile(p, flags)
            except re.error as e:
                raise ValueError(f"invalid regex pattern {p!r}: {e}") from e
            try:
                pc.match_substring_regex(probe, p, ignore_case=ignore_case)
                use_arrow = True
            except pa.ArrowInvalid:
                use_arrow = False
            self.compiled.append((p, cre, np.asarray(rids_p), use_arrow))


class BroadcastRegexScorer:
    def __init__(self, index_ref, cfg: dict):
        self.idx: RightPatternIndex = ray.get(index_ref)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cfg = self.cfg
        col = batch.column(cfg["left_key"])
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lids = batch.column(cfg["lid"]).to_numpy(zero_copy_only=False)
        pos = np.nonzero(pc.is_valid(col).to_numpy(zero_copy_only=False))[0]
        sarr = col.take(pa.array(pos, pa.int64()))
        svals: list | None = None  # materialized lazily for re-only patterns

        lid_parts: list[np.ndarray] = []
        rid_parts: list[np.ndarray] = []
        for p, cre, rids_p, use_arrow in self.idx.compiled:
            if use_arrow:
                hit = pc.match_substring_regex(
                    sarr, p, ignore_case=self.idx.ignore_case
                ).to_numpy(zero_copy_only=False)
            else:
                if svals is None:
                    svals = sarr.to_pylist()
                hit = np.fromiter(
                    (cre.search(v) is not None for v in svals), bool, count=len(svals)
                )
            hpos = pos[hit]
            if len(hpos):
                lid_parts.append(np.repeat(lids[hpos], len(rids_p)))
                rid_parts.append(np.tile(rids_p, len(hpos)))
        if lid_parts:
            out_l = np.concatenate(lid_parts)
            out_r = np.concatenate(rid_parts)
        else:
            out_l = lids[:0]
            out_r = self.idx.compiled[0][2][:0] if self.idx.compiled else np.empty(0, np.int64)
        return pa.table(
            {
                LID: pa.array(out_l, type=batch.schema.field(cfg["lid"]).type),
                RID: pa.array(out_r, type=self.idx.rid_type),
            }
        )


def fuzzy_regex_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by=None,
    *,
    how: str = "inner",
    ignore_case: bool = False,
    left_id: str | None = None,
    right_id: str | None = None,
    num_partitions: int = 16,
    concurrency=(1, 8),
    batch_size: int = 16384,
) -> rd.Dataset:
    """Ray-Data analog of ``fozzie_regex_join``
    (/root/reference/R/fozzie_regex_join.R:36-49)."""
    check_mode(how)
    by = normalize_by(by, left, right)
    left, lid = ensure_row_id(left, left_id, "__fj_lid_src")
    right, rid = ensure_row_id(right, right_id, "__fj_rid_src")

    rcols = [rid, by[0][1]]
    tables = list(
        right.select_columns(rcols).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    rt = pa.concat_tables(tables)
    index = RightPatternIndex(
        rt.column(by[0][1]).to_numpy(zero_copy_only=False),
        rt.column(rid).to_numpy(zero_copy_only=False),
        ignore_case,
        rid_type=rt.schema.field(rid).type,
    )
    index_ref = ray.put(index)
    cfg = {"left_key": by[0][0], "lid": lid}
    edges = left.select_columns([lid, by[0][0]]).map_batches(
        BroadcastRegexScorer,
        fn_constructor_args=(index_ref, cfg),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return assemble(
        left,
        right,
        edges,
        how=how,
        lid=lid,
        rid=rid,
        distance_cols=[],
        num_partitions=num_partitions,
        drop_ids=["__fj_lid_src", "__fj_rid_src"],
        n_dist=0,
    )
