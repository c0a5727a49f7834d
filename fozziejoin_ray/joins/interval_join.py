"""Interval-overlap joins (real and integer/IRanges semantics).

Predicate spec (exact mirror of the reference):

- real mode (/root/reference/src/rust/src/interval/real.rs:90-121):
  ``gap = rs-le if le<rs else ls-re if re<ls else 0``;
  ``overlap_len = max(min(le,re) - max(ls,rs), 0)``;
  match iff gap <= maxgap and overlap_len >= minoverlap and the
  overlap_type predicate holds (any / within / start / end,
  interval/mod.rs:6-24). Queries are expanded by ``maxgap + 1e-6``
  (real.rs:79-88) so touching intervals match at maxgap=0.
- integer mode (interval/integer.rs:96-139, IRanges semantics):
  inclusive endpoints; ``gap`` counted in integer space
  (``rs-le-1`` / ``ls-re-1``) so [1,2] and [3,4] touch at maxgap=0;
  ``overlap_len = min(le,re) - max(ls,rs) + 1``.
- ``interval_mode="auto"`` infers integer iff all four key columns are
  integer-typed (/root/reference/R/fozzie_interval_join.R:60-70).
- start > end anywhere is an error (real.rs:47-63).
- No distance columns (lib.rs:201-204).

Physical plan: right intervals broadcast once; an actor pool streams
left batches and evaluates the predicates as chunked vectorized numpy
over the full right set — the distributed analog of the reference's
shared interval tree. (For two huge sides, tile-partition the number
line and apply the same predicates per tile; the predicates here are
the single source of truth.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..semantics import check_mode
from .modes import assemble, normalize_by
from .rowids import ensure_row_id
from .string_join import LID, RID

OVERLAP_TYPES = ("any", "within", "start", "end")
_INT_TYPES = {pa.int8(), pa.int16(), pa.int32(), pa.int64()}


def interval_matches(
    ls: np.ndarray,
    le: np.ndarray,
    rs: np.ndarray,
    re: np.ndarray,
    *,
    mode: str,
    overlap_type: str,
    maxgap: float,
    minoverlap: float,
) -> np.ndarray:
    """Boolean (n_left, n_right) match matrix for broadcasted interval
    arrays; single source of truth for both physical plans."""
    LS = ls[:, None]
    LE = le[:, None]
    RS = rs[None, :]
    RE = re[None, :]
    if mode == "integer":
        gap = np.where(LE < RS, RS - LE - 1, np.where(RE < LS, LS - RE - 1, 0))
        ov = np.minimum(LE, RE) - np.maximum(LS, RS) + 1
    else:
        gap = np.where(LE < RS, RS - LE, np.where(RE < LS, LS - RE, 0.0))
        ov = np.maximum(np.minimum(LE, RE) - np.maximum(LS, RS), 0.0)
    keep = (gap <= maxgap) & (ov >= minoverlap)
    if overlap_type == "within":
        keep &= (LS >= RS - maxgap) & (LE <= RE + maxgap)
    elif overlap_type == "start":
        keep &= np.abs(LS - RS) <= maxgap
    elif overlap_type == "end":
        keep &= np.abs(LE - RE) <= maxgap
    return keep


def interval_matches_flat(
    ls: np.ndarray,
    le: np.ndarray,
    rs: np.ndarray,
    re: np.ndarray,
    *,
    mode: str,
    overlap_type: str,
    maxgap: float,
    minoverlap: float,
) -> np.ndarray:
    """Boolean mask over aligned candidate pairs (1-D arrays); same
    predicates as :func:`interval_matches`."""
    if mode == "integer":
        gap = np.where(le < rs, rs - le - 1, np.where(re < ls, ls - re - 1, 0))
        ov = np.minimum(le, re) - np.maximum(ls, rs) + 1
    else:
        gap = np.where(le < rs, rs - le, np.where(re < ls, ls - re, 0.0))
        ov = np.maximum(np.minimum(le, re) - np.maximum(ls, rs), 0.0)
    keep = (gap <= maxgap) & (ov >= minoverlap)
    if overlap_type == "within":
        keep &= (ls >= rs - maxgap) & (le <= re + maxgap)
    elif overlap_type == "start":
        keep &= np.abs(ls - rs) <= maxgap
    elif overlap_type == "end":
        keep &= np.abs(le - re) <= maxgap
    return keep


class RightIntervalIndex:
    """Right intervals sorted by start, with the max interval length, so a
    left query [ls-g, le+g] prunes to the start window
    [ls - g - max_len, le + g] via two searchsorted probes — the
    vectorized stand-in for the reference's interval tree
    (/root/reference/src/rust/src/interval/real.rs:68-88)."""

    def __init__(self, rs: np.ndarray, re: np.ndarray, rids: np.ndarray):
        order = np.argsort(rs, kind="stable")
        self.rs = rs[order]
        self.re = re[order]
        self.rids = rids[order]
        self.max_len = float((re - rs).max()) if len(rs) else 0.0


def _concat_ranges(lo: np.ndarray, counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.repeat(lo, counts)
    offsets = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    return starts + offsets


class BroadcastIntervalScorer:
    def __init__(self, index_ref, cfg: dict):
        self.idx: RightIntervalIndex = ray.get(index_ref)
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        idx = self.idx
        skey, ekey = cfg["left_start"], cfg["left_end"]
        ls = np.asarray(batch.column(skey).cast(pa.float64()).to_numpy(zero_copy_only=False))
        le = np.asarray(batch.column(ekey).cast(pa.float64()).to_numpy(zero_copy_only=False))
        if np.any(ls > le):  # NaN comparisons are False, so NA rows pass through unmatched
            raise ValueError("Invalid interval in left table: start > end")
        lids = batch.column(cfg["lid"]).to_numpy(zero_copy_only=False)

        g = cfg["maxgap"] + (0.0 if cfg["mode"] == "integer" else 1e-6)
        slack = 1.0 if cfg["mode"] == "integer" else 0.0
        # candidates: right starts within [ls - g - max_len - slack, le + g + slack]
        lo = np.searchsorted(idx.rs, ls - g - idx.max_len - slack, side="left")
        hi = np.searchsorted(idx.rs, le + g + slack, side="right")
        nan_mask = np.isnan(ls) | np.isnan(le)
        lo[nan_mask] = 0
        hi[nan_mask] = 0
        counts = np.maximum(hi - lo, 0)
        lrow = np.repeat(np.arange(len(ls)), counts)
        rpos = _concat_ranges(lo, counts)
        keep = interval_matches_flat(
            ls[lrow],
            le[lrow],
            idx.rs[rpos],
            idx.re[rpos],
            mode=cfg["mode"],
            overlap_type=cfg["overlap_type"],
            maxgap=cfg["maxgap"],
            minoverlap=cfg["minoverlap"],
        )
        lrow = lrow[keep]
        rpos = rpos[keep]
        return pa.table(
            {
                LID: pa.array(lids[lrow]),
                RID: pa.array(idx.rids[rpos]),
            }
        )


def fuzzy_interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by=None,
    *,
    how: str = "inner",
    overlap_type: str = "any",
    maxgap: float = 0.0,
    minoverlap: float = 0.0,
    interval_mode: str = "auto",
    left_id: str | None = None,
    right_id: str | None = None,
    num_partitions: int = 16,
    concurrency=(1, 8),
    batch_size: int = 16384,
    drop_cols: tuple = (),
) -> rd.Dataset:
    """Ray-Data analog of ``fozzie_interval_join``
    (/root/reference/R/fozzie_interval_join.R:47-83)."""
    check_mode(how)
    if overlap_type not in OVERLAP_TYPES:
        raise ValueError(f"Unknown overlap type: {overlap_type}")
    if interval_mode not in ("auto", "real", "integer"):
        raise ValueError(f"unknown interval_mode {interval_mode!r}")
    by = normalize_by(by, left, right)
    if len(by) != 2:
        raise ValueError("Expected exactly two columns for interval matching (start and end)")

    if interval_mode == "auto":
        lsch = left.schema()
        rsch = right.schema()
        ltypes = {dict(zip(lsch.names, lsch.types))[l] for l, _ in by}
        rtypes = {dict(zip(rsch.names, rsch.types))[r] for _, r in by}
        interval_mode = (
            "integer" if (ltypes | rtypes) <= _INT_TYPES else "real"
        )

    left, lid = ensure_row_id(left, left_id, "__fj_lid_src")
    right, rid = ensure_row_id(right, right_id, "__fj_rid_src")

    rcols = [rid, by[0][1], by[1][1]]
    tables = list(
        right.select_columns(rcols).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    rt = pa.concat_tables(tables)
    rs = np.asarray(rt.column(by[0][1]).cast(pa.float64()).to_numpy(zero_copy_only=False))
    re = np.asarray(rt.column(by[1][1]).cast(pa.float64()).to_numpy(zero_copy_only=False))
    if np.any(rs > re):
        bad = int(np.nonzero(rs > re)[0][0]) + 1
        raise ValueError(f"Invalid interval in df2 at row {bad}: start > end")
    index_ref = ray.put(
        RightIntervalIndex(rs, re, rt.column(rid).to_numpy(zero_copy_only=False))
    )
    cfg = {
        "left_start": by[0][0],
        "left_end": by[1][0],
        "lid": lid,
        "mode": interval_mode,
        "overlap_type": overlap_type,
        "maxgap": float(maxgap),
        "minoverlap": float(minoverlap),
    }
    left_cols = [lid] + sorted({l for l, _ in by})
    edges = left.select_columns(left_cols).map_batches(
        BroadcastIntervalScorer,
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
        drop_ids=["__fj_lid_src", "__fj_rid_src", *drop_cols],
        n_dist=0,
    )
