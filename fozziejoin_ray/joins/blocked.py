"""Blocked (shuffle) fuzzy-join edge builder — the scale path.

For inputs too large to broadcast (or self-joins for entity resolution),
candidate generation becomes a distributed blocking shuffle:

1. **emit**: a stateless ``map_batches`` emits (block_key, side, id,
   key values) rows per input row, using the method's recall-complete
   strategy (blocking/strategies.py). Only the id + key columns travel
   through the shuffle — wide payload columns (e.g. ``spans``) are
   joined back by id afterwards.
2. **salt** (optional): a cheap pre-pass counts rows per block key,
   collects only the oversized blocks to the driver, and re-emits them
   under salted sub-keys — a grid split for two-table joins, a triangle
   split for self-joins — so no single ``map_groups`` call exceeds the
   pair budget. Every pair still meets in exactly one block.
3. **score**: one ``groupby(block_key)`` co-locates candidates;
   ``map_groups`` dedups values, applies ``strategy.pair_ok`` (validity
   + exactly-once dedup across blocks), scores the surviving unique
   value pairs with the vectorized kernels, fans out to id pairs, and
   applies multi-key AND refinement.

This generalizes the reference's in-memory candidate maps
(/root/reference/src/rust/src/string/edit/mod.rs:32-51 and
ngram/jaccard.rs:118-158) to an all-to-all exchange with explicit skew
handling, which the reference — single-process rayon — never needed.
"""

from __future__ import annotations

import math
import zlib
from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..blocking.strategies import strategy_for
from ..kernels.strdist import score_pairs
from ..semantics import canon_method
from .string_join import LID, RID, dist_names, refine_score

BK = "__fj_bk"
SIDE = "__fj_side"
ID = "__fj_id"


def _id_hash(v) -> int:
    return zlib.crc32(repr(v).encode())


def _emit_batches(strategy, side: str, id_col: str, key_cols: list[str], salts: dict | None):
    """Returns a map_batches fn emitting (bk, side, id, k0..kn) rows."""
    side_num = {"left": 0, "right": 1, "self": 0}[side]

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keys = [t.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
        out_bk: list[str] = []
        out_row: list[int] = []
        k0 = keys[0]
        for i in range(len(ids)):
            v = k0[i]
            if v is None:
                continue
            for bk in strategy.emit(v, side):
                salt = salts.get(bk) if salts else None
                if salt is None:
                    out_bk.append(bk)
                    out_row.append(i)
                else:
                    sl, sr = salt
                    h = _id_hash(ids[i])
                    if side == "left":
                        li = h % sl
                        for j in range(sr):
                            out_bk.append(f"{bk}#{li}_{j}")
                            out_row.append(i)
                    elif side == "right":
                        rj = h % sr
                        for li in range(sl):
                            out_bk.append(f"{bk}#{li}_{rj}")
                            out_row.append(i)
                    else:  # self: triangle (sl encoded so the scorer can
                        # restrict same-salt id pairs to the diagonal block)
                        s = h % sl
                        for tt in range(sl):
                            out_bk.append(f"{bk}#T{sl}:{min(s, tt)}_{max(s, tt)}")
                            out_row.append(i)
        rows = np.asarray(out_row, dtype=np.int64)
        cols = {
            BK: pa.array(out_bk, type=pa.string()),
            SIDE: pa.array(np.full(len(rows), side_num, dtype=np.int8)),
            ID: pa.array(ids[rows]) if len(rows) else pa.array([], t.column(id_col).type),
        }
        for c, arr in zip(key_cols, keys):
            cols["k_" + c] = pa.array(arr[rows]) if len(rows) else pa.array([], t.column(c).type)
        return pa.table(cols)

    return fn


def _base_bk(bk: str) -> str:
    return bk.split("#", 1)[0]


def _plan_salts(
    emitted: rd.Dataset, pair_budget: int, selfjoin: bool
) -> dict[str, tuple[int, int]]:
    """Count rows per (block, side); return salt grids for blocks whose
    candidate-pair count exceeds the budget. Only hot keys reach the
    driver (the counts dataset is filtered before collection)."""
    counts = emitted.groupby([BK, SIDE]).count()
    # a block can only be hot if one side alone exceeds sqrt(budget)
    floor = max(64, int(math.sqrt(pair_budget)))
    hot = counts.map_batches(
        lambda t: t.filter(pa.compute.greater(t["count()"], floor)),
        batch_format="pyarrow",
    ).take_all()
    by_bk: dict[str, dict[int, int]] = defaultdict(dict)
    for row in hot:
        by_bk[row[BK]][row[SIDE]] = row["count()"]
    plan: dict[str, tuple[int, int]] = {}
    for bk, sides in by_bk.items():
        cl = sides.get(0, 0)
        cr = sides.get(1, 0)
        pairs = cl * (cl - 1) // 2 if selfjoin else cl * cr
        if pairs <= pair_budget:
            continue
        if selfjoin:
            k = max(2, math.ceil(math.sqrt(pairs / pair_budget * 2)))
            plan[bk] = (k, k)
        else:
            ratio = max(1.0, pairs / pair_budget)
            sl = max(1, math.ceil(math.sqrt(ratio * max(1, cl) / max(1, cr))))
            sr = max(1, math.ceil(ratio / sl))
            plan[bk] = (sl, sr)
    return plan


def _make_group_scorer(cfg: dict):
    strategy = strategy_for(
        cfg["method"], cfg["max_distance"], cfg["q"], allpairs_salts=cfg["allpairs_salts"]
    )
    selfjoin = cfg["selfjoin"]
    method = cfg["method"]
    maxd = cfg["max_distance"]
    q = cfg["q"]
    max_prefix = cfg["max_prefix"]
    prefix_weight = cfg["prefix_weight"]
    lkeys = cfg["left_keys"]
    rkeys = cfg["right_keys"]
    nkeys = len(lkeys)

    def empty(t: pa.Table) -> pa.Table:
        idt = t.column(ID).type
        cols = {LID: pa.array([], idt), RID: pa.array([], idt)}
        for n in dist_names(nkeys):
            cols[n] = pa.array([], pa.float64())
        return pa.table(cols)

    def score_group(t: pa.Table) -> pa.Table:
        full_bk = t.column(BK)[0].as_py()
        bk = _base_bk(full_bk)
        side = t.column(SIDE).to_numpy(zero_copy_only=False)
        ids = t.column(ID).to_numpy(zero_copy_only=False)
        # Salted self-join triangle sub-block: two ids with the SAME salt
        # co-occur in all sl sub-blocks of this base block — keep only the
        # id pairs whose salt pair names THIS sub-block (same-salt pairs on
        # the diagonal), mirroring AllPairs.pair_ok at the id level.
        salt_spec = None
        if selfjoin and "#T" in full_bk:
            spec = full_bk.split("#T", 1)[1]
            slt, rest = spec.split(":", 1)
            bi, bj = (int(x) for x in rest.split("_"))
            id_salt = np.fromiter(
                (_id_hash(x) % int(slt) for x in ids), np.int64, count=len(ids)
            )
            salt_spec = (id_salt, bi, bj)
        # emitted key columns are unified under the left names for both
        # sides (see build_edges_blocked); row positions select the side
        lkv = [t.column("k_" + c).to_numpy(zero_copy_only=False) for c in lkeys]
        rkv = lkv

        if selfjoin:
            lpos = np.arange(len(ids))
            rpos = lpos
        else:
            lpos = np.nonzero(side == 0)[0]
            rpos = np.nonzero(side == 1)[0]
        if not len(lpos) or not len(rpos):
            return empty(t)

        lu: dict[str, list[int]] = defaultdict(list)
        for p in lpos:
            v = lkv[0][p]
            if v is not None:
                lu[v].append(p)
        if selfjoin:
            ru = lu
        else:
            ru = defaultdict(list)
            for p in rpos:
                v = rkv[0][p]
                if v is not None:
                    ru[v].append(p)

        luvals = list(lu)
        ruvals = list(ru)
        pair_a: list[str] = []
        pair_b: list[str] = []
        if selfjoin:
            svals = sorted(luvals)
            for i, va in enumerate(svals):
                for vb in svals[i:]:
                    if va == vb and len(lu[va]) < 2:
                        continue
                    if strategy.pair_ok(va, vb, bk, True):
                        pair_a.append(va)
                        pair_b.append(vb)
        else:
            for va in luvals:
                for vb in ruvals:
                    if strategy.pair_ok(va, vb, bk, False):
                        pair_a.append(va)
                        pair_b.append(vb)
        if not pair_a:
            return empty(t)

        d0 = score_pairs(
            method, pair_a, pair_b, q=q, max_prefix=max_prefix, prefix_weight=prefix_weight
        )
        keep = d0 <= maxd

        la_parts: list[np.ndarray] = []
        rb_parts: list[np.ndarray] = []
        d_parts: list[np.ndarray] = []
        for k in np.nonzero(keep)[0]:
            va, vb = pair_a[k], pair_b[k]
            ap = np.asarray(lu[va], dtype=np.int64)
            bp = np.asarray((ru if not selfjoin else lu)[vb], dtype=np.int64)
            aa = np.repeat(ap, len(bp))
            bb = np.tile(bp, len(ap))
            if selfjoin:
                ia = ids[aa]
                ib = ids[bb]
                if va == vb:
                    # same value list crossed with itself: keep each
                    # unordered id pair once
                    m = ia < ib
                    aa, bb = aa[m], bb[m]
                else:
                    # distinct values: every id pair is unique; normalize
                    # orientation so edges are canonical (id_a < id_b)
                    swap = ia > ib
                    aa2 = np.where(swap, bb, aa)
                    bb2 = np.where(swap, aa, bb)
                    aa, bb = aa2, bb2
                if salt_spec is not None:
                    id_salt, bi, bj = salt_spec
                    sa_ = id_salt[aa]
                    sb_ = id_salt[bb]
                    m2 = (np.minimum(sa_, sb_) == bi) & (np.maximum(sa_, sb_) == bj)
                    aa, bb = aa[m2], bb[m2]
            la_parts.append(aa)
            rb_parts.append(bb)
            d_parts.append(np.full(len(aa), d0[k]))
        if not la_parts:
            return empty(t)
        apos = np.concatenate(la_parts)
        bpos = np.concatenate(rb_parts)
        dists = [np.concatenate(d_parts)]

        for ki in range(1, nkeys):
            av = lkv[ki][apos]
            bv = rkv[ki][bpos]
            ok = np.fromiter(
                ((x is not None and y is not None) for x, y in zip(av, bv)),
                bool,
                count=len(av),
            )
            dk = np.full(len(av), np.inf)
            ii = np.nonzero(ok)[0]
            if len(ii):
                dk[ii] = refine_score(
                    method,
                    [av[i] for i in ii],
                    [bv[i] for i in ii],
                    q=q,
                    max_prefix=max_prefix,
                    prefix_weight=prefix_weight,
                )
            keep2 = dk <= maxd
            apos = apos[keep2]
            bpos = bpos[keep2]
            dists = [d[keep2] for d in dists] + [dk[keep2]]
            if not len(apos):
                return empty(t)

        cols = {LID: pa.array(ids[apos]), RID: pa.array(ids[bpos])}
        for n, d in zip(dist_names(nkeys), dists):
            cols[n] = pa.array(d, pa.float64())
        return pa.table(cols)

    return score_group


def build_edges_blocked(
    left: rd.Dataset,
    right: rd.Dataset | None,
    by: list[tuple[str, str]],
    method: str,
    max_distance: float,
    q: int,
    max_prefix: int,
    prefix_weight: float,
    lid: str,
    rid: str | None,
    *,
    pair_budget: int | None = 4_000_000,
    allpairs_salts: tuple[int, int] = (8, 8),
) -> rd.Dataset:
    """Edges via blocking shuffle. ``right=None`` -> self-join on ``left``
    (edges have id_a < id_b, one per unordered pair)."""
    method = canon_method(method)
    selfjoin = right is None
    strategy = strategy_for(method, max_distance, q, allpairs_salts=allpairs_salts)

    lkeys = [l for l, _ in by]
    rkeys = [r for _, r in by]
    cfg = {
        "method": method,
        "max_distance": max_distance,
        "q": q,
        "max_prefix": max_prefix,
        "prefix_weight": prefix_weight,
        "selfjoin": selfjoin,
        "left_keys": lkeys,
        "right_keys": rkeys,
        "allpairs_salts": allpairs_salts,
    }

    def emitted_with(salts):
        lsel = [lid] + sorted(set(lkeys) - {lid})
        if selfjoin:
            e = left.select_columns(lsel).map_batches(
                _emit_batches(strategy, "self", lid, lkeys, salts), batch_format="pyarrow"
            )
            return e
        el = left.select_columns(lsel).map_batches(
            _emit_batches(strategy, "left", lid, lkeys, salts), batch_format="pyarrow"
        )
        er = right.select_columns([rid] + sorted(set(rkeys) - {rid})).map_batches(
            _emit_batches(strategy, "right", rid, rkeys, salts), batch_format="pyarrow"
        )
        if lkeys != rkeys:
            # unify emitted key column names (k_<leftname>)
            er = er.map_batches(
                lambda t: t.rename_columns(
                    [
                        ("k_" + lkeys[rkeys.index(c[2:])]) if c.startswith("k_") else c
                        for c in t.column_names
                    ]
                ),
                batch_format="pyarrow",
            )
        return el.union(er)

    salts = None
    if pair_budget is not None:
        salts = _plan_salts(emitted_with(None), pair_budget, selfjoin)
        if not salts:
            salts = None

    emitted = emitted_with(salts)
    return emitted.groupby(BK).map_groups(_make_group_scorer(cfg), batch_format="pyarrow")
