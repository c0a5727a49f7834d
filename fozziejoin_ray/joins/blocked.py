"""Blocked (shuffle) fuzzy-join edge builder — the scale path.

For inputs too large to broadcast (or self-joins for entity resolution),
candidate generation becomes a distributed blocking shuffle:

1. **emit**: a stateless ``map_batches`` emits (block_key, side, id,
   key values) rows per input row, using the method's recall-complete
   strategy (blocking/strategies.py). Only the id + key columns travel
   through the shuffle — wide payload columns (e.g. ``spans``) are
   joined back by id afterwards. The batch is factorized first, so
   per-value work (gram/soundex encoding) runs once per DISTINCT value
   and the fanout to rows is pure ``np.repeat`` arithmetic — no Python
   loop over rows.
2. **salt** (optional): a cheap pre-pass counts rows per block key,
   collects only the oversized blocks to the driver, and re-emits them
   under salted sub-keys — a grid split for two-table joins, a triangle
   split for self-joins — so no single ``map_groups`` call exceeds the
   pair budget. Every pair still meets in exactly one block.
3. **score**: one ``groupby(block_key)`` co-locates candidates;
   ``map_groups`` factorizes values, asks the strategy for the valid
   unique-value pairs (vectorized: length masks, bucketed gram
   disqualification, salt-triangle masks — see
   ``strategies.candidates``), scores them with the vectorized kernels,
   fans out to id pairs with one ``np.repeat`` cross-product expansion,
   and applies multi-key AND refinement. No per-pair Python anywhere.

This generalizes the reference's in-memory candidate maps
(/root/reference/src/rust/src/string/edit/mod.rs:32-51 and
ngram/jaccard.rs:118-158) to an all-to-all exchange with explicit skew
handling, which the reference — single-process rayon — never needed.

Key values may contain ANY character except embedded NUL ('\\x00'):
numpy's fixed-width unicode arrays (used for vectorized key
construction) treat NULs as padding and silently drop them. The
reference's own data model shares the restriction — R character vectors
cannot hold embedded NULs at all.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..blocking.strategies import _cross_expand, id_salt_hash, strategy_for
from ..kernels.strdist import edit_bag_bound, score_pairs
from ..semantics import canon_method
from .string_join import LID, RID, dist_names, refine_score

BK = "__fj_bk"
SIDE = "__fj_side"
ID = "__fj_id"

# methods with a sound bag-distance (char-multiset) lower bound
_BAG_METHODS = {"levenshtein", "osa", "damerau_levensthein", "hamming", "lcs"}
# methods where equal values imply distance exactly 0 (cosine's
# both-empty -> 1.0 reference quirk keeps it out)
_EQ_ZERO_METHODS = _BAG_METHODS | {"jaro_winkler", "qgram", "jaccard", "soundex"}


def _cmp_ids(ids: np.ndarray) -> np.ndarray:
    """Comparable view of an id array: object strings -> fixed-width
    unicode so elementwise < runs in C (same codepoint order as Python)."""
    if ids.dtype == object:
        return ids.astype("U")
    return ids


def _salted_keys(bk: str, a: np.ndarray, b: np.ndarray, tri_sl: int | None = None):
    """Vectorized '\\x01{a}_{b};{bk}' (grid) or '\\x01T{sl}:{a}_{b};{bk}'
    (triangle). The salt HEADER comes first, marked by an SOH sentinel no
    strategy's keys start with (all begin with an ASCII letter; NUL would
    be stripped as padding by numpy's fixed-width unicode arrays) and
    closed by the first ';' — the header
    itself is machine-generated (digits/T/:/_ only), so that ';' is
    unambiguous and the base key's CONTENT (gram/variant text, which may
    contain any character) is never parsed for delimiters."""
    head = f"\x01T{tri_sl}:" if tri_sl is not None else "\x01"
    suffix = ";" + bk
    return np.char.add(
        np.char.add(np.char.add(np.char.add(head, a.astype("U")), "_"), b.astype("U")),
        suffix,
    ).astype(object)


def _emit_batches(strategy, side: str, id_col: str, key_cols: list[str], salts: dict | None):
    """Returns a map_batches fn emitting (bk, side, id, k0..kn) rows —
    factorize once, emit per unique value, fan out with np.repeat."""
    side_num = {"left": 0, "right": 1, "self": 0}[side]

    def fn(t: pa.Table) -> pa.Table:
        import pandas as pd

        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keys = [t.column(c).to_numpy(zero_copy_only=False) for c in key_cols]
        codes, uniq = pd.factorize(keys[0])
        uniq = np.asarray(uniq, dtype=object)
        if len(uniq):
            uidx, bks = strategy.emit_unique(uniq, side)
        else:
            uidx, bks = np.empty(0, np.int64), np.empty(0, dtype=object)
        # group emissions by unique index for the per-row gather
        order = np.argsort(uidx, kind="stable")
        uidx_s, bks_s = uidx[order], bks[order]
        rng = np.arange(len(uniq), dtype=np.int64)
        starts = np.searchsorted(uidx_s, rng, side="left")
        counts = np.searchsorted(uidx_s, rng, side="right") - starts

        rows0 = np.nonzero(codes >= 0)[0]
        c = codes[rows0]
        cnt = counts[c]
        total = int(cnt.sum())
        rep_row = np.repeat(rows0, cnt)
        within = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        em_keys = bks_s[np.repeat(starts[c], cnt) + within]

        if salts:
            hot_mask = np.isin(em_keys.astype("U"), np.array(list(salts)))
            rows_parts = [rep_row[~hot_mask]]
            keys_parts = [em_keys[~hot_mask]]
            if hot_mask.any():
                hr = rep_row[hot_mask]
                hk = em_keys[hot_mask].astype("U")
                hh = id_salt_hash(ids[hr])
                for bk, (sl, sr) in salts.items():
                    m = hk == bk
                    if not m.any():
                        continue
                    rr, rh = hr[m], hh[m]
                    if side == "left":
                        li = np.repeat((rh % sl).astype(np.int64), sr)
                        jj = np.tile(np.arange(sr, dtype=np.int64), len(rr))
                        rows_parts.append(np.repeat(rr, sr))
                        keys_parts.append(_salted_keys(bk, li, jj))
                    elif side == "right":
                        rj = np.repeat((rh % sr).astype(np.int64), sl)
                        ii = np.tile(np.arange(sl, dtype=np.int64), len(rr))
                        rows_parts.append(np.repeat(rr, sl))
                        keys_parts.append(_salted_keys(bk, ii, rj))
                    else:  # self: triangle (sl encoded so the scorer can
                        # restrict same-salt id pairs to the diagonal block)
                        ss = np.repeat((rh % sl).astype(np.int64), sl)
                        tt = np.tile(np.arange(sl, dtype=np.int64), len(rr))
                        rows_parts.append(np.repeat(rr, sl))
                        keys_parts.append(
                            _salted_keys(bk, np.minimum(ss, tt), np.maximum(ss, tt), tri_sl=sl)
                        )
            rep_row = np.concatenate(rows_parts)
            em_keys = np.concatenate(keys_parts)

        take = pa.array(rep_row, pa.int64())
        idc = t.column(id_col).combine_chunks() if isinstance(t.column(id_col), pa.ChunkedArray) else t.column(id_col)
        cols = {
            BK: pa.array(em_keys, type=pa.string()),
            SIDE: pa.array(np.full(len(rep_row), side_num, dtype=np.int8)),
            ID: idc.take(take),
        }
        for cname in key_cols:
            kc = t.column(cname)
            kc = kc.combine_chunks() if isinstance(kc, pa.ChunkedArray) else kc
            cols["k_" + cname] = kc.take(take)
        return pa.table(cols)

    return fn


def _base_bk(bk: str) -> str:
    return bk.split(";", 1)[1] if bk.startswith("\x01") else bk


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


def _group_positions(codes: np.ndarray, n_uniq: int):
    """Row positions per factorized code: (sorted positions, starts,
    counts) so group k's rows are pos_sorted[starts[k] : starts[k]+counts[k]]."""
    order = np.argsort(codes, kind="stable")
    sorted_codes = codes[order]
    rng = np.arange(n_uniq, dtype=np.int64)
    starts = np.searchsorted(sorted_codes, rng, side="left")
    counts = np.searchsorted(sorted_codes, rng, side="right") - starts
    return order, starts, counts


def _bk_part_hash(bks: np.ndarray, num_parts: int) -> np.ndarray:
    """Deterministic partition id per FULL block key (salt suffix
    included) — the unit of partition-granular checkpoint resume: every
    edge a block produces lands in that block's partition."""
    import pandas as pd

    return (
        pd.util.hash_array(np.asarray(bks, dtype=object), categorize=False) % num_parts
    ).astype(np.int64)


def _make_group_scorer(cfg: dict):
    strategy = strategy_for(
        cfg["method"], cfg["max_distance"], cfg["q"], allpairs_salts=cfg["allpairs_salts"]
    )
    ckpt = cfg.get("ckpt_parts")  # (num_parts, part_col) or None
    selfjoin = cfg["selfjoin"]
    method = cfg["method"]
    maxd = cfg["max_distance"]
    q = cfg["q"]
    max_prefix = cfg["max_prefix"]
    prefix_weight = cfg["prefix_weight"]
    lkeys = cfg["left_keys"]
    nkeys = len(lkeys)

    def empty(t: pa.Table) -> pa.Table:
        idt = t.column(ID).type
        cols = {LID: pa.array([], idt), RID: pa.array([], idt)}
        for n in dist_names(nkeys):
            cols[n] = pa.array([], pa.float64())
        if ckpt is not None:
            cols[ckpt[1]] = pa.array([], pa.int64())
        return pa.table(cols)

    def score_group(t: pa.Table) -> pa.Table:
        import pandas as pd

        full_bk = t.column(BK)[0].as_py()
        bk = _base_bk(full_bk)
        side = t.column(SIDE).to_numpy(zero_copy_only=False)
        ids = t.column(ID).to_numpy(zero_copy_only=False)
        # Salted self-join triangle sub-block: two ids with the SAME salt
        # co-occur in all sl sub-blocks of this base block — keep only the
        # id pairs whose salt pair names THIS sub-block (same-salt pairs on
        # the diagonal), mirroring AllPairs.candidates at the id level.
        salt_spec = None
        if selfjoin and full_bk.startswith("\x01T"):
            spec = full_bk[2:].split(";", 1)[0]
            slt, rest = spec.split(":", 1)
            bi, bj = (int(x) for x in rest.split("_"))
            id_salt = (id_salt_hash(ids) % int(slt)).astype(np.int64)
            salt_spec = (id_salt, bi, bj)
        # emitted key columns are unified under the left names for both
        # sides (see build_edges_blocked); row positions select the side
        lkv = [t.column("k_" + c).to_numpy(zero_copy_only=False) for c in lkeys]
        rkv = lkv

        if selfjoin:
            lpos = np.arange(len(ids), dtype=np.int64)
            rpos = lpos
        else:
            lpos = np.nonzero(side == 0)[0]
            rpos = np.nonzero(side == 1)[0]
        if not len(lpos) or not len(rpos):
            return empty(t)

        lcodes, lu = pd.factorize(lkv[0][lpos])
        lu = np.asarray(lu, dtype=object)
        lorder, lstarts, lcounts = _group_positions(lcodes, len(lu))
        lrows_sorted = lpos[lorder]
        if selfjoin:
            ru, rrows_sorted, rstarts, rcounts = lu, lrows_sorted, lstarts, lcounts
        else:
            rcodes, ru = pd.factorize(rkv[0][rpos])
            ru = np.asarray(ru, dtype=object)
            rorder, rstarts, rcounts = _group_positions(rcodes, len(ru))
            rrows_sorted = rpos[rorder]
        if not len(lu) or not len(ru):
            return empty(t)

        ia, ib = strategy.candidates(lu, None if selfjoin else ru, bk, selfjoin)
        if not len(ia):
            return empty(t)

        # recall-lossless bag-distance prefilter: the bucketed char-count
        # lower bound costs ~1/3 of the exact kernel per pair and kills
        # the overwhelming majority of length-window candidates, so the
        # kernel only sees near-anagrams (cf. strdist.edit_bag_bound)
        if method in _BAG_METHODS and len(ia) >= 4096:
            lbnd = edit_bag_bound(
                lu, None if selfjoin else ru, ia, ib, lcs=(method == "lcs")
            )
            pre = lbnd <= maxd
            ia, ib = ia[pre], ib[pre]
            if not len(ia):
                return empty(t)

        # exact-equality short-circuit (reference: edit/levenshtein.rs:78-85):
        # equal values have distance 0 for these methods, so the kernel
        # only sees unequal pairs — crucial for deletion-variant blocks,
        # where most blocks are singletons whose only candidate is the
        # identity pair. (cosine excluded: both-empty is 1.0 by the
        # reference's quirk.)
        if method in _EQ_ZERO_METHODS:
            if selfjoin:
                eq = ia == ib
            else:
                allv, _ = pd.factorize(np.concatenate([lu, ru]))
                eq = allv[ia] == allv[len(lu) + ib]
            d0 = np.zeros(len(ia), np.float64)
            ne = np.nonzero(~eq)[0]
            if len(ne):
                d0[ne] = score_pairs(
                    method, list(lu[ia[ne]]), list(ru[ib[ne]]),
                    q=q, max_prefix=max_prefix, prefix_weight=prefix_weight,
                )
        else:
            d0 = score_pairs(
                method, list(lu[ia]), list(ru[ib]),
                q=q, max_prefix=max_prefix, prefix_weight=prefix_weight,
            )
        keep = d0 <= maxd
        ia, ib, d0 = ia[keep], ib[keep], d0[keep]
        if not len(ia):
            return empty(t)

        # fan out unique-value pairs to id pairs: one vectorized
        # variable-size cross-product expansion
        rep, al, bl = _cross_expand(lcounts[ia], rcounts[ib])
        if not len(rep):
            return empty(t)
        apos = lrows_sorted[lstarts[ia][rep] + al]
        bpos = rrows_sorted[rstarts[ib][rep] + bl]
        dists0 = d0[rep]

        if selfjoin:
            ids_c = _cmp_ids(ids)
            a_ids, b_ids = ids_c[apos], ids_c[bpos]
            samev = ia[rep] == ib[rep]
            # same value list crossed with itself: keep each unordered id
            # pair once; distinct values: every id pair is unique —
            # normalize orientation so edges are canonical (id_a < id_b)
            keepm = np.where(samev, a_ids < b_ids, True)
            swap = (~samev) & (a_ids > b_ids)
            apos, bpos = np.where(swap, bpos, apos), np.where(swap, apos, bpos)
            if salt_spec is not None:
                id_salt, bi, bj = salt_spec
                sa_, sb_ = id_salt[apos], id_salt[bpos]
                keepm &= (np.minimum(sa_, sb_) == bi) & (np.maximum(sa_, sb_) == bj)
            apos, bpos, dists0 = apos[keepm], bpos[keepm], dists0[keepm]
            if not len(apos):
                return empty(t)

        dists = [dists0]
        for ki in range(1, nkeys):
            av = lkv[ki][apos]
            bv = rkv[ki][bpos]
            ok = ~(pd.isna(av) | pd.isna(bv))
            dk = np.full(len(av), np.inf)
            ii = np.nonzero(ok)[0]
            if len(ii):
                dk[ii] = refine_score(
                    method, list(av[ii]), list(bv[ii]),
                    q=q, max_prefix=max_prefix, prefix_weight=prefix_weight,
                )
            keep2 = dk <= maxd
            apos, bpos = apos[keep2], bpos[keep2]
            dists = [d[keep2] for d in dists] + [dk[keep2]]
            if not len(apos):
                return empty(t)

        cols = {LID: pa.array(ids[apos]), RID: pa.array(ids[bpos])}
        for n, d in zip(dist_names(nkeys), dists):
            cols[n] = pa.array(d, pa.float64())
        if ckpt is not None:
            part = int(_bk_part_hash(np.array([full_bk], object), ckpt[0])[0])
            cols[ckpt[1]] = pa.array(np.full(len(apos), part, dtype=np.int64))
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
    ckpt_parts: tuple[int, list[int], str] | None = None,
) -> rd.Dataset:
    """Edges via blocking shuffle. ``right=None`` -> self-join on ``left``
    (edges have id_a < id_b, one per unordered pair).

    ``ckpt_parts=(num_parts, missing, part_col)`` enables
    partition-granular checkpoint resume: each block (salted key) hashes
    to one of ``num_parts`` deterministic partitions; only blocks whose
    partition is in ``missing`` enter the shuffle — candidate generation
    AND scoring are skipped for partitions a previous run completed —
    and every edge carries its partition id in ``part_col``."""
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
        "ckpt_parts": None if ckpt_parts is None else (ckpt_parts[0], ckpt_parts[2]),
    }

    lsel = [lid] + sorted(set(lkeys) - {lid})
    left_p = left.select_columns(lsel)
    right_p = None if selfjoin else right.select_columns([rid] + sorted(set(rkeys) - {rid}))
    if pair_budget is not None:
        # salt planning runs the emit pipeline a second time; materialize
        # the projected (id, keys) inputs once so the upstream graph does
        # not re-execute for the planning pass
        left_p = left_p.materialize()
        if right_p is not None:
            right_p = right_p.materialize()

    def emitted_with(salts):
        if selfjoin:
            e = left_p.map_batches(
                _emit_batches(strategy, "self", lid, lkeys, salts), batch_format="pyarrow"
            )
            return e
        el = left_p.map_batches(
            _emit_batches(strategy, "left", lid, lkeys, salts), batch_format="pyarrow"
        )
        er = right_p.map_batches(
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
    if ckpt_parts is not None:
        num_parts, missing, _ = ckpt_parts
        want = np.asarray(sorted(missing), dtype=np.int64)

        def part_filter(t: pa.Table) -> pa.Table:
            bks = t.column(BK).to_numpy(zero_copy_only=False)
            keep = np.isin(_bk_part_hash(bks, num_parts), want)
            return t.filter(pa.array(keep))

        emitted = emitted.map_batches(part_filter, batch_format="pyarrow")
    return emitted.groupby(BK).map_groups(_make_group_scorer(cfg), batch_format="pyarrow")
