"""Equality joins for Ray Datasets, built on groupby + per-partition Acero.

``ray.data.Dataset.join`` in this Ray build mis-resolves join keys when a
plan contains more than one hash-shuffle join (observed:
``ArrowInvalid: No match or multiple matches for key field reference ...``
on the second join of a chain even across a materialize() barrier), so
the engine carries its own grace-style partitioned hash join:

1. both sides get a partition column ``hash(keys) % P`` (vectorized,
   ``pandas.util.hash_array`` folded across key columns) and a side tag,
   padded to a common schema;
2. one ``groupby(partition)`` sort-shuffle co-locates matching keys;
3. each partition is joined locally with pyarrow's C++ ``Table.join``.

This is exactly the "explicit partitioned hash join" pattern for
both-sides-large joins; a broadcast fast path (``broadcast_semi_filter``)
covers the small-side cases without any shuffle.

Null keys never match (consistent with the engine-wide NA rule — Acero's
hash join shares SQL null semantics, verified empirically); null-key
rows still surface as unmatched in the outer modes, mirroring the
reference's full-join assembly (src/rust/src/merge/full.rs:9-85).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_PART = "__hj_part"
_SIDE = "__hj_side"

_MODES = {
    "inner": "inner",
    "left_outer": "left outer",
    "left_semi": "left semi",
    "left_anti": "left anti",
    "right_outer": "right outer",
    "right_semi": "right semi",
    "right_anti": "right anti",
    "full_outer": "full outer",
}


def _schema_or(ds: rd.Dataset, override: pa.Schema | None, side: str) -> pa.Schema:
    if override is not None:
        return override
    sch = ds.schema()
    if sch is None:
        raise ValueError(
            f"{side} join input has no observable schema (all blocks empty); "
            "pass an explicit schema"
        )
    return pa.schema(list(zip(sch.names, sch.types))) if not isinstance(sch, pa.Schema) else sch


def _hash_mod_many(cols: list[pa.ChunkedArray | pa.Array], p: int) -> np.ndarray:
    """Fold per-column row hashes into one partition id (single-column
    case degenerates to the plain ``hash % p`` used since round 2).

    Integer/boolean columns are null-filled BEFORE the numpy
    conversion: a single null used to flip the whole column to float64
    (NaN), so the same key value hashed differently on a side whose
    batch happened to contain a null and matching rows landed in
    different partitions (latent since round 2, surfaced by the
    hypothesis fuzz). Null keys never match, so their own placement is
    arbitrary — only the dtype stability of the NON-null values
    matters."""
    import pyarrow.compute as pc

    h = np.zeros(0, dtype=np.uint64)
    for col in cols:
        if pa.types.is_integer(col.type) or pa.types.is_boolean(col.type):
            col = pc.fill_null(col, 0)
        vals = col.to_numpy(zero_copy_only=False)
        hc = pd.util.hash_array(np.asarray(vals), categorize=False)
        h = hc if not len(h) else (h * np.uint64(1000003)) ^ hc
    return (h % p).astype(np.int64)


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str | list[str],
    right_on: str | list[str],
    *,
    how: str = "inner",
    num_partitions: int = 16,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Join two Datasets on equality of ``left_on``/``right_on`` (each a
    column name or a same-length list of names for composite keys).

    ``how``: "inner" | "left_outer" | "left_semi" | "left_anti" |
    "right_outer" | "right_semi" | "right_anti" | "full_outer".
    Output columns: all left columns ++ right columns minus ``right_on``
    (keys survive under their left names, coalesced across sides in the
    outer modes); the semi/anti modes emit only their own side's rows —
    ``right_semi``/``right_anti`` return right rows with the keys renamed
    to the left names, so the contract's key naming holds in every mode.
    Column names must not collide otherwise (callers pre-suffix). Pass
    ``left_schema``/``right_schema`` when a side may be empty — Ray
    reports ``schema() is None`` for datasets whose blocks were all
    empty.
    """
    if how not in _MODES:
        raise ValueError(f"how must be one of {sorted(_MODES)}, got {how!r}")
    lkeys = [left_on] if isinstance(left_on, str) else list(left_on)
    rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
    if len(lkeys) != len(rkeys) or not lkeys:
        raise ValueError(f"key lists must be same nonzero length: {lkeys} vs {rkeys}")
    lschema = _schema_or(left, left_schema, "left")
    rschema = _schema_or(right, right_schema, "right")
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    overlap = set(lnames) & (set(rnames) - set(rkeys))
    if overlap:
        raise ValueError(f"column collision between join sides: {sorted(overlap)}")

    lfields = list(zip(lschema.names, lschema.types))
    rfields = list(zip(rschema.names, rschema.types))
    # semi/anti modes never emit the other side's payload — shrink that
    # side to its key columns BEFORE the unified-schema shuffle so only
    # keys cross the exchange (collision validation above still saw the
    # full declared schemas)
    if how in ("left_semi", "left_anti"):
        rfields = [(n, t) for n, t in rfields if n in rkeys]
    elif how in ("right_semi", "right_anti"):
        lfields = [(n, t) for n, t in lfields if n in lkeys]
    all_fields = lfields + [(n, t) for n, t in rfields if n not in rkeys]
    # unified shuffle schema: every column of both sides + part + side;
    # right keys are carried in the LEFT keys' slots (cast to left types).
    ltypes = dict(lfields)
    key_types = {lk: ltypes[lk] for lk in lkeys}
    r2l = dict(zip(rkeys, lkeys))

    def prep(side: int, key_map: dict[str, str]):
        # key_map: unified (left) key name -> source column on this side.
        # Columns already consumed as keys must not ALSO be read as
        # payload: a right key named like a left payload column would
        # otherwise leak its values into that slot (or crash casting)
        consumed = set(key_map.values())

        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols: dict[str, pa.Array | pa.ChunkedArray] = {}
            for name, typ in all_fields:
                if name in key_map and key_map[name] in t.column_names:
                    cols[name] = t[key_map[name]].cast(key_types[name])
                elif name in t.column_names and name not in consumed:
                    col = t[name]
                    # upstream stages can emit degraded block dtypes for
                    # empty/all-null batches (e.g. arrow `null` from an
                    # empty pandas block); pin every column to the
                    # declared schema so per-partition Acero never sees
                    # a null-typed non-key field
                    cols[name] = col if col.type == typ else col.cast(typ)
                else:
                    cols[name] = pa.nulls(n, type=typ)
            keys = [
                c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                for c in (cols[lk] for lk in lkeys)
            ]
            cols[_PART] = pa.array(_hash_mod_many(keys, num_partitions))
            cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    lu = left.map_batches(prep(0, {lk: lk for lk in lkeys}), batch_format="pyarrow")
    ru = right.map_batches(
        prep(1, {r2l[rk]: rk for rk in rkeys}), batch_format="pyarrow"
    )
    unioned = lu.union(ru)

    lcols = [n for n, _ in lfields]
    rcols = [n for n, _ in rfields if n not in rkeys]
    arrow_how = _MODES[how]
    rk_tmp = [f"__hj_rk{i}" for i in range(len(lkeys))]

    def _is_nested(typ: pa.DataType) -> bool:
        return pa.types.is_nested(typ)

    nested_l = [n for n, typ in lfields if _is_nested(typ) and n not in lkeys]
    nested_r = [n for n, typ in rfields if _is_nested(typ) and n not in rkeys]
    left_in_out = how not in ("right_semi", "right_anti")
    right_in_out = how not in ("left_semi", "left_anti") and left_in_out
    right_only = not left_in_out  # right_semi / right_anti emit right cols

    def join_part(t: pa.Table) -> pa.Table:
        # Ray's sort shuffle can degrade an all-null int64 column to
        # arrow `null` type when a partition holds rows from ONE side
        # only (observed at num_partitions > distinct-key spread); pin
        # the unified schema before Acero sees the table — it rejects
        # null-typed non-key fields
        for name, typ in all_fields:
            i = t.schema.get_field_index(name)
            if t.schema.field(i).type != typ:
                t = t.set_column(i, name, t[name].cast(typ))
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(lcols)
        rt = t.filter(pa.array(side == 1)).select(lkeys + rcols)
        rt = rt.rename_columns(rk_tmp + rcols)
        # null keys never match: pre-filter rows that cannot join AND
        # would not survive as unmatched output in this mode (Acero
        # already applies SQL null semantics; this just sheds work)
        if how in ("inner", "left_semi", "right_outer", "right_semi", "right_anti"):
            for lk in lkeys:
                lt = lt.filter(pa.compute.is_valid(lt[lk]))
        if how in ("inner", "left_semi", "left_anti", "left_outer", "right_semi"):
            for rk in rk_tmp:
                rt = rt.filter(pa.compute.is_valid(rt[rk]))
        # Acero rejects nested (list/struct) non-key columns: carry row
        # indices through the join and re-attach nested columns by take
        lt_j = lt
        rt_j = rt
        if nested_l:
            lt_j = lt_j.drop_columns(nested_l).append_column(
                "__hj_lrow", pa.array(np.arange(lt.num_rows))
            )
        if nested_r:
            rt_j = rt_j.drop_columns(nested_r).append_column(
                "__hj_rrow", pa.array(np.arange(rt.num_rows))
            )
        out = lt_j.join(
            rt_j,
            keys=lkeys,
            right_keys=rk_tmp,
            join_type=arrow_how,
            coalesce_keys=True,
        )
        # right outer emits the (coalesced) keys under the RIGHT names;
        # restore the unified left names
        for i, lk in enumerate(lkeys):
            if rk_tmp[i] in out.column_names and lk not in out.column_names:
                out = out.rename_columns(
                    [lk if c == rk_tmp[i] else c for c in out.column_names]
                )
        if nested_l and left_in_out:
            idx = out["__hj_lrow"]
            for c in nested_l:
                out = out.append_column(c, lt[c].take(idx))
        if "__hj_lrow" in out.column_names:
            out = out.drop_columns(["__hj_lrow"])
        if nested_r and (right_in_out or right_only):
            idx = out["__hj_rrow"]
            for c in nested_r:
                out = out.append_column(c, rt[c].take(idx))
        if "__hj_rrow" in out.column_names:
            out = out.drop_columns(["__hj_rrow"])
        if right_in_out:
            return out.select(lcols + rcols)
        if right_only:
            return out.select(lkeys + rcols)
        return out.select(lcols)

    grouped = unioned.groupby(_PART)
    return grouped.map_groups(join_part, batch_format="pyarrow")
