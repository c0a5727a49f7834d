"""Equality joins for Ray Datasets, built on groupby + per-partition Acero.

``ray.data.Dataset.join`` in this Ray build mis-resolves join keys when a
plan contains more than one hash-shuffle join (observed:
``ArrowInvalid: No match or multiple matches for key field reference ...``
on the second join of a chain even across a materialize() barrier), so
the engine carries its own grace-style partitioned hash join:

1. both sides get a partition column ``hash(key) % P`` (vectorized,
   ``pandas.util.hash_array``) and a side tag, padded to a common schema;
2. one ``groupby(partition)`` sort-shuffle co-locates matching keys;
3. each partition is joined locally with pyarrow's C++ ``Table.join``.

This is exactly the "explicit partitioned hash join" pattern for
both-sides-large joins; a broadcast fast path (``broadcast_semi_filter``)
covers the small-side cases without any shuffle.

Null keys never match (consistent with the engine-wide NA rule); null-key
left rows still surface in ``left_outer`` output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_PART = "__hj_part"
_SIDE = "__hj_side"


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


def _hash_mod(arr: pa.ChunkedArray | pa.Array, p: int) -> np.ndarray:
    vals = arr.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(vals), categorize=False)
    return (h % p).astype(np.int64)


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    *,
    how: str = "inner",
    num_partitions: int = 16,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Join two Datasets on equality of ``left_on``/``right_on``.

    ``how``: "inner" | "left_outer" | "left_semi" | "left_anti".
    Output columns: all left columns ++ right columns minus ``right_on``
    (the key survives under its left name). Column names must not collide
    otherwise (callers pre-suffix). Pass ``left_schema``/``right_schema``
    when a side may be empty — Ray reports ``schema() is None`` for
    datasets whose blocks were all empty.
    """
    assert how in ("inner", "left_outer", "left_semi", "left_anti"), how
    lschema = _schema_or(left, left_schema, "left")
    rschema = _schema_or(right, right_schema, "right")
    lnames = list(lschema.names)
    rnames = list(rschema.names)
    overlap = (set(lnames) & set(rnames)) - set()
    if overlap:
        raise ValueError(f"column collision between join sides: {sorted(overlap)}")

    lfields = list(zip(lschema.names, lschema.types))
    rfields = [(n, t) for n, t in zip(rschema.names, rschema.types)]
    all_fields = lfields + [(n, t) for n, t in rfields if n != right_on]
    # unified shuffle schema: every column of both sides + part + side;
    # the right key is carried in the LEFT key's slot (cast to left type).
    key_type = dict(lfields)[left_on]

    def prep(side: int, key_col: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols: dict[str, pa.Array | pa.ChunkedArray] = {}
            for name, typ in all_fields:
                if name in t.column_names:
                    cols[name] = t[name]
                elif name == left_on and key_col != left_on:
                    cols[name] = t[key_col].cast(key_type)
                else:
                    cols[name] = pa.nulls(n, type=typ)
            key = cols[left_on]
            keynp = (
                key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
            )
            cols[_PART] = pa.array(_hash_mod(keynp, num_partitions))
            cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
            return pa.table(cols)

        return fn

    lu = left.map_batches(prep(0, left_on), batch_format="pyarrow")
    ru = right.map_batches(prep(1, right_on), batch_format="pyarrow")
    unioned = lu.union(ru)

    lcols = [n for n, _ in lfields]
    rcols = [n for n, _ in rfields if n != right_on]
    arrow_how = {
        "inner": "inner",
        "left_outer": "left outer",
        "left_semi": "left semi",
        "left_anti": "left anti",
    }[how]

    def _is_nested(typ: pa.DataType) -> bool:
        return pa.types.is_nested(typ)

    nested_l = [n for n, typ in lfields if _is_nested(typ) and n != left_on]
    nested_r = [n for n, typ in rfields if _is_nested(typ) and n not in (right_on,)]

    def join_part(t: pa.Table) -> pa.Table:
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(lcols)
        rt_cols = [left_on] + rcols
        rt = t.filter(pa.array(side == 1)).select(rt_cols)
        rt = rt.rename_columns(["__hj_rkey"] + rcols)
        # drop null keys from the right side; null left keys never match
        rt = rt.filter(pa.compute.is_valid(rt["__hj_rkey"]))
        if how == "inner":
            lt = lt.filter(pa.compute.is_valid(lt[left_on]))
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
            keys=[left_on],
            right_keys=["__hj_rkey"],
            join_type=arrow_how,
            coalesce_keys=True,
        )
        if nested_l:
            idx = out["__hj_lrow"]
            for c in nested_l:
                out = out.append_column(c, lt[c].take(idx))
            out = out.drop_columns(["__hj_lrow"])
        if nested_r and how in ("inner", "left_outer"):
            idx = out["__hj_rrow"]
            for c in nested_r:
                out = out.append_column(c, rt[c].take(idx))
        if "__hj_rrow" in out.column_names:
            out = out.drop_columns(["__hj_rrow"])
        return out.select(lcols + rcols) if how in ("inner", "left_outer") else out.select(lcols)

    grouped = unioned.groupby(_PART)
    return grouped.map_groups(join_part, batch_format="pyarrow")
