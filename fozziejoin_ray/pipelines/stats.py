"""Distributed exact descriptive statistics for pipeline threshold
selection: value counts and discrete quantiles over bounded-cardinality
columns (token counts, lengths, integer quality scores).

A 100 TB curation pipeline picks its filter thresholds ("drop the
bottom 5% by token count") from the corpus distribution; these
operators compute that distribution EXACTLY with one partial-aggregate
pass:

- ``value_counts``: ``map_batches`` computes per-batch (value, count)
  partials — aggregation happens BEFORE the shuffle, so the groupby
  merge moves one row per (batch, distinct value), not per input row.
- ``column_quantiles``: merges the counts and resolves discrete
  quantiles on the driver from the (distinct value, total) table —
  exact, and driver memory is bounded by column CARDINALITY, never row
  count. For genuinely continuous columns (cardinality ~ rows) use a
  sampled approximation instead; exactness there requires a full sort.

Quantile convention matches DuckDB's ``quantile_disc`` (Postgres
``percentile_disc``): the smallest value whose cumulative relative
frequency reaches ``q`` — i.e. the element at 1-based position
``ceil(q * n)`` of the sorted multiset (position 1 for q = 0). NULLs
are ignored, like the SQL aggregate.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def value_counts(ds: rd.Dataset, col: str) -> rd.Dataset:
    """(value, count) per distinct value of ``col``; NULLs dropped.
    Per-batch partial counts, then one small groupby-sum merge."""

    def partial(t: pa.Table) -> pa.Table:
        c = t.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        c = c.drop_null()
        vc = c.value_counts()
        if len(vc) == 0:
            return pa.table(
                {"value": pa.array([], c.type), "count": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "value": pc.struct_field(vc, "values"),
                "count": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    return ds.select_columns([col]).map_batches(partial, batch_format="pyarrow").groupby(
        "value"
    ).sum("count")


def column_quantiles(ds: rd.Dataset, col: str, qs: list[float]) -> pa.Table:
    """Exact discrete quantiles of ``col`` at each q in ``qs``.

    Returns an Arrow table (q: float64, value: col's type), one row per
    requested quantile, in the given order. Raises on an all-null /
    empty column."""
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {q}")
    merged = pa.concat_tables(
        value_counts(ds, col).iter_batches(batch_size=None, batch_format="pyarrow")
    )
    if merged.num_rows == 0:
        raise ValueError(f"column {col!r} has no non-null values")
    merged = merged.sort_by("value")
    counts = merged.column("sum(count)").to_numpy(zero_copy_only=False)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    # 1-based rank ceil(q*n), clamped to [1, n]; first value whose
    # cumulative count reaches it
    ranks = np.array([min(max(int(math.ceil(q * n)), 1), n) for q in qs], np.int64)
    idx = np.searchsorted(cum, ranks, side="left")
    vals = merged.column("value").take(pa.array(idx, pa.int64()))
    return pa.table({"q": pa.array([float(q) for q in qs], pa.float64()), "value": vals})


_AGGS = ("count", "sum", "min", "max", "avg")


def group_aggregate(
    ds: rd.Dataset,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    num_partitions: int = 32,
) -> rd.Dataset:
    """General distributed groupby with COMBINER-BEFORE-SHUFFLE: one row
    per distinct key tuple with one output column per ``aggs`` entry
    ``{out_name: (agg, col)}``, agg in count/sum/min/max/avg
    (``("count", "*")`` counts rows; ``("count", col)`` counts non-null).

    This is the wide-aggregation pattern for 100 TB inputs: every batch
    collapses to per-key PARTIALS (count/sum/min/max; avg is carried as
    a sum+count pair and finalized after the merge), so the single hash
    exchange moves one row per (batch, distinct key tuple) instead of
    one per input row. NULLs are ignored by the aggregates (SQL
    semantics); float sums are partial-sum reassociations — exact for
    integer-valued columns, within reassociation noise otherwise
    (callers needing cross-engine bit-equality should aggregate integer
    projections, e.g. cents).
    """
    import pandas as pd

    if not keys:
        raise ValueError("keys must name at least one grouping column")
    for out, (agg, col) in aggs.items():
        if agg not in _AGGS:
            raise ValueError(f"unknown agg {agg!r} for {out!r}; expected one of {_AGGS}")
        if col == "*" and agg != "count":
            raise ValueError(f"col='*' only valid with count (got {agg!r} for {out!r})")

    # internal partial plan: out -> list of (partial_col, src_col, how)
    plan: dict[str, list[tuple[str, str, str]]] = {}
    for out, (agg, col) in aggs.items():
        if agg == "count":
            plan[out] = [(f"__p_{out}_c", col, "count")]
        elif agg == "avg":
            plan[out] = [(f"__p_{out}_s", col, "sum"), (f"__p_{out}_c", col, "count")]
        else:
            plan[out] = [(f"__p_{out}_{agg[0]}", col, agg)]
    partial_cols = [p for ps in plan.values() for p in ps]
    merge_how = {pc_: ("sum" if how in ("count", "sum") else how) for pc_, _, how in partial_cols}

    def partial(df: "pd.DataFrame") -> "pd.DataFrame":
        g = df.groupby(keys, sort=False, dropna=False)
        cols = {}
        for pc_, col, how in partial_cols:
            if how == "count":
                s = g.size() if col == "*" else g[col].count()
            else:
                s = getattr(g[col], how)()
            cols[pc_] = s
        out = pd.DataFrame(cols).reset_index()
        h = pd.util.hash_pandas_object(out[keys], index=False).to_numpy()
        out["__gp"] = (h % np.uint64(num_partitions)).astype(np.int64)
        return out

    def merge(df: "pd.DataFrame") -> "pd.DataFrame":
        if not len(df):
            cols = list(keys) + list(aggs)
            return pd.DataFrame({c: [] for c in cols})
        g = df.drop(columns=["__gp"]).groupby(keys, sort=False, dropna=False)
        m = g.agg({pc_: how for pc_, how in merge_how.items()}).reset_index()
        out = m[keys].copy()
        for o, (agg, _col) in aggs.items():
            ps = plan[o]
            if agg == "avg":
                out[o] = m[ps[0][0]] / m[ps[1][0]]
            elif agg == "count":
                out[o] = m[ps[0][0]].astype(np.int64)
            else:
                out[o] = m[ps[0][0]]
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__gp")
        .map_groups(merge, batch_format="pandas")
    )
