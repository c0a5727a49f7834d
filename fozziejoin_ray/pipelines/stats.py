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
