"""Sequence packing for LLM training pipelines: assign every document a
training-sequence id by cumulative token count in global ``id_col``
order — ``seq_id = (tokens_before_me) // seq_len`` (fixed-boundary
packing), ``seq_pos = tokens_before_me % seq_len``.

This is a distributed prefix sum, the pattern Ray Data has no built-in
for: per-doc token counts are range-bucketed on the (numeric) id, one
small ``groupby(bucket).sum`` produces per-bucket totals, the driver
turns that B-row table into exclusive bucket offsets (broadcast via
closure), and a per-bucket ``map_groups`` sorts within the bucket and
adds offset + local cumsum. One shuffle total; the driver holds B rows,
never the data. Exact at any scale, deterministic (pure function of the
id order), and SQL-replicable with one window function — the driver
oracle exploits that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def pack_sequences(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    seq_len: int = 512,
    num_buckets: int = 64,
) -> rd.Dataset:
    """(id, n_tokens, seq_id, seq_pos) for every row; tokens are
    whitespace tokens (the token_count ws semantics: null/blank -> 0).

    ``id_col`` must be numeric and unique — the packing order. Range
    buckets come from the global id min/max (skewed ids only unbalance
    bucket sizes, never correctness)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")

    def count_fn(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col], "")
        ws = pc.list_value_length(pc.split_pattern_regex(txt, r"\s+"))
        empty = pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(txt)), 0)
        ws = pc.if_else(empty, pa.scalar(0, pa.int32()), ws)
        return pa.table({id_col: t[id_col], "n_tokens": ws.cast(pa.int64())})

    tok = ds.map_batches(count_fn, batch_format="pyarrow").materialize()
    lo = tok.min(id_col)
    hi = tok.max(id_col)
    span = max(int(hi) - int(lo) + 1, 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum((ids - int(lo)) * num_buckets // span, num_buckets - 1)
        return t.append_column("__bkt", pa.array(b, pa.int64()))

    bucketed = tok.map_batches(add_bucket, batch_format="pyarrow")

    # B-row driver reduction: exclusive prefix offsets per bucket
    sums = {r["__bkt"]: r["sum(n_tokens)"] for r in bucketed.groupby("__bkt").sum("n_tokens").take_all()}
    offsets = {}
    acc = 0
    for b in range(num_buckets):
        offsets[b] = acc
        acc += int(sums.get(b, 0))

    def pack_group(df):
        import pandas as pd

        df = df.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        pre = int(offsets[int(df["__bkt"].iloc[0])]) + (
            df["n_tokens"].cumsum() - df["n_tokens"]
        )
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "n_tokens": df["n_tokens"],
                "seq_id": (pre // seq_len).astype(np.int64),
                "seq_pos": (pre % seq_len).astype(np.int64),
            }
        )

    return bucketed.groupby("__bkt").map_groups(pack_group, batch_format="pandas")


def pack_sequences_sql(table: str, text_expr: str, id_col: str, seq_len: int) -> str:
    """DuckDB query computing the SAME packing as :func:`pack_sequences`
    (one window function — the single-node mirror of the distributed
    prefix sum)."""
    return f"""
        WITH tc AS (
          SELECT {id_col},
                 CASE WHEN {text_expr} IS NULL OR trim({text_expr}) = '' THEN 0
                      ELSE len(regexp_split_to_array({text_expr}, '\\s+')) END::BIGINT AS n_tokens
          FROM {table}
        ),
        c AS (
          SELECT {id_col}, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY {id_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS pre
          FROM tc
        )
        SELECT {id_col}, n_tokens,
               CAST(pre // {seq_len} AS BIGINT) AS seq_id,
               CAST(pre % {seq_len} AS BIGINT) AS seq_pos
        FROM c"""
