"""Blocking-quality metrics: the pre-flight instrument an entity-
resolution pipeline runs BEFORE committing to a blocking key at scale.

At 100 TB the choice of blocking key is the whole ballgame: too coarse
and candidate-pair generation explodes quadratically inside giant
blocks; too fine and true matches land in different blocks. This
operator measures, per candidate strategy, exactly the numbers that
decision needs — block count, candidate-pair count (sum of
c*(c-1)/2 over blocks, i.e. the self-join workload the scorer would
face), the largest block (the skew/straggler bound a salting step must
handle), and the reduction ratio vs the full N*(N-1)/2 cross product —
in ONE streamed pass over the corpus plus one bounded exchange:

    docs ── map_batches: all strategies' keys per row, in-batch
            (strategy, key) partial counts            [combiner]
         ── groupby(strategy, key).sum                [one exchange,
            rows ≤ Σ distinct keys, never corpus rows]
         ── map_batches per-strategy partial stats    [combiner]
         ── groupby(strategy).map_groups final merge  [≤ |strategies|
            rows]

Block sizes, not rows, travel through both exchanges, so driver and
shuffle memory are bounded by key cardinality. Strategies are
deterministic, SQL-mirrorable key functions (the oracle in
__ray_entry__.py reproduces each in DuckDB):

- ``first_token``: ``lower(split_part(text, ' ', 1))``
- ``prefix4``:     ``lower(substr(text, 1, 4))``
- ``len_bucket``:  ``CAST(n_chars // 16 AS VARCHAR)``

NULL texts / empty keys are excluded from blocking (NA never matches
— reference semantics, fozziejoin R/fuzzy_join.R join-key NA
handling), so ``blocked_docs`` reports per-strategy coverage too.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

__all__ = ["blocking_stats", "blocking_pair_completeness", "STRATEGIES"]


def _key_first_token(t: pa.Table) -> pa.Array:
    txt = t.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    first = pc.list_element(pc.split_pattern(txt, " "), 0)
    return pc.utf8_lower(first)


def _key_prefix4(t: pa.Table) -> pa.Array:
    txt = t.column("text")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    return pc.utf8_lower(pc.utf8_slice_codeunits(txt, 0, 4))


def _key_len_bucket(t: pa.Table) -> pa.Array:
    n = t.column("n_chars")
    if isinstance(n, pa.ChunkedArray):
        n = n.combine_chunks()
    return pc.cast(pc.divide(n, pa.scalar(16, n.type)), pa.string())


STRATEGIES = {
    "first_token": _key_first_token,
    "prefix4": _key_prefix4,
    "len_bucket": _key_len_bucket,
}


def blocking_stats(
    docs: rd.Dataset,
    *,
    n_total: int,
    strategies: dict | None = None,
) -> rd.Dataset:
    """Per-strategy blocking metrics over ``docs`` (needs the columns
    each strategy's key function reads — default set: text, n_chars).

    ``n_total`` is the corpus row count (callers get it for free from
    parquet metadata via ``read_parquet(...).count()``); it denominates
    ``reduction_ratio = 1 - candidate_pairs / (n*(n-1)/2)``.

    Returns one row per strategy: (strategy, n_blocks, blocked_docs,
    candidate_pairs, max_block, reduction_ratio), all counts int64,
    ratio float64.
    """
    strategies = STRATEGIES if strategies is None else strategies
    names = sorted(strategies)
    if n_total < 0:
        raise ValueError(f"n_total must be >= 0, got {n_total}")
    total_pairs = n_total * (n_total - 1) // 2

    def partial_counts(t: pa.Table) -> pa.Table:
        strat_parts, key_parts = [], []
        for name in names:
            k = strategies[name](t)
            k = k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
            keep = pc.and_(pc.is_valid(k), pc.not_equal(k, "")).fill_null(False)
            k = k.filter(keep)
            if len(k):
                strat_parts.append(pa.array([name] * len(k), pa.string()))
                key_parts.append(pc.cast(k, pa.string()))
        if not strat_parts:
            return pa.table(
                {
                    "strategy": pa.array([], pa.string()),
                    "key": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        flat = pa.table(
            {
                "strategy": pa.concat_arrays(strat_parts),
                "key": pa.concat_arrays(key_parts),
            }
        )
        agg = flat.group_by(["strategy", "key"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "strategy": agg.column("strategy"),
                "key": agg.column("key"),
                "c": pc.cast(agg.column("count_all"), pa.int64()),
            }
        )

    merged = (
        docs.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["strategy", "key"])
        .sum("c")
    )

    def partial_stats(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "strategy": t.column("strategy").to_numpy(zero_copy_only=False),
                "c": t.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        df["pairs"] = df["c"] * (df["c"] - 1) // 2
        g = df.groupby("strategy", sort=False)
        out = g.agg(
            n_blocks=("c", "size"),
            blocked_docs=("c", "sum"),
            candidate_pairs=("pairs", "sum"),
            max_block=("c", "max"),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(
                [
                    ("strategy", pa.string()),
                    ("n_blocks", pa.int64()),
                    ("blocked_docs", pa.int64()),
                    ("candidate_pairs", pa.int64()),
                    ("max_block", pa.int64()),
                ]
            )
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "strategy": [df["strategy"].iloc[0]],
                "n_blocks": [np.int64(df["n_blocks"].sum())],
                "blocked_docs": [np.int64(df["blocked_docs"].sum())],
                "candidate_pairs": [np.int64(df["candidate_pairs"].sum())],
                "max_block": [np.int64(df["max_block"].max())],
            }
        )
        out["reduction_ratio"] = (
            1.0 - out["candidate_pairs"].astype(np.float64) / float(total_pairs)
            if total_pairs
            else np.float64(1.0)
        )
        return out

    return (
        merged.map_batches(partial_stats, batch_format="pyarrow")
        .groupby("strategy")
        .map_groups(finalize, batch_format="pandas")
    )


def blocking_pair_completeness(
    ds: rd.Dataset, key_col: str, truth_col: str
) -> dict:
    """Pair completeness (recall of the blocking step): the fraction of
    ground-truth match pairs that share a blocking key — the OTHER half
    of the blocking trade-off ``blocking_stats`` measures (reduction
    ratio says how much work blocking saves; completeness says how many
    true matches it can still find). Labeled corpora only (tests use
    sources/docgen.py's (doc_id, entity_id) truth table).

    true_pairs      = sum over truth groups e of c_e*(c_e-1)/2
    co_blocked      = sum over (key, truth) groups of c*(c-1)/2
                      (rows with a NULL/empty key are unblocked and
                      can co-block with nothing)
    completeness    = co_blocked / true_pairs

    Both sums are computed from per-batch (group, count) PARTIALS
    merged by one bounded groupby each — group sizes travel, rows
    don't — then reduced to scalars from the (distinct group, count)
    tables streamed through ``iter_batches`` (driver memory bounded by
    group cardinality). Returns {"true_pairs", "co_blocked_pairs",
    "pair_completeness"}.
    """

    def _pairs_total(grouped: rd.Dataset) -> int:
        total = 0
        for b in grouped.iter_batches(batch_size=None, batch_format="pyarrow"):
            c = b.column("sum(c)").to_numpy(zero_copy_only=False).astype(np.int64)
            total += int((c * (c - 1) // 2).sum())
        return total

    def truth_partial(t: pa.Table) -> pa.Table:
        e = t.column(truth_col)
        e = e.combine_chunks() if isinstance(e, pa.ChunkedArray) else e
        vc = e.drop_null().value_counts()
        return pa.table(
            {
                "g": pc.cast(pc.struct_field(vc, "values"), pa.string()),
                "c": pc.cast(pc.struct_field(vc, "counts"), pa.int64()),
            }
        )

    def blocked_partial(t: pa.Table) -> pa.Table:
        k = t.column(key_col)
        k = k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k
        k = pc.cast(k, pa.string())
        keep = pc.and_(
            pc.and_(pc.is_valid(k), pc.not_equal(k, "")),
            pc.is_valid(t.column(truth_col)),
        ).fill_null(False)
        sub = pa.table(
            {"k": k, "e": pc.cast(t.column(truth_col), pa.string())}
        ).filter(keep)
        agg = sub.group_by(["k", "e"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "g": pc.binary_join_element_wise(
                    agg.column("k"), agg.column("e"), "\x1f"
                ),
                "c": pc.cast(agg.column("count_all"), pa.int64()),
            }
        )

    true_pairs = _pairs_total(
        ds.map_batches(truth_partial, batch_format="pyarrow").groupby("g").sum("c")
    )
    co_blocked = _pairs_total(
        ds.map_batches(blocked_partial, batch_format="pyarrow").groupby("g").sum("c")
    )
    return {
        "true_pairs": true_pairs,
        "co_blocked_pairs": co_blocked,
        "pair_completeness": (co_blocked / true_pairs) if true_pairs else 1.0,
    }
