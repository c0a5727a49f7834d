"""Okapi BM25 top-k retrieval over a document table — the standard
lexical ranking a data-curation / retrieval pipeline runs next to
TF-IDF (pipelines/text.py) and embedding ANN (pipelines/ann.py).

score(D, Q) = sum over query terms t of
    idf(t) * f(t,D) * (k1 + 1) / (f(t,D) + k1 * (1 - b + b * |D|/avgdl))
with idf(t) = ln((N - df(t) + 0.5) / (df(t) + 0.5) + 1)   (Lucene form,
always positive), over the shared lowercase ASCII tokenizer
(pipelines/lm.py). Documents containing no query term score 0 and still
participate in the ranking (ties resolve by id, so the order is total
and cross-engine deterministic on the ROUNDED score).

Scale shape: TWO streaming passes over a materialized input.
Pass 1 reduces each batch to ONE tiny stats row (doc count, token
count, per-term document frequencies — the query has a handful of
terms, so the row is a handful of ints); the driver sums the partials.
Pass 2 scores each batch fully vectorized (one flat == scan per query
term, bincount by doc — loops over TERMS, never rows), prunes to the
local top-k, and a distributed sort+limit over <= k * num_batches
candidate rows picks the global answer. No shuffle of corpus data at
any point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .lm import _flat_tokens


def bm25_topk(
    ds: rd.Dataset,
    query: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> rd.Dataset:
    """Top ``top_k`` documents by BM25 against ``query`` (whitespace/
    punctuation-tokenized like the corpus; duplicate query terms are
    scored once). Output: ``(id_col, bm25)`` with bm25 rounded to 6."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    terms = sorted(set(t for t in _query_terms(query) if t))
    if not terms:
        raise ValueError(f"query {query!r} contains no tokenizable terms")
    ds = ds.materialize()

    def stats(t: pa.Table) -> pa.Table:
        parents, toks = _flat_tokens(t, text_col)
        cols: dict[str, object] = {
            "n_docs": np.array([t.num_rows], np.int64),
            "n_tokens": np.array([len(toks)], np.int64),
        }
        for i, term in enumerate(terms):
            hit = parents[toks == term]
            cols[f"df_{i}"] = np.array([len(np.unique(hit))], np.int64)
        return pa.table(cols)

    parts = pa.concat_tables(
        ds.map_batches(stats, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    n = int(pc.sum(parts["n_docs"]).as_py() or 0)
    if n == 0:
        return rd.from_arrow(
            pa.table({id_col: pa.nulls(0, pa.int64()), "bm25": pa.nulls(0, pa.float64())})
        )
    avgdl = float(pc.sum(parts["n_tokens"]).as_py() or 0) / n
    idf = np.array(
        [
            np.log(
                (n - int(pc.sum(parts[f"df_{i}"]).as_py() or 0) + 0.5)
                / (int(pc.sum(parts[f"df_{i}"]).as_py() or 0) + 0.5)
                + 1.0
            )
            for i in range(len(terms))
        ],
        np.float64,
    )

    def score(t: pa.Table) -> pa.Table:
        idc = t[id_col].combine_chunks() if isinstance(t[id_col], pa.ChunkedArray) else t[id_col]
        parents, toks = _flat_tokens(t, text_col)
        dl = np.bincount(parents, minlength=t.num_rows).astype(np.float64)
        denom_dl = k1 * (1.0 - b + b * (dl / avgdl if avgdl > 0 else dl))
        sc = np.zeros(t.num_rows, np.float64)
        for i, term in enumerate(terms):
            f = np.bincount(parents[toks == term], minlength=t.num_rows).astype(np.float64)
            sc += idf[i] * f * (k1 + 1.0) / np.where(f > 0, f + denom_dl, 1.0) * (f > 0)
        sc_r = pc.round(
            pa.array(sc, pa.float64()), ndigits=6, round_mode="half_towards_infinity"
        ).to_numpy(zero_copy_only=False)
        ids = idc.to_numpy(zero_copy_only=False)
        order = np.sort(np.lexsort((ids, -sc_r))[:top_k])
        return pa.table(
            {
                id_col: idc.take(pa.array(order)),
                "bm25": pa.array(sc_r[order], pa.float64()),
                "__neg": pa.array(-sc_r[order], pa.float64()),
            }
        )

    out = ds.map_batches(score, batch_format="pyarrow").sort(["__neg", id_col]).limit(top_k)
    return out.map_batches(lambda t: t.drop_columns(["__neg"]), batch_format="pyarrow")


def _query_terms(query: str) -> list[str]:
    import re

    return re.findall(r"[0-9a-z_]+", query.lower())
