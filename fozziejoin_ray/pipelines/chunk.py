"""Fixed-size token chunking with overlap — the standard pre-training
"split long documents into model-window pieces" operator (the inverse
of pipelines/pack.py's sequence packing).

Tokenization is the engine-wide whitespace convention: split on runs of
whitespace, drop empty pieces (matches ``token_count``'s ``n_tokens_ws``
and the DuckDB ``regexp_split_to_array(text, '\\s+')`` + filter oracle).

Chunk layout for a doc with ``n`` tokens, window ``chunk_size`` and
``overlap`` (stride = chunk_size - overlap):

- ``n == 0`` -> no chunks (empty/whitespace-only docs vanish, documented);
- else chunks ``j = 0 .. ceil(max(0, n - chunk_size) / stride)``, chunk j
  covering tokens ``[j*stride, min(j*stride + chunk_size, n))`` — every
  token appears in at least one chunk, the last chunk may be short, and
  no chunk starts at-or-past the end (so no empty tail chunks and no
  chunk fully contained in the previous one).

Scale design: pure per-batch flat map, ZERO shuffle. The hot path is
all array ops — one Arrow regex split per batch, numpy repeat/arange
index arithmetic to materialize the (overlapping) token gather list,
one ``take`` and one C++ ``binary_join`` to re-join chunk texts. No
per-row or per-chunk Python. Output rows carry (id, chunk_id, n_tokens,
text), so downstream stages (pack, dedup, scoring) stream straight off
this map.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def chunk_documents(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int,
    overlap: int = 0,
    out_text_col: str = "chunk_text",
) -> rd.Dataset:
    """One output row per (document, chunk): ``id_col``, ``chunk_id``
    (0-based), ``n_tokens`` (int64), ``out_text_col`` (space-joined)."""
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if not 0 <= overlap < chunk_size:
        raise ValueError("overlap must satisfy 0 <= overlap < chunk_size")
    stride = chunk_size - overlap

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col]
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
        txt = t[text_col]
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) else txt
        # nulls tokenize to zero tokens -> no chunks
        txt = pc.coalesce(txt, pa.scalar("", pa.string()))
        toks = pc.split_pattern_regex(txt, r"\s+")
        flat = toks.flatten()
        keep = pc.not_equal(flat, "")
        # per-doc non-empty token counts from list offsets + a cumsum
        # over the keep mask (split_pattern_regex emits "" for leading/
        # trailing whitespace runs)
        offs = toks.offsets.to_numpy()
        kept = np.r_[0, np.cumsum(keep.to_numpy(zero_copy_only=False))]
        n = kept[offs[1:]] - kept[offs[:-1]]  # per-doc token count
        values = flat.filter(keep)  # flattened non-empty tokens
        starts_doc = kept[offs[:-1]]  # each doc's first token in `values`

        n_chunks = np.where(n == 0, 0, (np.maximum(n - chunk_size, 0) + stride - 1) // stride + 1)
        total = int(n_chunks.sum())
        empty_out = pa.table(
            {
                id_col: pa.nulls(0, ids.type),
                "chunk_id": pa.nulls(0, pa.int64()),
                "n_tokens": pa.nulls(0, pa.int64()),
                out_text_col: pa.nulls(0, pa.string()),
            }
        )
        if total == 0:
            return empty_out
        doc_of_chunk = np.repeat(np.arange(len(n)), n_chunks)
        c0 = np.r_[0, np.cumsum(n_chunks)][:-1]  # first chunk index per doc
        chunk_j = np.arange(total) - c0[doc_of_chunk]  # 0-based within doc
        tok0 = starts_doc[doc_of_chunk] + chunk_j * stride
        lens = np.minimum(chunk_size, n[doc_of_chunk] - chunk_j * stride)
        # gather indices: repeat each chunk's start, add an intra-chunk arange
        l0 = np.r_[0, np.cumsum(lens)]
        idx = np.repeat(tok0, lens) + (np.arange(l0[-1]) - np.repeat(l0[:-1], lens))
        gathered = values.take(pa.array(idx, pa.int64()))
        la = pa.ListArray.from_arrays(pa.array(l0, pa.int32()), gathered)
        texts = pc.binary_join(la, pa.scalar(" ", pa.string()))
        return pa.table(
            {
                id_col: ids.take(pa.array(doc_of_chunk, pa.int64())),
                "chunk_id": pa.array(chunk_j, pa.int64()),
                "n_tokens": pa.array(lens, pa.int64()),
                out_text_col: texts,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
