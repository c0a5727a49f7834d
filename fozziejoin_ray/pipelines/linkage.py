"""Flagship pipeline: entity resolution over interleaved text+media
documents (BASELINE.json north_star).

    documents(doc_id, spans)
      └─ key extraction: first text span's text          [map_batches]
      └─ blocking + vectorized pairwise scoring          [blocked self-join]
      └─ match edges (doc_a, doc_b, dist <= threshold)
      └─ transitive clustering                           [connected components]
      └─ clusters (doc_id, cluster_id); isolated docs keep their own id

The wide ``spans`` column NEVER travels through a shuffle: only
(doc_id, key) rows are emitted into the blocking exchange, and outputs
re-attach spans by doc_id — preserving the per-row span-sequence
invariant (kind, text, media_ref, order) by construction.

With ``checkpoint_dir`` set, the edge and cluster stages are persisted
as parquet partitions under a manifest (state/checkpoint.py) and a
re-run with identical parameters + input fingerprint skips completed
stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..cluster.union_find import connected_components
from ..joins.blocked import build_edges_blocked
from ..joins.hashjoin import hash_join
from ..state.checkpoint import Manifest, fingerprint


def extract_keys(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, key): the first text span's text per document; documents
    with no text span get a null key (NA never matches, so they surface
    as singleton clusters)."""

    def fn(t: pa.Table) -> pa.Table:
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        parents = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kind = pc.struct_field(flat, "kind")
        text = pc.struct_field(flat, "text")
        mask = pc.and_(
            pc.equal(kind, "text"),
            pc.and_(pc.is_valid(text), pc.not_equal(text, "")),
        ).to_numpy(zero_copy_only=False)
        sel = np.nonzero(mask)[0]
        # flattened spans are in row order; first masked hit per parent wins
        first_parent, first_pos = np.unique(parents[sel], return_index=True)
        key_vals = text.take(pa.array(sel[first_pos])).to_numpy(zero_copy_only=False)
        keys = np.full(t.num_rows, None, dtype=object)
        keys[first_parent] = key_vals
        return pa.table({"doc_id": t["doc_id"], "key": pa.array(keys, pa.string())})

    return docs.map_batches(fn, batch_format="pyarrow")


def match_edges(
    keys: rd.Dataset,
    *,
    method: str = "jaro_winkler",
    max_distance: float = 0.15,
    q: int = 2,
    pair_budget: int | None = 4_000_000,
    allpairs_salts: tuple[int, int] = (8, 8),
    blocking: str = "exact",
    num_partitions: int = 32,
    minhash_bands: int = 32,
    minhash_perm: int = 64,
    shingle_k: int = 2,
) -> rd.Dataset:
    """Self-join the key table under fozziejoin string semantics; edges
    (src, dst, dist) with src < dst, exactly once per pair.

    ``blocking``:
    - "exact": the method's recall-complete strategy (for jw this is a
      salted cross product — O(n^2) candidates, exactly the reference's
      all-pairs semantics; fine up to ~10^4-10^5 keys);
    - "minhash": banded MinHash buckets over key shingles generate
      candidates, the string kernel verifies ``dist <= max_distance``.
      Near-linear in corpus size; recall is approximate (a matching
      pair is missed only if no band agrees — vanishing for the high
      shingle overlap that small string distances imply). This is the
      10^12-document path from the north_star.
    """
    if blocking == "exact":
        edges = build_edges_blocked(
            keys,
            None,
            [("key", "key")],
            method,
            max_distance,
            q,
            0,
            0.0,
            "doc_id",
            None,
            pair_budget=pair_budget,
            allpairs_salts=allpairs_salts,
        )
        return edges.map_batches(
            lambda t: pa.table(
                {"src": t["__fj_lid"], "dst": t["__fj_rid"], "dist": t["__fj_d0"]}
            ),
            batch_format="pyarrow",
        )
    if blocking != "minhash":
        raise ValueError(f"unknown blocking {blocking!r}")

    from ..kernels.strdist import score_pairs

    # Value-level dedup BEFORE candidate generation (the reference's
    # score-distinct-values-once design, utils.rs:7-20, taken distributed):
    # identical keys would otherwise share every LSH bucket and blow the
    # per-bucket pair loop quadratic in the duplicate count. Each distinct
    # key gets a representative (min doc id); duplicates connect to their
    # representative with zero-distance edges, and scoring runs once per
    # distinct value pair.
    import pandas as pd

    def add_part(t: pa.Table) -> pa.Table:
        keyarr = t["key"].combine_chunks() if isinstance(t["key"], pa.ChunkedArray) else t["key"]
        h = pd.util.hash_array(
            np.asarray(keyarr.to_numpy(zero_copy_only=False)), categorize=False
        )
        return t.append_column("__kp", pa.array((h % num_partitions).astype(np.int64)))

    def rep_rows(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["key"].notna()]
        if not len(df):
            return pd.DataFrame({"doc_id": [], "rep": [], "key": []})
        reps = df.groupby("key", sort=False)["doc_id"].transform("min")
        return pd.DataFrame({"doc_id": df["doc_id"], "rep": reps, "key": df["key"]})

    doc_rep = (
        keys.map_batches(add_part, batch_format="pyarrow")
        .groupby("__kp")
        .map_groups(rep_rows, batch_format="pandas")
        .materialize()
    )
    identity_edges = doc_rep.map_batches(
        lambda t: (
            lambda m: pa.table(
                {
                    "src": pa.compute.if_else(
                        pa.compute.less(t["doc_id"], t["rep"]), t["doc_id"], t["rep"]
                    ).filter(m),
                    "dst": pa.compute.if_else(
                        pa.compute.less(t["doc_id"], t["rep"]), t["rep"], t["doc_id"]
                    ).filter(m),
                    "dist": pa.array(
                        np.zeros(m.to_numpy(zero_copy_only=False).sum()), pa.float64()
                    ),
                }
            )
        )(pa.compute.not_equal(t["doc_id"], t["rep"])),
        batch_format="pyarrow",
    )
    distinct_vals = doc_rep.map_batches(
        lambda t: t.filter(pa.compute.equal(t["doc_id"], t["rep"])).select(["rep", "key"]),
        batch_format="pyarrow",
    )

    # Fused LSH candidate generation + verification (shared machinery,
    # dedup.lsh_fused_edges): exactly-once across bands, no candidate
    # dedup shuffle, no text join-back.
    from .dedup import lsh_fused_edges

    def string_score_fn(a_list, b_list):
        d = score_pairs(method, a_list, b_list, q=q)
        keep = d <= max_distance
        return keep, d[keep]

    scored = lsh_fused_edges(
        distinct_vals,
        "key",
        "rep",
        string_score_fn,
        num_perm=minhash_perm,
        bands=minhash_bands,
        shingle_k=shingle_k,
        num_partitions=num_partitions,
    )
    edges = scored.map_batches(
        lambda t: pa.table(
            {
                "src": t["a"].cast(pa.string()),
                "dst": t["b"].cast(pa.string()),
                "dist": t["score"],
            }
        ),
        batch_format="pyarrow",
    )
    return edges.union(identity_edges)


def cluster_documents(
    docs: rd.Dataset,
    *,
    method: str = "jaro_winkler",
    max_distance: float = 0.15,
    q: int = 2,
    pair_budget: int | None = 4_000_000,
    allpairs_salts: tuple[int, int] = (8, 8),
    checkpoint_dir: str | None = None,
    num_partitions: int = 32,
    id_type: pa.DataType = pa.string(),
    blocking: str = "exact",
) -> rd.Dataset:
    """(doc_id, cluster_id) for every document; cluster_id = min doc_id of
    the connected component; singletons cluster to themselves.

    ``id_type`` is the Arrow type of ``doc_id`` — passed explicitly so no
    ``schema()`` sampling executes on the (possibly derived) input."""
    keys = extract_keys(docs)

    params = {
        "method": method,
        "max_distance": max_distance,
        "q": q,
        "pair_budget": pair_budget,
        "salts": list(allpairs_salts),
        "blocking": blocking,
    }

    def build_edges():
        return match_edges(
            keys,
            method=method,
            max_distance=max_distance,
            q=q,
            pair_budget=pair_budget,
            allpairs_salts=allpairs_salts,
            blocking=blocking,
            num_partitions=num_partitions,
        )

    if checkpoint_dir is not None:
        manifest = Manifest(checkpoint_dir)
        n_docs = docs.count()
        fp_edges = fingerprint({"stage": "edges", "n_docs": n_docs, **params})
        edges = manifest.run_stage("edges", fp_edges, build_edges)
        labels = manifest.run_stage(
            "labels",
            fingerprint({"stage": "labels", "edges_fp": fp_edges}),
            lambda: connected_components(edges, "src", "dst", num_partitions=num_partitions),
        )
    else:
        edges = build_edges()
        labels = connected_components(edges, "src", "dst", num_partitions=num_partitions)

    # every document gets a cluster row; unmatched docs cluster to themselves
    labels_r = labels.map_batches(
        lambda t: pa.table({"__cc_node": t["node"], "__cc_lbl": t["cluster"]}),
        batch_format="pyarrow",
    )
    idt = id_type
    ids = keys.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    joined = hash_join(
        ids,
        labels_r,
        "doc_id",
        "__cc_node",
        how="left_outer",
        num_partitions=num_partitions,
        left_schema=pa.schema([("doc_id", idt)]),
        right_schema=pa.schema([("__cc_node", idt), ("__cc_lbl", idt)]),
    )
    return joined.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"],
                "cluster_id": pc.coalesce(t["__cc_lbl"], t["doc_id"]),
            }
        ),
        batch_format="pyarrow",
    )


def clustered_documents(docs: rd.Dataset, clusters: rd.Dataset, num_partitions: int = 32) -> rd.Dataset:
    """Re-attach the untouched spans column to cluster assignments by
    doc_id (spans never crossed a shuffle)."""
    cl = clusters.map_batches(
        lambda t: pa.table({"__cl_doc": t["doc_id"], "cluster_id": t["cluster_id"]}),
        batch_format="pyarrow",
    )
    return hash_join(docs, cl, "doc_id", "__cl_doc", how="inner", num_partitions=num_partitions)


def pairwise_f1(pred_pairs: set, true_pairs: set) -> dict:
    tp = len(pred_pairs & true_pairs)
    prec = tp / len(pred_pairs) if pred_pairs else 1.0
    rec = tp / len(true_pairs) if true_pairs else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1, "tp": tp}


def cluster_pairs(assignments: list[tuple[str, str]]) -> set:
    """All unordered same-cluster doc pairs from (doc_id, cluster_id)."""
    from collections import defaultdict
    from itertools import combinations

    by_cluster = defaultdict(list)
    for d, c in assignments:
        by_cluster[c].append(d)
    out = set()
    for members in by_cluster.values():
        for a, b in combinations(sorted(members), 2):
            out.add((a, b))
    return out
