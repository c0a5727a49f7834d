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
        keys = []
        for sp in t.column("spans").to_pylist():
            key = None
            for s in sp:
                if s["kind"] == "text" and s["text"]:
                    key = s["text"]
                    break
            keys.append(key)
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
) -> rd.Dataset:
    """Self-join the key table under fozziejoin string semantics; edges
    (src, dst, dist) with src < dst, exactly once per pair."""
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
        lambda t: pa.table({"src": t["__fj_lid"], "dst": t["__fj_rid"], "dist": t["__fj_d0"]}),
        batch_format="pyarrow",
    )


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
) -> rd.Dataset:
    """(doc_id, cluster_id) for every document; cluster_id = min doc_id of
    the connected component; singletons cluster to themselves."""
    keys = extract_keys(docs)

    params = {
        "method": method,
        "max_distance": max_distance,
        "q": q,
        "pair_budget": pair_budget,
        "salts": list(allpairs_salts),
    }

    def build_edges():
        return match_edges(
            keys,
            method=method,
            max_distance=max_distance,
            q=q,
            pair_budget=pair_budget,
            allpairs_salts=allpairs_salts,
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
    import pyarrow as _pa

    idt = dict(zip(docs.schema().names, docs.schema().types))["doc_id"]
    ids = keys.map_batches(lambda t: t.select(["doc_id"]), batch_format="pyarrow")
    joined = hash_join(
        ids,
        labels_r,
        "doc_id",
        "__cc_node",
        how="left_outer",
        num_partitions=num_partitions,
        left_schema=_pa.schema([("doc_id", idt)]),
        right_schema=_pa.schema([("__cc_node", idt), ("__cc_lbl", idt)]),
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
