"""Pairwise-F1 evidence for the headline correctness rule: the engine's
flagship entity clusters vs the reference-semantics SQL oracle
(`linkage_clusters`' DuckDB CTE), scored the way entity-resolution
papers score clusterings — precision/recall/F1 over the set of
UNORDERED SAME-CLUSTER PAIRS.

The driver's hash check already proves label-table equality; this tool
restates that as the rule's own metric ("pairwise F1 >= 0.99 on labeled
pairs") and emits a JSON artifact.

Usage: python tools/measure_f1.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import sys
import time


def pair_count_by_cluster(labels: dict) -> dict:
    """cluster label -> member list."""
    groups: dict = {}
    for node, lab in labels.items():
        groups.setdefault(lab, []).append(node)
    return groups


def pair_set(labels: dict) -> set:
    out = set()
    for members in pair_count_by_cluster(labels).values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                out.add((ms[i], ms[j]))
    return out


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "F1_linkage.json"

    import os

    import duckdb
    import ray

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    t0 = time.time()
    res = e.queries()["linkage_clusters"](sf)
    got = {}
    for batch in res.iter_batches(batch_size=None, batch_format="pyarrow"):
        got.update(zip(batch["doc_id"].to_pylist(), batch["cluster_id"].to_pylist()))
    engine_sec = time.time() - t0

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    odf = con.execute(e.oracle_sql()["linkage_clusters"]).df()
    ocols = list(odf.columns)
    ref = dict(zip(odf[ocols[0]], odf[ocols[1]]))

    got_pairs = pair_set(got)
    ref_pairs = pair_set(ref)
    tp = len(got_pairs & ref_pairs)
    precision = tp / len(got_pairs) if got_pairs else 1.0
    recall = tp / len(ref_pairs) if ref_pairs else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0

    artifact = {
        "metric": "pairwise F1 of flagship entity clusters vs the reference-semantics SQL oracle (same method/threshold/blocking)",
        "sf": sf,
        "n_docs": len(got),
        "engine_same_cluster_pairs": len(got_pairs),
        "oracle_same_cluster_pairs": len(ref_pairs),
        "true_positive_pairs": tp,
        "pairwise_precision": round(precision, 6),
        "pairwise_recall": round(recall, 6),
        "pairwise_f1": round(f1, 6),
        "engine_sec": round(engine_sec, 2),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))
    ray.shutdown()


if __name__ == "__main__":
    main()
