"""A/B the PageRank shuffle strategy on the BASELINE.md bench graph
(the sf0.1 symmetrized supplier-part lineitem graph: ~1.2M edges /
~21k nodes) — the round-4 Dataset-join design measured 107.5 s for
5 iterations (~21 s/iter of exchange); this records the BSP
shard-actor replacement on the same input plus the broadcast
reference.

Usage: python tools/bench_pagerank_shuffle.py [sf_dir] [num_cpus]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(os.environ.get("RAY_GRAFT_CPUS", 32))

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from fozziejoin_ray.cluster.pagerank import pagerank

    li = rd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_suppkey", "l_partkey"])

    def mk_edges(t: pa.Table) -> pa.Table:
        s = pc.binary_join_element_wise("s", pc.cast(t["l_suppkey"], pa.string()), "")
        p = pc.binary_join_element_wise("p", pc.cast(t["l_partkey"], pa.string()), "")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        if isinstance(p, pa.ChunkedArray):
            p = p.combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([s, p]),
                "dst": pa.concat_arrays([p, s]),
            }
        )

    edges = li.map_batches(mk_edges, batch_format="pyarrow").materialize()
    n_edges = edges.count()

    out = {"sf": sf, "num_cpus": cpus, "n_edges": n_edges}
    for strategy, iters in (("shuffle", 5), ("broadcast", 20)):
        t0 = time.time()
        res = pagerank(edges, strategy=strategy, iters=iters, num_partitions=32).to_pandas()
        wall = time.time() - t0
        out[strategy] = {
            "iters": iters,
            "sec": round(wall, 2),
            "sec_per_iter": round(wall / iters, 2),
            "n_nodes": len(res),
            "rank_sum": round(float(res["rank"].sum()), 6),
        }
    # cross-strategy agreement on the same graph (5-iter shuffle vs a
    # 5-iter broadcast re-run)
    t0 = time.time()
    b5 = pagerank(edges, strategy="broadcast", iters=5, num_partitions=32).to_pandas()
    s5 = out["shuffle"]
    bd = b5.set_index("node")["rank"]
    sd = (
        pagerank(edges, strategy="shuffle", iters=5, num_partitions=32)
        .to_pandas()
        .set_index("node")["rank"]
    )
    out["max_abs_diff_5iter"] = float(np.abs((bd - sd).to_numpy()).max())
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
