"""Distributed PageRank over an edge table — the ranking sibling of the
connected-components pass (cluster/union_find.py): after transitive
clustering, rank nodes by link structure to pick canonical records, hub
documents, or crawl priorities.

Two physical strategies, same math (power iteration with damping ``d``,
uniform teleport, dangling mass redistributed uniformly — the standard
formulation):

- ``strategy="broadcast"`` (default, node set fits the object store):
  node ids are factorized ONCE into a dense [0, N) index (one distinct
  exchange), edges are re-encoded to int32 index pairs and materialized,
  and each iteration is ONE streamed pass: every edge batch scatter-adds
  ``rank[src]/deg[src]`` into a dense float64 contribution vector
  (np.add.at — vectorized, no per-edge Python), per-batch vectors reduce
  driver-side (length N each, batches-many adds). Driver memory O(N)
  floats — the same bound as kmeans' centroid reduce, fine up to ~10^8
  nodes; the RANKS are what must fit, never the edges.
- ``strategy="shuffle"`` (node set itself is web-scale): ranks live in a
  Dataset, each iteration joins ranks onto edges by src (grace hash
  join), pre-aggregates contributions per dst inside each batch, and
  sums them with the combiner groupby — 2-3 exchanges per iteration, no
  driver-side state beyond the dangling-mass scalar.

Float sums are partial-sum reassociations, so ranks are stable to ~1e-12
but not bit-identical across partitionings; there is deliberately no SQL
oracle (iterative float math) — pytest verifies against a brute NumPy
power iteration within 1e-9.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _distinct_nodes(clean_edges: rd.Dataset) -> pa.Array:
    """All distinct node ids (s ∪ d) of the CLEANED string edge table,
    one distinct pass per batch + a driver unique over the survivors
    (bounded by node cardinality)."""

    def uniq(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t["s"].combine_chunks(), t["d"].combine_chunks()]
        )
        return pa.table({"n": pc.unique(both)})

    parts = [
        b["n"]
        for b in clean_edges.map_batches(uniq, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    if not parts:
        return pa.array([], pa.string())
    return pc.unique(pa.concat_arrays([p.combine_chunks() for p in parts]))


def pagerank(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 20,
    strategy: str = "broadcast",
    num_partitions: int = 32,
    round_to: int = 8,
) -> rd.Dataset:
    """PageRank over directed edges ``(src_col, dst_col)``. Returns
    ``(node, rank)`` for every node appearing in the edge table, ranks
    summing to 1 (damping teleport + uniform dangling redistribution).
    NULL endpoints are dropped (an edge needs both ends). Duplicate
    edges count once each (multigraph semantics, matching the classic
    formulation over a link multiset). Node ids are returned as STRINGS
    (cast once so the src ∪ dst union is type-stable)."""
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"strategy must be 'broadcast' or 'shuffle', got {strategy!r}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")

    # materialize the cleaned string edge table ONCE: the node-set
    # pass, the re-encode/degree passes and every iteration all read it
    # (the same materialize-once shape the CC pipeline uses)
    def clean(t: pa.Table) -> pa.Table:
        sc = t[src_col].cast(pa.string())
        dc = t[dst_col].cast(pa.string())
        ok = pc.and_(pc.is_valid(sc), pc.is_valid(dc))
        return pa.table({"s": sc, "d": dc}).filter(ok)

    e = edges.select_columns([src_col, dst_col]).map_batches(
        clean, batch_format="pyarrow"
    ).materialize()
    nodes = _distinct_nodes(e)
    n = len(nodes)
    if n == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "rank": pa.array([], pa.float64())})
        )
    if strategy == "shuffle":
        return _pagerank_shuffle(e, nodes, damping, iters, num_partitions, round_to)

    # ---- broadcast strategy: dense [0, N) re-encoding, one pass/iter
    import pandas as pd

    idx = pd.Index(nodes.to_pandas())
    nref = ray.put(idx)

    def encode(t: pa.Table) -> pa.Table:
        index = ray.get(nref)
        si = index.get_indexer(t["s"].to_pandas()).astype(np.int64)
        di = index.get_indexer(t["d"].to_pandas()).astype(np.int64)
        return pa.table({"si": pa.array(si), "di": pa.array(di)})

    enc = e.map_batches(encode, batch_format="pyarrow").materialize()

    # out-degree: one streamed bincount reduce
    deg = np.zeros(n, dtype=np.int64)
    for b in enc.iter_batches(batch_size=None, batch_format="pyarrow"):
        deg += np.bincount(b["si"].to_numpy(zero_copy_only=False), minlength=n)

    rank = np.full(n, 1.0 / n, dtype=np.float64)
    safe_deg = np.maximum(deg, 1)
    for _ in range(iters):
        w = rank / safe_deg
        wref = ray.put(w)

        def contrib(t: pa.Table) -> pa.Table:
            wv = ray.get(wref)
            out = np.zeros(len(wv), dtype=np.float64)
            np.add.at(
                out,
                t["di"].to_numpy(zero_copy_only=False),
                wv[t["si"].to_numpy(zero_copy_only=False)],
            )
            return pa.table({"c": pa.array([out])})

        total = np.zeros(n, dtype=np.float64)
        for b in enc.map_batches(contrib, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            total += (
                b["c"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
                .reshape(-1, n)
                .sum(axis=0)
            )
        dangling = rank[deg == 0].sum()
        rank = (1.0 - damping) / n + damping * (total + dangling / n)

    return rd.from_arrow(
        pa.table({"node": nodes, "rank": pa.array(np.round(rank, round_to))})
    )


def _pagerank_shuffle(
    e, nodes, damping, iters, num_partitions, round_to
) -> rd.Dataset:
    """Web-scale path: ranks as a Dataset, 2 exchanges per iteration
    (``e`` is the caller's materialized cleaned string edge table)."""
    from ..joins.hashjoin import hash_join
    from ..pipelines.stats import group_aggregate

    n = len(nodes)
    # degrees are iteration-invariant: materialize so the per-iteration
    # dangling-mass pass never re-runs the aggregate over all edges
    degrees = group_aggregate(
        e, ["s"], {"deg": ("count", "*")}, num_partitions=num_partitions
    ).materialize()
    # group_aggregate emits pandas blocks (numpy dtypes in Ray's schema
    # report) — give the joins explicit Arrow schemas
    dschema = pa.schema([("s", pa.string()), ("deg", pa.int64())])
    ewd = hash_join(
        e, degrees, "s", "s", how="inner", num_partitions=num_partitions,
        right_schema=dschema,
    ).materialize()

    node_ds = rd.from_arrow(pa.table({"node": nodes})).materialize()
    ranks = rd.from_arrow(
        pa.table({"node": nodes, "rank": pa.array(np.full(n, 1.0 / n))})
    ).materialize()
    rschema = pa.schema([("node", pa.string()), ("rank", pa.float64())])
    cschema = pa.schema([("d", pa.string()), ("contrib", pa.float64())])
    nschema = pa.schema([("node", pa.string())])
    # the no-out-edge node set never changes: compute it once
    dang_nodes = hash_join(
        node_ds, degrees, "node", "s", how="left_anti",
        num_partitions=num_partitions, left_schema=nschema,
        right_schema=dschema,
    ).materialize()

    for it in range(iters):
        joined = hash_join(
            ewd, ranks, "s", "node", how="inner",
            num_partitions=num_partitions, right_schema=rschema,
        )

        def partial(t: pa.Table) -> pa.Table:
            import pandas as pd

            d = t["d"].to_pandas()
            w = (
                t["rank"].to_numpy(zero_copy_only=False)
                / t["deg"].to_numpy(zero_copy_only=False)
            )
            g = pd.Series(w).groupby(d.values, sort=False).sum()
            return pa.table(
                {"d": pa.array(g.index.astype(str)), "contrib": pa.array(g.to_numpy())}
            )

        contribs = group_aggregate(
            joined.map_batches(partial, batch_format="pyarrow"),
            ["d"],
            {"contrib": ("sum", "contrib")},
            num_partitions=num_partitions,
        )
        # dangling mass: ranks of the (static) no-out-edge node set
        no_out = hash_join(
            dang_nodes, ranks, "node", "node", how="inner",
            num_partitions=num_partitions,
            left_schema=nschema, right_schema=rschema,
        )
        dangling = 0.0
        for b in no_out.iter_batches(batch_size=None, batch_format="pyarrow"):
            dangling += float(pc.sum(b["rank"]).as_py() or 0.0)

        merged = hash_join(
            node_ds, contribs, "node", "d", how="left_outer",
            num_partitions=num_partitions, right_schema=cschema,
        )
        base = (1.0 - damping) / n + damping * dangling / n

        def update(t: pa.Table) -> pa.Table:
            c = pc.fill_null(t["contrib"], 0.0)
            r = pc.add(pc.multiply(c, pa.scalar(damping)), pa.scalar(base))
            return pa.table({"node": t["node"], "rank": r})

        ranks = merged.map_batches(update, batch_format="pyarrow").materialize()

    def final(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": t["node"], "rank": pc.round(t["rank"], ndigits=round_to)}
        )

    return ranks.map_batches(final, batch_format="pyarrow")
