"""top_k_per_group tests: brute-force oracle, ties, nulls, multi-col groups."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from fozziejoin_ray.pipelines.topk import top_k_per_group


def ds(**cols):
    return rd.from_arrow(pa.table(cols))


def brute(rows, k, descending=True):
    """rows: (g, v, tid). Returns {(g, tid): rank} for kept rows."""
    out = {}
    groups = {}
    for g, v, tid in rows:
        groups.setdefault(g, []).append((v, tid))
    for g, members in groups.items():
        members.sort(key=lambda m: (m[0] is None, (-m[0] if descending else m[0]) if m[0] is not None else 0, m[1]))
        for r, (v, tid) in enumerate(members[:k], 1):
            out[(g, tid)] = r
    return out


ROWS = [
    ("a", 5.0, 1), ("a", 7.0, 2), ("a", 7.0, 3), ("a", 1.0, 4), ("a", None, 5),
    ("b", 2.0, 6), ("b", None, 7),
    ("c", None, 8),
]


@pytest.mark.parametrize("k", [1, 2, 3])
@pytest.mark.parametrize("descending", [True, False])
def test_topk_matches_brute_force(k, descending):
    g, v, t = zip(*ROWS)
    d = ds(g=list(g), v=list(v), tid=list(t))
    out = top_k_per_group(d, "g", "v", k, descending=descending, tie_cols="tid", num_partitions=3).take_all()
    got = {(r["g"], r["tid"]): r["rank"] for r in out}
    assert got == brute(ROWS, k, descending), (k, descending)


def test_topk_tie_breaks_by_tie_col():
    d = ds(g=["a"] * 3, v=[7.0, 7.0, 7.0], tid=[30, 10, 20])
    out = top_k_per_group(d, "g", "v", 2, tie_cols="tid").take_all()
    assert sorted((r["tid"], r["rank"]) for r in out) == [(10, 1), (20, 2)]


def test_topk_multi_group_and_partition_invariance():
    rng = np.random.RandomState(1)
    n = 3000
    d = pa.table(
        {
            "g1": rng.randint(0, 12, n),
            "g2": rng.choice(["x", "y"], n),
            "v": np.round(rng.uniform(0, 10, n), 6),
            "tid": np.arange(n),
        }
    )
    a = top_k_per_group(rd.from_arrow(d), ["g1", "g2"], "v", 4, tie_cols="tid", num_partitions=2).take_all()
    b = top_k_per_group(rd.from_arrow(d).repartition(9), ["g1", "g2"], "v", 4, tie_cols="tid", num_partitions=17).take_all()
    key = lambda r: (r["g1"], r["g2"], r["tid"], r["rank"])
    assert sorted(map(key, a)) == sorted(map(key, b))
    # every group kept at most 4, ranked 1..m
    import collections

    cnt = collections.Counter((r["g1"], r["g2"]) for r in a)
    assert max(cnt.values()) <= 4
    for (g1, g2), m in cnt.items():
        ranks = sorted(r["rank"] for r in a if (r["g1"], r["g2"]) == (g1, g2))
        assert ranks == list(range(1, m + 1))


def test_topk_validates_k():
    d = ds(g=["a"], v=[1.0])
    with pytest.raises(ValueError, match="k must be"):
        top_k_per_group(d, "g", "v", 0)
