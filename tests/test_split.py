"""hash_split tests: determinism, completeness, proportions, SQL parity."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from fozziejoin_ray.pipelines.split import hash_split, split_sql_expr

RATIOS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_deterministic_complete_and_proportional():
    n = 20_000
    ds = rd.from_arrow(pa.table({"doc_id": list(range(n))}))
    out = hash_split(ds, "doc_id", RATIOS, salt="s1").take_all()
    a = {d["doc_id"]: d["split"] for d in out}
    out2 = hash_split(ds, "doc_id", RATIOS, salt="s1").take_all()
    assert a == {d["doc_id"]: d["split"] for d in out2}  # rerun-stable
    assert len(a) == n
    frac = {k: sum(1 for v in a.values() if v == k) / n for k in RATIOS}
    for k in RATIOS:
        assert abs(frac[k] - RATIOS[k]) < 0.02, frac
    # different salt reshuffles assignments
    b = {d["doc_id"]: d["split"] for d in hash_split(ds, "doc_id", RATIOS, salt="s2").take_all()}
    assert sum(1 for i in a if a[i] != b[i]) > n * 0.1


def test_split_partition_invariant():
    ds1 = rd.from_arrow(pa.table({"k": [f"id{i}" for i in range(500)]}))
    a = {d["k"]: d["split"] for d in hash_split(ds1, "k", RATIOS).take_all()}
    ds2 = rd.from_arrow(pa.table({"k": [f"id{i}" for i in range(500)]})).repartition(13)
    b = {d["k"]: d["split"] for d in hash_split(ds2, "k", RATIOS).take_all()}
    assert a == b


def test_split_matches_sql_expr():
    keys = list(range(300)) + [None]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(keys, pa.int64())}))
    got = {d["doc_id"]: d["split"] for d in hash_split(ds, "doc_id", RATIOS, salt="x").take_all()}
    con = duckdb.connect()
    expr = split_sql_expr("doc_id", RATIOS, salt="x")
    sql = con.execute(
        f"SELECT doc_id, {expr} AS split FROM (SELECT unnest(?) AS doc_id)", [keys]
    ).fetchall()
    exp = dict(sql)
    assert got == exp


def test_split_validates_ratios():
    ds = rd.from_arrow(pa.table({"k": [1]}))
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(ds, "k", {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(ds, "k", {})


def test_uniform_sample_k():
    import numpy as np

    from fozziejoin_ray.pipelines.split import _rank_of, uniform_sample_k

    ids = list(range(1000))
    ds = rd.from_arrow(pa.table({"id": ids, "v": [i * 2 for i in ids]}))
    got = uniform_sample_k(ds, "id", 50, salt="t").take_all()
    assert len(got) == 50
    # matches the brute-force (rank, key) order
    h = _rank_of(ids, "t").astype(np.int64)
    order = np.lexsort((np.array(ids), h))[:50]
    assert sorted(d["id"] for d in got) == sorted(int(ids[i]) for i in order)
    # payload column rides along; helper column dropped
    assert set(got[0]) == {"id", "v"}
    # stable under re-partitioning
    got2 = uniform_sample_k(ds.repartition(7), "id", 50, salt="t").take_all()
    assert sorted(d["id"] for d in got2) == sorted(d["id"] for d in got)
    # k >= n returns everything
    assert len(uniform_sample_k(ds.limit(10), "id", 50).take_all()) == 10
    with pytest.raises(ValueError, match="k must be"):
        uniform_sample_k(ds, "id", 0)


def test_uniform_sample_k_null_keys():
    from fozziejoin_ray.pipelines.split import uniform_sample_k

    keys = [f"k{i}" for i in range(200)] + [None] * 10
    ds = rd.from_arrow(pa.table({"id": pa.array(keys, pa.string())}))
    out = uniform_sample_k(ds, "id", 20, salt="z").take_all()
    assert len(out) == 20  # no crash; nulls participate via their hash


def test_sample_per_group_matches_pandas_oracle():
    from fozziejoin_ray.pipelines.split import _rank_of, sample_per_group

    ids = list(range(500))
    grp = [f"g{i % 7}" for i in ids]
    ds = rd.from_arrow(pa.table({"id": ids, "g": grp, "v": [i * 3 for i in ids]}))
    got = sample_per_group(ds.repartition(5), "id", "g", 9, salt="pg").take_all()
    # brute-force oracle: per-group 9 smallest under (rank, key)
    h = _rank_of(ids, "pg").astype(np.int64)
    import pandas as pd

    df = pd.DataFrame({"id": ids, "g": grp, "h": h})
    exp = df.sort_values(["h", "id"]).groupby("g").head(9)
    assert sorted(d["id"] for d in got) == sorted(exp["id"].tolist())
    assert len(got) == 7 * 9
    # payload rides along; helper dropped
    assert set(got[0]) == {"id", "g", "v"}
    # k exceeding a group's size returns the whole group
    small = rd.from_arrow(pa.table({"id": [1, 2, 3], "g": ["a", "a", "b"]}))
    assert len(sample_per_group(small, "id", "g", 10).take_all()) == 3
    with pytest.raises(ValueError, match="k must be"):
        sample_per_group(ds, "id", "g", 0)


def test_weighted_sample_matches_sql_semantics():
    import duckdb

    from fozziejoin_ray.pipelines.split import bucket_sql_expr, weighted_sample

    n = 2000
    w = np.r_[np.linspace(0, 1, n - 4), [-0.5, 1.5, 0.25, 0.0]]
    warr = pa.array(w, pa.float64()).to_pylist()
    warr[n - 2] = None  # null weight: never kept, mirrorable in SQL
    t = pa.table({"id": [f"k{i}" for i in range(n)], "w": pa.array(warr, pa.float64())})
    ds = rd.from_arrow(t).repartition(5)
    got = sorted(r["id"] for r in weighted_sample(ds, "id", "w", salt="t9").take_all())
    con = duckdb.connect()
    con.register("t", t)
    exp = sorted(
        r[0]
        for r in con.execute(
            "SELECT id FROM t WHERE "
            + bucket_sql_expr("id", salt="t9")
            + " < LEAST(GREATEST(w, 0), 1) * 10000"
        ).fetchall()
    )
    assert got == exp
    # realized rate tracks the mean weight to bucket resolution
    w[n - 2] = np.nan
    assert abs(len(got) / n - np.nanmean(np.clip(w, 0, 1))) < 0.03
    # w=1.5 -> always kept; w=-0.5 / null -> never
    assert f"k{n-3}" in got and f"k{n-4}" not in got and f"k{n-2}" not in got


def test_replicate_weighted_and_mix_corpora():
    from fozziejoin_ray.pipelines.split import (
        _bucket_of,
        mix_corpora,
        replicate_weighted,
    )

    ids = [f"k{i}" for i in range(400)]
    t = pa.table({"id": ids, "v": list(range(400))})
    ds = rd.from_arrow(t).repartition(3)
    got = replicate_weighted(ds, "id", 2.5, salt="rw").take_all()
    # exact per-row copy counts from the same bucket primitive
    b = _bucket_of(pa.array(ids), "rw")
    exp_counts = 2 + (b < 0.5 * 10000).astype(int)
    import collections

    cnt = collections.Counter(r["id"] for r in got)
    assert all(cnt[f"k{i}"] == exp_counts[i] for i in range(400))
    # copy indices are 0..n-1 per row
    copies = collections.defaultdict(set)
    for r in got:
        copies[r["id"]].add(r["copy"])
    assert all(v == set(range(len(v))) for v in copies.values())
    # weight < 1 degenerates to Bernoulli; weight 0 drops everything
    assert len(replicate_weighted(ds, "id", 0.0).take_all()) == 0
    sub = replicate_weighted(ds, "id", 0.25, salt="rw").take_all()
    assert 0 < len(sub) < 200 and all(r["copy"] == 0 for r in sub)
    with pytest.raises(ValueError):
        replicate_weighted(ds, "id", -0.1)

    mixed = mix_corpora({"x": (ds, 1.0), "y": (ds, 0.5)}, "id", salt="m").take_all()
    by_src = collections.Counter(r["source_label"] for r in mixed)
    assert by_src["x"] == 400 and 100 < by_src["y"] < 300
    with pytest.raises(ValueError):
        mix_corpora({}, "id")
