"""Direct tests for the partitioned grace hash join (joins/hashjoin.py):
all four modes vs a pandas merge oracle, null-key semantics, nested
payload re-attachment, and collision validation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fozziejoin_ray.joins.hashjoin import hash_join


def _mk(rows, schema):
    return rd.from_arrow(pa.table(rows, schema=schema))


LEFT = pa.table(
    {
        "lk": pa.array([1, 2, 2, None, 5], pa.int64()),
        "lv": ["a", "b", "c", "d", "e"],
    }
)
RIGHT = pa.table(
    {
        "rk": pa.array([2, 2, 3, None, 5], pa.int64()),
        "rv": ["x", "y", "z", "w", "v"],
    }
)


def _oracle(how):
    l = LEFT.to_pandas()
    r = RIGHT.to_pandas().dropna(subset=["rk"])  # null keys never match
    if how == "inner":
        m = l.dropna(subset=["lk"]).merge(r, left_on="lk", right_on="rk")
        return m[["lk", "lv", "rv"]]
    if how == "left_outer":
        m = l.merge(r, left_on="lk", right_on="rk", how="left")
        return m[["lk", "lv", "rv"]]
    matched = l["lk"].isin(r["rk"])
    if how == "left_semi":
        return l[matched][["lk", "lv"]]
    return l[~matched][["lk", "lv"]]


@pytest.mark.parametrize("how", ["inner", "left_outer", "left_semi", "left_anti"])
@pytest.mark.parametrize("nparts", [1, 4])
def test_hash_join_modes_vs_pandas(how, nparts):
    out = hash_join(
        rd.from_arrow(LEFT), rd.from_arrow(RIGHT), "lk", "rk", how=how, num_partitions=nparts
    ).take_all()
    key = lambda t: tuple((v is None, v) for v in t)
    got = sorted(
        (tuple(None if pd.isna(v) else v for v in d.values()) for d in out), key=key
    )
    exp = sorted(
        (
            tuple(None if pd.isna(v) else v for v in row)
            for row in _oracle(how).itertuples(index=False)
        ),
        key=key,
    )
    assert got == exp, how


def test_hash_join_nested_payload_reattached():
    left = rd.from_arrow(
        pa.table({"k": [1, 2], "emb": [[1.0, 2.0], [3.0, 4.0]]})
    )
    right = rd.from_arrow(pa.table({"rk": [2, 2], "tag": ["p", "q"]}))
    out = hash_join(left, right, "k", "rk", how="inner").take_all()
    assert sorted((d["k"], tuple(d["emb"]), d["tag"]) for d in out) == [
        (2, (3.0, 4.0), "p"),
        (2, (3.0, 4.0), "q"),
    ]


def test_hash_join_collision_and_empty():
    l = rd.from_arrow(pa.table({"k": [1], "v": ["a"]}))
    r = rd.from_arrow(pa.table({"k": [1], "w": ["b"]}))
    with pytest.raises(ValueError, match="collision"):
        hash_join(l, r, "k", "k")
    # empty right side with explicit schema: left_outer pads, anti passes all
    empty = rd.from_arrow(pa.table({"rk": pa.nulls(0, pa.int64()), "w": pa.nulls(0, pa.string())}))
    sch = pa.schema([("rk", pa.int64()), ("w", pa.string())])
    out = hash_join(l, empty, "k", "rk", how="left_outer", right_schema=sch).take_all()
    assert out == [{"k": 1, "v": "a", "w": None}]
