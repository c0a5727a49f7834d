"""Sequence-packing tests: hand-computed boundaries, partition
invariance, SQL parity, empty/null text, validation."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from fozziejoin_ray.pipelines.pack import pack_sequences, pack_sequences_sql


def _rows(ds):
    return sorted(ds.take_all(), key=lambda d: d["doc_id"])


def test_pack_hand_computed():
    # token counts: 3, 4, 2, 0, 5 -> pre: 0, 3, 7, 9, 9 (seq_len=4)
    texts = ["a b c", "d e f g", "h i", "", "j k l m n"]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(5)), "text": texts}))
    rows = _rows(pack_sequences(ds, "text", "doc_id", seq_len=4, num_buckets=2))
    assert [r["n_tokens"] for r in rows] == [3, 4, 2, 0, 5]
    assert [r["seq_id"] for r in rows] == [0, 0, 1, 2, 2]
    assert [r["seq_pos"] for r in rows] == [0, 3, 3, 1, 1]


def test_pack_partition_invariant_and_sql_parity():
    rng = np.random.default_rng(11)
    n = 3_000
    # non-contiguous, shuffled ids exercise the range bucketing
    ids = rng.permutation(np.arange(0, n * 7, 7)).tolist()
    texts = [" ".join(["w"] * int(k)) if k else "" for k in rng.integers(0, 40, n)]
    t = pa.table({"doc_id": ids, "text": texts})
    a = _rows(pack_sequences(rd.from_arrow(t), "text", "doc_id", seq_len=128, num_buckets=8))
    b = _rows(
        pack_sequences(
            rd.from_arrow(t).repartition(13), "text", "doc_id", seq_len=128, num_buckets=32
        )
    )
    assert a == b  # partitioning and bucket count never change the answer
    con = duckdb.connect()
    con.register("docs", t)
    sql = con.execute(
        pack_sequences_sql("docs", "text", "doc_id", 128) + " ORDER BY doc_id"
    ).fetchall()
    assert [(r["doc_id"], r["n_tokens"], r["seq_id"], r["seq_pos"]) for r in a] == sql


def test_pack_validates_seq_len():
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        pack_sequences(ds, "text", "doc_id", seq_len=0)
