"""Sessionize / session_stats tests: brute-force oracle, gap boundary
inclusivity, partition invariance."""

import datetime as dt

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from fozziejoin_ray.pipelines.events import session_stats, sessionize

B = dt.datetime(2024, 1, 1)


def ev(rows):
    ids, us, ts = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "event_id": list(ids),
                "user_id": list(us),
                "ts": pa.array([B + dt.timedelta(seconds=s) for s in ts], pa.timestamp("us")),
            }
        )
    )


ROWS = [
    # user 1: sessions [0, 10, 70], [200], [500, 530]  (gap 60s)
    (1, 1, 0.0), (2, 1, 10.0), (3, 1, 70.0), (4, 1, 200.0), (5, 1, 500.0), (6, 1, 530.0),
    # user 2: single event
    (7, 2, 1000.0),
    # user 3: exactly-at-gap stays in session; 1us over breaks
    (8, 3, 0.0), (9, 3, 60.0), (10, 3, 120.000001),
]
EXPECTED_SEQ = {1: 1, 2: 1, 3: 1, 4: 2, 5: 3, 6: 3, 7: 1, 8: 1, 9: 1, 10: 2}


@pytest.mark.parametrize("nparts", [1, 7])
def test_sessionize_matches_oracle(nparts):
    out = sessionize(ev(ROWS), gap=60, unit="seconds", num_partitions=nparts).take_all()
    got = {d["event_id"]: d["session_seq"] for d in out}
    assert got == EXPECTED_SEQ
    assert len(out) == len(ROWS)


def test_session_stats():
    out = session_stats(ev(ROWS), gap=60, unit="seconds", num_partitions=4).take_all()
    got = {(d["user_id"], d["session_seq"]): (d["n_events"], d["duration_us"]) for d in out}
    assert got == {
        (1, 1): (3, 70_000_000),
        (1, 2): (1, 0),
        (1, 3): (2, 30_000_000),
        (2, 1): (1, 0),
        (3, 1): (2, 60_000_000),
        (3, 2): (1, 0),
    }
    firsts = {(d["user_id"], d["session_seq"]): d["ts_first"] for d in out}
    assert firsts[(1, 3)] == B + dt.timedelta(seconds=500)


@pytest.mark.parametrize("res", ["s", "ms", "ns"])
def test_sessionize_nonmicro_resolution(res):
    """timestamp[ns]/[ms]/[s] inputs must be normalized to microseconds
    before the gap comparison — a ns input previously compared
    nanoseconds against a microsecond threshold."""
    ids, us, ts = zip(*ROWS)
    # shift the 1us-over row to the smallest over-gap step the resolution
    # can represent (1s / 1ms); everything else is whole seconds
    step = {"s": 1.0, "ms": 0.001, "ns": 0.000001}[res]
    secs = [float(int(s)) + (step if s != int(s) else 0.0) for s in ts]
    tbl = pa.table(
        {
            "event_id": list(ids),
            "user_id": list(us),
            "ts": pa.array(
                [B + dt.timedelta(seconds=s) for s in secs], pa.timestamp("us")
            ).cast(pa.timestamp(res)),
        }
    )
    out = sessionize(rd.from_arrow(tbl), gap=60, unit="seconds", num_partitions=3).take_all()
    got = {d["event_id"]: d["session_seq"] for d in out}
    assert got == EXPECTED_SEQ

    stats = session_stats(rd.from_arrow(tbl), gap=60, unit="seconds", num_partitions=3).take_all()
    durs = {(d["user_id"], d["session_seq"]): d["duration_us"] for d in stats}
    assert durs[(1, 1)] == 70_000_000  # micros, not nanos


def test_sessionize_random_vs_pandas_oracle():
    rng = np.random.RandomState(3)
    n = 2000
    rows = [
        (i, int(rng.randint(0, 25)), float(np.round(rng.uniform(0, 50_000), 3)))
        for i in range(n)
    ]
    out = sessionize(ev(rows), gap=10, unit="minutes", num_partitions=8).take_all()
    got = {d["event_id"]: d["session_seq"] for d in out}

    import pandas as pd

    df = pd.DataFrame(rows, columns=["event_id", "user_id", "s"]).sort_values(["user_id", "s"])
    brk = df.groupby("user_id")["s"].diff().gt(600).fillna(True) | df["event_id"].isna()
    first = ~df["user_id"].duplicated()
    df["seq"] = (brk | first).groupby(df["user_id"]).cumsum().astype(int)
    exp = dict(zip(df["event_id"], df["seq"]))
    assert got == exp


def evv(rows):
    """(event_id, user_id, seconds, value) -> Dataset with a value column."""
    ids, us, ts, vs = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "event_id": list(ids),
                "user_id": list(us),
                "ts": pa.array([B + dt.timedelta(seconds=s) for s in ts], pa.timestamp("us")),
                "value": pa.array(list(vs), pa.float64()),
            }
        )
    )


def _brute_windows(rows, width_s, hop_s):
    """All (user, win_start_us, count, sum, min, max) by direct scan."""
    import collections

    base_us = int(B.timestamp() * 1_000_000)
    acc = collections.defaultdict(list)
    w_us, h_us = width_s * 1_000_000, hop_s * 1_000_000
    for _, u, s, v in rows:
        t = base_us + int(round(s * 1_000_000))
        start = (t // h_us) * h_us
        while start > t - w_us:
            acc[(u, start)].append(v)
            start -= h_us
    return {
        k: (len(vs), sum(vs), min(vs), max(vs)) for k, vs in acc.items()
    }


@pytest.mark.parametrize("width,hop", [(60, 60), (60, 20)])
def test_window_agg_vs_brute(width, hop):
    from fozziejoin_ray.pipelines.events import window_agg

    rng = np.random.RandomState(7)
    rows = [
        (i, int(rng.randint(0, 8)), float(rng.uniform(0, 900)), float(rng.randint(0, 100)))
        for i in range(500)
    ]
    out = window_agg(
        evv(rows), width=width, hop=hop, unit="seconds", num_partitions=5
    ).take_all()
    got = {
        (d["user_id"], d["win_start"]): (d["n_events"], d["value_sum"], d["value_min"], d["value_max"])
        for d in out
    }
    exp = _brute_windows(rows, width, hop)
    assert set(got) == set(exp)
    for k, (n, s, lo, hi) in exp.items():
        gn, gs, glo, ghi = got[k]
        assert gn == n and glo == lo and ghi == hi
        assert abs(gs - s) < 1e-6
    if hop == width:
        # tumbling: every event in exactly one window
        assert sum(v[0] for v in got.values()) == len(rows)
    else:
        assert sum(v[0] for v in got.values()) == len(rows) * (width // hop)


def test_window_agg_validates_hop():
    from fozziejoin_ray.pipelines.events import window_agg

    ds = evv([(1, 1, 0.0, 1.0)])
    with pytest.raises(ValueError, match="divide"):
        window_agg(ds, width=60, hop=25, unit="seconds")
    with pytest.raises(ValueError, match="positive"):
        window_agg(ds, width=0, unit="seconds")


# ----------------------------------------------------- pivot + funnel


def evt(rows):
    """rows: (user, seconds, type)"""
    us, ts, ty = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "user_id": list(us),
                "ts": pa.array([B + dt.timedelta(seconds=s) for s in ts], pa.timestamp("us")),
                "event_type": list(ty),
            }
        )
    )


FUNNEL_ROWS = [
    # user 1 completes a->b->c in order
    (1, 0.0, "a"), (1, 5.0, "b"), (1, 9.0, "c"),
    # user 2: b before a -> only depth 1 (a at t=10, no b after)
    (2, 0.0, "b"), (2, 10.0, "a"),
    # user 3: a then b at the SAME timestamp -> strict > blocks b
    (3, 0.0, "a"), (3, 0.0, "b"),
    # user 4: no funnel events at all
    (4, 0.0, "x"),
    # user 5: a, b, c but c before b -> depth 2
    (5, 0.0, "a"), (5, 2.0, "c"), (5, 4.0, "b"),
    # user 6: greedy earliest-a still allows later completion
    (6, 0.0, "a"), (6, 1.0, "a"), (6, 2.0, "b"), (6, 3.0, "c"),
]
FUNNEL_EXP = {1: 3, 2: 1, 3: 1, 4: 0, 5: 2, 6: 3}


@pytest.mark.parametrize("nparts", [1, 5])
def test_event_funnel(nparts):
    from fozziejoin_ray.pipelines.events import event_funnel

    out = event_funnel(
        evt(FUNNEL_ROWS), steps=["a", "b", "c"], num_partitions=nparts
    ).take_all()
    got = {d["user_id"]: d["funnel_depth"] for d in out}
    assert got == FUNNEL_EXP
    comp = {d["user_id"]: d["completed"] for d in out}
    assert comp == {u: d == 3 for u, d in FUNNEL_EXP.items()}


def test_event_funnel_repeated_step():
    from fozziejoin_ray.pipelines.events import event_funnel

    rows = [(1, 0.0, "a"), (1, 1.0, "a"), (2, 0.0, "a")]
    out = event_funnel(evt(rows), steps=["a", "a"], num_partitions=2).take_all()
    got = {d["user_id"]: d["funnel_depth"] for d in out}
    assert got == {1: 2, 2: 1}


def test_pivot_event_counts():
    from fozziejoin_ray.pipelines.events import pivot_event_counts

    out = pivot_event_counts(
        evt(FUNNEL_ROWS), categories=["a", "b", "c"], num_partitions=3
    ).take_all()
    got = {d["user_id"]: (d["n_a"], d["n_b"], d["n_c"]) for d in out}
    assert got == {
        1: (1, 1, 1),
        2: (1, 1, 0),
        3: (1, 1, 0),
        4: (0, 0, 0),  # unknown type 'x' keeps the user, adds no count
        5: (1, 1, 1),
        6: (2, 1, 1),
    }
    with pytest.raises(ValueError, match="distinct"):
        pivot_event_counts(evt(FUNNEL_ROWS), categories=["a", "a"])


def test_extract_json():
    from fozziejoin_ray.pipelines.jsonx import extract_json

    ds = rd.from_arrow(
        pa.table(
            {
                "id": [1, 2, 3, 4, 5, 6],
                "props": [
                    '{"k": 87, "s": "x"}',
                    None,
                    "",
                    '{"s": "only-s"}',
                    '{"k": null}',
                    '{"k": 3, "extra": [1,2]}',
                ],
            }
        )
    )
    out = extract_json(
        ds, json_col="props", fields={"k": pa.int64(), "s": pa.string()}, prefix="p_"
    ).take_all()
    got = {d["id"]: (d["p_k"], d["p_s"]) for d in out}
    assert got == {
        1: (87, "x"),
        2: (None, None),
        3: (None, None),
        4: (None, "only-s"),
        5: (None, None),
        6: (3, None),
    }


def test_extract_json_raw_newline_fallback():
    from fozziejoin_ray.pipelines.jsonx import extract_json

    # a malformed producer emitted a raw newline inside a JSON string:
    # the batch routes through the row-wise fallback with identical
    # missing->null semantics
    ds = rd.from_arrow(
        pa.table({"id": [1, 2], "props": ['{"k": 1}', '{"k": 2, "s": "a\nb"}']})
    )
    out = extract_json(ds, json_col="props", fields={"k": pa.int64()}).take_all()
    assert {d["id"]: d["k"] for d in out} == {1: 1, 2: 2}


def test_pivot_and_funnel_null_users():
    from fozziejoin_ray.pipelines.events import event_funnel, pivot_event_counts

    rows = [("u1", 0.0, "a"), (None, 1.0, "a"), (None, 2.0, "b"), ("u1", 3.0, "b")]
    us, ts, ty = zip(*rows)
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(us, pa.string()),
                "ts": pa.array([B + dt.timedelta(seconds=s) for s in ts], pa.timestamp("us")),
                "event_type": list(ty),
            }
        )
    )
    piv = pivot_event_counts(ds, categories=["a", "b"], num_partitions=2).take_all()
    got = {d["user_id"]: (d["n_a"], d["n_b"]) for d in piv}
    # SQL GROUP BY keeps the null group and counts its events
    assert got == {"u1": (1, 1), None: (1, 1)}

    fun = event_funnel(ds, steps=["a", "b"], num_partitions=2).take_all()
    gotf = {d["user_id"]: d["funnel_depth"] for d in fun}
    # NULL never equals NULL in the oracle's step joins -> depth 0
    assert gotf == {"u1": 2, None: 0}


def test_extract_json_malformed_rows_degrade_to_null():
    from fozziejoin_ray.pipelines.jsonx import extract_json

    ds = rd.from_arrow(
        pa.table(
            {
                "id": [1, 2, 3, 4],
                "props": ['{"k": 1}', '{"k": 2', "[1,2]", "   "],
            }
        )
    )
    out = extract_json(ds, json_col="props", fields={"k": pa.int64()}).take_all()
    assert {d["id"]: d["k"] for d in out} == {1: 1, 2: None, 3: None, 4: None}


@pytest.mark.parametrize("nparts", [1, 5])
def test_rolling_agg_vs_brute(nparts):
    from fozziejoin_ray.pipelines.events import rolling_agg

    rng = np.random.default_rng(3)
    n = 400
    rows = [
        (int(rng.integers(0, 12)), float(rng.integers(0, 3600)), v)
        for v in rng.normal(size=n)
    ]
    rows[5] = (rows[4][0], rows[4][1], 7.0)  # forced equal-ts tie
    us, secs, vs = zip(*rows)
    vals = list(vs)
    vals[7] = None  # a NULL value: counted by n_win, skipped by sum
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": list(us),
                "ts": pa.array([B + dt.timedelta(seconds=s) for s in secs], pa.timestamp("us")),
                "value": pa.array(vals, pa.float64()),
            }
        )
    )
    W = 600.0  # 10-minute window
    out = rolling_agg(ds, width=10, unit="minutes", num_partitions=nparts).take_all()
    def norm(v):
        return None if v is None or (isinstance(v, float) and np.isnan(v)) else round(v, 9)

    got = sorted(
        (d["user_id"], d["ts"], norm(d["value"]), d["n_win"], norm(d["sum_win"]))
        for d in out
    )
    exp = []
    for u, s, v in zip(us, secs, vals):
        win = [(s2, v2) for u2, s2, v2 in zip(us, secs, vals) if u2 == u and s - W <= s2 <= s]
        sv = [v2 for _, v2 in win if v2 is not None]
        exp.append(
            (u, B + dt.timedelta(seconds=s), round(v, 9) if v is not None else None,
             len(win), round(sum(sv), 9) if sv else None)
        )
    assert got == sorted(exp)


def test_window_distinct_vs_brute():
    from fozziejoin_ray.pipelines.events import window_distinct

    rows = [
        (1, 0.0), (2, 10.0), (1, 20.0),      # window 0: users {1,2}, 3 events
        (3, 70.0), (3, 80.0),                # window 60: {3}, 2 events
        (None, 130.0), (4, 140.0),           # window 120: {4}, 2 events (null counted in n_events only)
    ]
    us, secs = zip(*rows)
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array(us, pa.int64()),
                "ts": pa.array([B + dt.timedelta(seconds=s) for s in secs], pa.timestamp("us")),
            }
        )
    ).repartition(3)
    out = window_distinct(ds, width=60, unit="seconds", num_partitions=2).take_all()
    base = int(B.timestamp() * 1_000_000)
    got = {(d["win_start"] - base) // 1_000_000: (d["n_distinct"], d["n_events"]) for d in out}
    assert got == {0: (2, 3), 60: (1, 2), 120: (1, 2)}


def test_rolling_agg_null_users_one_partition_and_null_ts_raises():
    from fozziejoin_ray.pipelines.events import rolling_agg, window_distinct

    # two NULL-user events 10s apart inside a 10-minute window: SQL
    # PARTITION BY puts them in ONE partition -> second row sees both
    ds = rd.from_arrow(
        pa.table(
            {
                "user_id": pa.array([None, None, "u1"], pa.string()),
                "ts": pa.array(
                    [B, B + dt.timedelta(seconds=10), B], pa.timestamp("us")
                ),
                "value": [1.0, 2.0, 5.0],
            }
        )
    )
    out = rolling_agg(ds, width=10, unit="minutes", num_partitions=2).take_all()
    nulls = sorted(
        (d["n_win"], d["sum_win"]) for d in out if d["user_id"] is None or (
            isinstance(d["user_id"], float) and np.isnan(d["user_id"])
        )
    )
    assert nulls == [(1, 1.0), (2, 3.0)]

    bad = rd.from_arrow(
        pa.table(
            {
                "user_id": ["u1"],
                "ts": pa.array([None], pa.timestamp("us")),
                "value": [1.0],
            }
        )
    )
    with pytest.raises(Exception, match="non-null timestamps"):
        rolling_agg(bad, width=1, unit="hours").take_all()
    with pytest.raises(Exception, match="non-null timestamps"):
        window_distinct(bad, width=1, unit="hours").take_all()
