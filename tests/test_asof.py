"""As-of join tests: brute-force oracle over every (direction, tolerance,
exact-key) combination, broadcast == blocked, tie rules, join modes."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from fozziejoin_ray import fuzzy_asof_join, fuzzy_temporal_asof_join


def ds(**cols):
    return rd.from_arrow(pa.table(cols))


def brute_asof(lrows, rrows, direction, tol, exact):
    """lrows: (lid, t, ekey); rrows: (rid, t, ekey). Returns {lid: (rid, gap)}."""
    eps = np.finfo(np.float64).eps
    out = {}
    for lid, lt, lk in lrows:
        if lt is None or (exact and lk is None):
            continue
        cands = []
        for rid, rt, rk in rrows:
            if rt is None or (exact and (rk is None or rk != lk)):
                continue
            d = lt - rt
            if direction == "backward" and d >= 0 and (tol is None or d <= tol + eps):
                cands.append((d, -1, rt, rid))
            elif direction == "forward" and d <= 0 and (tol is None or -d <= tol + eps):
                cands.append((-d, -1, rt, rid))
            elif direction == "nearest" and (tol is None or abs(d) <= tol + eps):
                # smaller |gap|; ties -> backward (rt <= lt); then largest rid
                cands.append((abs(d), 0 if rt <= lt else 1, rt, rid))
        if not cands:
            continue
        best = min(cands, key=lambda c: (c[0], c[1], -c[3]))
        out[lid] = (best[3], best[0])
    return out


LROWS = [
    (1, 10.0, "u1"), (2, 15.0, "u1"), (3, 5.0, "u2"), (4, 30.0, "u2"),
    (5, 12.0, "u3"), (6, None, "u1"), (7, 11.0, None), (8, 17.5, "u1"),
]
RROWS = [
    (101, 9.0, "u1"), (102, 9.0, "u1"), (103, 14.0, "u1"), (104, 20.0, "u1"),
    (105, 6.0, "u2"), (106, 29.0, "u2"), (107, None, "u2"), (108, 12.5, "u3"),
]


def _mk(rows, idn, tn, kn):
    ids, ts, ks = zip(*rows)
    return ds(**{idn: list(ids), tn: list(ts), kn: list(ks)})


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("tol", [None, 3.0])
@pytest.mark.parametrize("exact", [False, True])
def test_asof_broadcast_matches_brute_force(direction, tol, exact):
    l = _mk(LROWS, "lid", "lt", "lk")
    r = _mk(RROWS, "rid", "rt", "rk")
    out = fuzzy_asof_join(
        l, r, by={"lt": "rt"}, on_exact={"lk": "rk"} if exact else None,
        direction=direction, tolerance=tol, left_id="lid", right_id="rid",
        distance_col="gap", strategy="broadcast",
    ).take_all()
    got = {d["lid"]: (d["rid"], round(d["gap"], 9)) for d in out}
    exp = {
        k: (v[0], round(v[1], 9))
        for k, v in brute_asof(LROWS, RROWS, direction, tol, exact).items()
    }
    assert got == exp, (direction, tol, exact, got, exp)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("exact", [False, True])
def test_asof_blocked_equals_broadcast(direction, exact):
    l = _mk(LROWS, "lid", "lt", "lk")
    r = _mk(RROWS, "rid", "rt", "rk")
    kw = dict(
        by={"lt": "rt"}, on_exact={"lk": "rk"} if exact else None,
        direction=direction, tolerance=3.0, left_id="lid", right_id="rid",
        distance_col="gap",
    )
    a = fuzzy_asof_join(l, r, strategy="broadcast", **kw).take_all()
    b = fuzzy_asof_join(l, r, strategy="blocked", num_partitions=5, **kw).take_all()
    key = lambda d: (d["lid"], d["rid"], round(d["gap"], 9))
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_asof_tie_takes_largest_rid():
    # rids 101 and 102 share t=9.0; backward from t=10 must pick 102
    l = ds(lid=[1], lt=[10.0])
    r = ds(rid=[101, 102], rt=[9.0, 9.0])
    out = fuzzy_asof_join(l, r, by={"lt": "rt"}, left_id="lid", right_id="rid").take_all()
    assert [(d["lid"], d["rid"]) for d in out] == [(1, 102)]
    # forward from t=8 sees the same tie and must also pick 102
    l2 = ds(lid=[1], lt=[8.0])
    out2 = fuzzy_asof_join(
        l2, r, by={"lt": "rt"}, direction="forward", left_id="lid", right_id="rid"
    ).take_all()
    assert [(d["lid"], d["rid"]) for d in out2] == [(1, 102)]


def test_asof_nearest_tie_breaks_backward():
    l = ds(lid=[1], lt=[10.0])
    r = ds(rid=[50, 60], rt=[8.0, 12.0])  # both gap 2
    out = fuzzy_asof_join(
        l, r, by={"lt": "rt"}, direction="nearest", left_id="lid", right_id="rid"
    ).take_all()
    assert [(d["lid"], d["rid"]) for d in out] == [(1, 50)]


def test_asof_left_mode_pads_unmatched():
    l = ds(lid=[1, 2], lt=[10.0, 1.0])
    r = ds(rid=[9], rt=[5.0])
    out = fuzzy_asof_join(
        l, r, by={"lt": "rt"}, how="left", left_id="lid", right_id="rid"
    ).take_all()
    by_lid = {d["lid"]: d["rid"] for d in out}
    assert by_lid == {1: 9, 2: None}


def test_asof_semi_anti():
    l = ds(lid=[1, 2], lt=[10.0, 1.0])
    r = ds(rid=[9], rt=[5.0])
    semi = fuzzy_asof_join(l, r, by={"lt": "rt"}, how="semi", left_id="lid", right_id="rid").take_all()
    anti = fuzzy_asof_join(l, r, by={"lt": "rt"}, how="anti", left_id="lid", right_id="rid").take_all()
    assert [d["lid"] for d in semi] == [1]
    assert [d["lid"] for d in anti] == [2]


def test_asof_blocked_requires_tolerance():
    l = ds(lid=[1], lt=[10.0])
    r = ds(rid=[9], rt=[5.0])
    with pytest.raises(ValueError, match="tolerance"):
        fuzzy_asof_join(l, r, by={"lt": "rt"}, strategy="blocked", left_id="lid", right_id="rid")
    # tolerance=0 is equally untileable (width-0 grid): must raise, not
    # feed width=0 into floor(v/width)
    with pytest.raises(ValueError, match="tolerance"):
        fuzzy_asof_join(
            l, r, by={"lt": "rt"}, strategy="blocked", tolerance=0.0,
            left_id="lid", right_id="rid",
        )


def test_asof_all_null_right_ordering_yields_no_matches():
    """Right side has rows but every ordering value is null: NA never
    matches, so inner is empty and left pads — no crash."""
    l = ds(lid=[1, 2], lt=[10.0, 1.0])
    r = ds(rid=[9, 10], rt=pa.array([None, None], pa.float64()))
    inner = fuzzy_asof_join(l, r, by={"lt": "rt"}, left_id="lid", right_id="rid").take_all()
    assert inner == []
    left = fuzzy_asof_join(
        l, r, by={"lt": "rt"}, how="left", left_id="lid", right_id="rid"
    ).take_all()
    assert {d["lid"]: d["rid"] for d in left} == {1: None, 2: None}


def test_asof_zero_row_right():
    """A zero-row right (with schema) must yield empty inner and padded
    left/anti output, not a ValueError."""
    l = ds(lid=[1, 2], lt=[10.0, 1.0])
    r = rd.from_arrow(pa.table({"rid": [9], "rt": [5.0]}).slice(0, 0))
    inner = fuzzy_asof_join(l, r, by={"lt": "rt"}, left_id="lid", right_id="rid").take_all()
    assert inner == []
    left = fuzzy_asof_join(
        l, r, by={"lt": "rt"}, how="left", left_id="lid", right_id="rid"
    ).take_all()
    assert {d["lid"]: d["rid"] for d in left} == {1: None, 2: None}
    anti = fuzzy_asof_join(
        l, r, by={"lt": "rt"}, how="anti", left_id="lid", right_id="rid"
    ).take_all()
    assert sorted(d["lid"] for d in anti) == [1, 2]


def test_asof_blocked_randomized_equals_broadcast():
    rng = np.random.RandomState(7)
    nl, nr = 400, 300
    lt = np.round(rng.uniform(0, 100, nl), 3)
    rt = np.round(rng.uniform(0, 100, nr), 3)
    lk = rng.randint(0, 6, nl)
    rk = rng.randint(0, 6, nr)
    l = ds(lid=list(range(nl)), lt=list(lt), lk=list(map(int, lk)))
    r = ds(rid=list(range(nr)), rt=list(rt), rk=list(map(int, rk)))
    for direction in ("backward", "forward", "nearest"):
        kw = dict(
            by={"lt": "rt"}, on_exact={"lk": "rk"}, direction=direction,
            tolerance=4.0, left_id="lid", right_id="rid", distance_col="gap",
        )
        a = fuzzy_asof_join(l, r, strategy="broadcast", **kw).take_all()
        b = fuzzy_asof_join(l, r, strategy="blocked", num_partitions=16, **kw).take_all()
        key = lambda d: (d["lid"], d["rid"], round(d["gap"], 9))
        assert sorted(map(key, a)) == sorted(map(key, b)), direction


def test_temporal_asof_units_and_dates():
    import datetime as dt

    base = dt.datetime(2020, 1, 1)
    l = ds(lid=[1, 2], lt=[base + dt.timedelta(hours=5), base + dt.timedelta(hours=50)])
    r = ds(rid=[10, 11], rt=[base + dt.timedelta(hours=4), base + dt.timedelta(hours=30)])
    out = fuzzy_temporal_asof_join(
        l, r, by={"lt": "rt"}, tolerance=2, unit="hours",
        left_id="lid", right_id="rid", distance_col="gap",
    ).take_all()
    got = {d["lid"]: (d["rid"], d["gap"]) for d in out}
    assert got == {1: (10, 3600.0)}  # 1h gap in seconds; lid 2 is 20h from rid 11

    dl = ds(lid=[1], lt=[dt.date(2020, 1, 10)])
    dr = ds(rid=[5, 6], rt=[dt.date(2020, 1, 7), dt.date(2020, 1, 12)])
    dout = fuzzy_temporal_asof_join(
        dl, dr, by={"lt": "rt"}, tolerance=5, unit="days",
        left_id="lid", right_id="rid", distance_col="gap",
    ).take_all()
    assert {d["lid"]: (d["rid"], d["gap"]) for d in dout} == {1: (5, 3.0)}
    with pytest.raises(ValueError, match="days"):
        fuzzy_temporal_asof_join(dl, dr, by={"lt": "rt"}, tolerance=1, unit="hours")
