"""Shared fixtures mirroring the reference test suite (FIXTURES.md).

``test_df``: 10 baby names with typed columns incl. NAs
(/root/reference/data-raw/test_data.R:1-22); ``whoops``: 11 misspelled
probes incl. NA (test_fozzie_string_inner_join.R:1-15).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa

NAMES = [
    "Liam",
    "Noah",
    "Oliver",
    "Theodore",
    "James",
    "Olivia",
    "Emma",
    "Amelia",
    "Charlotte",
    "Mia",
]

WHOOPS = [
    "Laim",
    "No, ahhh",
    "Olive",
    "Jams",
    "A-A-ron",
    "Luças",
    "Oliv HEE-YAH",
    "Emma",
    "Smelia",
    None,
    "Ada",
]


def test_df_table() -> pa.Table:
    days = [dt.date(2020, 1, d) for d in range(1, 11)]
    ts = [dt.datetime(2020, 1, 1, 20, 0, 0) + dt.timedelta(hours=h) for h in range(10)]
    return pa.table(
        {
            "Name": pa.array(NAMES, pa.string()),
            "int_col": pa.array([1, 2, 3, 4, 5, 6, None, 8, 9, 10], pa.int32()),
            "real_col": pa.array(
                [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, None, 9.0, 10.0], pa.float64()
            ),
            "logical_col": pa.array(
                [True, True, True, True, None, True, True, False, False, False], pa.bool_()
            ),
            "date_col": pa.array(days, pa.date32()),
            "posixct_col": pa.array(ts, pa.timestamp("s")),
            "factor_col": pa.array(list("AABBCCDDEE"), pa.string()).dictionary_encode(),
        }
    )


def whoops_table() -> pa.Table:
    return pa.table({"Name": pa.array(WHOOPS, pa.string())})


def rows_sorted(ds, keys):
    """take_all + canonical sort for order-insensitive golden compare."""
    rows = ds.take_all()
    return sorted(rows, key=lambda d: tuple(str(d.get(k)) for k in keys))
