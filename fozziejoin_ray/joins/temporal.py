"""Temporal joins: Date / timestamp wrappers over the numeric kernels.

Mirrors /root/reference/R/fozzie_temporal_join.R:44-110 and
fozzie_temporal_interval_join.R:54-121:

- every key column must be date32 (R Date) or timestamp (R POSIXct) on
  both sides, consistently — mixed types error;
- Date keys: unit must be "days", distances are in days;
- timestamp keys: ``max_distance`` (and maxgap/minoverlap for the
  interval variant) are converted to seconds with the reference's unit
  multipliers (ns 1e-9 ... days 86400, fozzie_temporal_join.R:91-97),
  and emitted distance columns are in seconds;
- the temporal interval join always runs interval_mode="real"
  (fozzie_temporal_interval_join.R:111-119).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .interval_join import fuzzy_interval_join
from .modes import normalize_by
from .numeric_join import fuzzy_difference_join

UNIT_MULTIPLIERS = {
    "ns": 1e-9,
    "us": 1e-6,
    "ms": 1e-3,
    "seconds": 1.0,
    "minutes": 60.0,
    "hours": 3600.0,
    "days": 86400.0,
}

_TS_SCALE = {"s": 1.0, "ms": 1e-3, "us": 1e-6, "ns": 1e-9}


def _temporal_kind(t: pa.DataType) -> str:
    if pa.types.is_date32(t) or pa.types.is_date64(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    raise TypeError(
        f"temporal join key must be date32/date64 or timestamp, got {t} "
        "(POSIXlt has no Arrow analog and is likewise unsupported)"
    )


def _check_kinds(ds: rd.Dataset, cols: list[str]) -> str:
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    kinds = {_temporal_kind(types[c]) for c in cols}
    if len(kinds) != 1:
        raise TypeError("All join columns must be of the same temporal type (all Date or all timestamp)")
    return kinds.pop()


def _to_numeric_cols(ds: rd.Dataset, cols: list[str], kind: str, prefix: str) -> rd.Dataset:
    """Append float64 copies of temporal key columns: days since epoch for
    dates, seconds since epoch for timestamps."""
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))

    def fn(t: pa.Table) -> pa.Table:
        for c in cols:
            col = t[c]
            typ = types[c]
            if kind == "date":
                # date32 -> int32 days since epoch; date64 -> int64 millis
                if pa.types.is_date32(typ):
                    num = pc.cast(pc.cast(col, pa.int32()), pa.float64())
                else:
                    num = pc.divide(
                        pc.cast(pc.cast(col, pa.int64()), pa.float64()), pa.scalar(86400000.0)
                    )
            else:
                scale = _TS_SCALE[typ.unit]
                num = pc.multiply(pc.cast(pc.cast(col, pa.int64()), pa.float64()), pa.scalar(scale))
            t = t.append_column(prefix + c, num)
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def fuzzy_temporal_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by=None,
    *,
    how: str = "inner",
    max_distance: float = 1.0,
    unit: str = "days",
    distance_col: str | None = None,
    **kwargs,
) -> rd.Dataset:
    if unit not in UNIT_MULTIPLIERS:
        raise ValueError(f"unknown unit {unit!r}; expected one of {tuple(UNIT_MULTIPLIERS)}")
    by = normalize_by(by, left, right)
    lkind = _check_kinds(left, [l for l, _ in by])
    rkind = _check_kinds(right, [r for _, r in by])
    if lkind != rkind:
        raise TypeError(
            "Join columns must be of the same type across both data frames (either all Date or all POSIXct)"
        )
    if lkind == "date":
        if unit != "days":
            raise ValueError("When joining on Date columns, unit must be 'days'.")
        maxd = float(max_distance)
    else:
        maxd = float(max_distance) * UNIT_MULTIPLIERS[unit]

    P = "__fj_t_"
    left_n = _to_numeric_cols(left, sorted({l for l, _ in by}), lkind, P)
    right_n = _to_numeric_cols(right, sorted({r for _, r in by}), rkind, P)
    num_by = [(P + l, P + r) for l, r in by]
    drop = tuple({P + l for l, _ in by} | {P + r for _, r in by})
    # distance-column naming must reflect the user-facing key names
    out = fuzzy_difference_join(
        left_n,
        right_n,
        by=num_by,
        how=how,
        max_distance=maxd,
        distance_col=None if distance_col is None else "__fj_tdist",
        drop_cols=drop,
        **kwargs,
    )
    if distance_col is not None:
        if len(by) == 1:
            mapping = {"__fj_tdist": distance_col}
        else:
            mapping = {
                f"__fj_tdist_{P + l}_{P + r}": f"{distance_col}_{l}_{r}" for l, r in by
            }
        out = out.rename_columns(mapping)
    return out


def fuzzy_temporal_interval_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by=None,
    *,
    how: str = "inner",
    overlap_type: str = "any",
    maxgap: float = 0.0,
    minoverlap: float = 0.0,
    unit: str = "seconds",
    **kwargs,
) -> rd.Dataset:
    if unit not in UNIT_MULTIPLIERS:
        raise ValueError(f"unknown unit {unit!r}; expected one of {tuple(UNIT_MULTIPLIERS)}")
    by = normalize_by(by, left, right)
    if len(by) != 2:
        raise ValueError("temporal interval join needs exactly two key pairs (start, end)")
    lkind = _check_kinds(left, [l for l, _ in by])
    rkind = _check_kinds(right, [r for _, r in by])
    if lkind != rkind:
        raise TypeError("Join columns must be of the same temporal type across both data frames")
    if lkind == "date":
        if unit != "days":
            raise ValueError("When joining on Date columns, unit must be 'days'.")
        gap, minov = float(maxgap), float(minoverlap)
    else:
        gap = float(maxgap) * UNIT_MULTIPLIERS[unit]
        minov = float(minoverlap) * UNIT_MULTIPLIERS[unit]

    P = "__fj_t_"
    left_n = _to_numeric_cols(left, sorted({l for l, _ in by}), lkind, P)
    right_n = _to_numeric_cols(right, sorted({r for _, r in by}), rkind, P)
    num_by = [(P + l, P + r) for l, r in by]
    drop = tuple({P + l for l, _ in by} | {P + r for _, r in by})
    return fuzzy_interval_join(
        left_n,
        right_n,
        by=num_by,
        how=how,
        overlap_type=overlap_type,
        maxgap=gap,
        minoverlap=minov,
        interval_mode="real",
        drop_cols=drop,
        **kwargs,
    )
