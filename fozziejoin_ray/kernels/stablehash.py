"""Dtype-stable value/row hashing for exchange keys.

Every exchange primitive that routes rows by a hash of their VALUES
(`group_count_distinct`'s distinct-tuple partitioner, the HLL value and
group keys, sampling buckets) must produce the SAME hash for the same
logical value in every block — but a pandas block's physical dtype is
not stable: an int64 column degrades to float64 in any block that holds
a null, a bool column to object, and `pd.util.hash_array` hashes the
PHYSICAL representation (hash(7) != hash(7.0)).  This is the exact bug
class fixed in `joins/hashjoin._hash_mod_many` (round 4) — these
helpers are the reusable pandas-side version, guarded by the same
hypothesis fuzz strategy (tests/test_stablehash.py).

Canonicalization: numeric/bool values hash as float64 (exact for
|v| < 2^53 — int ids beyond that must be hashed as strings by the
caller); datetimes as int64 epoch-nanos; everything else as str.  A
per-row validity hash is folded in so NULL stays distinct from 0 / ''
and from the string "None".
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_VALID = np.uint64(0x9E3779B97F4A7C15)
_NULL = np.uint64(0x2545F4914F6CDD1D)


def stable_col_hash(s: "pd.Series") -> np.ndarray:
    """uint64 hash per element, a pure function of (logical value,
    validity) — invariant to the block's physical dtype."""
    valid = s.notna().to_numpy()
    if pd.api.types.is_bool_dtype(s) or pd.api.types.is_numeric_dtype(s):
        vals = s.to_numpy(dtype=np.float64, na_value=0.0)
        # canonicalize -0.0 -> 0.0 (hash_array distinguishes the bit
        # patterns; SQL equality does not)
        vals = vals + 0.0
        h = pd.util.hash_array(vals, categorize=False)
    elif pd.api.types.is_datetime64_any_dtype(s):
        h = pd.util.hash_array(
            s.astype("datetime64[ns]").to_numpy().view(np.int64), categorize=False
        )
    else:
        obj = s.to_numpy(dtype=object, copy=True)
        nonnull = obj[valid]
        if len(nonnull) and all(
            isinstance(v, (bool, int, float, np.bool_, np.integer, np.floating))
            for v in nonnull
        ):
            # a bool/int block with a null degrades to OBJECT dtype, not
            # float64 — route numeric-valued object columns through the
            # same float64 canonical form as the typed numeric branch
            vals = np.zeros(len(obj), dtype=np.float64)
            vals[valid] = [float(v) for v in nonnull]
            h = pd.util.hash_array(vals + 0.0, categorize=False)
        else:
            if not valid.all():
                obj[~valid] = ""
            h = pd.util.hash_array(
                np.array([str(v) for v in obj], dtype=object), categorize=False
            )
    # nulls hash to one BRANCH-INDEPENDENT constant: an all-null block
    # may take a different dtype branch than a mixed block, so the
    # fill-value's hash must never leak into a null position
    return np.where(valid, h ^ _VALID, _NULL)


def stable_row_hash(df: "pd.DataFrame", cols: list[str] | None = None) -> np.ndarray:
    """Fold per-column stable hashes into one uint64 per row (same
    1000003-multiplier fold as hashjoin._hash_mod_many)."""
    use = list(df.columns) if cols is None else list(cols)
    if not use:
        raise ValueError("stable_row_hash needs at least one column")
    h = None
    for c in use:
        hc = stable_col_hash(df[c])
        h = hc if h is None else (h * np.uint64(1000003)) ^ hc
    return h
