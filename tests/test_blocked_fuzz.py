"""Property tests for the blocked string-join hot path: the deletion-
neighborhood strategy + bag prefilter + equality short-circuit must be
invisible — blocked edges always equal broadcast edges (two-table) or a
brute-force reference (self-join), on adversarial corpora (tiny
alphabets dense with near-matches, unicode, empties, duplicates, the
salt delimiter character itself)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fozziejoin_ray import fuzzy_string_join
from fozziejoin_ray.joins.blocked import build_edges_blocked
from fozziejoin_ray.kernels.strdist import score_pairs

# ';' / '\x1f' attack the salt-header format; 'é'/'中' the unicode path.
# '\x00' is excluded: R strings cannot contain embedded NUL, so the
# reference's data model rules it out of key values (blocked.py docs).
_ALPHA = "ab;\x1fé中"
_word = st.text(alphabet=_ALPHA, min_size=0, max_size=6)
_corpus = st.lists(_word, min_size=1, max_size=25)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(L=_corpus, R=_corpus, method=st.sampled_from(["lv", "osa", "dl"]), d=st.integers(0, 2))
def test_blocked_equals_broadcast_fuzz(L, R, method, d):
    l = rd.from_arrow(pa.table({"lid": list(range(len(L))), "wl": L}))
    r = rd.from_arrow(pa.table({"rid": list(range(len(R))), "wr": R}))

    def run(strategy):
        out = fuzzy_string_join(
            l, r, by={"wl": "wr"}, method=method, max_distance=d,
            how="inner", distance_col="dd", left_id="lid", right_id="rid",
            strategy=strategy,
        )
        return sorted((x["lid"], x["rid"], x["dd"]) for x in out.take_all())

    assert run("blocked") == run("broadcast")


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(vals=_corpus, d=st.integers(0, 2))
def test_blocked_selfjoin_matches_bruteforce_fuzz(vals, d):
    """Self-join edges (id_a < id_b, once per unordered pair) vs an
    all-pairs brute force through the exact kernel."""
    n = len(vals)
    ds = rd.from_arrow(pa.table({"lid": list(range(n)), "wl": vals}))
    e = build_edges_blocked(
        ds, None, [("wl", "wl")], "levenshtein", float(d), 2, 0, 0.0, "lid", None
    )
    got = sorted((x["__fj_lid"], x["__fj_rid"], x["__fj_d0"]) for x in e.take_all())

    ia, ib = np.triu_indices(n, k=1)
    dist = score_pairs("lv", [vals[i] for i in ia], [vals[j] for j in ib])
    keep = dist <= d
    want = sorted(
        (int(a), int(b), float(x)) for a, b, x in zip(ia[keep], ib[keep], dist[keep])
    )
    assert got == want
