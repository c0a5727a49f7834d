"""Kernel goldens from the reference test suite
(/root/reference/tests/testthat/test_fozzie_string_inner_join.R and
test_fozzie_string_soundex_join.R)."""

import math

import numpy as np
import pytest

from fozziejoin_ray.kernels.soundex import soundex_match, soundex_na, soundex_na_dual
from fozziejoin_ray.kernels.strdist import (
    get_qgram_set,
    get_qgrams,
    jaccard_set_batch,
    score_pairs,
)


def pairs(method, a, b, **kw):
    return list(score_pairs(method, a, b, **kw))


def test_levenshtein_goldens():
    assert pairs("lv", ["Oliver", "James", "Emma", "Amelia"], ["Olive", "Jams", "Emma", "Smelia"]) == [1, 1, 0, 1]


def test_levenshtein_unicode_char_based():
    assert pairs("lv", ["Luças"], ["Lucas"]) == [1]
    assert pairs("lv", ["Luças"], ["Luc"]) == [3]  # ç->c sub + 2 deletions (char, not byte, counting)


def test_osa_goldens():
    got = pairs("osa", ["Liam", "Oliver", "James", "Emma", "Amelia"], ["Laim", "Olive", "Jams", "Emma", "Smelia"])
    assert got == [1, 1, 1, 0, 1]


def test_damerau_unrestricted():
    assert pairs("dl", ["ca"], ["abc"]) == [2]  # unrestricted; OSA would be 3
    assert pairs("osa", ["ca"], ["abc"]) == [3]
    assert pairs("dl", ["Liam"], ["Laim"]) == [1]


def test_hamming():
    got = pairs("hamming", ["Emma", "Amelia", "abc"], ["Emma", "Smelia", "abcd"])
    assert got[:2] == [0, 1]
    assert math.isinf(got[2])  # unequal length never matches (hamming.rs:84-87)


def test_lcs():
    assert pairs("lcs", ["Oliver", "James", "Emma"], ["Olive", "Jams", "Emma"]) == [1, 1, 0]


def test_qgram():
    assert pairs("qgram", ["Oliver", "Emma"], ["Olive", "Emma"], q=2) == [1, 0]


COS_A = ["Oliver", "Oliver", "James", "Olivia", "Olivia", "Emma", "Amelia"]
COS_B = ["Olive", "Oliv HEE-YAH", "Jams", "Olive", "Oliv HEE-YAH", "Emma", "Smelia"]


def test_cosine_goldens_q3():
    expected = [
        0.133974596215561,
        0.683772233983162,
        0.591751709536137,
        0.422649730810374,
        0.683772233983162,
        0.0,
        0.25,
    ]
    got = pairs("cosine", COS_A, COS_B, q=3)
    assert np.allclose(got, expected, atol=1e-12)


def test_jaccard_goldens_q3():
    expected = [0.25, 5 / 6, 0.75, 0.6, 5 / 6, 0.0, 0.4]
    got = pairs("jaccard", COS_A, COS_B, q=3)
    assert np.allclose(got, expected, atol=1e-12)


def test_jw_pure_jaro():
    got = pairs("jw", ["Liam", "Noah", "Oliver"], ["Laim", "No, ahhh", "Olive"])
    # matched under max_distance=0.2 in the reference golden
    assert all(d <= 0.2 for d in got)
    assert abs(got[0] - (1 - 11 / 12)) < 1e-12  # jaro(Liam, Laim)


def test_jw_unicode_char_based():
    got = pairs("jw", ["Luças"], ["Lucas"])
    assert abs(got[0] - (1 - (4 / 5 + 4 / 5 + 1.0) / 3)) < 1e-12


def test_jw_prefix_formula():
    # reference quirk: x2 = x + min(prefix,max_prefix)*w*(1-x) (jaro_winkler.rs:66-68)
    base = pairs("jw", ["Oliver"], ["Olivia"])[0]
    adj = pairs("jw", ["Oliver"], ["Olivia"], max_prefix=4, prefix_weight=0.1)[0]
    assert abs(adj - (base + 4 * 0.1 * (1 - base))) < 1e-12


def test_qgram_profiles():
    assert get_qgrams("ab", 3) == {}
    assert dict(get_qgrams("banana", 2)) == {"ba": 1, "an": 2, "na": 2}
    assert get_qgram_set("banana", 2) == {"ba", "an", "na"}


def test_jaccard_set_refine_both_empty_is_zero():
    # compare_pairs quirk: both profiles empty -> 0.0 (jaccard.rs:84-93)
    assert jaccard_set_batch(["a"], ["b"], 3)[0] == 0.0


def test_soundex_goldens():
    assert soundex_na("Robert") == "R163"
    assert soundex_na("Tymczak") == "T522"
    assert soundex_match("Smith", "Smyth")
    assert soundex_match("Ashcraft", "Ashcroft")
    assert not soundex_match("Smith", "Ashcraft")


def test_soundex_dual_prefix():
    assert soundex_na_dual("VanDeusen") == ("D250", "V500")
    assert soundex_match("VanDeusen", "Deusen")
    assert soundex_match("De La Cruz", "Cruz")


def test_bad_method():
    with pytest.raises(ValueError):
        score_pairs("nope", ["a"], ["b"])


def test_edit_bag_bound_is_sound_lower_bound():
    """Fuzz: the bucketed bag bound never exceeds the exact distance for
    any method it prefilters (blocked.py drops pairs with bound > maxd,
    so bound <= dist is the recall-lossless invariant)."""
    import random

    import numpy as np

    from fozziejoin_ray.kernels.strdist import edit_bag_bound

    rng = random.Random(7)
    alpha = "abcdefghé中 "  # small alphabet -> many near-anagrams
    vals = [
        "".join(rng.choices(alpha, k=rng.randint(0, 10))) for _ in range(300)
    ]
    uniq = np.array(list(dict.fromkeys(vals)), dtype=object)
    n = len(uniq)
    g = np.random.default_rng(7)
    ia = g.integers(0, n, 5000)
    ib = g.integers(0, n, 5000)
    for method in ("lv", "osa", "dl", "hamming", "lcs"):
        lb = edit_bag_bound(uniq, None, ia, ib, lcs=(method == "lcs"))
        d = score_pairs(method, list(uniq[ia]), list(uniq[ib]))
        finite = np.isfinite(d)
        assert (lb[finite] <= d[finite] + 1e-9).all(), method
