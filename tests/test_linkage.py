"""Blocked fuzzy join — hand-computed matches, length-band
losslessness vs a brute-force reference, blocker/edge behavior."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from rusty_timeseries_db_spark.operators.linkage import fuzzy_join


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _frames(spark, probes, names):
    l = spark.createDataFrame([(p,) for p in probes], "probe string")
    r = spark.createDataFrame([(n,) for n in names], "name string")
    return l, r


def test_hand_computed_matches(spark):
    l, r = _frames(
        spark,
        ["blue rin", "hot bolt", "zzz"],
        ["blue ring", "blue ring small", "hot bolt", "red ring"],
    )
    got = {
        (row.probe, row.name): row.edit_dist
        for row in fuzzy_join(l, r, "probe", "name", max_dist=1).collect()
    }
    # "blue rin" -> "blue ring" (dist 1); NOT "blue ring small" (dist 7)
    # "hot bolt" -> itself (dist 0); "zzz" matches nothing
    assert got == {("blue rin", "blue ring"): 1, ("hot bolt", "hot bolt"): 0}


def test_blocker_excludes_cross_token_matches(spark):
    # "red ring" vs "bed ring" is dist 1 but first tokens differ ->
    # blocked out (the documented recall trade of conjunctive blocking)
    l, r = _frames(spark, ["red ring"], ["bed ring"])
    assert fuzzy_join(l, r, "probe", "name", max_dist=1).count() == 0
    # blocker=None restores it via the length band alone
    assert (
        fuzzy_join(l, r, "probe", "name", max_dist=1, blocker=None).count()
        == 1
    )


def test_max_dist_zero_is_exact_join(spark):
    l, r = _frames(spark, ["a b", "a c"], ["a b", "a d"])
    rows = fuzzy_join(l, r, "probe", "name", max_dist=0).collect()
    assert [(x.probe, x.name, x.edit_dist) for x in rows] == [("a b", "a b", 0)]


def test_same_column_name_raises(spark):
    l, r = _frames(spark, ["x"], ["x"])
    with pytest.raises(ValueError, match="share a name"):
        fuzzy_join(
            l.withColumnRenamed("probe", "name"), r, "name", "name"
        )


@settings(max_examples=6, deadline=None)
@given(
    probes=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=6), min_size=1,
        max_size=8, unique=True,
    ),
    names=st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=6), min_size=1,
        max_size=8, unique=True,
    ),
    k=st.integers(0, 2),
)
def test_band_lossless_vs_bruteforce(spark, probes, names, k):
    """With blocker=None the result must be EXACTLY the brute-force
    distance-<=k cross filter — the length band admits more candidates
    than needed and the predicate trims them, never the reverse."""
    l, r = _frames(spark, probes, names)
    got = {
        (row.probe, row.name, row.edit_dist)
        for row in fuzzy_join(
            l, r, "probe", "name", max_dist=k, blocker=None
        ).collect()
    }
    want = {
        (p, n, _lev(p, n)) for p in probes for n in names if _lev(p, n) <= k
    }
    assert got == want
