"""Blocked fuzzy string join (record linkage / entity resolution).

Reference behavior: the reference engine (bbartling/rusty-timeseries-db
main.rs:92-140) keys every series by a free-text ``sensor_name`` and
offers only exact-match lookup; linking dirty external names onto that
catalog is the classic entity-resolution task this operator serves
engine-side.

The all-pairs edit-distance join is O(|L|·|R|) and never acceptable at
scale. This operator generates candidates with CONJUNCTIVE BLOCKING —
pairs must agree on a user blocking key (default: first whitespace
token) — composed with a LENGTH BAND that is *lossless* for the
requested distance: edit distance >= |len(a) - len(b)|, so bucketing
lengths at width (max_dist+1) and exploding each left row to its
adjacent buckets {-1, 0, +1} can never drop a true match, while
candidates shrink from |L|·|R| to the blocked bucket volume. The
verification predicate is Spark's thresholded ``levenshtein(l, r, k)``
(early-exits above k, returning -1) — candidates that survive carry
their exact distance.

Scale shape: one shuffle keyed on (blocking key, length bucket); the
3x left-side bucket explode is the only fan-out. Skew lives in hot
blocking keys — the remedy is a higher-cardinality blocker (add a
second token, a q-gram prefix), exactly the knob ``blocker`` exposes;
the operator itself never falls back to a cartesian product.

Result = pairs agreeing on the blocking key with edit distance <=
max_dist, EXACTLY (the length band is invisible in the result — it
admits more than it needs and the distance predicate finishes the
job), which is what makes the operator oracle-pairable
(q_fuzzy_vocab_match: DuckDB recomputes blocker equality +
levenshtein <= k directly).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _first_token(c: Column) -> Column:
    return F.split_part(c, F.lit(" "), F.lit(1))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    blocker: Callable[[Column], Column] | None = _first_token,
) -> DataFrame:
    """Inner-join ``left`` and ``right`` on approximate string equality:
    pairs whose ``blocker`` keys agree AND whose Levenshtein distance is
    <= ``max_dist``. Emits every column of both inputs plus
    ``edit_dist`` (int). ``left_col`` / ``right_col`` must be named
    differently (rename upstream — keeps the output schema honest).

    ``blocker=None`` disables the user key and blocks on the length
    band alone — still never all-pairs, but only appropriate when the
    value distribution is short and tight (a vocabulary, not a corpus).
    """
    if left_col == right_col:
        raise ValueError(
            "fuzzy_join: left_col and right_col share a name; rename one"
        )
    k = int(max_dist)
    if k < 0:
        raise ValueError("fuzzy_join: max_dist must be >= 0")
    width = k + 1
    lbkt = F.floor(F.length(F.col(left_col)) / width)
    rbkt = F.floor(F.length(F.col(right_col)) / width)
    l = left.withColumn(
        "_bkt",
        F.explode(F.array(lbkt - 1, lbkt, lbkt + 1)),
    )
    r = right.withColumn("_bkt", rbkt)
    cond = l["_bkt"] == r["_bkt"]
    if blocker is not None:
        cond = cond & (
            blocker(F.col(left_col)) == blocker(F.col(right_col))
        )
    dist = F.levenshtein(F.col(left_col), F.col(right_col), k)
    return (
        l.join(r, on=cond, how="inner")
        .drop(l["_bkt"])
        .drop(r["_bkt"])
        # materialize the distance ONCE, filter on the column — the
        # O(len^2) verification is the dominant per-candidate cost
        .withColumn("edit_dist", dist)
        .filter(F.col("edit_dist") >= 0)
    )
