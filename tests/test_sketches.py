"""HLL sketch rollups (functions/sketches.py): estimate accuracy vs
exact distinct counts, and the merge property — unioned per-day
sketches must estimate what one whole-range sketch estimates."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from rusty_timeseries_db_spark.functions.sketches import (
    distinct_rollup,
    merge_rollup,
    sketch_estimate,
)
from rusty_timeseries_db_spark.queries import T
from tests.conftest import SF_DIR


def test_estimate_accuracy_vs_exact(spark):
    e = T(spark, SF_DIR, "events")
    roll = distinct_rollup(
        e.withColumn("day", F.to_date("ts")), ["event_type"], "user_id"
    )
    exact = {
        r.event_type: r.exact
        for r in e.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    for r in roll.collect():
        rel_err = abs(r.distinct_est - exact[r.event_type]) / exact[r.event_type]
        assert rel_err < 0.05, (r.event_type, r.distinct_est, exact[r.event_type])


def test_merge_equals_whole_range_sketch(spark):
    e = T(spark, SF_DIR, "events").withColumn("day", F.to_date("ts"))
    daily = distinct_rollup(e, ["event_type", "day"], "user_id")
    merged = merge_rollup(daily, ["event_type"])

    whole = distinct_rollup(e, ["event_type"], "user_id")
    m = {r.event_type: (r.distinct_est, r.n_rows) for r in merged.collect()}
    w = {r.event_type: (r.distinct_est, r.n_rows) for r in whole.collect()}
    # HLL union is lossless for same-lg_k sketches: identical estimates,
    # and row counts add up exactly
    assert m == w


def test_sketch_column_is_reusable(spark, tmp_path):
    """The stored sketch column itself estimates correctly after a
    round-trip through parquet (it is the thing a rollup persists)."""
    e = T(spark, SF_DIR, "events")
    daily = distinct_rollup(
        e.withColumn("day", F.to_date("ts")), ["day"], "user_id"
    )
    path = str(tmp_path / "sketch_roundtrip")
    daily.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    re_est = back.select(
        "day", sketch_estimate("sketch").cast("bigint").alias("est2"),
        "distinct_est",
    )
    for r in re_est.collect():
        assert r.est2 == r.distinct_est


# ------------------------------------------- mergeable top-k sketch


def test_topk_sketch_hand_computed(spark):
    from pyspark.sql import functions as F

    from rusty_timeseries_db_spark.functions.sketches import (
        merge_topk_sketch,
        topk_sketch,
    )

    # cell c1: a x3, b x2, c x1  (k=2 keeps a,b; dropped_max=1)
    # cell c2: c x4, a x1        (k=2 keeps all;  dropped_max=0)
    rows = (
        [("c1", "a")] * 3 + [("c1", "b")] * 2 + [("c1", "c")]
        + [("c2", "c")] * 4 + [("c2", "a")]
    )
    df = spark.createDataFrame(rows, "cell string, v string")
    sk = topk_sketch(df, ["cell"], "v", k=2)
    got = {r.cell: r for r in sk.collect()}
    assert got["c1"].top == {"a": 3, "b": 2}
    assert got["c1"].dropped_max == 1
    assert got["c1"].n_rows == 6
    assert got["c2"].top == {"c": 4, "a": 1}
    assert got["c2"].dropped_max == 0

    merged = merge_topk_sketch(
        sk.withColumn("all", F.lit(1)), ["all"]
    ).collect()
    m = {r.value: r for r in merged}
    # a: survived both cells -> count_lo exact 4, err 0
    assert (m["a"].count_lo, m["a"].err_ub) == (4, 0)
    # b: missing from c2 (was never there) -> err = c2.dropped_max = 0
    assert (m["b"].count_lo, m["b"].err_ub) == (2, 0)
    # c: dropped in c1 -> count_lo 4 (c2 only), err = c1.dropped_max
    assert (m["c"].count_lo, m["c"].err_ub) == (4, 1)
    # truth c=5 is inside [4, 4+1]
    assert all(r.n_rows == 11 for r in merged)


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 9)),  # (cell, value)
        min_size=1,
        max_size=120,
    ),
    k=st.integers(1, 4),
)
def test_topk_sketch_merge_bound_always_holds(spark, data, k):
    """For ANY split of the data into cells and any k: every surviving
    merged value's true global count lies in [count_lo, count_lo +
    err_ub], and any value with true count > every kept value's upper
    miss bound survives the merge (the heavy-hitter recall face)."""
    from collections import Counter

    from rusty_timeseries_db_spark.functions.sketches import (
        merge_topk_sketch,
        topk_sketch,
    )

    df = spark.createDataFrame(data, "cell int, v int").withColumn(
        "g", F.lit(1)
    )
    sk = topk_sketch(df, ["g", "cell"], "v", k=k)
    merged = merge_topk_sketch(sk, ["g"]).collect()
    truth = Counter(v for _, v in data)
    kept = {r.value for r in merged}
    for r in merged:
        assert r.count_lo <= truth[r.value] <= r.count_lo + r.err_ub
    # a value absent from EVERY cell's top-k has true count bounded by
    # the sum of all cells' dropped_max
    total_err = sum(r.dropped_max for r in sk.collect())
    for v, c in truth.items():
        if v not in kept:
            assert c <= total_err


def test_topk_sketch_null_values_ignored(spark):
    from rusty_timeseries_db_spark.functions.sketches import topk_sketch

    df = spark.createDataFrame(
        [("c", "a"), ("c", None), ("c", None), ("c", None), ("c", "b"),
         ("empty", None)],
        "cell string, v string",
    )
    got = {r.cell: r for r in topk_sketch(df, ["cell"], "v", k=2).collect()}
    # NULLs neither rank nor count; the all-NULL cell emits nothing
    assert set(got) == {"c"}
    assert got["c"].top == {"a": 1, "b": 1}
    assert got["c"].n_rows == 2
