"""HLL sketch rollups (functions/sketches.py): estimate accuracy vs
exact distinct counts, and the merge property — unioned per-day
sketches must estimate what one whole-range sketch estimates."""

from __future__ import annotations

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
