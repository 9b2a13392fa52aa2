"""SCD2 merge semantics: close-out, insert, no-op idempotence, history
preservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from rusty_timeseries_db_spark.operators.scd2 import scd2_apply


def _dim(spark):
    return spark.createDataFrame(
        [
            # k1: one historical + one current version
            ("k1", "addr_old", "2023-01-01 00:00:00", "2023-06-01 00:00:00"),
            ("k1", "addr_v2", "2023-06-01 00:00:00", None),
            # k2: current only
            ("k2", "addr_b", "2023-01-01 00:00:00", None),
        ],
        "k string, addr string, vf string, vt string",
    ).select(
        "k",
        "addr",
        F.to_timestamp("vf").alias("valid_from"),
        F.to_timestamp("vt").alias("valid_to"),
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k string, addr string, cts string").select(
        "k", "addr", F.to_timestamp("cts").alias("change_ts")
    )


def test_scd2_close_out_and_insert(spark):
    dim = _dim(spark)
    out = scd2_apply(
        dim,
        _changes(spark, [("k1", "addr_v3", "2024-01-01 00:00:00"),
                         ("k3", "addr_new", "2024-01-01 00:00:00")]),
        key="k", tracked=["addr"],
    )
    rows = {(r.k, r.addr): (r.valid_from, r.valid_to) for r in out.collect()}
    assert len(rows) == 5
    # old current closed out at change ts
    assert rows[("k1", "addr_v2")][1].strftime("%Y-%m-%d") == "2024-01-01"
    # new current version open-ended
    assert rows[("k1", "addr_v3")][1] is None
    # brand-new key inserted
    assert rows[("k3", "addr_new")][1] is None
    # untouched current + history intact
    assert rows[("k2", "addr_b")][1] is None
    assert rows[("k1", "addr_old")][1] is not None


def test_scd2_noop_change_is_idempotent(spark):
    dim = _dim(spark)
    ch = _changes(spark, [("k2", "addr_b", "2024-01-01 00:00:00")])  # same attrs
    out1 = scd2_apply(dim, ch, key="k", tracked=["addr"])
    assert out1.count() == dim.count()  # nothing closed, nothing inserted
    out2 = scd2_apply(out1, ch, key="k", tracked=["addr"])
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


def test_scd2_plan_is_broadcast_no_sort_merge(spark):
    """The dimension must never shuffle for a small change batch: every
    join leg is a BroadcastHashJoin (a full-outer formulation silently
    ignores the broadcast hint and sort-merges the whole dimension)."""
    out = scd2_apply(
        _dim(spark),
        _changes(spark, [("k1", "addr_v3", "2024-01-01 00:00:00"),
                         ("k3", "addr_new", "2024-01-01 00:00:00")]),
        key="k", tracked=["addr"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_scd2_point_in_time_query(spark):
    """The payoff: as-of dimension lookups over validity intervals."""
    dim = _dim(spark)
    out = scd2_apply(
        dim,
        _changes(spark, [("k1", "addr_v3", "2024-01-01 00:00:00")]),
        key="k", tracked=["addr"],
    )
    t = F.lit("2023-08-01 00:00:00").cast("timestamp")
    asof = out.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
    got = {r.k: r.addr for r in asof.collect()}
    assert got == {"k1": "addr_v2", "k2": "addr_b"}  # the 2023-08 view
