"""Event-sequence analytics: funnel stages (and cohort retention,
added alongside in round 14)."""

from datetime import datetime, timedelta

import pytest

from rusty_timeseries_db_spark.operators.funnel import funnel

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ev(uid, etype, dt_h):
    return (uid, etype, T0 + timedelta(hours=dt_h))


@pytest.fixture()
def funnel_events(spark):
    rows = [
        # u1: clean 3-stage conversion
        _ev(1, "view", 0), _ev(1, "click", 1), _ev(1, "purchase", 2),
        # u2: click BEFORE the view anchor only -> stage 1 only
        _ev(2, "click", -1), _ev(2, "view", 0),
        # u3: click outside the 24h horizon -> stage 1 only
        _ev(3, "view", 0), _ev(3, "click", 25),
        # u4: purchase precedes the click anchor -> stages 1-2 only
        _ev(4, "view", 0), _ev(4, "purchase", 0.5), _ev(4, "click", 1),
        # u5: FIRST-TOUCH anchoring — the second view would convert,
        # but the anchor is the first view, whose horizon the click
        # misses -> stage 1 only
        _ev(5, "view", 0), _ev(5, "view", 48), _ev(5, "click", 49),
        # u6: never viewed -> not in the funnel at all
        _ev(6, "click", 0), _ev(6, "purchase", 1),
        # u7: click lands EXACTLY at anchor + horizon (inclusive edge)
        _ev(7, "view", 0), _ev(7, "click", 24),
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    )


def test_funnel_anchoring_ordering_horizon(funnel_events):
    got = {
        r.stage_idx: r
        for r in funnel(
            funnel_events, ["view", "click", "purchase"]
        ).collect()
    }
    assert [got[i].stage for i in (1, 2, 3)] == [
        "view", "click", "purchase"
    ]
    assert got[1].users == 6          # u1..u5, u7
    assert got[2].users == 3          # u1, u4, u7
    assert got[3].users == 1          # u1
    assert got[1].conversion_frac == 1.0
    assert got[2].conversion_frac == 0.5
    assert got[3].conversion_frac == round(1 / 6, 6)


def test_funnel_same_timestamp_not_after(spark):
    """A stage-2 event at EXACTLY the stage-1 anchor timestamp is not
    'after' it — strict inequality, so simultaneous batch-loaded
    events don't fabricate conversions."""
    df = spark.createDataFrame(
        [_ev(1, "view", 0), _ev(1, "click", 0)],
        "user_id bigint, event_type string, ts timestamp",
    )
    got = {r.stage_idx: r.users for r in funnel(df, ["view", "click"]).collect()}
    assert got == {1: 1, 2: 0}


def test_funnel_needs_two_stages(spark):
    df = spark.createDataFrame(
        [_ev(1, "view", 0)], "user_id bigint, event_type string, ts timestamp"
    )
    with pytest.raises(ValueError, match="at least 2"):
        funnel(df, ["view"])


def test_cohort_retention_hand_matrix(spark):
    """Two Monday-aligned weekly cohorts, hand-checked matrix:
    2024-01-01 week cohort {u1, u2}: u1 returns weeks 1 and 2, u2
    never returns; 2024-01-08 week cohort {u3}: u3 returns week 1.
    Offset-0 rows always read retention 1.0."""
    from rusty_timeseries_db_spark.operators.funnel import cohort_retention

    rows = [
        (1, datetime(2024, 1, 2, 9)),    # cohort week 2024-01-01
        (1, datetime(2024, 1, 10, 9)),   # offset 1
        (1, datetime(2024, 1, 16, 9)),   # offset 2
        (1, datetime(2024, 1, 16, 18)),  # same period, no double count
        (2, datetime(2024, 1, 3, 9)),    # cohort week 2024-01-01 only
        (3, datetime(2024, 1, 8, 0)),    # cohort week 2024-01-08 (Mon)
        (3, datetime(2024, 1, 21, 23)),  # Sunday -> still offset 1
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        (r.cohort, r.period_offset): (
            r.active_users, r.cohort_size, r.retention_frac
        )
        for r in cohort_retention(df, granularity="week").collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 1.0),
        ("2024-01-01", 1): (1, 2, 0.5),
        ("2024-01-01", 2): (1, 2, 0.5),
        ("2024-01-08", 0): (1, 1, 1.0),
        ("2024-01-08", 1): (1, 1, 1.0),
    }


def test_cohort_retention_day_granularity(spark):
    from rusty_timeseries_db_spark.operators.funnel import cohort_retention

    rows = [
        (1, datetime(2024, 1, 1, 9)),
        (1, datetime(2024, 1, 3, 9)),   # day offset 2
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        r.period_offset: r.retention_frac
        for r in cohort_retention(df, granularity="day").collect()
    }
    assert got == {0: 1.0, 2: 1.0}

    with pytest.raises(ValueError, match="granularity"):
        cohort_retention(df, granularity="hour")


def test_attribution_last_touch_hand_computed(spark):
    """u1: view->click->purchase attributes to click (last touch);
    u2: purchase with no preceding touch -> (direct); u3: same-ts
    click+purchase ordered by event_id -> click still attributes;
    later events never attribute backwards."""
    from pyspark.sql import functions as F

    from rusty_timeseries_db_spark.operators.funnel import (
        attribute_conversions,
    )

    rows = [
        (1, 1, "view", 0.0, 0),
        (1, 2, "click", 0.0, 1),
        (1, 3, "purchase", 10.0, 2),
        (2, 1, "purchase", 4.0, 0),
        (2, 2, "view", 0.0, 1),      # AFTER the purchase: must not count
        (3, 1, "click", 0.0, 0),     # same ts as the purchase
        (3, 2, "purchase", 6.0, 0),  # event_id orders them
    ]
    df = spark.createDataFrame(
        [(u, e, t, v, h) for u, e, t, v, h in rows],
        "user_id long, event_id long, event_type string, value double, h long",
    ).withColumn(
        "ts",
        F.to_timestamp(F.lit("2024-01-01 00:00:00")) +
        F.make_interval(hours=F.col("h")),
    )
    got = {
        r.source: r
        for r in attribute_conversions(
            df, order_tiebreak="event_id"
        ).collect()
    }
    assert set(got) == {"click", "(direct)"}
    assert got["click"].n_conversions == 2
    assert got["click"].attributed_value == 16.0
    assert got["(direct)"].n_conversions == 1
    assert got["(direct)"].attributed_value == 4.0
    assert got["click"].share == round(2 / 3, 6)
