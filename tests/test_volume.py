"""Volume fixture (FIXTURES.md §1.3): a generated 1M-row telemetry
table exercising the bulk-ingest path, partition pruning at volume, FDD
determinism, and the SQL surface. Rows come from ``spark.range`` — no
driver-side materialization anywhere."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rusty_timeseries_db_spark.api import TimeseriesEngine

N_ROWS = 1_000_000
N_SERIES = 200


@pytest.fixture(scope="module")
def volume_engine(spark, tmp_path_factory):
    eng = TimeseriesEngine(spark, str(tmp_path_factory.mktemp("vol") / "wh"))
    # deterministic synthetic minutely readings: value = |sin| scaled into
    # [0, 1.1] so a known subset crosses the 0.95 FDD threshold
    raw = (
        spark.range(N_ROWS)
        .select(
            F.concat(F.lit("sensor_"), (F.col("id") % N_SERIES)).alias("sensor_name"),
            F.date_format(
                F.timestamp_seconds(
                    F.lit(1724846400) + (F.col("id") / N_SERIES).cast("long") * 60
                ),
                "yyyy-MM-dd'T'HH:mm:ss'Z'",
            ).alias("timestamp"),
            (F.abs(F.sin(F.col("id").cast("double"))) * 1.1).alias("value"),
            F.lit(None).cast("tinyint").alias("fc1_flag"),
            F.concat(F.lit("series-"), (F.col("id") % N_SERIES)).alias(
                "timeseries_id"
            ),
        )
        .repartition(16)
    )
    eng.ingest_df(raw, dense_seq=False)
    return eng


def test_bulk_ingest_count_and_uniqueness(volume_engine):
    tel = volume_engine.telemetry()
    assert tel.count() == N_ROWS
    assert tel.select("ingest_seq").distinct().count() == N_ROWS


def test_volume_query_by_id_prunes_and_filters(volume_engine):
    df = volume_engine.query_by_id(
        "series-7", "2024-08-28T12:00:00Z", "2024-08-28T14:00:00Z"
    )
    rows = df.collect()
    assert 0 < len(rows) <= 121
    assert all(r.timeseries_id == "series-7" for r in rows)
    from rusty_timeseries_db_spark.plans.explain import formatted_plan

    assert "series_bucket" in formatted_plan(df)  # partition pruning active


def test_volume_fdd_deterministic(volume_engine, spark):
    """|sin| > 0.95/1.1 has a closed-form density — check the flagged
    fraction is in the expected band and exactly reproducible."""
    tel = volume_engine.telemetry()
    n_faults = tel.filter(F.col("value") > 0.95).count()
    frac = n_faults / N_ROWS
    # P(|sin(x)| > 0.8636) = 1 - (2/pi)*asin(0.8636) ≈ 0.336
    assert 0.32 < frac < 0.35
    assert tel.filter(F.col("value") > 0.95).count() == n_faults  # stable


def test_volume_sql_surface(volume_engine, spark):
    volume_engine.register_views("vol_telemetry")
    out = spark.sql(
        """
        SELECT timeseries_id, COUNT(*) AS n, ROUND(AVG(value), 3) AS avg_v
        FROM vol_telemetry
        WHERE timeseries_id IN ('series-1', 'series-2')
        GROUP BY timeseries_id ORDER BY timeseries_id
        """
    ).collect()
    assert [r.timeseries_id for r in out] == ["series-1", "series-2"]
    assert all(r.n == N_ROWS // N_SERIES for r in out)
    cat = spark.sql("SELECT COUNT(*) c FROM vol_telemetry_series_catalog").collect()
    assert cat[0].c == N_SERIES
