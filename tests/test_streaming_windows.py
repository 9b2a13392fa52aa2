"""Streaming windowed aggregation, watermark late-data drop, and
streaming dedup via the memory sink."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from rusty_timeseries_db_spark.streaming.ingest import (
    normalized_stream,
    read_telemetry_stream,
    streaming_dedup,
    windowed_series_stats,
)

ROWS = [
    # two 5-min buckets for series s1
    {"sensor_name": "x", "timestamp": "2024-08-28T12:00:10Z", "value": 1.0,
     "fc1_flag": None, "timeseries_id": "s1"},
    {"sensor_name": "x", "timestamp": "2024-08-28T12:01:10Z", "value": 3.0,
     "fc1_flag": None, "timeseries_id": "s1"},
    {"sensor_name": "x", "timestamp": "2024-08-28T12:06:00Z", "value": 5.0,
     "fc1_flag": None, "timeseries_id": "s1"},
]


def _drop(src_dir: str, rows, name: str) -> None:
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_to_memory(spark, df, name: str, mode: str = "append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_series_stats(spark, tmp_path):
    src = str(tmp_path / "drop")
    _drop(src, ROWS, "b1.jsonl")
    stream = normalized_stream(read_telemetry_stream(spark, src))
    agg = windowed_series_stats(stream, window="5 minutes", watermark="10 minutes")
    # append mode would wait for the watermark to close windows — with
    # availableNow the final watermark (max ts - 10 min) closes none, so
    # assert on the complete-mode result instead
    out = _run_to_memory(spark, agg, "win_stats", mode="complete").collect()
    got = {
        (r.timeseries_id, r.window_start.strftime("%H:%M")): (r.n, r.avg_value)
        for r in out
    }
    assert got[("s1", "12:00")] == (2, 2.0)
    assert got[("s1", "12:05")] == (1, 5.0)


def test_streaming_dedup_drops_duplicate_keys(spark, tmp_path):
    src = str(tmp_path / "drop")
    dup = [ROWS[0], dict(ROWS[0], value=9.9), ROWS[1]]  # same (id, ts) twice
    _drop(src, dup, "b1.jsonl")
    stream = normalized_stream(read_telemetry_stream(spark, src))
    dd = streaming_dedup(stream, watermark="10 minutes")
    out = _run_to_memory(spark, dd, "dedup_out").collect()
    assert len(out) == 2  # duplicate (s1, 12:00:10) collapsed


def test_sliding_window(spark, tmp_path):
    src = str(tmp_path / "drop")
    _drop(src, ROWS, "b1.jsonl")
    stream = normalized_stream(read_telemetry_stream(spark, src))
    agg = windowed_series_stats(
        stream, window="10 minutes", slide="5 minutes", watermark="10 minutes"
    )
    out = _run_to_memory(spark, agg, "slide_stats", mode="complete").collect()
    # row at 12:06 belongs to [12:00,12:10) and [12:05,12:15) — sliding
    # windows overlap
    windows_for_s1 = {r.window_start.strftime("%H:%M") for r in out}
    assert {"12:00", "12:05"} <= windows_for_s1
