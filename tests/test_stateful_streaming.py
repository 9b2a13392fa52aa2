"""Custom stateful streaming operator: consecutive-fault runs tracked
across micro-batches via applyInPandasWithState."""

from __future__ import annotations

import json
import os

from rusty_timeseries_db_spark.schema import normalize_payload
from rusty_timeseries_db_spark.streaming.fdd import stateful_fault_runs
from rusty_timeseries_db_spark.streaming.ingest import read_telemetry_stream


def _drop(src_dir: str, rows, name: str) -> None:
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _row(minute: int, value: float, sid: str = "s1") -> dict:
    return {
        "sensor_name": "x",
        "timestamp": f"2024-08-28T12:{minute:02d}:00Z",
        "value": value,
        "fc1_flag": None,
        "timeseries_id": sid,
    }


def test_stateful_run_spans_micro_batches(spark, tmp_path):
    """A fault run split across two micro-batches must still trigger —
    exactly what per-batch (stateless) FDD cannot see."""
    src = str(tmp_path / "drop")
    # batch 1: two over-threshold readings (run=2, below min_run=3)
    _drop(src, [_row(0, 0.99), _row(1, 0.97)], "b1.jsonl")
    # batch 2: third consecutive → the run completes across the boundary
    _drop(src, [_row(2, 0.98), _row(3, 0.5)], "b2.jsonl")

    stream = normalize_payload(read_telemetry_stream(spark, src)).select(
        "timeseries_id", "ts", "value"
    )
    runs = stateful_fault_runs(stream, threshold=0.95, min_run=3)
    q = (
        runs.writeStream.format("memory")
        .queryName("fault_runs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM fault_runs").collect()
    assert len(got) == 1
    r = got[0]
    assert r.timeseries_id == "s1" and r.run_length == 3
    assert r.run_start.strftime("%H:%M") == "12:00"
    assert r.run_end.strftime("%H:%M") == "12:02"
