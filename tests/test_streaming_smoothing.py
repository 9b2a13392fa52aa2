"""Streaming recursive EWMA (streaming/smoothing.py): the recurrence
must carry state across micro-batch boundaries and match the exact
sequential computation."""

from __future__ import annotations

import json
import os

import pytest

from rusty_timeseries_db_spark.schema import normalize_payload
from rusty_timeseries_db_spark.streaming.ingest import read_telemetry_stream
from rusty_timeseries_db_spark.streaming.smoothing import stateful_ewma


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


def _reference_ewma(values, alpha):
    out, y = [], None
    for x in values:
        y = x if y is None else alpha * x + (1.0 - alpha) * y
        out.append(y)
    return out


def test_ewma_recursion_spans_micro_batches(spark, tmp_path):
    src = str(tmp_path / "drop")
    vals_b1 = [0.2, 0.4, 0.8]
    vals_b2 = [1.0, 0.6]
    _drop(src, [_row(i, v) for i, v in enumerate(vals_b1)], "b1.jsonl")
    _drop(src, [_row(3 + i, v) for i, v in enumerate(vals_b2)], "b2.jsonl")

    stream = normalize_payload(read_telemetry_stream(spark, src)).select(
        "timeseries_id", "ts", "value"
    )
    q = (
        stateful_ewma(stream, alpha=0.5)
        .writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("select * from ewma_out").collect(), key=lambda r: r.ts
    )
    got = [r.ewma for r in rows]
    want = _reference_ewma(vals_b1 + vals_b2, 0.5)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-12)


def test_ewma_independent_series(spark, tmp_path):
    src = str(tmp_path / "drop")
    _drop(
        src,
        [_row(0, 1.0, "a"), _row(1, 0.0, "a"), _row(0, 4.0, "b")],
        "b1.jsonl",
    )
    stream = normalize_payload(read_telemetry_stream(spark, src)).select(
        "timeseries_id", "ts", "value"
    )
    q = (
        stateful_ewma(stream, alpha=0.5)
        .writeStream.format("memory")
        .queryName("ewma_two")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    by_sid = {}
    for r in spark.sql("select * from ewma_two").collect():
        by_sid.setdefault(r.timeseries_id, []).append((r.ts, r.ewma))
    a = [e for _, e in sorted(by_sid["a"])]
    assert a == pytest.approx([1.0, 0.5])
    assert [e for _, e in by_sid["b"]] == pytest.approx([4.0])


def test_ewma_rejects_bad_alpha(spark):
    df = spark.range(1).selectExpr(
        "'s' as timeseries_id", "current_timestamp() as ts",
        "0.0 as value"
    )
    with pytest.raises(ValueError):
        stateful_ewma(df, alpha=0.0)
    with pytest.raises(ValueError):
        stateful_ewma(df, alpha=1.5)


def test_transform_with_state_series_stats(spark, tmp_path):
    """Spark-4 transformWithState surface: running per-series stats
    must accumulate across micro-batches (one output row per key per
    batch, last row reflects all input)."""
    from rusty_timeseries_db_spark.streaming.smoothing import (
        stateful_series_stats_tws,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("google.protobuf unavailable — transformWithState "
                    "is env-blocked in this container")

    src = str(tmp_path / "drop")
    _drop(src, [_row(0, 0.3), _row(1, 0.9)], "b1.jsonl")
    _drop(src, [_row(2, 0.1)], "b2.jsonl")
    stream = normalize_payload(read_telemetry_stream(spark, src)).select(
        "timeseries_id", "ts", "value"
    )
    q = (
        stateful_series_stats_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_stats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select * from tws_stats order by n"
    ).collect()
    assert rows, "no output rows"
    final = rows[-1]
    assert final.n == 3
    assert final.min_value == pytest.approx(0.1)
    assert final.max_value == pytest.approx(0.9)
