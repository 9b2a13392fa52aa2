"""Fidelity tests porting the reference's four test intents
(main.rs:408-517) plus the semantic quirks pinned in FIXTURES.md §1.2.
"""

from __future__ import annotations

import pytest

from rusty_timeseries_db_spark.api import TimeseriesEngine
from tests.conftest import CANONICAL_ROWS, SERIES_ID


@pytest.fixture()
def engine(spark, tmp_path) -> TimeseriesEngine:
    return TimeseriesEngine(spark, str(tmp_path / "wh"))


def _ingest_canonical(engine: TimeseriesEngine) -> None:
    engine.ingest_rows(CANONICAL_ROWS)


def test_insert_and_query_roundtrip(engine):
    """main.rs:412-436: single-row round-trip preserves every field;
    inclusive bounds."""
    _ingest_canonical(engine)
    rows = engine.query_by_id(
        SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:01:00Z"
    ).collect()
    assert len(rows) == 2
    r0 = rows[0]
    assert r0.sensor_name == "Sa_FanSpeed"
    assert r0.ts_raw == "2024-08-28T12:00:00Z"
    assert r0.value == 0.8
    assert r0.fc1_flag is None
    # Stored id is 32-char-truncated (main.rs:179); the 36-char UUID
    # round-trips as its first 32 chars.
    assert r0.timeseries_id == SERIES_ID[:32]


def test_query_all_three_inclusive(engine):
    """FIXTURES.md §1.1: [12:00, 12:03] → all 3 rows, insertion order."""
    _ingest_canonical(engine)
    rows = engine.query_by_id(
        SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:03:00Z"
    ).collect()
    assert [r.value for r in rows] == [0.8, 0.9, 1.0]


def test_query_empty_table(engine):
    """main.rs:463-472: unknown id ⇒ empty result."""
    _ingest_canonical(engine)
    assert (
        engine.query_by_id(
            "nonexistent_id", "2024-08-28T12:00:00Z", "2024-08-28T12:03:00Z"
        ).count()
        == 0
    )


def test_capacity_guard(engine, spark, tmp_path):
    """main.rs:438-461 intent: optional quota guard raises 'Table Full'."""
    small = TimeseriesEngine(spark, str(tmp_path / "wh2"), max_rows=3)
    small.ingest_rows(CANONICAL_ROWS)
    with pytest.raises(RuntimeError, match="Table Full"):
        small.ingest_rows(CANONICAL_ROWS[:1])


def test_fault_detection_exactly_one(engine):
    """main.rs:474-516: values 0.8/0.9/1.0, threshold 0.95 ⇒ exactly one
    flagged row; boundary (==0.95) not flagged (strict >, main.rs:398)."""
    _ingest_canonical(engine)
    n = engine.run_fault_detection(
        SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:03:00Z"
    )
    assert n == 1
    flagged = (
        engine.query_by_id(SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:03:00Z")
        .filter("fc1_flag = 1")
        .collect()
    )
    assert len(flagged) == 1
    assert flagged[0].value == 1.0


def test_fault_count_client_semantics(engine):
    """py_client.py:40-49: strict > threshold."""
    _ingest_canonical(engine)
    df = engine.query_by_id(
        SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:03:00Z"
    )
    assert engine.fault_count(df, threshold=0.95) == 1
    assert engine.fault_count(df, threshold=1.0) == 0  # boundary excluded


def test_flag_zero_erasure(engine):
    """main.rs:172-176,205-209: fc1_flag=0 reads back NULL."""
    row = dict(CANONICAL_ROWS[0])
    row["fc1_flag"] = 0
    engine.ingest_rows([row])
    got = engine.query_by_id(
        SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:00:00Z"
    ).collect()
    assert got[0].fc1_flag is None


def test_truncation_32_chars(engine):
    """main.rs:154,161,179: string fields silently truncated to 32."""
    row = dict(CANONICAL_ROWS[0])
    row["sensor_name"] = "X" * 40
    engine.ingest_rows([row])
    got = engine.query_by_id(
        SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:00:00Z"
    ).collect()
    assert got[0].sensor_name == "X" * 32


def test_duplicate_keys_allowed_update_hits_first(engine):
    """main.rs:92-104 (dups allowed) + main.rs:107-115 (update touches
    only the first match in insertion order)."""
    engine.ingest_rows([CANONICAL_ROWS[0], CANONICAL_ROWS[0]])
    assert (
        engine.query_by_id(
            SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:00:00Z"
        ).count()
        == 2
    )
    upd = dict(CANONICAL_ROWS[0])
    upd["value"] = 7.0
    assert engine.update_rows([upd]) == 1
    rows = engine.query_by_id(
        SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:00:00Z"
    ).collect()
    assert [r.value for r in rows] == [7.0, 0.8]


def test_out_of_order_arrival_kept_in_arrival_order(engine):
    """FIXTURES.md §1.2: earlier event-time row arriving later is stored
    and returned in arrival order."""
    engine.ingest_rows([CANONICAL_ROWS[1]])
    engine.ingest_rows([CANONICAL_ROWS[0]])
    rows = engine.query_by_id(
        SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:03:00Z"
    ).collect()
    assert [r.value for r in rows] == [0.9, 0.8]
