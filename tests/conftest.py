from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rusty_timeseries_db_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # Round 20 (VERDICT r19 #2 — get the suite's wall time back under
    # the external verification window): TEST-SESSION-ONLY shuffle
    # sizing. Test fixtures are tiny (tens-to-thousands of rows), so
    # the default 32 shuffle partitions just multiply per-task
    # scheduling overhead across ~20k test-suite Spark stages on a
    # local[4] session. 8 partitions still exercises multi-partition
    # shuffles (2 task waves) while cutting the per-stage floor.
    # bench.py / the driver contract keep the production default —
    # this is test infrastructure, not engine tuning.
    s = get_spark(
        app_name="rtsdb-spark-tests",
        master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


#: Canonical 3-row Sa_FanSpeed fixture (main.rs:478-500, py_client.py:54-56).
SERIES_ID = "8f541ba4-c437-43ba-ba1d-5c946583fe54"
CANONICAL_ROWS = [
    {
        "sensor_name": "Sa_FanSpeed",
        "timestamp": "2024-08-28T12:00:00Z",
        "value": 0.8,
        "fc1_flag": None,
        "timeseries_id": SERIES_ID,
    },
    {
        "sensor_name": "Sa_FanSpeed",
        "timestamp": "2024-08-28T12:01:00Z",
        "value": 0.9,
        "fc1_flag": None,
        "timeseries_id": SERIES_ID,
    },
    {
        "sensor_name": "Sa_FanSpeed",
        "timestamp": "2024-08-28T12:02:00Z",
        "value": 1.0,
        "fc1_flag": None,
        "timeseries_id": SERIES_ID,
    },
]
