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
    s = get_spark(app_name="rtsdb-spark-tests", master="local[4]")
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
