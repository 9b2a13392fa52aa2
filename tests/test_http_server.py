"""HTTP surface parity: the reference's py_client.py flows (insert →
query_by_id → client-side fault check, py_client.py:8-49) run verbatim
against the stdlib adapter — same routes, same row shape, same status
codes (main.rs:325-375)."""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pytest

from rusty_timeseries_db_spark.api import TimeseriesEngine
from rusty_timeseries_db_spark.server import TelemetryHttpServer

SID = "8f541ba4-c437-43ba-ba1d-5c946583fe54"


@pytest.fixture()
def server(spark, tmp_path):
    eng = TimeseriesEngine(spark, str(tmp_path / "wh"), max_rows=5)
    srv = TelemetryHttpServer(eng, port=0).start()
    yield srv
    srv.stop()


def _insert(base, sensor, ts, value, sid, flag=None):
    """py_client.insert_telemetry, requests swapped for urllib."""
    body = json.dumps(
        {
            "sensor_name": sensor,
            "timestamp": ts,
            "value": value,
            "fc1_flag": flag,
            "timeseries_id": sid,
        }
    ).encode()
    req = urllib.request.Request(
        f"{base}/telemetry", data=body,
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def _query(base, sid, start, end):
    """py_client.query_telemetry."""
    qs = urllib.parse.urlencode(
        {"timeseries_id": sid, "start_time": start, "end_time": end}
    )
    with urllib.request.urlopen(f"{base}/query_by_id?{qs}") as resp:
        assert resp.status == 200
        return json.loads(resp.read())


def test_py_client_flow(server):
    base = server.base_url
    for ts, v in (
        ("2024-08-28T12:00:00Z", 0.8),
        ("2024-08-28T12:01:00Z", 0.9),
        ("2024-08-28T12:02:00Z", 1.0),
    ):
        code, text = _insert(base, "Sa_FanSpeed", ts, v, SID)
        assert (code, text) == (200, "Inserted")

    data = _query(base, SID, "2024-08-28T12:00:00Z", "2024-08-28T12:03:00Z")
    assert [e["value"] for e in data] == [0.8, 0.9, 1.0]
    assert data[0]["timestamp"] == "2024-08-28T12:00:00Z"
    assert all(e["sensor_name"] == "Sa_FanSpeed" for e in data)
    # stored ids are 32-char truncated (main.rs:179) and the probe is
    # normalized identically, so the 36-char UUID round-trips
    assert all(e["timeseries_id"] == SID[:32] for e in data)

    # py_client.check_for_fault at threshold 0.95: exactly one fault
    faults = [e for e in data if e["value"] > 0.95]
    assert len(faults) == 1 and faults[0]["timestamp"] == "2024-08-28T12:02:00Z"


def test_table_full_maps_to_500(server):
    base = server.base_url
    for i in range(5):
        code, _ = _insert(
            base, "s", f"2024-08-28T12:00:0{i}Z", 0.1, SID
        )
        assert code == 200
    code, text = _insert(base, "s", "2024-08-28T12:00:09Z", 0.1, SID)
    assert (code, text) == (500, "Table Full")


def test_unknown_routes_and_bad_requests(server):
    base = server.base_url
    with pytest.raises(urllib.error.HTTPError) as e1:
        urllib.request.urlopen(f"{base}/nope")
    assert e1.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e2:
        urllib.request.urlopen(f"{base}/query_by_id?timeseries_id=x")
    assert e2.value.code == 400
