"""Client facade mirroring the reference's py_client.py surface
(insert_telemetry / query_telemetry / check_for_fault) 1:1, minus the
HTTP hop — the engine call IS the server here. Function signatures,
return shapes (list of dicts, exactly the JSON the reference's
/query_by_id returns, main.rs:364-375) and the fault-count rule
(py_client.py:40-49, strict >) all match.
"""

from __future__ import annotations

from typing import Optional

from .api import TimeseriesEngine


class TelemetryClient:
    def __init__(self, engine: TimeseriesEngine) -> None:
        self.engine = engine

    def insert_telemetry(
        self,
        sensor_name: str,
        timestamp: str,
        value: float,
        timeseries_id: str,
        fc1_flag: Optional[int] = None,
    ) -> bool:
        """POST /telemetry analog (py_client.py:8-21): True on insert,
        False on capacity error (the reference's 500 'Table Full')."""
        try:
            self.engine.ingest_rows(
                [
                    {
                        "sensor_name": sensor_name,
                        "timestamp": timestamp,
                        "value": value,
                        "fc1_flag": fc1_flag,
                        "timeseries_id": timeseries_id,
                    }
                ]
            )
            return True
        except RuntimeError:
            return False

    def query_telemetry(
        self, timeseries_id: str, start_time: str, end_time: str
    ) -> list[dict]:
        """GET /query_by_id analog (py_client.py:24-37): JSON-shaped rows
        in insertion order, field names as the reference serializes them
        (``timestamp``, not ``ts``)."""
        rows = self.engine.query_by_id(timeseries_id, start_time, end_time).collect()
        return [
            {
                "sensor_name": r.sensor_name,
                "timestamp": r.ts_raw,
                "value": r.value,
                "fc1_flag": r.fc1_flag,
                "timeseries_id": r.timeseries_id,
            }
            for r in rows
        ]

    @staticmethod
    def check_for_fault(data: list[dict], fault_threshold: float = 0.95) -> int:
        """py_client.py:40-49: count entries with value strictly above
        the threshold."""
        return sum(1 for entry in data if entry["value"] > fault_threshold)
