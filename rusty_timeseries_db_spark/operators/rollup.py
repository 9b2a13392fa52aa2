"""Continuous aggregate — the hypertable-rollup operator of a
timeseries engine (TimescaleDB-style continuous aggregates; the
reference has no aggregation at all, its FDD loop re-scans a fixed
window each tick, main.rs:384-406).

A continuous aggregate keeps a MATERIALIZED windowed rollup of an
append-only base table, refreshed incrementally, and serves reads as
``materialized rollup ∪ freshly-aggregated tail`` so results are
always complete even between refreshes. The Spark-idiomatic build:

- **Materialization is parquet partitioned by window day** — readers
  prune to the window range they query (PartitionFilters), and a
  refresh replaces exactly the affected partitions.
- **Incremental refresh = dynamic partition overwrite.** The refresh
  re-aggregates only window-days at-or-after the stored high-water
  mark and rewrites those partition directories atomically
  (``partitionOverwriteMode=dynamic``). Re-running a refresh is
  idempotent — the same partitions get the same bytes — so a crashed
  refresh is retried, never reconciled. No driver state: the
  watermark manifest is one tiny JSON file beside the data.
- **The tail stays correct by re-aggregating from base.** Windows at
  or after the high-water mark may still receive appends, so
  ``read()`` unions the materialized part (window_day < hwm) with an
  on-the-fly aggregation of the base tail (ts >= hwm). Aggregating a
  tail bounded by one refresh interval is cheap at any scale — the
  exact trade TimescaleDB's real-time aggregates make.

At 100 TB: the rollup is ~(base rows / rows-per-window) — orders of
magnitude smaller than base; refresh cost is O(appended data), not
O(history); the only shuffle is the grouped aggregation's.

Always-safe restriction: the high-water mark only ADVANCES to
``max(ts)`` seen at refresh time, truncated DOWN to a window-day
boundary, so a window-day is materialized-final only once wholly in
the past of observed data. Late rows older than the high-water mark
are a documented loss (same watermark contract as the streaming
surface, streaming/ingest.py) — call ``refresh(full=True)`` to
rebuild everything when late data must be folded in.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ContinuousRollup:
    """A windowed rollup of an events-shaped table, maintained
    incrementally.

    Parameters: ``base`` the append-only source — a parquet path, or a
    zero-arg callable returning a DataFrame (e.g. the engine's
    overlay-merged canonical telemetry view, api.py
    ``continuous_rollup``); ``rollup_path`` the materialization;
    ``key_cols`` grouping keys besides the window; ``ts_col``
    event-time column; ``window`` tumbling width (any ``F.window``
    duration); ``value_col`` the measure.
    """

    def __init__(
        self,
        spark: SparkSession,
        base,
        rollup_path: str,
        key_cols: list[str],
        ts_col: str = "ts",
        value_col: str = "value",
        window: str = "5 minutes",
    ) -> None:
        self.spark = spark
        self.base = base
        self.rollup_path = rollup_path
        self.key_cols = list(key_cols)
        self.ts_col = ts_col
        self.value_col = value_col
        self.window = window
        self.manifest_path = rollup_path + ".hwm.json"
        # Day boundaries must be window boundaries: otherwise a window
        # spanning midnight could be half-materialized and half-tail
        # (double-counted by read()). Tumbling rollups use day-dividing
        # widths in practice; enforce it.
        _SECS = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                 "hour": 3600, "hours": 3600}
        try:
            qty, unit = window.split()
            secs = int(qty) * _SECS[unit]
        except (ValueError, KeyError):
            raise ValueError(
                f"window {window!r} must be '<n> seconds|minutes|hours'"
            ) from None
        if secs <= 0 or 86_400 % secs != 0:
            raise ValueError(
                f"window {window!r} ({secs}s) must evenly divide 24 hours "
                "so day boundaries are window boundaries"
            )

    # ------------------------------------------------------------ internals

    def _base(self) -> DataFrame:
        if callable(self.base):
            return self.base()
        return self.spark.read.parquet(self.base)

    def _aggregate(self, df: DataFrame) -> DataFrame:
        w = F.window(self.ts_col, self.window)
        v = F.col(self.value_col)
        return (
            df.groupBy(*self.key_cols, w.alias("w"))
            .agg(
                F.count("*").alias("n"),
                # exact 2-dp decimal sum: refresh order can never change
                # the stored bytes (idempotent partition rewrites)
                F.sum(v.cast("decimal(18,2)")).cast("double").alias("sum_value"),
                F.min(v).alias("min_value"),
                F.max(v).alias("max_value"),
            )
            .select(
                *self.key_cols,
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "n",
                "sum_value",
                "min_value",
                "max_value",
                F.to_date("w.start").alias("window_day"),
            )
        )

    def _read_hwm(self) -> str | None:
        if not os.path.exists(self.manifest_path):
            return None
        with open(self.manifest_path) as f:
            return json.load(f)["hwm_day"]

    def _write_hwm(self, day: str) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"hwm_day": day}, f)
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    # ------------------------------------------------------------- surface

    def refresh(self, full: bool = False) -> int:
        """Materialize complete window-days; returns rows written.

        Incremental by default: only days >= the stored high-water mark
        are re-aggregated and dynamically overwritten. ``full=True``
        rebuilds the whole rollup (the late-data escape hatch).
        """
        base = self._base()
        hwm = None if full else self._read_hwm()
        if hwm is not None:
            base = base.filter(F.col(self.ts_col) >= F.lit(hwm).cast("date"))
        bounds = base.agg(F.max(self.ts_col).alias("mx")).collect()[0]
        if bounds.mx is None:
            return 0  # nothing new
        agg = self._aggregate(base)
        # final day = the day containing max(ts): still append-hot, so
        # materialize only days strictly BEFORE it and leave it to the
        # real-time tail
        new_hwm = str(bounds.mx.date())
        out = agg.filter(F.col("window_day") < F.lit(new_hwm).cast("date"))
        # row count via an Observation on the WRITE job — a separate
        # count() action would execute the whole aggregation twice
        from pyspark.sql import Observation

        obs = Observation()
        (
            out.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_day")
            .parquet(self.rollup_path)
        )
        self._write_hwm(new_hwm)
        return int(obs.get["n"])

    def read(self) -> DataFrame:
        """The always-complete view: materialized days ∪ an on-the-fly
        aggregation of the base tail (ts at/after the high-water mark).
        Same schema either way; readers cannot tell which side a window
        came from."""
        hwm = self._read_hwm()
        tail_base = self._base()
        if hwm is None:
            return self._aggregate(tail_base)
        tail = self._aggregate(
            tail_base.filter(F.col(self.ts_col) >= F.lit(hwm).cast("date"))
        )
        # a refresh that materialized zero rows leaves only _SUCCESS —
        # no schema to read; require actual data files
        has_files = os.path.isdir(self.rollup_path) and any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(self.rollup_path)
            for f in fs
        )
        if not has_files:
            return tail
        mat = self.spark.read.parquet(self.rollup_path).filter(
            F.col("window_day") < F.lit(hwm).cast("date")
        )
        return mat.unionByName(tail)
