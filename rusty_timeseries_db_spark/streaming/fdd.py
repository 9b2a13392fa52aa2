"""Streaming fault detection (FDD) — R4/R5 re-expressed.

The reference runs a hard-coded threshold rule every 300 s in a tokio
task (main.rs:233-240, 384-406), mutating rows in place. Here:
- ``flag_faults`` is the pure transformation (usable in batch or
  ``foreachBatch``);
- ``start_fdd_stream`` attaches it to the ingest stream with a
  configurable processing-time trigger (R5 cadence; R6 re-arm is just
  stop + restart with a new trigger);
- stateful escalation (``consecutive_faults``) goes beyond the
  reference: N consecutive over-threshold readings per series via
  ``applyInPandasWithState``-free window logic in batch, or
  transformWithState-style sessionization for streams.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

DEFAULT_THRESHOLD = 0.95  # main.rs:388
DEFAULT_FLAG = 1  # main.rs:399


def flag_faults(
    df: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    flag_value: int = DEFAULT_FLAG,
) -> DataFrame:
    """R4: ``fc1_flag = flag_value`` where ``value > threshold`` (strict
    — boundary value == threshold is NOT a fault, main.rs:398), existing
    flags preserved otherwise."""
    return df.withColumn(
        "fc1_flag",
        F.when(F.col("value") > threshold, F.lit(flag_value).cast("tinyint")).otherwise(
            F.col("fc1_flag")
        ),
    )


def start_fdd_stream(
    stream: DataFrame,
    warehouse_dir: str,
    threshold: float = DEFAULT_THRESHOLD,
    trigger_seconds: int = 300,
    available_now: bool = False,
    sink: Callable[[DataFrame, int], None] | None = None,
) -> StreamingQuery:
    """Attach the FC1 rule to a telemetry stream via ``foreachBatch``:
    each micro-batch is flagged and appended to the flagged-telemetry
    table (or a caller-supplied sink). Trigger cadence defaults to the
    reference's 300 s (main.rs:235)."""
    out_path = os.path.join(warehouse_dir, "telemetry_flagged")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        from .ingest import normalize_batch

        flagged = flag_faults(normalize_batch(batch, batch_id), threshold)
        if sink is not None:
            sink(flagged, batch_id)
        else:
            flagged.write.mode("append").parquet(out_path)

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", os.path.join(warehouse_dir, "_checkpoints/fdd")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


class FddScheduler:
    """R5/R6 cadence owner for a running FDD stream.

    The reference's ``set_interval`` (main.rs:285-299) spawns a task
    that sleeps once, runs FDD once, and never re-arms (the R6 bug
    SURVEY §2.1 documents). Here the scheduler owns the live
    ``StreamingQuery``: ``set_interval`` stops it and restarts against
    the SAME checkpoint directory with the new processing-time trigger,
    so processed-offset state carries over and every future micro-batch
    fires at the new cadence.
    """

    def __init__(
        self,
        stream: DataFrame,
        warehouse_dir: str,
        threshold: float = DEFAULT_THRESHOLD,
        trigger_seconds: int = 300,
        sink: Callable[[DataFrame, int], None] | None = None,
    ) -> None:
        self.stream = stream
        self.warehouse_dir = warehouse_dir
        self.threshold = threshold
        self.trigger_seconds = int(trigger_seconds)
        self.sink = sink
        self.query: StreamingQuery | None = None

    def start(self) -> StreamingQuery:
        self.query = start_fdd_stream(
            self.stream,
            self.warehouse_dir,
            self.threshold,
            trigger_seconds=self.trigger_seconds,
            sink=self.sink,
        )
        return self.query

    def set_interval(self, seconds: int) -> StreamingQuery:
        """Re-arm the FDD cadence (R6). Stops the active query (if any)
        and restarts it with the new trigger on the same checkpoint."""
        self.trigger_seconds = int(seconds)
        if self.query is not None and self.query.isActive:
            self.query.stop()
            self.query.awaitTermination()
        return self.start()

    def stop(self) -> None:
        if self.query is not None and self.query.isActive:
            self.query.stop()
            self.query.awaitTermination()


def stateful_fault_runs(
    stream: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    min_run: int = 3,
) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    tracks, per series, the current run of consecutive over-threshold
    readings **across micro-batches**, emitting a row whenever a run
    reaches ``min_run``. This is the escalation path beyond the
    reference's stateless per-batch rule (main.rs:384-406) — state the
    reference cannot express at all.

    Input must have columns (timeseries_id, ts, value). State per key:
    (run_length, run_start_epoch_us).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "timeseries_id string, run_length bigint, run_start timestamp, "
        "run_end timestamp"
    )
    state_schema = "run_length bigint, run_start_us bigint"

    def track(key, pdfs, state: GroupState):
        import pandas as pd

        (series_id,) = key
        run_len, run_start_us = (
            state.get if state.exists else (0, 0)
        )
        emitted = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for ts, value in zip(pdf["ts"], pdf["value"]):
                if value > threshold:
                    if run_len == 0:
                        run_start_us = int(pd.Timestamp(ts).value // 1000)
                    run_len += 1
                    if run_len == min_run:
                        emitted.append(
                            (
                                series_id,
                                run_len,
                                pd.Timestamp(run_start_us * 1000),
                                pd.Timestamp(ts),
                            )
                        )
                else:
                    run_len, run_start_us = 0, 0
        state.update((run_len, run_start_us))
        if emitted:
            yield pd.DataFrame(
                emitted,
                columns=["timeseries_id", "run_length", "run_start", "run_end"],
            )

    return stream.groupBy("timeseries_id").applyInPandasWithState(
        track,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def apply_rules(telemetry: DataFrame, rules: DataFrame) -> DataFrame:
    """Rules-driven FDD (generalizes the reference's single hard-coded
    rule, main.rs:388-395, via the FIXTURES.md §3 ``fdd_rules`` table).

    Interval + threshold join: a reading matches a rule when it is in
    the rule's series and time window with ``value > threshold``; the
    matched reading gets the rule's ``flag_value`` (lowest flag wins on
    overlapping rules, deterministically). Rules are broadcast — the
    telemetry side never shuffles."""
    r = F.broadcast(
        rules.select(
            F.col("rule_id").alias("_r_rule_id"),
            F.col("timeseries_id").alias("_r_sid"),
            F.col("threshold").alias("_r_thr"),
            F.col("window_start").alias("_r_ws"),
            F.col("window_end").alias("_r_we"),
            F.col("flag_value").alias("_r_flag"),
        )
    )
    cond = (
        (telemetry["timeseries_id"] == F.col("_r_sid"))
        & (telemetry["ts"] >= F.col("_r_ws"))
        & (telemetry["ts"] <= F.col("_r_we"))
        & (telemetry["value"] > F.col("_r_thr"))
    )
    joined = telemetry.join(r, cond, "left")
    keys = [c for c in telemetry.columns]
    return (
        joined.groupBy(*keys)
        .agg(
            F.min("_r_flag").alias("_new_flag"),
            F.count("_r_rule_id").alias("n_rules_matched"),
        )
        .withColumn(
            "fc1_flag",
            F.coalesce(F.col("_new_flag"), F.col("fc1_flag")).cast("tinyint"),
        )
        .drop("_new_flag")
    )


def consecutive_faults(
    df: DataFrame,
    min_run: int = 3,
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Escalation rule (extension): series with ≥ ``min_run`` consecutive
    over-threshold readings. Classic gaps-and-islands with two window
    passes — one shuffle on the series key."""
    w = Window.partitionBy("timeseries_id").orderBy("ts", "ingest_seq")
    marked = df.withColumn(
        "_is_fault", (F.col("value") > threshold).cast("int")
    ).withColumn(
        "_grp",
        F.row_number().over(w)
        - F.sum("_is_fault").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = (
        marked.filter(F.col("_is_fault") == 1)
        .groupBy("timeseries_id", "_grp")
        .agg(
            F.count("*").alias("run_length"),
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
        )
        .filter(F.col("run_length") >= min_run)
        .drop("_grp")
    )
    return runs
