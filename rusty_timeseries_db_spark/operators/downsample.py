"""Visualization downsampling — LTTB and min-max decimation (the
operators a timeseries UI calls before plotting millions of points;
the reference returns raw rows only, main.rs:300-315).

Two operators with different contracts:

- ``minmax_decimate`` — per (series, time-bucket) keep the rows
  achieving the bucket's min and max value (ties broken by id, so the
  selection is total-ordered and ORACLE-CHECKABLE). Pure relational:
  one window rank over the bucket key, fully JVM-side, one shuffle.
  Preserves every extreme; output ≤ 2 rows/bucket.

- ``lttb`` — Largest-Triangle-Three-Buckets (Steinarsson 2013, the
  de-facto charting standard): picks the point per bucket that
  maximizes the triangle area with the PREVIOUSLY SELECTED point and
  the next bucket's centroid. That trailing dependency makes it
  inherently sequential per series — exactly the grouped-map
  (``applyInPandas``) shape this engine reserves for per-series model
  logic (functions/udfs.py policy). Scale: parallelism = #series;
  one series' points must fit a pandas group (downsample per
  day/shard first if a single series exceeds executor memory).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def minmax_decimate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Keep the min-valued and max-valued row per (keys, bucket).

    Deterministic: within a bucket, ties on value break by ``id_col``
    (required for a total order when duplicate values exist). Output
    columns = input columns + ``bucket_start``; a row that is both the
    min and max (single-row bucket) appears once.
    """
    tiebreak = [F.col(id_col)] if id_col else []
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(ts_col) / bucket_seconds).cast("bigint")
        * bucket_seconds
    ).alias("bucket_start")
    b = df.withColumn("bucket_start", bucket)
    part = Window.partitionBy(*key_cols, "bucket_start")
    lo = F.row_number().over(part.orderBy(F.col(value_col).asc(), *tiebreak))
    hi = F.row_number().over(part.orderBy(F.col(value_col).desc(), *tiebreak))
    return (
        b.withColumn("_lo", lo)
        .withColumn("_hi", hi)
        .filter((F.col("_lo") == 1) | (F.col("_hi") == 1))
        .drop("_lo", "_hi")
    )


def lttb(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    n_out: int = 200,
) -> DataFrame:
    """Downsample each series to ≤ ``n_out`` points with LTTB.

    Output schema: key cols + (ts, value). First and last points of
    each series are always kept; interior points are chosen per bucket
    to maximize visual fidelity (triangle area). Series with ≤ n_out
    points pass through unchanged.
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*key_cols, ts_col, value_col).schema.fields
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        # value as a tiebreak: duplicate timestamps otherwise keep
        # partition-arrival order and the pick set varies across runs
        pdf = pdf.sort_values(
            [ts_col, value_col], kind="mergesort"
        ).reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[[*key_cols, ts_col, value_col]]
        x = pdf[ts_col].astype("int64").to_numpy(dtype="float64")
        y = pdf[value_col].to_numpy(dtype="float64")
        # canonical LTTB: n_out-2 interior buckets over points 1..n-2
        import numpy as np

        edges = np.linspace(1, n - 1, n_out - 1).astype("int64")
        selected = [0]
        prev = 0
        for b in range(n_out - 2):
            lo, hi = edges[b], edges[b + 1]
            nxt_lo, nxt_hi = edges[b + 1], (
                edges[b + 2] if b + 2 < len(edges) else n - 1
            )
            # centroid of the NEXT bucket (last bucket → the last point)
            if nxt_hi > nxt_lo:
                cx, cy = x[nxt_lo:nxt_hi].mean(), y[nxt_lo:nxt_hi].mean()
            else:
                cx, cy = x[n - 1], y[n - 1]
            ax, ay = x[prev], y[prev]
            area = abs(
                (ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay)
            )
            prev = lo + (int(area.argmax()) if hi > lo else 0)
            selected.append(prev)
        selected.append(n - 1)
        return pdf.iloc[selected][[*key_cols, ts_col, value_col]]

    return (
        df.select(*key_cols, ts_col, value_col)
        .groupBy(*key_cols)
        .applyInPandas(pick, out_fields)
    )
