"""Time-series resampling, gap-fill (LOCF), and rolling windows
(SURVEY §2.2 window-function rows; capability extensions — the reference
has no aggregation surface at all, SURVEY §2.1 "explicitly absent").

All pure DataFrame compositions: one shuffle on the series key per
operator, everything inside whole-stage codegen. The time spine for
gap-fill is generated with ``sequence()`` (JVM-side) — no driver loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    interval: str,
    aggs: dict[str, Column],
) -> DataFrame:
    """Tumbling-bucket downsample: ``date_trunc``-style bucketing via the
    ``window()`` function + grouped agg (partial aggregation map-side).

    ``interval`` is a Spark interval string, e.g. ``"5 minutes"``.
    """
    bucketed = df.groupBy(
        *keys, F.window(F.col(ts), interval).alias("_w")
    ).agg(*[v.alias(k) for k, v in aggs.items()])
    return bucketed.select(
        *keys,
        F.col("_w.start").alias("bucket_start"),
        F.col("_w.end").alias("bucket_end"),
        *aggs.keys(),
    )


def time_spine(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    step: str = "1 minute",
) -> DataFrame:
    """Per-key dense timestamp spine from each key's min(ts) to max(ts).

    ``sequence(min, max, interval)`` runs JVM-side; the explode is
    narrow (no shuffle beyond the groupBy)."""
    bounds = df.groupBy(*keys).agg(
        F.min(ts).alias("_lo"), F.max(ts).alias("_hi")
    )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}"))
        ).alias(ts),
    )


def locf_fill(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value_cols: Sequence[str],
    spine: DataFrame | None = None,
    step: str = "1 minute",
) -> DataFrame:
    """Last-observation-carried-forward gap-fill.

    Joins the (generated or supplied) spine with observations, then
    fills NULLs with ``last(..., ignorenulls=True)`` over an
    unbounded-preceding frame per key — the canonical Spark LOCF idiom.
    """
    keys = list(keys)
    if spine is None:
        spine = time_spine(df, keys, ts, step)
    obs = df.select(*keys, ts, *value_cols)
    joined = spine.join(obs, [*keys, ts], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *keys,
        ts,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )


def rolling_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    value: str,
    window_seconds: int,
    aggs: Sequence[str] = ("avg", "min", "max", "count"),
) -> DataFrame:
    """Trailing time-based rolling aggregates over ``[t - w, t]`` using a
    ``rangeBetween`` frame on epoch seconds (true event-time frames, not
    row counts)."""
    epoch = F.col(ts).cast("double").cast("long")
    w = (
        Window.partitionBy(*keys)
        .orderBy(epoch)
        .rangeBetween(-window_seconds, 0)
    )
    out = df
    for a in aggs:
        out = out.withColumn(
            f"rolling_{a}", getattr(F, a)(F.col(value)).over(w)
        )
    return out


def cumulative_agg(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[str],
    value: str,
) -> DataFrame:
    """Running sum/count per key in event order (deterministic given a
    unique ``order`` tiebreak)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("cum_sum", F.sum(value).over(w)).withColumn(
        "cum_count", F.count(F.lit(1)).over(w)
    )
