"""Mergeable sketch aggregates — HyperLogLog distinct-count rollups
(SURVEY §2.2 A2's scale path; the reference has no aggregation).

``COUNT(DISTINCT x)`` does not decompose: a per-day rollup of exact
distinct counts cannot be summed into a weekly count (users overlap).
The scale answer is a MERGEABLE sketch: store an HLL sketch per rollup
cell, union sketches across cells, estimate at read time. Spark 4
ships Apache DataSketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``) — JVM-side, codegen'd,
shuffle = the grouped agg's only.

No DuckDB oracle is possible (DataSketches binary layout is
Spark-specific), so the declared query is rows-only; correctness is
pinned by invariant tests instead: estimate accuracy vs exact distinct
counts, and the defining MERGE property — union of per-day sketches
estimates the same value as one sketch over the whole range
(tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch(col: Column | str, lg_k: int = 12) -> Column:
    """HLL sketch aggregate of a column (~0.8% rel. error at lg_k=12,
    1.5 KB per sketch). Store next to plain counts in rollup cells."""
    c = F.col(col) if isinstance(col, str) else col
    return F.hll_sketch_agg(c, F.lit(lg_k))


def sketch_estimate(sketch: Column | str) -> Column:
    """Distinct-count estimate from a sketch (or union of sketches)."""
    c = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.hll_sketch_estimate(c)


def distinct_rollup(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-cell sketch rollup: one row per ``keys`` cell with the cell's
    HLL sketch AND its estimate. The sketch column is what downstream
    re-aggregation unions; the estimate is for direct reads."""
    sk = distinct_sketch(value_col, lg_k)
    return df.groupBy(*keys).agg(
        sk.alias("sketch"),
        F.count("*").alias("n_rows"),
    ).withColumn("distinct_est", sketch_estimate("sketch").cast("bigint"))


def merge_rollup(
    rollup: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate a sketch rollup to coarser ``keys`` (e.g. day cells
    → week) by UNIONING sketches — the operation exact distinct counts
    cannot do. Returns the coarser cells with merged sketch + estimate."""
    return (
        rollup.groupBy(*keys)
        .agg(
            F.hll_union_agg(F.col(sketch_col)).alias("sketch"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
        .withColumn("distinct_est", sketch_estimate("sketch").cast("bigint"))
    )
