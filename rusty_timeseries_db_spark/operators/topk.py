"""Top-k operators (SURVEY §2.2 sort/limit rows).

Global top-k compiles to ``TakeOrderedAndProject`` (no global sort —
each partition keeps k rows, the driver merges k×partitions rows), which
is exactly the 100 TB-safe plan. Per-group top-k is the standard
window + ``row_number`` composition (single shuffle on the group key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Global top-k; Catalyst plans TakeOrderedAndProject."""
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """k best rows per group. Pass a deterministic ``order`` (include a
    unique tiebreak column) so results are stable across runs/engines."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
