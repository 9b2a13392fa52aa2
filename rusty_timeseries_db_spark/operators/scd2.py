"""SCD2 (slowly-changing dimension, type 2) merge — the CDC pattern on
engines without MERGE INTO: emulate with join + union (guide-listed
OLAP pattern; the same overlay philosophy as telemetry updates, §7.4,
applied to dimension history).

A dimension row carries ``(key, attrs..., valid_from, valid_to)`` with
``valid_to IS NULL`` marking the current version. ``scd2_apply`` takes a
batch of changes ``(key, attrs..., change_ts)`` and returns the new
dimension:

- current rows whose tracked attrs changed → closed out
  (``valid_to = change_ts``);
- a new current version inserted per changed/new key;
- unchanged-attr changes are no-ops (idempotent re-delivery safe);
- history rows pass through untouched.

Shuffle shape: one equi-join on the key + union — broadcast the change
batch (CDC batches ≪ dimension at scale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: Sequence[str],
    change_ts: str = "change_ts",
) -> DataFrame:
    """Return the post-merge SCD2 dimension (see module docstring).

    ``changes`` must hold one row per key (dedupe/latest-wins upstream
    for multi-change batches).
    """
    tracked = list(tracked)
    cur = dim.filter(F.col("valid_to").isNull())
    hist = dim.filter(F.col("valid_to").isNotNull())

    ch = F.broadcast(
        changes.select(
            F.col(key).alias("_ck"),
            F.col(change_ts).alias("_cts"),
            *[F.col(c).alias(f"_c_{c}") for c in tracked],
        )
    )
    joined = cur.join(ch, cur[key] == F.col("_ck"), "full_outer")

    attrs_differ = F.lit(False)
    for c in tracked:
        attrs_differ = attrs_differ | ~F.col(c).eqNullSafe(F.col(f"_c_{c}"))

    # 1. current rows with no change, or change with identical attrs
    keep_cur = joined.filter(
        F.col("_ck").isNull() | (cur[key].isNotNull() & ~attrs_differ)
    ).select(*dim.columns)

    # 2. current rows closed out by a real change
    closed = (
        joined.filter(cur[key].isNotNull() & F.col("_ck").isNotNull() & attrs_differ)
        .select(
            *[cur[c] for c in dim.columns if c != "valid_to"],
            F.col("_cts").alias("valid_to"),
        )
        .select(*dim.columns)
    )

    # 3. new current versions (changed keys + brand-new keys)
    new_rows = (
        joined.filter(
            F.col("_ck").isNotNull() & (cur[key].isNull() | attrs_differ)
        )
        .select(
            F.col("_ck").alias(key),
            *[F.col(f"_c_{c}").alias(c) for c in tracked],
            F.col("_cts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
        .select(*dim.columns)
    )

    return hist.unionByName(keep_cur).unionByName(closed).unionByName(new_rows)
