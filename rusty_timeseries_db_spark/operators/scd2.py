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

Shuffle shape: the dimension NEVER shuffles. Spark cannot broadcast
either side of a full-outer join, so the merge is decomposed into
broadcast-able legs instead:

1. ``cur LEFT OUTER broadcast(changes)`` — BroadcastHashJoin
   (build-right supports left-outer); yields untouched/identical
   current rows, closed-out rows, and the new version for every
   *existing* key, all from one probe of the dimension;
2. brand-new keys = ``changes LEFT ANTI broadcast(matched_keys)``
   where ``matched_keys`` is the (≤ |changes|) key set that leg 1
   matched — both sides tiny, also a BroadcastHashJoin.

CDC batches ≪ dimension at scale, so every join builds on the small
side and the big dimension is only ever the streamed probe side.
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

    ch_cols = changes.select(
        F.col(key).alias("_ck"),
        F.col(change_ts).alias("_cts"),
        *[F.col(c).alias(f"_c_{c}") for c in tracked],
    )
    ch = F.broadcast(ch_cols)
    # Leg 1: probe the big current-dimension side once; the broadcast
    # hint is honored (left-outer + build-right is a supported
    # BroadcastHashJoin shape — a full-outer join would silently fall
    # back to SortMergeJoin and shuffle the whole dimension).
    joined = cur.join(ch, cur[key] == F.col("_ck"), "left_outer")

    attrs_differ = F.lit(False)
    for c in tracked:
        attrs_differ = attrs_differ | ~F.col(c).eqNullSafe(F.col(f"_c_{c}"))

    # 1a. current rows with no change, or change with identical attrs
    keep_cur = joined.filter(
        F.col("_ck").isNull() | ~attrs_differ
    ).select(*dim.columns)

    # 1b. current rows closed out by a real change
    closed = (
        joined.filter(F.col("_ck").isNotNull() & attrs_differ)
        .select(
            *[cur[c] for c in dim.columns if c != "valid_to"],
            F.col("_cts").alias("valid_to"),
        )
        .select(*dim.columns)
    )

    # 1c. new current versions for keys that already exist
    changed_new = (
        joined.filter(F.col("_ck").isNotNull() & attrs_differ)
        .select(
            F.col("_ck").alias(key),
            *[F.col(f"_c_{c}").alias(c) for c in tracked],
            F.col("_cts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
        .select(*dim.columns)
    )

    # Leg 2: brand-new keys — changes minus the keys leg 1 matched.
    # matched_keys is ≤ |changes| rows, so both sides of this anti join
    # broadcast; the dimension is not re-shuffled.
    matched_keys = F.broadcast(
        joined.filter(F.col("_ck").isNotNull()).select(F.col("_ck"))
    )
    brand_new = (
        ch_cols.join(matched_keys, "_ck", "left_anti")
        .select(
            F.col("_ck").alias(key),
            *[F.col(f"_c_{c}").alias(c) for c in tracked],
            F.col("_cts").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
        )
        .select(*dim.columns)
    )

    return (
        hist.unionByName(keep_cur)
        .unionByName(closed)
        .unionByName(changed_new)
        .unionByName(brand_new)
    )
