"""Skew mitigation (SURVEY §7.6): hot series/keys are the expected
failure mode of telemetry workloads at 100 TB. First line of defense is
AQE's skew-join splitting (on by default in session.py); these
operators are the explicit fallback for cases AQE can't fix:

- ``salted_agg``: two-phase aggregation for skewed groupBy — partial
  agg on (key, salt), final agg on key. Turns one giant reducer into
  ``n_salts`` parallel ones.
- ``salted_join``: replicate the small side per salt, salt the big
  side — removes the single hot-key reducer in a shuffle join where the
  hot side is too large to broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation for decomposable aggregates.

    Supported agg shapes: sum / count / min / max (anything where
    final(partial(x)) == agg(x)). Callers pass partial-phase columns;
    the final phase re-aggregates with sum for counts/sums and min/max
    for extrema, inferred from the expression name.
    """
    # Salt by input partition: a hot key's rows already span many input
    # partitions, so this spreads them across n_salts partial groups
    # deterministically (no rand() → plan stays reproducible).
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[v.alias(k) for k, v in aggs.items()]
    )
    finals = []
    for name, expr in aggs.items():
        op = expr._jc.toString().split("(")[0].lower() if hasattr(expr, "_jc") else ""
        if "count" in op or "sum" in op:
            finals.append(F.sum(name).alias(name))
        elif "min" in op:
            finals.append(F.min(name).alias(name))
        elif "max" in op:
            finals.append(F.max(name).alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate for salting: {name}")
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side with a random salt in
    [0, n_salts), explode the small side across all salts, join on
    (keys + salt). The hot key's rows spread over ``n_salts`` reducers
    instead of one. Small side grows ×n_salts — use only when it's too
    big to broadcast but still ≪ big side."""
    on = list(on)
    b = big.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, [*on, "_salt"], how)
    return out.drop("_salt")
