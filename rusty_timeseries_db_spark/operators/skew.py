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

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: A salted aggregate: (partial-phase expression, final-phase combiner).
#: The combiner is called with the partial column NAME and must return
#: the re-aggregating Column — e.g. ``(F.count("*"), F.sum)``,
#: ``(F.max("value"), F.max)``, ``(F.sum("x"), F.sum)``.
SaltedAgg = tuple[Column, Callable[[str], Column]]


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, SaltedAgg],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation for decomposable aggregates.

    Callers pass EXPLICIT (partial, final) pairs per output column —
    the two phases are the caller's contract, not something inferred
    from expression internals (the previous implementation dispatched
    on the JVM expression's toString, which breaks under Spark Connect
    and across Spark upgrades). Correct pairs satisfy
    ``final(partial(x) per salt) == agg(x)``: count→sum, sum→sum,
    min→min, max→max. Non-decomposable aggregates (avg, stddev,
    percentiles) have no such pair — decompose them yourself (e.g. avg
    = salted sum / salted count) or raise the salt into the key.
    """
    for name, pair in aggs.items():
        if isinstance(pair, Column) or not (
            isinstance(pair, tuple)
            and len(pair) == 2
            and isinstance(pair[0], Column)
            and callable(pair[1])
        ):
            raise ValueError(
                "non-decomposable aggregate for salting (or missing "
                f"final phase): pass {name!r} as an explicit "
                "(partial: Column, final: name -> Column) pair, e.g. "
                "(F.count('*'), F.sum)"
            )
    # Salt by input partition: a hot key's rows already span many input
    # partitions, so this spreads them across n_salts partial groups
    # deterministically (no rand() → plan stays reproducible).
    salted = df.withColumn(
        "_salt", F.pmod(F.spark_partition_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[partial_expr.alias(k) for k, (partial_expr, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[final(k).alias(k) for k, (_, final) in aggs.items()]
    )


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
