"""Column profiling — the ``DESCRIBE``-grade data-quality pass every
training-data pipeline runs before trusting a new drop of data (null
rates, cardinalities, numeric ranges per column). The reference has no
profiling surface; this is one of the pipeline-native additions.

Spark-first shape: ONE job over the table computes every column's
stats in a single aggregate —

- ``count(col)`` (non-null) and ``count(*)`` give the null rate;
- ``count(DISTINCT col)`` per column makes Catalyst plan an Expand
  (one duplicated stream per distinct-column) feeding a two-level
  hash aggregate: exact, single pass, but the expanded shuffle is
  ~#cols × data. That is the right default at test scale and for
  audits that must be exact;
- ``exact=False`` swaps every distinct count for HLL
  ``approx_count_distinct`` — no Expand, plain partial-agg pipeline,
  the 100 TB default (2% error on cardinalities is noise for
  profiling);
- numeric min/max go through a caller-supplied numeric VIEW of the
  column (e.g. ``unix_micros(ts)`` for timestamps) so the output
  schema stays fixed (DOUBLE) for every column type.

The wide 1-row aggregate is then exploded into one tidy row per column
(array-of-structs + explode — pure JVM, no shuffle after the agg).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str],
    numeric: dict[str, Column] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Profile ``cols`` of ``df`` in one aggregate job.

    ``numeric`` maps a column name to a numeric expression of it used
    for min/max (defaults to the column itself for numeric types; pass
    e.g. ``F.unix_micros("ts")`` for timestamps); columns absent from
    ``numeric`` and not castable stay NULL in min_num/max_num.

    Returns one row per profiled column:
    (column_name, n, n_nulls, n_distinct, min_num, max_num).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    numeric = dict(numeric or {})
    distinct = (
        (lambda c: F.countDistinct(c))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        # try_cast, not cast: under ANSI mode (Spark 4's default) a
        # plain cast of a non-numeric string column would fail the
        # whole profile job; try_cast degrades to NULL min/max
        num = numeric.get(c, col).try_cast("double")
        aggs += [
            F.count(col).alias(f"_nn_{c}"),
            distinct(col).alias(f"_nd_{c}"),
            F.min(num).alias(f"_mn_{c}"),
            F.max(num).alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_n").alias("n"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_num"),
                F.col(f"_mx_{c}").alias("max_num"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")
