"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the declared-operator manifest
(rusty_timeseries_db_spark/queries.py, SURVEY.md §2.2) for the driver's
DuckDB differential check at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rusty_timeseries_db_spark import queries as _q  # noqa: E402
from rusty_timeseries_db_spark.session import tune_existing  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue-per-nation
    star join (fact ⋈ broadcast dims) with exact decimal aggregation —
    exercises scan pushdown, broadcast join, and partial aggregation."""
    tune_existing(spark)
    return _q.q_join_inner_broadcast(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (others are
    declared with oracle=None → rows-only check)."""
    return _q.all_oracles()
