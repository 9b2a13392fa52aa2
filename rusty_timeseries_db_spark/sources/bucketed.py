"""Bucketed table layout for exchange-free co-located joins.

At 100 TB the dominant join cost is the shuffle. Pre-bucketing both
fact tables on the join key (`bucketBy` + `sortBy` on write) lets Spark
plan a sort-merge join with **zero Exchange operators** — each bucket
pair joins locally. This is the batch analog of co-partitioned stores;
the plan property is asserted in tests/test_bucketed.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: Sequence[str],
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``keys``. ``path`` makes
    it an external table; bucket metadata lives in the session catalog
    (bucketBy requires ``saveAsTable``)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
