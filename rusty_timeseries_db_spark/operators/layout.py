"""Data-layout optimizer — range-partitioned, sorted parquet rewrites
(the "OPTIMIZE ... ZORDER-lite" of this engine; reference has no layout
surface, its single page file IS the layout, ``main.rs:64-90``).

At 100 TB, query latency is mostly decided before the first operator
runs: by how much data the scan can SKIP. Parquet readers prune at two
levels — directory partitions (partition column equality/range) and
row-group min/max statistics (any sorted column). This operator
rewrites a table so both levels bite:

- ``repartitionByRange(sort_cols)`` puts disjoint key ranges in
  disjoint files (range partitioner samples the data; one shuffle);
- ``sortWithinPartitions(sort_cols)`` orders rows inside each file so
  every row group covers a narrow key band — a ``ts BETWEEN`` or
  ``id =`` predicate then touches only the files/row-groups whose
  [min, max] intersect it, which is the near-index-seek behavior the
  SCALE.md storage table promises;
- optional hive ``partition_cols`` (e.g. a date or hash bucket) add
  directory-level pruning for the highest-selectivity predicates.

The rewrite is O(data) with exactly ONE shuffle (the range exchange);
sorting is per-partition and spills gracefully. File-level min/max
disjointness is verifiable from parquet footers alone — see
``file_stats`` and tests/test_layout.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def optimize_layout(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    partition_cols: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """Rewrite ``df`` at ``path`` range-clustered and sorted on
    ``sort_cols`` (optionally hive-partitioned by ``partition_cols``).

    ``target_files`` bounds the file count per partition directory —
    at cluster scale pick ``ceil(bytes / 1 GiB)``; default keeps the
    range partitioner's own choice (``spark.sql.shuffle.partitions``).
    """
    if not sort_cols:
        raise ValueError("sort_cols must be non-empty")
    try:
        # INT96 timestamps carry no min/max stats — the whole point of
        # this rewrite is stats-based skipping, so force a stats-bearing
        # physical type even on sessions our factory didn't build.
        df.sparkSession.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
    except Exception:
        pass
    cols = [df[c] for c in sort_cols]
    out = (
        df.repartitionByRange(target_files, *cols)
        if target_files
        else df.repartitionByRange(*cols)
    )
    out = out.sortWithinPartitions(*cols)
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def file_stats(
    spark: SparkSession, path: str, column: str
) -> list[tuple[str, object, object]]:
    """Per-file [min, max] of ``column`` from parquet footers only —
    the metadata a reader's skipping logic sees. Returns
    ``[(file, min, max), ...]``; no data pages are read."""
    import pyarrow.parquet as pq

    rows: list[tuple[str, object, object]] = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(root, f)
            md = pq.ParquetFile(fp).metadata
            # Row-group columns are parquet LEAF-ordered, not top-level
            # Arrow-field-ordered: a nested column (map/struct/list)
            # earlier in the schema contributes several leaves and shifts
            # every later index. Resolve via the leaf path instead.
            idx = next(
                (
                    i
                    for i in range(len(md.schema))
                    if md.schema.column(i).path == column
                ),
                -1,
            )
            if idx < 0:
                continue
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is not None:
                rows.append((fp, lo, hi))
    return rows


def overlap_fraction(stats: list[tuple[str, object, object]]) -> float:
    """Fraction of file pairs whose [min, max] ranges overlap — 0.0 is
    perfect clustering (every predicate touches ≤1 file + boundary
    neighbors), 1.0 means min/max skipping is useless."""
    n = len(stats)
    if n < 2:
        return 0.0
    overlaps = 0
    pairs = 0
    for i in range(n):
        for j in range(i + 1, n):
            pairs += 1
            _, lo1, hi1 = stats[i]
            _, lo2, hi2 = stats[j]
            if lo1 <= hi2 and lo2 <= hi1:
                overlaps += 1
    return overlaps / pairs
