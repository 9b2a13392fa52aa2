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


def _force_stats_timestamps(df: DataFrame) -> None:
    """INT96 timestamps carry no min/max stats — the whole point of a
    layout rewrite is stats-based skipping, so force a stats-bearing
    physical type even on sessions our factory didn't build."""
    try:
        df.sparkSession.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
    except Exception:
        pass


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
    _force_stats_timestamps(df)
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


def quantile_bucket(col, boundaries: list[float]):
    """Equi-DEPTH bucket id (0..len(boundaries)) of ``col``: the count
    of quantile boundaries ≤ the value, as one ``aggregate`` HOF over a
    literal array — codegen'd, no join, no shuffle. Equi-depth (not
    equi-width) bucketing is what makes Z-order robust to skew: a
    linear ``width_bucket`` wastes its bit budget on empty value space
    and the skewed dimension never gets split (observed: 0.96 overlap
    on a long-tailed value column)."""
    from pyspark.sql import functions as F

    arr = F.array(*[F.lit(float(x)) for x in boundaries])
    c = col.cast("double")
    return F.aggregate(
        arr,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + F.when(x <= c, 1).otherwise(0).cast("bigint"),
    )


def morton_key(buckets, bits: int):
    """Interleave-bits (Morton / Z-order) key of k ``bits``-bit bucket
    ids (round-robin: bit i of column j lands at position i*k + j), as
    one codegen'd JVM expression: rows close in ANY dimension get close
    keys, which is what makes min/max file skipping bite on every
    z-ordered column at once. k*bits must fit a signed 64-bit long."""
    from pyspark.sql import functions as F

    k = len(buckets)
    if k * bits > 62:
        raise ValueError(
            f"{k} columns x {bits} bits = {k * bits} key bits > 62"
        )
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * k + j))
    return key


def zorder_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    target_files: int | None = None,
    bits: int = 8,
) -> None:
    """Rewrite ``df`` Z-ordered on two or more columns: range-cluster +
    sort on the Morton key of each column's EQUI-DEPTH bucket id, so
    EVERY z-ordered column's file/row-group min-max stats become
    selective — the multi-dimensional sibling of ``optimize_layout``
    (which is optimal for one leading column but leaves later columns'
    stats useless). Selectivity per dimension decays as columns are
    added (k dims share the same key space) — 2-4 columns is the
    practical range, same guidance as Delta's OPTIMIZE ZORDER BY.

    Cost: one sample-based ``approxQuantile`` pre-pass for the bucket
    boundaries (2^bits − 1 per column; 8 bits ≈ 255 boundaries is
    plenty for file-level clustering) + the same single range-exchange
    as optimize_layout.
    """
    from pyspark.sql import functions as F

    if len(cols) < 2:
        raise ValueError(f"zorder_layout needs at least 2 columns, got {cols}")
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    d = df.select(
        *[F.col(c).cast("double").alias(f"_c{i}") for i, c in enumerate(cols)]
    )
    qs = d.approxQuantile([f"_c{i}" for i in range(len(cols))], probs, 0.001)
    if any(not q for q in qs):
        raise ValueError("cannot z-order an empty or all-null input")
    key = morton_key(
        [quantile_bucket(F.col(c), q) for c, q in zip(cols, qs)],
        bits,
    ).alias("_zkey")
    _force_stats_timestamps(df)
    out = df.withColumn("_zkey", key)
    out = (
        out.repartitionByRange(target_files, "_zkey")
        if target_files
        else out.repartitionByRange("_zkey")
    )
    out.sortWithinPartitions("_zkey").drop("_zkey").write.mode(
        "overwrite"
    ).parquet(path)
