"""Hypertable maintenance — retention (chunk drop) and small-file
compaction for partitioned parquet datasets.

The reference keeps a fixed-capacity in-memory table and simply stops
accepting inserts when full (main.rs:353-356 "Table Full"); a real
timeseries store instead AGES data out and keeps its file layout
healthy. These are the two jobs every hypertable scheduler runs
(TimescaleDB ``drop_chunks`` / ``reorder_chunk``, ClickHouse TTL +
merges), re-expressed for a parquet-on-object-store layout:

- ``drop_partitions_older_than`` — retention is an O(#partitions)
  METADATA operation, never a data scan: partition directories encode
  the partition value (``day=2024-03-01/``), so selecting victims is a
  directory listing + string compare, and dropping is a recursive
  delete of whole directories. At 100 TB this is the difference
  between a millisecond unlink-per-day and rewriting the table with an
  anti-filter (which a naive DELETE would do).

- ``compact_partitions`` — streaming ingest writes one file per
  micro-batch per partition, and small files poison scans at scale
  (one task + one object-store GET per file; a 1000-executor cluster
  reading 10 000 tiny files spends its time in listing and task
  startup, not I/O). Compaction rewrites ONLY the partitions whose
  file count exceeds a threshold, each as one distributed job sized to
  ``target_file_mb``, and swaps directories via rename so readers
  never see a partial partition (write-tmp → move-aside → rename-in →
  drop-aside; a crash leaves either the old or the new complete set,
  plus at worst a ``.bak`` directory to sweep).

All filesystem access goes through the Hadoop FileSystem API resolved
from the path's own scheme (the ContinuousRollup pattern,
operators/rollup.py) — local, HDFS, and s3a paths behave identically.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from ..fsutil import fs_for as _fs, hpath as _hpath


def _partition_dirs(
    spark: SparkSession, path: str, partition_col: str, depth: int = 0
):
    """(value, Path) for each ``col=value`` directory found ``depth``
    levels below ``path`` (depth=0: first level; depth=1 matches e.g.
    ``series_bucket=*/ds=*`` — the engine's nested layout). One
    metadata glob, no data I/O."""
    fs = _fs(spark, path)
    if not fs.exists(_hpath(spark, path)):
        return []
    pattern = "/".join(
        [path.rstrip("/")] + ["*"] * depth + [partition_col + "=*"]
    )
    prefix = partition_col + "="
    out = []
    for st in fs.globStatus(_hpath(spark, pattern)) or []:
        if st.isDirectory():
            p = st.getPath()
            value = p.getName()[len(prefix):]
            # label: the bare value at depth 0; the relative dir path
            # ("bucket=3/ds=2024-03-01") at depth > 0, where the same
            # leaf value recurs under many parents
            if depth == 0:
                label = value
            else:
                segs = []
                q = p
                for _ in range(depth + 1):
                    segs.append(q.getName())
                    q = q.getParent()
                label = "/".join(reversed(segs))
            out.append((value, label, p))
    return out


def drop_partitions_older_than(
    spark: SparkSession,
    path: str,
    partition_col: str,
    cutoff: str,
    depth: int = 0,
) -> list[str]:
    """Delete every ``partition_col=<value>`` directory with
    ``value < cutoff`` (string compare — ISO dates and zero-padded
    keys order correctly). Returns the dropped directories' relative
    labels ("bucket=3/ds=2024-03-01" at depth 1), sorted.

    Retention contract: drops are whole-partition and irreversible;
    a concurrent reader that already planned a scan over a dropped
    directory fails that scan (same as any engine's chunk drop —
    schedule retention against quiesced time ranges).
    """
    fs = _fs(spark, path)
    dropped = []
    for value, label, pdir in _partition_dirs(spark, path, partition_col, depth):
        if value < cutoff:
            fs.delete(pdir, True)
            dropped.append(label)
    return sorted(dropped)


def sweep_residue(spark: SparkSession, path: str) -> list[str]:
    """Delete crash leftovers under ``path``: ``*.bak`` /
    ``*.compact_tmp`` directories a killed :func:`compact_partitions`
    may strand (its documented worst-case outcome). Safe anytime —
    live partitions never carry these suffixes; run it before a
    compaction pass or from a janitor schedule. Returns deleted dir
    names."""
    fs = _fs(spark, path)
    root = _hpath(spark, path)
    if not fs.exists(root):
        return []
    removed = []
    stack = [root]
    while stack:
        cur = stack.pop()
        for st in fs.listStatus(cur):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if name.endswith((".bak", ".compact_tmp")):
                fs.delete(st.getPath(), True)
                removed.append(name)
            else:
                stack.append(st.getPath())
    return sorted(removed)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    target_file_mb: int = 128,
    min_files: int = 4,
    depth: int = 0,
) -> dict[str, tuple[int, int]]:
    """Rewrite partitions holding more than ``min_files`` data files
    into ``ceil(bytes / target_file_mb)`` files each. Returns
    ``{partition_label: (files_before, files_after)}`` for the
    partitions actually rewritten (labels are relative dir paths,
    unique even when the same leaf value recurs under many parents at
    depth > 0).

    Each rewrite is one distributed Spark job over one partition
    directory — compaction cost is O(touched partitions' bytes), and
    untouched partitions are not read at all. The swap is rename-based:
    ``<dir>`` → ``<dir>.bak``, tmp → ``<dir>``, drop ``.bak`` — atomic
    per rename on HDFS/POSIX, and the worst crash outcome is the old
    directory surviving (as ``.bak``) next to a complete new one.

    Concurrent appends: the file list is re-checked after the rewrite
    and a partition whose contents changed mid-rewrite is SKIPPED
    (reported as ``(files_before, -1)``) rather than swapped — swapping
    would silently drop the just-appended files. This shrinks the race
    window from the whole rewrite job to the instant between re-check
    and rename; for a hard guarantee, compact partitions the ingest
    path is no longer appending to (e.g. closed date chunks), the same
    quiescence rule as retention.
    """
    fs = _fs(spark, path)
    done: dict[str, tuple[int, int]] = {}
    for value, label, pdir in _partition_dirs(spark, path, partition_col, depth):
        files = [
            st for st in fs.listStatus(pdir)
            if st.isFile() and st.getPath().getName().endswith(".parquet")
        ]
        if len(files) <= min_files:
            continue
        total_bytes = sum(st.getLen() for st in files)
        n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
        tmp = _hpath(spark, str(pdir) + ".compact_tmp")
        bak = _hpath(spark, str(pdir) + ".bak")
        fs.delete(tmp, True)
        fs.delete(bak, True)
        # one job, one partition: the read is a plain directory scan (the
        # partition column lives in the path, not the files — preserved
        # by writing back into a same-named directory)
        spark.read.parquet(str(pdir)).repartition(n_out).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        # re-check: a concurrent append during the rewrite means the
        # tmp dir is missing those rows — skip the swap, never lose them
        now = {
            st.getPath().getName()
            for st in fs.listStatus(pdir)
            if st.isFile() and st.getPath().getName().endswith(".parquet")
        }
        if now != {st.getPath().getName() for st in files}:
            fs.delete(tmp, True)
            done[label] = (len(files), -1)  # skipped: concurrent append
            continue
        # Spark leaves a _SUCCESS marker; the swapped-in dir keeps it
        if not fs.rename(pdir, bak):
            raise IOError(f"compaction: cannot move aside {pdir}")
        if not fs.rename(tmp, pdir):
            # restore and give up on this partition
            fs.rename(bak, pdir)
            raise IOError(f"compaction: cannot swap in {tmp}")
        fs.delete(bak, True)
        after = sum(
            1 for st in fs.listStatus(pdir)
            if st.isFile() and st.getPath().getName().endswith(".parquet")
        )
        done[label] = (len(files), after)
    return done
