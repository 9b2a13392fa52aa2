"""Sequence packing — grouping variable-length documents into
fixed-token-budget training sequences (SURVEY §2.3 family; the
reference has no packing surface — this is a training-data-pipeline
extension like sampling.py).

LLM pre-training consumes fixed-length sequences; feeding one short
document per sequence wastes the budget on padding. The standard fix
is to PACK documents: concatenate several into one sequence up to a
token budget. At 100 TB the packing assignment must be

- **deterministic** — re-runs and repartitions must produce the same
  packs (else shuffling data between runs changes the training set);
- **shuffle-bounded** — one window sort per shard, never a global
  single-partition sort. We shard by an md5 bucket of the id and pack
  WITHIN each shard: ``Window.partitionBy(shard)`` keeps every sort
  local to a shard, so parallelism = #shards regardless of data size
  (pick shards ≈ cluster cores; each pack never crosses shards);
- **engine-agnostic** — document order inside a shard is the md5 order
  of the id (a uniform deterministic shuffle, same trick as
  sampling.py), so DuckDB can replay the exact assignment as an
  oracle.

Assignment rule ("greedy sequential with spillover"): walk the shard
in md5 order, keep a running token total, and start a new pack each
time the PRECEDING total crosses a multiple of the budget:
``pack = floor((cumsum - n_tok) / budget)``. A document therefore
lands in the pack that was open when it arrived; a pack may overflow
the budget by at most one document (downstream truncates or wraps —
standard practice, e.g. GPT-style block packing). This closed form is
a single window cumsum — no iterative bin-packing state, which is
what makes it expressible at scale AND in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_bucket, hash_key


def assign_packs(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Add ``shard``, ``pack_id`` and ``pack_pos`` columns assigning each
    row to a fixed-token-budget pack (see module doc for the rule).

    ``pack_id`` is unique within a shard; ``(shard, pack_id)`` is the
    global pack key. ``pack_pos`` is the row's position inside its pack
    (0-based), i.e. the concat order for sequence assembly.
    """
    shard = hash_bucket(F.col(id_col), shards, salt=salt).alias("shard")
    order = [hash_key(F.col(id_col), salt=salt), F.col(id_col)]
    w = Window.partitionBy("shard").orderBy(*order)
    cum = F.sum(token_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        df.withColumn("shard", shard)
        .withColumn(
            "pack_id",
            F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("bigint"),
        )
    )
    wp = Window.partitionBy("shard", "pack_id").orderBy(*order)
    return out.withColumn(
        "pack_pos", (F.row_number().over(wp) - F.lit(1)).cast("bigint")
    )


def pack_stats(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Per-pack summary: document count, token total, and budget fill
    ratio — the packing-efficiency report a pipeline monitors."""
    packed = assign_packs(df, id_col, token_col, budget, shards, salt)
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_col).cast("bigint").alias("total_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("total_tokens") / F.lit(float(budget)), 6),
        )
    )
