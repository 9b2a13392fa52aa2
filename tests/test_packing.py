"""Sequence packing (operators/packing.py): assignment invariants that
the DuckDB oracle of q_sequence_packing cannot express — spillover
bound, partition-layout independence, shard locality."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from rusty_timeseries_db_spark.operators.packing import assign_packs, pack_stats
from rusty_timeseries_db_spark.queries import T
from tests.conftest import SF_DIR

BUDGET = 64


def _docs(spark):
    d = T(spark, SF_DIR, "documents")
    return d.withColumn(
        "n_tok",
        F.size(F.filter(F.split(F.lower(F.col("text")), " "),
                        lambda x: F.length(x) > 0)),
    ).select("doc_id", "n_tok")


def test_every_doc_packed_exactly_once(spark):
    d = _docs(spark)
    packed = assign_packs(d, "doc_id", "n_tok", BUDGET, shards=4)
    assert packed.count() == d.count()
    assert packed.select("doc_id").distinct().count() == d.count()


def test_spillover_bound(spark):
    """A pack exceeds the budget by at most its LAST document: dropping
    the highest-pack_pos row must leave every pack under budget."""
    packed = assign_packs(_docs(spark), "doc_id", "n_tok", BUDGET, shards=4)
    wo_last = (
        packed.withColumn(
            "_max_pos",
            F.max("pack_pos").over(Window.partitionBy("shard", "pack_id")),
        )
        .filter(F.col("pack_pos") < F.col("_max_pos"))
        .groupBy("shard", "pack_id")
        .agg(F.sum("n_tok").alias("head_tokens"))
    )
    over = wo_last.filter(F.col("head_tokens") >= BUDGET).count()
    assert over == 0


def test_pack_ids_contiguous_per_shard(spark):
    """Contiguity holds iff no single doc spans a whole budget window
    (a >budget doc advances the cumsum past one or more pack ids);
    pick a budget above the corpus max so the invariant applies."""
    d = _docs(spark)
    budget = 128
    assert d.agg(F.max("n_tok")).first()[0] < budget
    stats = pack_stats(d, "doc_id", "n_tok", budget, shards=4)
    per_shard = (
        stats.groupBy("shard")
        .agg(F.min("pack_id").alias("lo"), F.max("pack_id").alias("hi"),
             F.count("*").alias("n"))
        .collect()
    )
    for r in per_shard:
        assert r.lo == 0
        assert r.n == r.hi + 1  # 0..hi with no holes


def test_assignment_partitioning_invariant(spark):
    """Same (doc -> pack) map regardless of input partition layout."""
    d = _docs(spark)
    a = assign_packs(d, "doc_id", "n_tok", BUDGET, shards=4)
    b = assign_packs(d.repartition(7), "doc_id", "n_tok", BUDGET, shards=4)
    key = lambda rows: sorted(
        (r.doc_id, r.shard, r.pack_id, r.pack_pos) for r in rows
    )
    assert key(a.collect()) == key(b.collect())
