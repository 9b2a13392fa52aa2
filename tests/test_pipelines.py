"""End-to-end training-corpus pipeline (pipelines.py): stage effects,
determinism, and manifest invariants over the documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rusty_timeseries_db_spark.pipelines import (
    CorpusPipelineConfig,
    build_training_corpus,
)
from rusty_timeseries_db_spark.queries import T
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def manifest(spark):
    docs = T(spark, SF_DIR, "documents")
    cfg = CorpusPipelineConfig(
        min_tokens=10,
        mixture={"src0": 1.0, "src1": 0.5},
        mixture_default=0.8,
        pack_budget=256,
        pack_shards=4,
    )
    out = build_training_corpus(docs, cfg)
    out.persist()
    out.count()
    return out


def test_manifest_schema_and_rows(spark, manifest):
    assert set(manifest.columns) == {
        "doc_id", "source", "n_tok", "split", "shard", "pack_id", "pack_pos"
    }
    docs = T(spark, SF_DIR, "documents")
    n = manifest.count()
    assert 0 < n <= docs.count()


def test_quality_gate_applied(manifest):
    assert manifest.filter(F.col("n_tok") < 10).count() == 0


def test_exact_dups_removed(spark, manifest):
    docs = T(spark, SF_DIR, "documents")
    surviving = docs.join(manifest.select("doc_id"), "doc_id", "left_semi")
    assert (
        surviving.select("text").count()
        == surviving.select("text").distinct().count()
    )


def test_only_train_is_packed(manifest):
    assert manifest.filter(
        (F.col("split") == "train") & F.col("pack_id").isNull()
    ).count() == 0
    assert manifest.filter(
        (F.col("split") != "train") & F.col("pack_id").isNotNull()
    ).count() == 0


def test_pipeline_deterministic(spark, manifest):
    docs = T(spark, SF_DIR, "documents")
    cfg = CorpusPipelineConfig(
        min_tokens=10,
        mixture={"src0": 1.0, "src1": 0.5},
        mixture_default=0.8,
        pack_budget=256,
        pack_shards=4,
    )
    again = build_training_corpus(docs.repartition(9), cfg)
    a = sorted(map(tuple, manifest.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_persist_intermediate_identical_results(spark, manifest):
    """persist_intermediate only changes materialization, never the
    manifest: byte-identical output with the cache on."""
    docs = T(spark, SF_DIR, "documents")
    cfg = CorpusPipelineConfig(
        min_tokens=10,
        mixture={"src0": 1.0, "src1": 0.5},
        mixture_default=0.8,
        pack_budget=256,
        pack_shards=4,
        persist_intermediate=True,
    )
    cached = build_training_corpus(docs, cfg)
    a = sorted(map(tuple, manifest.collect()))
    b = sorted(map(tuple, cached.collect()))
    assert a == b
    spark.catalog.clearCache()
