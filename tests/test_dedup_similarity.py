"""Dedup + similarity validation: MinHash/SimHash candidates vs exact
n-gram Jaccard ground truth; LSH recall vs brute-force cosine."""

from __future__ import annotations

from pyspark.sql import functions as F

from rusty_timeseries_db_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from rusty_timeseries_db_spark.operators.similarity import (
    cosine_topk,
    lsh_cosine_topk,
)
from rusty_timeseries_db_spark.queries import T
from tests.conftest import SF_DIR


def test_exact_dedup_keep_first(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "id int, t string"
    )
    kept = exact_dedup(df, ["t"], order=[F.col("id")]).toPandas()
    assert sorted(kept["id"]) == [1, 3]


def test_minhash_recall_vs_exact_jaccard(spark):
    """MinHash candidates (est ≥ 0.35) must recover the high-similarity
    pairs found by exact trigram Jaccard (≥ 0.5 — comfortably above the
    LSH threshold so probabilistic misses are negligible)."""
    docs = T(spark, SF_DIR, "documents")
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
        .collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", shingle_k=3, num_hashes=128, bands=32,
            threshold=0.35,
        ).collect()
    }
    assert truth, "fixture should contain near-dup pairs"
    missed = truth - cand
    assert len(missed) <= max(1, len(truth) // 10), f"missed {missed}"


def test_minhash_estimate_accuracy(spark):
    """MinHash Jaccard estimate within ±0.15 of exact Jaccard."""
    docs = T(spark, SF_DIR, "documents")
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3)
        .collect()
    }
    est = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", threshold=0.3
        ).collect()
    }
    common = set(exact) & set(est)
    assert common
    for k in common:
        assert abs(exact[k] - est[k]) < 0.15, (k, exact[k], est[k])


def test_simhash_finds_near_dups(spark):
    docs = T(spark, SF_DIR, "documents")
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.6)
        .collect()
    }
    sh = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=10).collect()
    }
    # simhash with generous hamming radius should cover most very-high-
    # similarity pairs
    if truth:
        assert len(truth - sh) <= max(1, len(truth) // 2)


def test_lsh_recall_vs_bruteforce(spark):
    emb = T(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, q, k=5)
    approx = lsh_cosine_topk(emb, q, k=5, dim=64, n_planes=4, n_tables=16)
    et = {(r.query_id, r.vec_id) for r in exact.collect()}
    at = {(r.query_id, r.vec_id) for r in approx.collect()}
    recall = len(et & at) / len(et)
    assert recall >= 0.7, f"LSH recall too low: {recall}"


def test_bruteforce_self_similarity(spark):
    emb = T(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top1 = cosine_topk(emb, q, k=1).collect()
    for r in top1:
        assert r.vec_id == r.query_id  # self is its own nearest neighbor
        assert abs(r.cos_sim - 1.0) < 1e-9
