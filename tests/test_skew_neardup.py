"""Salted skew operators (result-equality with unsalted plans) and
embedding near-dup recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from rusty_timeseries_db_spark.operators.skew import salted_agg, salted_join
from rusty_timeseries_db_spark.operators.similarity import lsh_near_dup_pairs
from rusty_timeseries_db_spark.queries import T
from tests.conftest import SF_DIR


def test_salted_agg_equals_plain_agg(spark):
    e = T(spark, SF_DIR, "events")
    plain = {
        r.event_type: (r.n, r.mx)
        for r in e.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        r.event_type: (r.n, r.mx)
        for r in salted_agg(
            e,
            ["event_type"],
            {"n": (F.count("*"), F.sum), "mx": (F.max("value"), F.max)},
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain_join(spark):
    o = T(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    c = T(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = o.join(c, "o_custkey").count()
    salted = salted_join(o, c, ["o_custkey"], n_salts=8).count()
    assert plain == salted


def test_salted_agg_rejects_non_decomposable(spark):
    import pytest

    e = T(spark, SF_DIR, "events")
    # a bare Column has no explicit final phase -> rejected up front
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(e, ["event_type"], {"a": F.avg("value")})
    # count salted correctly requires final=sum; the pair is explicit
    out = salted_agg(
        e, ["event_type"], {"n": (F.count("*"), F.sum)}, n_salts=4
    )
    plain = e.groupBy("event_type").agg(F.count("*").alias("n"))
    assert {(r.event_type, r.n) for r in out.collect()} == {
        (r.event_type, r.n) for r in plain.collect()
    }


def test_embedding_neardup_lsh_recall(spark):
    from rusty_timeseries_db_spark.functions.vectors import cosine

    emb = T(spark, SF_DIR, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_b"))
    exact = {
        (r.id_a, r.id_b)
        for r in a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("_a"), F.col("_b")).alias("cs"))
        .filter(F.col("cs") >= 0.4)
        .collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in lsh_near_dup_pairs(
            emb, dim=64, threshold=0.4, n_planes=6, n_tables=16
        ).collect()
    }
    assert not approx - exact  # LSH must not invent pairs (exact rerank)
    if exact:
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.5, f"near-dup recall too low: {recall}"
