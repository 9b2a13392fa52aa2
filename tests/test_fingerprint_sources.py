"""Rolling-hash fingerprint invariants + rate/memory streaming sources."""

from __future__ import annotations

from pyspark.sql import functions as F

from rusty_timeseries_db_spark.functions.text import (
    bpe_ish_token_count,
    rolling_hash_fingerprint,
)


def test_rolling_hash_invariants(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown fox"),   # exact dup
            (3, "fox brown quick the"),   # reorder
            (4, "the quick brown"),       # prefix
            (5, "The  Quick   Brown Fox"),  # case/extra-space normalize
        ],
        "id int, t string",
    )
    fp = {
        r.id: r.fp
        for r in df.select(
            "id", rolling_hash_fingerprint(F.col("t")).alias("fp")
        ).collect()
    }
    assert fp[1] == fp[2]          # identical text, identical fp
    assert fp[1] != fp[3]          # order-sensitive (vs set hashes)
    assert fp[1] != fp[4]          # prefix differs
    assert fp[1] == fp[5]          # lowercase + empty-token filter normalize


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([("hello, world! 42",), ("",)], "t string")
    got = [r.n for r in df.select(bpe_ish_token_count(F.col("t")).alias("n")).collect()]
    # hello | , | world | ! | 42  → 5 non-space pieces
    assert got[0] == 5
    assert got[1] == 0


def test_rate_source_smoke(spark):
    """rate source → memory sink (test-harness streaming row, SURVEY §2.2)."""
    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "100")
        .load()
        .withColumn("bucket", F.col("value") % 10)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM rate_smoke").collect()[0].c
            if n > 0:
                break
            time.sleep(1)
        assert n > 0
    finally:
        q.stop()
