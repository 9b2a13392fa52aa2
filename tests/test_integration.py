"""Cross-component integration: streaming ingest feeding the batch
engine, malformed-timestamp fidelity, MLlib MinHashLSH cross-check."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from rusty_timeseries_db_spark.api import TimeseriesEngine
from rusty_timeseries_db_spark.streaming.ingest import (
    read_telemetry_stream,
    start_telemetry_sink,
)
from tests.conftest import CANONICAL_ROWS, SERIES_ID, SF_DIR


def test_streamed_rows_visible_to_engine_queries(spark, tmp_path):
    """Rows arriving via the streaming sink land in the same physical
    layout the batch engine reads — one storage, two ingest paths."""
    wh = str(tmp_path / "wh")
    src = str(tmp_path / "drop")
    os.makedirs(src)
    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        for r in CANONICAL_ROWS:
            f.write(json.dumps(r) + "\n")
    q = start_telemetry_sink(
        read_telemetry_stream(spark, src), wh, available_now=True
    )
    q.awaitTermination(120)

    eng = TimeseriesEngine(spark, wh)
    out = eng.query_by_id(
        SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:03:00Z"
    ).collect()
    assert [r.value for r in out] == [0.8, 0.9, 1.0]
    # FDD over the streamed data behaves identically to batch-ingested
    assert eng.run_fault_detection(
        SERIES_ID, "2024-08-28T12:00:00Z", "2024-08-28T12:03:00Z"
    ) == 1


def test_malformed_timestamp_stored_and_queryable(spark, tmp_path):
    """The reference never validates timestamps (main.rs:160-166): any
    string is stored and lexicographically compared. We keep ts_raw for
    that fidelity — a malformed stamp parses to NULL ts but remains
    stored and range-queryable via ts_raw."""
    eng = TimeseriesEngine(spark, str(tmp_path / "wh"))
    eng.ingest_rows(
        [
            {
                "sensor_name": "s",
                "timestamp": "not-a-timestamp",
                "value": 1.0,
                "fc1_flag": None,
                "timeseries_id": "weird",
            }
        ]
    )
    got = eng.query_by_id("weird", "a", "z").collect()  # lexicographic range
    assert len(got) == 1
    assert got[0].ts is None and got[0].ts_raw == "not-a-timestamp"


def test_mllib_minhash_agrees_with_native(spark):
    """Cross-implementation check: pyspark.ml MinHashLSH over the same
    shingle sets should surface the same high-similarity pairs as the
    native (expression-based) implementation."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH
    from rusty_timeseries_db_spark.operators.dedup import (
        ngram_jaccard_pairs,
        word_shingles,
        word_tokens,
    )
    from rusty_timeseries_db_spark.queries import T

    docs = T(spark, SF_DIR, "documents")
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
        .collect()
    }
    if not truth:
        return

    shingled = docs.select(
        "doc_id", word_shingles(word_tokens("text"), 3).alias("sh")
    )
    cv = CountVectorizer(
        inputCol="sh", outputCol="features", binary=True, minDF=1.0
    ).fit(shingled)
    feats = cv.transform(shingled).filter(
        F.expr("aggregate(sh, 0, (a, x) -> a + 1) > 0")
    )
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=16, seed=42
    ).fit(feats)
    sim = mh.approxSimilarityJoin(feats, feats, 0.5, distCol="jd")
    ml_pairs = {
        (r.datasetA.doc_id, r.datasetB.doc_id)
        for r in sim.filter("datasetA.doc_id < datasetB.doc_id").collect()
    }
    missed = truth - ml_pairs
    assert len(missed) <= max(1, len(truth) // 5), missed


def test_streaming_exactly_once_across_restarts(spark, tmp_path):
    """Checkpoint resume: re-running the sink over the same source must
    not duplicate rows (exactly-once per micro-batch); new files are
    picked up incrementally."""
    wh = str(tmp_path / "wh")
    src = str(tmp_path / "drop")
    os.makedirs(src)

    def drop(rows, name):
        with open(os.path.join(src, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    drop(CANONICAL_ROWS[:2], "b1.jsonl")
    q1 = start_telemetry_sink(read_telemetry_stream(spark, src), wh, available_now=True)
    q1.awaitTermination(120)
    eng = TimeseriesEngine(spark, wh)
    assert eng.telemetry().count() == 2

    # restart with the SAME checkpoint, same source files → no dups
    q2 = start_telemetry_sink(read_telemetry_stream(spark, src), wh, available_now=True)
    q2.awaitTermination(120)
    assert eng.telemetry().count() == 2

    # new file arrives → only the delta is ingested
    drop(CANONICAL_ROWS[2:], "b2.jsonl")
    q3 = start_telemetry_sink(read_telemetry_stream(spark, src), wh, available_now=True)
    q3.awaitTermination(120)
    tel = eng.telemetry()
    assert tel.count() == 3
    assert tel.select("ingest_seq").distinct().count() == 3
