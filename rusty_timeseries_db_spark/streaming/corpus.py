"""Streaming CORPUS ingest — documents arriving continuously, cleaned
the same way the batch pipeline cleans them.

A 100 TB training corpus is not loaded once: crawls and uploads land
continuously, and the quality gate / dedup / quarantine decisions the
batch pipeline (:mod:`..pipelines`) makes must hold for documents that
arrive AFTER the snapshot. This module is the documents-domain face of
the telemetry streaming surface (:mod:`.ingest`): same drop-dir JSON
source shape, same PERMISSIVE + quarantine side-channel, same
``foreachBatch`` append sink — but the per-row work is the corpus
operators (``content_hash``, ``quality_score``, token counting), and
the stateful stage is a content-hash streaming dedup bounded by a
watermark.

Scale notes:

- the dedup state is ONE md5 per distinct document content inside the
  watermark horizon — O(docs/window), evicted by the watermark; it is
  the streaming face of the batch pipeline's exact-dedup stage (same
  ``content_hash`` expression, so a doc the batch pass would fold, the
  stream folds too);
- everything else is stateless map-side expressions per micro-batch;
  the sink appends partitioned by ``source`` so downstream mixture /
  per-domain reads prune;
- at-least-once per micro-batch (checkpointed offsets), matching the
  telemetry sink's documented replay story: a replayed batch re-appends
  its files; readers that need effectively-once dedup on
  ``content_hash`` — which survives replays by construction.

No reference analog (main.rs is numeric telemetry only; SURVEY §2.2
extension family).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.text import quality_score
from ..operators.dedup import content_hash, word_tokens

#: the drop-dir JSON-lines document schema: producers stamp
#: ``ingest_ts`` (arrival event time) — it carries the dedup watermark.
DOCUMENT_INGEST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("ingest_ts", TimestampType(), True),
    ]
)


def read_document_stream(
    spark: SparkSession,
    source_dir: str,
    with_corrupt_record: bool = False,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """JSON-lines drop-dir source with the document ingest schema.
    ``with_corrupt_record=True`` adds the PERMISSIVE ``_corrupt_record``
    column (raw text of unparseable lines) that
    :func:`start_corpus_sink`'s quarantine path splits on — the same
    contract as ``read_telemetry_stream``. ``max_files_per_trigger``
    bounds micro-batch size (files are taken in modification-time
    order); fixtures that need a DETERMINISTIC file→batch mapping set
    it to 1 (q_corpus_stream_served)."""
    schema = DOCUMENT_INGEST_SCHEMA
    if with_corrupt_record:
        schema = StructType(
            list(DOCUMENT_INGEST_SCHEMA.fields)
            + [StructField("_corrupt_record", StringType(), True)]
        )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(source_dir)
    )


def start_corpus_sink(
    stream: DataFrame,
    warehouse_dir: str,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_quality: float | None = None,
    dedup_watermark: str | None = "10 minutes",
    quarantine_dir: str | None = None,
    rejects_dir: str | None = None,
    trigger_seconds: int | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Append stream → ``<warehouse>/documents`` Parquet, partitioned by
    ``source``, after the batch pipeline's stage-1 decisions run on
    every arriving document:

    - **quarantine**: unparseable JSON lines append verbatim to
      ``quarantine_dir`` (requires the stream read
      ``with_corrupt_record=True``) — same side-channel contract as the
      telemetry sink;
    - **dedup** (``dedup_watermark`` not None): stateful
      ``dropDuplicates`` on the batch pipeline's ``content_hash``
      inside the watermark horizon, so a re-crawled page arriving twice
      within the window lands once. Corrupt rows hash their raw line
      (NULL text would otherwise fold ALL of them to one quarantine
      entry); identical garbage lines inside the window DO fold — a
      feature for repeating producers, and the quarantine is a
      diagnostic channel, not an audit log;
    - **quality gate**: rows outside ``[min_tokens, max_tokens]`` (or
      under ``min_quality`` when given) append to ``rejects_dir`` with
      a ``reject_reason`` column instead of the table — rejecting
      silently hides producer regressions, failing the stream on one
      bad doc loses the good ones;
    - accepted rows carry ``(n_tok, quality, content_hash, batch_id)``
      so downstream consumers (mixture, splits, packing) run without
      re-deriving stage-1 columns.

    A schema-valid row with NULL ``ingest_ts`` is NOT lost (pinned by
    test), but its dedup state entry has no event time to age on and
    therefore never watermark-evicts — producers that omit the stamp
    slowly grow the state store. Stamp ``ingest_ts`` at the producer.
    """
    path = os.path.join(warehouse_dir, "documents")
    if quarantine_dir is not None and "_corrupt_record" not in stream.columns:
        raise ValueError(
            "quarantine_dir needs the stream read with "
            "read_document_stream(..., with_corrupt_record=True)"
        )
    if quarantine_dir is None and "_corrupt_record" in stream.columns:
        import warnings

        warnings.warn(
            "stream carries _corrupt_record but no quarantine_dir was "
            "given: corrupt lines will be dropped without a trace",
            stacklevel=2,
        )

    has_corrupt = "_corrupt_record" in stream.columns
    if dedup_watermark is not None:
        key = content_hash(F.col("text"))
        if has_corrupt:
            key = F.coalesce(
                key, F.concat(F.lit("corrupt:"), F.md5("_corrupt_record"))
            )
        # dropDuplicatesWithinWatermark, NOT dropDuplicates: a plain
        # dropDuplicates whose keys lack the event-time column keeps
        # its state FOREVER (the watermark only evicts keys containing
        # event time) — the WithinWatermark variant evicts each hash
        # once it ages past the horizon, which is the whole bound on
        # state here
        stream = (
            stream.withColumn("content_hash", key)
            .withWatermark("ingest_ts", dedup_watermark)
            .dropDuplicatesWithinWatermark(["content_hash"])
        )
    else:
        stream = stream.withColumn("content_hash", content_hash(F.col("text")))

    def _sink(batch: DataFrame, batch_id: int) -> None:
        cached = None
        if has_corrupt:
            cached = batch.cache()
            if quarantine_dir is not None:
                bad = cached.filter(F.col("_corrupt_record").isNotNull())
                bad.select("_corrupt_record").write.mode("append").text(
                    quarantine_dir
                )
            batch = cached.filter(F.col("_corrupt_record").isNull()).drop(
                "_corrupt_record"
            )
        scored = (
            batch.withColumn("n_tok", F.size(word_tokens("text")).cast("long"))
            .withColumn("quality", F.round(quality_score("text"), 6))
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
        )
        reason = F.when(F.col("n_tok") < min_tokens, "too_short").when(
            F.col("n_tok") > max_tokens, "too_long"
        )
        if min_quality is not None:
            reason = reason.when(
                F.col("quality") < F.lit(float(min_quality)), "low_quality"
            )
        scored = scored.withColumn("reject_reason", reason)
        # one cache serves the reject and accept splits; without it the
        # quality expressions run twice per batch
        scored = scored.cache()
        try:
            if rejects_dir is not None:
                scored.filter(F.col("reject_reason").isNotNull()).write.mode(
                    "append"
                ).parquet(rejects_dir)
            (
                scored.filter(F.col("reject_reason").isNull())
                .drop("reject_reason")
                .write.mode("append")
                .partitionBy("source")
                .parquet(path)
            )
        finally:
            scored.unpersist()
            if cached is not None:
                cached.unpersist()

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation",
        os.path.join(warehouse_dir, "_checkpoints/corpus_ingest"),
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
