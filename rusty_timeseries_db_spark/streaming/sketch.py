"""Streaming heavy-hitter maintenance — keep a mergeable
:func:`..functions.sketches.topk_sketch` store current as events
stream in (round 14; the streaming face of the sketch the way
streaming/index.py is the streaming face of the persisted retrieval
indexes).

Shape: every micro-batch computes its OWN per-cell top-k summaries
(batch-sized work, exact within the batch) and APPENDS them to a
parquet store; serving merges the stored summaries with
:func:`..functions.sketches.merge_topk_sketch`, whose error bound is
split-agnostic — a cell's rows arriving over many batches just means
several summary rows for that cell, and the merge's
``[count_lo, count_lo + err_ub]`` containment holds for ANY split
(pinned by the batch-side property test). No raw event is ever
revisited: the store grows by O(cells × k) per batch, not O(events).

Delivery contract: at-least-once with an idempotent skip of
fully-applied batches — the manifest's ``last_applied_batch``
watermark makes a replayed ``batch_id`` a no-op, exactly the
streaming/index.py contract (the append+manifest crash window and its
heal-by-rebuild remedy are the same, documented there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..fsutil import read_json_manifest, write_json_manifest
from ..functions.sketches import merge_topk_sketch, topk_sketch


def _manifest_path(store_path: str) -> str:
    return store_path.rstrip("/") + ".sketch.json"


def apply_topk_sketch_batch(
    spark,
    store_path: str,
    batch: DataFrame,
    batch_id: int,
    keys: list[str],
    value_col: str,
    k: int = 16,
) -> int:
    """Summarize ONE micro-batch and append it to the store,
    idempotently: returns the number of summary rows appended, or 0
    when ``batch_id`` was already applied (manifest watermark) or the
    batch is empty. Factored out of the sink so the replay contract
    is unit-testable without a streaming harness."""
    man = read_json_manifest(spark, _manifest_path(store_path)) or {
        "keys": keys,
        "value_col": value_col,
        "k": int(k),
        "last_applied_batch": -1,
    }
    if list(man["keys"]) != list(keys) or man["value_col"] != value_col:
        raise ValueError(
            "topk-sketch store schema mismatch: built for "
            f"({man['keys']}, {man['value_col']}), got ({keys}, "
            f"{value_col})"
        )
    if int(k) != int(man["k"]):
        raise ValueError(
            f"topk-sketch store built with k={man['k']}, got k={k} — "
            "per-cell truncation depth must not vary across batches"
        )
    if batch_id <= int(man.get("last_applied_batch", -1)):
        return 0
    sk = topk_sketch(batch, keys, value_col, k=k).withColumn(
        "_batch_id", F.lit(int(batch_id))
    )
    n = sk.count()
    if n > 0:
        sk.write.mode("append").parquet(store_path)
    man["last_applied_batch"] = int(batch_id)
    write_json_manifest(spark, _manifest_path(store_path), man)
    return int(n)


def serve_topk(
    spark,
    store_path: str,
    keys: list[str],
    k: int | None = None,
) -> DataFrame:
    """Merged heavy hitters over everything the sink has landed:
    :func:`merge_topk_sketch` over the stored per-(cell, batch)
    summaries, coarsened to ``keys`` (any subset of the stored cell
    keys — the batch split just adds summary rows, the bound
    machinery is identical). O(stored summaries), never O(events).
    Raises with the honest state when the sink has not landed any
    summaries yet (manifest missing, or only empty batches so far)."""
    man = read_json_manifest(spark, _manifest_path(store_path))
    if man is None:
        raise FileNotFoundError(
            f"no topk-sketch store at {store_path} — start the sink (or "
            "apply_topk_sketch_batch) first"
        )
    from pyspark.errors import AnalysisException

    try:
        stored = spark.read.parquet(store_path)
    except AnalysisException as e:
        # only PATH_NOT_FOUND means "no summaries yet"; a corrupt
        # footer / permission fault must surface as itself, not as a
        # misleading empty-store message
        if "PATH_NOT_FOUND" not in str(e):
            raise
        raise ValueError(
            f"topk-sketch store at {store_path} has a manifest "
            f"(last_applied_batch={man.get('last_applied_batch')}) but no "
            "summaries yet — every applied batch was empty"
        ) from e
    return merge_topk_sketch(stored, keys, k=k)


def start_topk_sketch_sink(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    k: int = 16,
    trigger_seconds: int | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Maintain the sketch store from an event stream: each micro-batch
    runs :func:`apply_topk_sketch_batch`. Serving reads go through
    :func:`serve_topk` at any time — summaries are self-describing
    (exact within their batch), so there is no build step and no
    rebuild-on-restart; the checkpoint + watermark pair gives the
    usual at-least-once-with-idempotent-skip delivery."""
    spark = stream.sparkSession

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_topk_sketch_batch(
            spark, store_path, batch, batch_id, keys, value_col, k=k
        )

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
