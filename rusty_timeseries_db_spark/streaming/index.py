"""Streaming search-index maintenance — keep a persisted
:class:`..operators.retrieval.Bm25Index` current as documents stream
in (round 13; the serving loop the persisted index exists for:
ingest → index → query without ever re-scanning the corpus).

Shape: the index is BUILT once from the initial corpus (build() — the
batch operator), then every micro-batch of new documents is applied
with ``Bm25Index.add`` inside ``foreachBatch`` — postings + df-delta
appends into the term-sharded layout, O(batch) work, after which
queries see the new documents with EXACT scores (BM25 has no
quantizer; there is no recall drift to watch, unlike the IVF add
path).

Delivery contract (honest): at-least-once with an idempotent skip of
FULLY-applied batches — ``apply_bm25_batch`` records
``last_applied_batch`` in the index manifest and a replayed
``batch_id`` ≤ that mark is a no-op, so the common restart (crash
AFTER a batch commits, offsets not yet advanced) does not
double-count documents. A crash strictly BETWEEN the postings append
and the manifest bump can still double-apply that one batch on
replay — the same window every append-mode foreachBatch sink has;
the corpus telemetry sink closes it with a CAS ledger
(streaming/ingest.py), and the equivalent here is a full
``build()`` re-run, which heals the index from the source corpus.
No reference analog (main.rs is numeric telemetry only).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..fsutil import write_json_manifest
from ..operators.retrieval import Bm25Index


def apply_bm25_batch(
    spark,
    index_path: str,
    batch: DataFrame,
    batch_id: int,
    id_col: str | None = None,
    text_col: str = "text",
    removed_ids: str = "skip",
) -> int:
    """Apply ONE micro-batch to the index, idempotently: returns the
    number of docs added, or 0 when ``batch_id`` was already fully
    applied (manifest ``last_applied_batch`` watermark). Factored out
    of the sink so the replay contract is unit-testable without a
    streaming harness.

    ``removed_ids`` (review round 13; unified with the batch door in
    round 14 — ONE policy knob, implemented once in
    ``Bm25Index.add``): what to do when the batch carries an id that
    was ``remove()``d — ``"skip"`` (streaming default) drops those
    rows and applies the rest, since a stream cannot raise its way
    out: a raise would fail the same micro-batch on every restart
    (the offsets never advance — a permanent poison pill) and erasure
    semantics usually WANT a re-published removed doc kept out until
    re-admitted deliberately. ``"error"`` keeps the strict contract
    for pipelines that prefer to stop. ``"readmit"`` compacts first
    (deletion becomes physical) and then adds the whole batch —
    compaction-gated re-admission, at the documented cost of an index
    rewrite inside the micro-batch that carries the clash."""
    if removed_ids not in ("skip", "error", "readmit"):
        raise ValueError(
            f"removed_ids must be skip|error|readmit, got {removed_ids!r}"
        )
    idx = Bm25Index(spark, index_path)
    man = idx._manifest()  # raises FileNotFoundError before build()
    if batch_id <= int(man.get("last_applied_batch", -1)):
        return 0
    n = idx.add(
        batch, id_col=id_col, text_col=text_col, removed_ids=removed_ids
    )
    man2 = idx._manifest()
    man2["last_applied_batch"] = int(batch_id)
    write_json_manifest(spark, idx.manifest_path, man2)
    return n


def start_bm25_index_sink(
    stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    id_col: str | None = None,
    text_col: str = "text",
    trigger_seconds: int | None = None,
    available_now: bool = False,
    removed_ids: str = "skip",
) -> StreamingQuery:
    """Maintain a built ``Bm25Index`` from a document stream: each
    micro-batch runs :func:`apply_bm25_batch`. The index must exist
    (``Bm25Index(...).build(initial_corpus)``) before the sink starts
    — the build defines the sharding the appends route into.
    ``removed_ids="skip"`` (default — see :func:`apply_bm25_batch`)
    keeps a re-published removed doc out instead of poison-pilling
    the stream on ``add()``'s re-add guard."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        apply_bm25_batch(
            batch.sparkSession, index_path, batch, batch_id,
            id_col=id_col, text_col=text_col, removed_ids=removed_ids,
        )

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", os.path.join(checkpoint_dir, "bm25_index")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


# ------------------------------------------------ IVF (ANN) index

def apply_ivf_batch(
    spark,
    index_path: str,
    batch: DataFrame,
    batch_id: int,
    corpus_id: str | None = None,
    corpus_vec: str = "embedding",
    removed_ids: str = "skip",
) -> int:
    """The :func:`apply_bm25_batch` contract for the ANN index
    (:class:`..operators.similarity.IvfIndex`): assign the batch's
    vectors to their frozen nearest centroids, append into the touched
    cell partitions, bump the manifest — skipping any ``batch_id``
    at or below the ``last_applied_batch`` watermark. IVF adds are
    exact *within probed cells* but carry the documented recall-drift
    contract as cells grow away from frozen centroids —
    ``IvfIndex.should_rebuild`` / the query-time warning fire off the
    same ``n_added/n_rows`` ratio this sink keeps bumping, so drift
    stays observable in streaming deployments too. ``removed_ids``
    (round 14, now that ``IvfIndex`` has the deletion lifecycle): same
    skip|error|readmit policy as the BM25 sink, streaming default
    ``"skip"`` — a re-published removed vector must not poison-pill
    the stream on the re-add guard."""
    from ..operators.similarity import IvfIndex

    if removed_ids not in ("skip", "error", "readmit"):
        raise ValueError(
            f"removed_ids must be skip|error|readmit, got {removed_ids!r}"
        )
    idx = IvfIndex(spark, index_path)
    man = idx._manifest()
    if batch_id <= int(man.get("last_applied_batch", -1)):
        return 0
    n = idx.add(
        batch, corpus_id=corpus_id, corpus_vec=corpus_vec,
        removed_ids=removed_ids,
    )
    man2 = idx._manifest()
    man2["last_applied_batch"] = int(batch_id)
    write_json_manifest(spark, idx.manifest_path, man2)
    return n


def start_ivf_index_sink(
    stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    corpus_id: str | None = None,
    corpus_vec: str = "embedding",
    trigger_seconds: int | None = None,
    available_now: bool = False,
    removed_ids: str = "skip",
) -> StreamingQuery:
    """Maintain a built ``IvfIndex`` from an embedding stream — the
    ANN twin of :func:`start_bm25_index_sink`, same delivery contract
    (at-least-once, idempotent skip of fully-applied batches, the
    append-vs-manifest window healed by ``build()``) and the same
    ``removed_ids`` policy (skip|error|readmit, streaming default
    skip)."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        apply_ivf_batch(
            batch.sparkSession, index_path, batch, batch_id,
            corpus_id=corpus_id, corpus_vec=corpus_vec,
            removed_ids=removed_ids,
        )

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", os.path.join(checkpoint_dir, "ivf_index")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


# --------------------------------------------- removal (erasure) sinks

def apply_removal_batch(
    spark,
    index_path: str,
    batch: DataFrame,
    kind: str = "bm25",
) -> int:
    """Apply ONE micro-batch of deletion requests (a single-column
    DataFrame of doc/vector ids) to a persisted index — the GDPR/
    right-to-erasure queue consumed as a stream. No batch watermark is
    needed: ``remove()`` is idempotent BY CONTENT (already-tombstoned
    or never-present ids are ignored, and the manifest re-derives from
    authoritative state), so an at-least-once replay removes nothing
    twice and converges to the same manifest. Returns the number of
    ids newly removed.

    Poison-pill contract (deliberate, unlike ``removed_ids="skip"`` on
    the add sinks): if an interrupted ``compact()`` left the index
    mid-swap, ``remove()`` raises and the micro-batch fails on every
    retry — an erasure request must NEVER be silently dropped, so the
    stream stalls until an operator re-runs compact(). Writer
    contract: do not run a removal sink concurrently with an add sink
    on the SAME index (the manifest commit is last-writer-wins; see
    the index class docstrings)."""
    if kind == "bm25":
        idx = Bm25Index(spark, index_path)
    elif kind == "ivf":
        from ..operators.similarity import IvfIndex

        idx = IvfIndex(spark, index_path)
    else:
        raise ValueError(f"kind must be bm25|ivf, got {kind!r}")
    return idx.remove(batch)


def start_index_removal_sink(
    stream: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    kind: str = "bm25",
    trigger_seconds: int | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Consume a deletion-request stream (single id column) into a
    persisted ``Bm25Index`` (``kind="bm25"``) or ``IvfIndex``
    (``kind="ivf"``): each micro-batch runs :func:`apply_removal_batch`
    — tombstone appends + exact post-delete query results, compaction
    deferred to an operator-scheduled ``compact()``. Delivery is
    at-least-once with content-idempotent replays (see
    apply_removal_batch)."""
    if kind not in ("bm25", "ivf"):
        raise ValueError(f"kind must be bm25|ivf, got {kind!r}")

    def _sink(batch: DataFrame, batch_id: int) -> None:
        apply_removal_batch(batch.sparkSession, index_path, batch, kind=kind)

    writer = stream.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", os.path.join(checkpoint_dir, f"{kind}_removal")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
