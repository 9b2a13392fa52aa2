"""Streaming heavy-hitter sketch sink (round 14 —
streaming/sketch.py): replay idempotence, schema/k guards, bound
containment for batch-split data, and the real-sink end-to-end run."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from rusty_timeseries_db_spark.streaming.sketch import (
    apply_topk_sketch_batch,
    serve_topk,
    start_topk_sketch_sink,
)

ROWS = [
    ("a", d, v)
    for d, vals in enumerate(
        [[1, 1, 1, 2, 2, 3], [1, 4, 4, 4, 2], [5, 5, 1, 1]]
    )
    for v in vals
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, day int, v int")


def test_apply_idempotent_and_guards(spark, tmp_path):
    store = str(tmp_path / "hh")
    df = _df(spark, ROWS)
    n = apply_topk_sketch_batch(
        spark, store, df, 0, ["g", "day"], "v", k=2
    )
    assert n == 3  # one summary row per (g, day) cell
    # replay: no-op
    assert (
        apply_topk_sketch_batch(spark, store, df, 0, ["g", "day"], "v", k=2)
        == 0
    )
    assert spark.read.parquet(store).count() == 3
    # schema/k drift refused
    with pytest.raises(ValueError, match="k="):
        apply_topk_sketch_batch(spark, store, df, 1, ["g", "day"], "v", k=3)
    with pytest.raises(ValueError, match="schema mismatch"):
        apply_topk_sketch_batch(spark, store, df, 1, ["g"], "v", k=2)
    # empty new batch: watermark still advances
    assert (
        apply_topk_sketch_batch(
            spark, store, df.limit(0), 1, ["g", "day"], "v", k=2
        )
        == 0
    )
    assert (
        apply_topk_sketch_batch(spark, store, df, 1, ["g", "day"], "v", k=2)
        == 0
    )


def test_split_across_batches_bound_holds(spark, tmp_path):
    """The same cell arriving over several batches yields several
    summary rows; the served merge's [count_lo, count_lo + err_ub]
    must still contain the exact truth."""
    store = str(tmp_path / "hh")
    # split every cell's rows across two batches
    b0, b1 = ROWS[::2], ROWS[1::2]
    apply_topk_sketch_batch(spark, store, _df(spark, b0), 0, ["g"], "v", k=2)
    apply_topk_sketch_batch(spark, store, _df(spark, b1), 1, ["g"], "v", k=2)
    truth = Counter(v for _, _, v in ROWS)
    served = serve_topk(spark, store, ["g"]).collect()
    assert all(r.n_rows == len(ROWS) for r in served)
    for r in served:
        assert r.count_lo <= truth[r.value] <= r.count_lo + r.err_ub
    # the global heavy hitter (value 1, count 6) must survive with a
    # bound that pins it above every other value's upper bound... at
    # least its lower bound is the largest
    top = max(served, key=lambda r: r.count_lo)
    assert top.value == 1


def test_streaming_sink_end_to_end(spark, tmp_path):
    """Two real micro-batches through the REAL sink; served merge ==
    the batch-side merge over identically-split summaries."""
    import glob
    import json as _json
    import os

    from rusty_timeseries_db_spark.functions.sketches import (
        merge_topk_sketch,
        topk_sketch,
    )

    src = str(tmp_path / "drop")
    df = _df(spark, ROWS)
    df.filter(F.col("day") < 2).coalesce(1).write.mode("overwrite").json(src)
    p2 = os.path.join(src, "zz_batch2.json")
    with open(p2, "w") as f:
        for r in df.filter(F.col("day") >= 2).collect():
            f.write(_json.dumps({"g": r.g, "day": r.day, "v": r.v}) + "\n")
    latest = max(
        os.path.getmtime(p) for p in glob.glob(os.path.join(src, "part-*"))
    )
    os.utime(p2, (latest + 10, latest + 10))

    stream = (
        spark.readStream.schema("g string, day int, v int")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    store = str(tmp_path / "hh")
    q = start_topk_sketch_sink(
        stream, store, str(tmp_path / "ckpt"), ["g", "day"], "v", k=2,
        available_now=True,
    )
    assert q.awaitTermination(180)

    served = {
        (r.g, r.value): (r.count_lo, r.err_ub)
        for r in serve_topk(spark, store, ["g"]).collect()
    }
    # cells (g, day) arrive whole (the batch split is by day), so the
    # served merge equals the one-shot batch pipeline exactly
    want = {
        (r.g, r.value): (r.count_lo, r.err_ub)
        for r in merge_topk_sketch(
            topk_sketch(df, ["g", "day"], "v", k=2), ["g"]
        ).collect()
    }
    assert served == want


def test_serve_before_any_summary_raises_honestly(spark, tmp_path):
    store = str(tmp_path / "hh")
    with pytest.raises(FileNotFoundError, match="start the sink"):
        serve_topk(spark, store, ["g"])
    # manifest exists but only an empty batch was applied
    apply_topk_sketch_batch(
        spark, store, _df(spark, ROWS).limit(0), 0, ["g"], "v", k=2
    )
    with pytest.raises(ValueError, match="every applied batch was empty"):
        serve_topk(spark, store, ["g"])
