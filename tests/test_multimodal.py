"""Multimodal plumbing: asset wrapping, Arrow-batched feature
extraction, frame sampling (decoders stubbed — plumbing is real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rusty_timeseries_db_spark.operators.multimodal import (
    extract_features,
    make_assets,
    sample_frames,
)
from rusty_timeseries_db_spark.queries import T
from tests.conftest import SF_DIR


@pytest.fixture()
def assets(spark):
    d = (
        T(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") < 20)
        .withColumn("payload", F.encode(F.col("text"), "UTF-8"))
    )
    return make_assets(d, id_col="doc_id", payload_col="payload", mime="video/fake")


def test_asset_schema_and_sha(assets):
    rows = assets.collect()
    assert len(rows) == 20
    r = rows[0]
    assert r.mime == "video/fake"
    assert len(r.meta.sha256) == 64
    assert isinstance(r.payload, (bytes, bytearray))


def test_fake_features_deterministic(assets):
    a = {r.asset_id: r.features for r in extract_features(assets, fake=True).collect()}
    b = {r.asset_id: r.features for r in extract_features(assets, fake=True).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())


def test_real_decode_is_stubbed(assets):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as exc:
        extract_features(assets, fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "decode" in str(exc.value)


def test_frame_sampling_fanout(assets):
    frames = sample_frames(assets, every_n_bytes=64, max_frames=4, fake=True)
    pdf = frames.toPandas()
    # every asset produced ≥1 frame, ≤4 frames, indices dense from 0
    per_asset = pdf.groupby("asset_id")["frame_idx"].agg(["min", "max", "count"])
    assert (per_asset["min"] == 0).all()
    assert (per_asset["count"] <= 4).all()
    assert (per_asset["max"] == per_asset["count"] - 1).all()
    # frame payloads are real slices
    assert all(len(p) <= 64 for p in pdf["frame_payload"])


def test_resize_stub(assets):
    from rusty_timeseries_db_spark.operators.multimodal import resize_images

    out = resize_images(assets, width=8, height=8, fake=True).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.payload) == 64
        assert r.meta.width == 8 and r.meta.height == 8
        assert len(r.meta.sha256) == 64
