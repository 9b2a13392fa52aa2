"""Multimodal (image/audio/video) column plumbing.

Assets are opaque ``binary`` payloads plus a typed metadata struct
(mime, width/height or duration, sha256). The Spark-side plumbing —
schema, partition-friendly layout, Arrow-batched UDF signatures — is
real and tested; the actual decoders are STUBBED (this container has no
image/audio libraries): ``decode_image``/``extract_frames`` raise
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake (seeded from the payload hash) exercises the full
pipeline shape end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal asset schema.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("mime", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("sha256", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("mime", StringType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def make_assets(df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Wrap a binary column into the canonical asset schema, computing
    sha256 JVM-side (no UDF)."""
    return df.select(
        F.col(id_col).cast("string").alias("asset_id"),
        F.lit(mime).alias("mime"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.sha2(F.col(payload_col).cast("binary"), 256).alias("sha256"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: features are
    derived from the sha256 of the payload, so the pipeline is testable
    without image/audio libs."""
    h = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(h[(4 * i) % 28 : (4 * i) % 28 + 4], "big") / 2**32
        for i in range(dim)
    ]


_FRAMES_SCHEMA = StructType(
    [
        StructField("asset_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """Video/audio frame sampling plumbing via ``mapInPandas``: one
    output row per sampled frame, Arrow-batched. The real decoder
    (ffmpeg) is STUBBED — ``fake=True`` slices the payload at fixed
    offsets so partitioning/fan-out behavior is testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "real frame extraction requires ffmpeg — not in this env"
                    )
                data = bytes(payload)
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    out.append((aid, i, data[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(out, columns=["asset_id", "frame_idx", "frame_payload"])

    return assets.mapInPandas(run, _FRAMES_SCHEMA)


def extract_features(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over asset payloads via
    ``mapInPandas`` — the correct shape for heavy per-asset Python work
    (decoders hold no Spark state; batches amortize Arrow transfer).

    With ``fake=False`` this raises ``NotImplementedError`` from the
    executors (no decode libraries in this environment — STUB)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg — not in this env"
                )
            feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["mime"],
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, _FEATURES_SCHEMA)


def resize_images(
    assets: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """Image resize plumbing (``mapInPandas``): same asset schema out,
    with meta.width/height set and the payload replaced by the resized
    encoding. Real decode/resize (PIL) is STUBBED; ``fake=True``
    deterministically truncates/pads the payload to width*height bytes
    so downstream batch shapes are testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resize requires PIL — not in this env"
                )
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                data = bytes(p)[:target].ljust(target, b"\0")
                payloads.append(data)
                metas.append(
                    {
                        "width": width,
                        "height": height,
                        "duration_ms": m["duration_ms"] if m is not None else None,
                        "sha256": hashlib.sha256(data).hexdigest(),
                    }
                )
            pdf = pdf.copy()
            pdf["payload"] = payloads
            pdf["meta"] = metas
            yield pdf

    return assets.mapInPandas(run, ASSET_SCHEMA)
