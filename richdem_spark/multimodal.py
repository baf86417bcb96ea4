"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the decode step is STUBBED
(``decode_image`` raises ``NotImplementedError`` unless the deterministic
fake decoder is selected); the Spark-side plumbing — schema, batch shape,
partitioning, UDF signature — is real and tested."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image|audio|video
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), False),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode image bytes to HxWx3 uint8.

    Real decoding requires an image codec library not present in this
    container; ``fake=True`` selects the deterministic stand-in used by
    tests (bytes -> repeating pixel pattern)."""
    if not fake:
        raise NotImplementedError(
            "no image codec in this environment; pass fake=True for the "
            "deterministic test decoder"
        )
    h = w = 16
    buf = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(h * w * 3 / max(len(buf), 1)))
    return np.tile(buf, reps)[: h * w * 3].reshape(h, w, 3)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("mean_pixel", DoubleType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode -> feature-extract pipeline over the binary column; one
    Arrow batch per partition slice, vectorized inside."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "n_bytes": [], "mean_pixel": [],
                   "feature": []}
            for r in pdf.itertuples():
                img = decode_image(r.payload, fake=fake_decode)
                out["media_id"].append(r.media_id)
                out["n_bytes"].append(len(r.payload))
                out["mean_pixel"].append(float(img.mean()))
                # 8-bin histogram as the stand-in embedding
                hist, _ = np.histogram(img, bins=8, range=(0, 256))
                out["feature"].append(
                    (hist / hist.sum()).astype(float).tolist()
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def synth_media(spark, n: int = 64, seed: int = 1) -> DataFrame:
    """Deterministic fake media table for the plumbing tests."""
    rows = []
    for i in range(n):
        payload = bytes(
            ((i * 131 + j * 17 + seed) % 256) for j in range(64 + i % 32)
        )
        rows.append(
            (i, "image", "image/fake", 16, 16, None, payload)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
