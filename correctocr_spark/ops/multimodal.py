"""Multimodal column plumbing: opaque ``binary`` media + typed metadata.

Images/audio/video ride as binary columns with a metadata struct; the
decode / feature-extract / resize / frame-sample operators are Pandas
UDFs over ``mapInPandas`` (Arrow batches of bytes). The decode libraries
(PIL/torchaudio/av) are NOT in this container, so the decode step is
STUBBED behind ``NotImplementedError`` / a deterministic byte-level
fake — the Spark-side plumbing (schema, partitioning, UDF signature,
batch shape) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _decode_image(data: bytes):  # pragma: no cover - stub
    """Real decode path — requires an image library absent from this
    container. The fake below keeps the pipeline testable."""
    raise NotImplementedError("image decode requires PIL/opencv (not installed)")


def _fake_features(data: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic byte-level stand-in for a decoded-media embedding:
    bucketed byte histogram, L2-normalized."""
    if not data:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(data, dtype=np.uint8)
    hist = np.bincount(arr // (256 // dim), minlength=dim).astype(np.float64)
    norm = np.linalg.norm(hist)
    return (hist / norm if norm else hist).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16, use_decoder: bool = False) -> DataFrame:
    """media binary -> feature vectors, Arrow-batched.

    ``use_decoder=True`` selects the real (stubbed) decode path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, data in zip(pdf["media_id"], pdf["media"]):
                data = bytes(data) if data is not None else b""
                if use_decoder:
                    _decode_image(data)  # raises: decoder not available
                arr = np.frombuffer(data, dtype=np.uint8)
                if len(arr):
                    counts = np.bincount(arr, minlength=256).astype(np.float64)
                    p = counts[counts > 0] / len(arr)
                    entropy = float(-(p * np.log2(p)).sum())
                else:
                    entropy = 0.0
                out.append(
                    {
                        "media_id": int(media_id),
                        "n_bytes": len(data),
                        "byte_entropy": round(entropy, 6),
                        "feature": _fake_features(data, dim).tolist(),
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("media_id", "media").mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per planned frame
    timestamp (the decode itself is the stubbed step). Native
    ``sequence``/``explode`` — the shuffle-free fan-out pattern."""
    return media.where(F.col("meta.duration_ms").isNotNull()).select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.duration_ms") - 1, F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )
