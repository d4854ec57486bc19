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


#: magic-byte table for :func:`mime_sniff` — (uppercase hex prefix,
#: mime). ORDER MATTERS: longer/more-specific prefixes first (PNG's
#: 89504E47 before nothing else claims 89; '<!DO' before a bare '<').
#: Hex-prefix matching keeps the whole check a byte-exact string
#: comparison that Spark and the SQL oracle share verbatim.
MAGIC_PREFIXES = [
    ("25504446", "application/pdf"),        # %PDF
    ("1F8B", "application/gzip"),
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("47494638", "image/gif"),
    ("504B0304", "application/zip"),
    ("574152432F", "application/warc"),     # WARC/
    ("3C21444F", "text/html"),              # <!DO
    ("3C68746D", "text/html"),              # <htm
    ("3C48544D", "text/html"),              # <HTM
    ("3C3F786D", "application/xml"),        # <?xm
    ("EFBBBF", "text/plain"),               # UTF-8 BOM
]


def mime_sniff(
    media: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
    declared_col: str = None,
) -> DataFrame:
    """Magic-byte MIME detection on an opaque ``binary`` column — the
    WARC-ingest routing gate: servers lie in Content-Type (text/html
    bytes that are really a PDF, gzip members behind a plain text
    header), and the extractor chosen off the DECLARED type silently
    produces garbage text. Sniff the first bytes, and when a
    ``declared_col`` is given also report agreement so the
    mislabeled mass is measurable before extraction.

    Row-local and bounded: only the first 16 bytes are hexed
    (``hex(substring(data, 1, 16))``) — never the blob — then matched
    against :data:`MAGIC_PREFIXES` in order; unknown prefixes report
    ``application/octet-stream`` (honest fallback, not a guess).
    Declared types compare on the lowercased bare type with any
    ``;charset=...`` parameter stripped.

    Returns ``(id_col, sniffed)`` plus ``(declared, agree)`` when
    ``declared_col`` is given. Scan speed; no shuffle, no UDF. The hex
    probe is hoisted into its own projection (``_p``) so the 12-branch
    CASE provably evaluates it once per row — not once per branch —
    independent of codegen subexpression elimination.
    """
    probe = F.upper(F.hex(F.expr(f"substring({data_col}, 1, 16)")))
    sniff = None
    for hx, mime in MAGIC_PREFIXES:
        cond = F.col("_p").startswith(hx)
        sniff = F.when(cond, mime) if sniff is None else sniff.when(cond, mime)
    sniff = sniff.otherwise("application/octet-stream")
    if declared_col is None:
        return media.select(F.col(id_col), probe.alias("_p")).select(
            id_col, sniff.alias("sniffed")
        )
    bare = F.lower(F.trim(F.regexp_replace(F.col(declared_col), r";.*$", "")))
    return (
        media.select(F.col(id_col), probe.alias("_p"), bare.alias("declared"))
        .select(id_col, sniff.alias("sniffed"), "declared")
        .withColumn(
            "agree",
            F.when(F.col("sniffed") == F.col("declared"), 1)
            .otherwise(0)
            .cast("int"),
        )
    )
