"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct —
the Spark-side contract (schema, partitioning, Arrow batch shape) is real
and tested; the actual codec step is STUBBED because no image/audio
libraries exist in this container. Each decode UDF either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
(test mode) with the exact schema a real decoder would emit, so swapping in
Pillow/torchaudio later changes one function body, not the pipeline.

Scale posture: decode runs in ``mapInPandas`` (Arrow-batched, one pass,
no shuffle); per-item fan-out (frame sampling) uses the same iterator to
yield more rows than it consumes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata carried alongside every media payload
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def attach_media_columns(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text table into the media contract for testing: payload =
    utf-8 bytes of the text, metadata struct populated deterministically.
    (Real pipelines read payloads from object-store binaryFile sources.)"""
    return df.select(
        F.col(id_col),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            (F.octet_length(text_col) % 640).cast("int").alias("width"),
            (F.octet_length(text_col) % 480).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector: byte-sum
    folded per dimension. Replace with a real decode+embed when codecs are
    available."""
    if payload is None:
        return None
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    return [float(a % 997) / 997.0 for a in acc]


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Image decode + feature extraction via ``mapInPandas`` (Arrow batches).

    ``strict=True`` raises ``NotImplementedError`` — the marked stub for the
    real codec path (Pillow/opencv absent in this container). Otherwise the
    deterministic fake keeps the distributed plumbing testable end-to-end.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode requires a codec library (Pillow/opencv) — "
                    "not available in this environment; stubbed by contract"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "feature": pdf[payload_col].map(lambda b: _fake_feature(b, dim)),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=IMAGE_FEATURES)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling (row fan-out): emit up to ``max_frames`` byte-slices
    per payload — the video→frames shape. Real decoders replace the slicing
    with keyframe extraction; the iterator contract (rows out ≠ rows in) is
    the part that matters for the distributed plan."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                for j in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    out_ids.append(did)
                    out_idx.append(j)
                    out_bytes.append(bytes(payload[j * every_n_bytes : (j + 1) * every_n_bytes]))
            yield pd.DataFrame({"doc_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes})

    return df.select(id_col, payload_col).mapInPandas(fn, schema=FRAME_SCHEMA)
