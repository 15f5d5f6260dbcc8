"""Multimodal column handling: opaque binary payloads + typed
metadata, with decode/feature steps as Arrow-batched mapInPandas.

The container has no image/audio codecs, so the decode kernel is a
clearly-marked deterministic fake (first-bytes "features"); the Spark
side — schema, batching, partition sizing — is real and is what
matters at 100 TB: payloads stay in binary columns (never strings),
decode happens per Arrow batch with bounded memory, and metadata
filters prune before any payload is touched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """Derive a synthetic media table from `documents`: the utf-8 text
    bytes stand in for an encoded payload; metadata is derived
    deterministically. Schema-identical to a real ingest."""
    d = documents
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        (F.col("n_chars") % 1920).alias("width"),
        (F.col("n_chars") % 1080).alias("height"),
        (F.col("n_chars") * 7).alias("duration_ms"),
    )


def decode_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    REAL DECODE IS STUBBED: with PIL/ffmpeg available this is where
    `Image.open(io.BytesIO(payload))` / frame sampling would run; the
    deterministic fake emits the first 8 payload bytes as floats so the
    pipeline (schema, batching, downstream aggregation) is testable.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [float(b) for b in (payload or b"")[:8]] for payload in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def decode_real(media: DataFrame) -> DataFrame:
    """Placeholder for the codec-backed decode path."""
    raise NotImplementedError(
        "image/audio codecs unavailable in this environment; "
        "use decode_features (deterministic fake) for pipeline tests"
    )
