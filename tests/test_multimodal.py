"""Multimodal plumbing: binary payloads, Arrow-batched decode stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.llm.multimodal import decode_features, decode_real, media_table
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def test_media_table_schema_and_payloads(spark, sf_dir):
    m = media_table(load_table(spark, sf_dir, "documents"))
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.where(F.col("media_id") == 0).head()
    assert isinstance(row.payload, (bytes, bytearray)) and len(row.payload) > 0
    assert row.media_type in ("image", "audio", "video")


def test_decode_features_roundtrip(spark, sf_dir):
    m = media_table(load_table(spark, sf_dir, "documents"))
    f = decode_features(m)
    rows = f.collect()
    assert len(rows) == m.count()
    r0 = next(r for r in rows if r.media_id == 0)
    # fake kernel: features are the first 8 payload bytes
    payload = m.where(F.col("media_id") == 0).head().payload
    assert r0.features == [float(b) for b in payload[:8]]
    assert r0.n_bytes == len(payload)


def test_decode_real_is_explicitly_stubbed(spark, sf_dir):
    m = media_table(load_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError):
        decode_real(m)
