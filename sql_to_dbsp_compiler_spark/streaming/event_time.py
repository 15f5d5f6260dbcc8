"""Event-time normalization shared by every watermark call site.

Spark's `withWatermark` requires the event-time column to be
TIMESTAMP (with local-time-zone); parquet file sources frequently
infer TIMESTAMP_NTZ, which raises
`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`. With the session pinned to
UTC (sources/tables._ensure_session_confs) the NTZ->LTZ cast is
value-preserving, so normalizing here is safe and makes every
streaming entry point accept either type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def ensure_event_time(df: DataFrame, col: str) -> DataFrame:
    """Cast `col` to TIMESTAMP_LTZ iff it is TIMESTAMP_NTZ.

    - Uses TimestampType() explicitly (not the string "timestamp")
      so the target does not depend on spark.sql.timestampType.
    - Resolves `col` case-insensitively, matching Spark's default
      column resolution, so a watermark spec with different case
      still gets the cast.
    """
    actual = next(
        (f for f in df.schema.fields if f.name.lower() == col.lower()), None
    )
    if actual is not None and isinstance(actual.dataType, TimestampNTZType):
        df = df.withColumn(actual.name, F.col(actual.name).cast(TimestampType()))
    return df


def with_event_time_watermark(df: DataFrame, col: str, delay: str) -> DataFrame:
    """`withWatermark` that tolerates TIMESTAMP_NTZ event-time columns."""
    return ensure_event_time(df, col).withWatermark(col, delay)
