"""Streaming joins (reference: DBSPIncrementalJoinOperator.java).

- stream-static: the static side is broadcast per micro-batch — the
  incremental join ΔA ⋈ B, which is exactly DBSP's bilinear join rule
  when one side is constant.
- stream-stream: both sides buffered in the state store, bounded by
  watermarks + a time-range join condition (DBSP bounds the same
  buffers via its time-indexed traces).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.streaming.event_time import with_event_time_watermark


def stream_static_join(stream: DataFrame, static: DataFrame, on: Column) -> DataFrame:
    return stream.join(F.broadcast(static), on)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    left_watermark: str = "1 hour",
    right_watermark: str = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Watermark-bounded stream-stream join. For outer joins the
    NULL-padded rows for unmatched buffered rows are emitted once the
    watermark passes their join-time bound (state stays bounded both
    ways — the incremental-join guarantee DBSP provides via integrated
    Z-set state, realized here by the state store)."""
    return with_event_time_watermark(left, left_ts, left_watermark).join(
        with_event_time_watermark(right, right_ts, right_watermark), on, how
    )
