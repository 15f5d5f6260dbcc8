"""Event-time windowed aggregation with watermarks
(reference: circuit/operator/DBSPWindowAggregateOperator.java; DBSP
handles late data via its time-indexed Z-sets, Spark via watermarks).

At scale: the watermark bounds state store size — without it a
windowed aggregate's state grows with the stream. 100 TB/day streams
need the watermark tight enough that (windows in flight × keys) fits
the cluster's aggregate state store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.streaming.event_time import with_event_time_watermark


def tumbling_window_agg_stream(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    *aggs: Column,
) -> DataFrame:
    agged = (
        with_event_time_watermark(events, ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_size).alias("win"), F.col("event_type"))
        .agg(*aggs)
    )
    rest = [c for c in agged.columns if c != "win"]
    return agged.select(F.col("win.start").alias("window_start"), *rest)


def hopping_window_agg_stream(
    events: DataFrame,
    size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    *aggs: Column,
) -> DataFrame:
    agged = (
        with_event_time_watermark(events, ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), size, slide).alias("win"))
        .agg(*aggs)
    )
    rest = [c for c in agged.columns if c != "win"]
    return agged.select(F.col("win.start").alias("window_start"), *rest)
