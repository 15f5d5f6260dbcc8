"""Incremental aggregate / view maintenance
(reference: circuit/operator/DBSPIncrementalAggregateOperator.java,
NaiveIncrementalTests.java, OptimizedIncrementalTests.java).

`run_incremental` feeds a directory of parquet files as a stream
(maxFilesPerTrigger=1 → one micro-batch per file, like the
reference's per-step circuit evaluation) and maintains an aggregate
view in the state store, emitting the maintained result after all
input is consumed.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def stream_from_dir(
    spark: SparkSession, path: str, schema: StructType, files_per_trigger: int = 1
) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )


def run_incremental(
    stream_df: DataFrame,
    view: Callable[[DataFrame], DataFrame],
    output_mode: str = "complete",
    query_name: str | None = None,
) -> DataFrame:
    """Maintain `view` incrementally over the stream; block until all
    available input is consumed; return the maintained result.

    The memory sink holds the view's current state — the analogue of
    the reference's output Z-set after integrating all deltas."""
    spark = stream_df.sparkSession
    name = query_name or f"ivm_{uuid.uuid4().hex[:8]}"
    q = (
        view(stream_df)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()
    return spark.table(name)
