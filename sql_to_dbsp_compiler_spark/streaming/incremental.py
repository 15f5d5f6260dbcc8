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
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(path)
    )
    # Parquet schemas often carry TIMESTAMP_NTZ, which event-time
    # watermarks reject; with the session pinned to UTC the LTZ cast is
    # value-preserving, so normalize up front for every consumer.
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType, TimestampType

    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast(TimestampType()))
    return df


def run_program_on_stream(
    spark: SparkSession,
    program,
    stream_table: str,
    stream_df: DataFrame,
    static_sources: dict[str, DataFrame] | None = None,
    sf_dir: str | None = None,
    optimize: bool = True,
):
    """Drive an :class:`~..compiler.IncrementalProgram` from a
    Structured Streaming source: every micro-batch of ``stream_df``
    becomes an insert Z-set delta for ``stream_table`` (the
    reference's circuit fed by its input stream adapters). Static
    tables are applied once as the first step's deltas. Returns the
    IncrementalProgram after all available input is consumed —
    ``snapshot(view)`` then equals the batch evaluation over
    everything streamed, and with ``optimize=True`` each micro-batch
    pays only the recognized operators' |delta|-bounded cost.

    This bridges the two IVM paths: Structured Streaming supplies
    ordered, replayable micro-batches; the program's Z-set operators
    maintain view state with explicit retract/insert deltas that
    Structured Streaming's own sinks don't expose."""
    from ..compiler.program import IncrementalProgram, SqlProgram, bind_sources
    from ..plans.zset import ZSet

    prog = SqlProgram.parse(program) if isinstance(program, str) else program
    inc = IncrementalProgram(spark, prog, optimize=optimize)
    static_prog = SqlProgram(
        tables={n: t for n, t in prog.tables.items() if n != stream_table},
        views=[],
        inserts=[i for i in prog.inserts if i.table != stream_table],
    )
    static = bind_sources(spark, static_prog, static_sources, sf_dir)
    nonempty = {n: ZSet.from_df(df) for n, df in static.items()}
    if nonempty:
        inc.step(nonempty)

    def feed(batch_df: DataFrame, batch_id: int) -> None:
        # eager checkpoint: state keeps referencing these rows long
        # after the micro-batch plan is gone. NB foreachBatch hands us
        # a DataFrame on a cloned session with an isolated temp-view
        # catalog — the optimized operators are catalog-free
        # (DataFrame ops only), and naive-path state unions keep the
        # program session's catalog, so this delta needs no rebinding.
        inc.step({stream_table: ZSet.from_df(batch_df.localCheckpoint())})

    q = stream_df.writeStream.foreachBatch(feed).trigger(availableNow=True).start()
    q.awaitTermination()
    return inc


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
