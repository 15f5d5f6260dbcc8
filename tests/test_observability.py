"""Observable metrics: Observation (batch) and observedMetrics in
streaming progress — the in-flight row-count/quality counters a
production pipeline exports without a second pass over the data."""

from __future__ import annotations

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.sources.tables import load_table


def test_batch_observation_counts_without_second_pass(spark, sf_dir):
    """df.observe() accumulates metrics DURING the action — the scan
    runs once and the observation matches a direct aggregate."""
    e = load_table(spark, sf_dir, "events")
    obs = Observation("ingest")
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.sum(F.col("value")).alias("value_sum"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("errors"),
    )
    kept = observed.where(F.col("event_type") != "error")
    n_kept = kept.count()

    direct = e.agg(
        F.count(F.lit(1)),
        F.sum("value"),
        F.count(F.when(F.col("event_type") == "error", 1)),
    ).collect()[0]
    got = obs.get
    assert got["rows_in"] == direct[0]
    assert got["value_sum"] == pytest.approx(direct[1])
    assert got["errors"] == direct[2]
    assert n_kept == direct[0] - direct[2]


def test_streaming_observed_metrics_in_progress(spark, tmp_path):
    """observe() on a stream surfaces per-batch metrics in the query
    progress — the late-row / volume counters a monitoring stack
    scrapes."""
    import glob
    import os
    import shutil

    src = str(tmp_path / "files")
    os.makedirs(src)
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    e.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "_b"))
    shutil.copy(
        glob.glob(str(tmp_path / "_b" / "*.parquet"))[0],
        os.path.join(src, "batch_0.parquet"),
    )
    from sql_to_dbsp_compiler_spark.streaming.incremental import stream_from_dir

    stream = stream_from_dir(spark, src, e.schema).observe(
        "feed", F.count(F.lit(1)).alias("rows"), F.max("ts").alias("max_ts")
    )
    q = (
        stream.groupBy("event_type")
        .count()
        .writeStream.format("memory")
        .queryName("obs_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    progresses = [p for p in q.recentProgress if p.get("observedMetrics")]
    q.awaitTermination()
    assert progresses, "no progress carried observedMetrics"
    m = progresses[-1]["observedMetrics"]["feed"]
    assert m["rows"] == e.count()
