"""Nexmark queries run as ACTUAL streams (micro-batched file source),
asserting maintained result == batch recompute — the reference's own
incremental-correctness criterion (NaiveIncrementalTests.java), plus a
rate-source demo (the reference's generator-driven NexmarkTest)."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.sources.tables import load_table
from sql_to_dbsp_compiler_spark.streaming import nexmark as nx
from sql_to_dbsp_compiler_spark.streaming.incremental import run_incremental, stream_from_dir


@pytest.fixture(scope="module")
def nx_stream_dir(spark, tmp_path_factory):
    """events split into 4 micro-batch files (round-robin by event_id,
    so every batch mixes event times — out-of-order arrival)."""
    base = tmp_path_factory.mktemp("nx_batches")
    out = str(tmp_path_factory.mktemp("nx_files"))
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    for i in range(4):
        d = os.path.join(str(base), f"b{i}")
        e.where(F.col("event_id") % 4 == i).coalesce(1).write.mode("overwrite").parquet(d)
        shutil.copy(glob.glob(os.path.join(d, "*.parquet"))[0], os.path.join(out, f"batch_{i}.parquet"))
    return out


@pytest.fixture(scope="module")
def events_schema(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events").schema


@pytest.fixture(scope="module")
def nx_ordered_dir(spark, tmp_path_factory):
    """events split into 4 CONTIGUOUS TIME RANGES (watermark-friendly:
    disorder exists only within a batch) plus a final sentinel event far
    in the future, which pushes the watermark past every real window so
    append-mode sinks flush them all. Tests filter the sentinel out."""
    base = tmp_path_factory.mktemp("nx_ordered")
    out = str(tmp_path_factory.mktemp("nx_ordered_files"))
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    bounds = ["2024-01-08", "2024-01-16", "2024-01-24"]
    ranges = [
        F.col("ts") < bounds[0],
        (F.col("ts") >= bounds[0]) & (F.col("ts") < bounds[1]),
        (F.col("ts") >= bounds[1]) & (F.col("ts") < bounds[2]),
        F.col("ts") >= bounds[2],
    ]
    for i, cond in enumerate(ranges):
        d = os.path.join(str(base), f"b{i}")
        e.where(cond).coalesce(1).write.mode("overwrite").parquet(d)
        shutil.copy(glob.glob(os.path.join(d, "*.parquet"))[0], os.path.join(out, f"batch_{i}.parquet"))
    sentinel = spark.createDataFrame(
        [(10**9, SENTINEL_TS, -1, "purchase", 0.0, "{}")],
        schema="event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).select(*[f.name for f in e.schema.fields])
    d = os.path.join(str(base), "b4")
    sentinel.coalesce(1).write.mode("overwrite").parquet(d)
    shutil.copy(glob.glob(os.path.join(d, "*.parquet"))[0], os.path.join(out, "batch_4.parquet"))
    return out


SENTINEL_TS = __import__("datetime").datetime(2024, 6, 1)
CUTOFF = "2024-03-01"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_q1_q2_stateless_stream(spark, nx_stream_dir, events_schema):
    batch = spark.read.parquet(nx_stream_dir)
    for view in (nx.q1_currency, nx.q2_filter):
        stream = stream_from_dir(spark, nx_stream_dir, events_schema)
        got = run_incremental(stream, view, output_mode="append")
        assert _rows(got) == _rows(view(batch))


def test_q3_stream_static_join(spark, nx_stream_dir, events_schema):
    customer = load_table(spark, "/root/testdata/sf0.001", "customer")
    stream = stream_from_dir(spark, nx_stream_dir, events_schema)
    got = run_incremental(stream, lambda df: nx.q3_join_filter(df, customer), output_mode="append")
    assert _rows(got) == _rows(nx.q3_join_filter(spark.read.parquet(nx_stream_dir), customer))


def test_q4_maintained_avg(spark, nx_stream_dir, events_schema):
    stream = stream_from_dir(spark, nx_stream_dir, events_schema)
    got = run_incremental(stream, nx.q4_avg_by_category, output_mode="complete")
    assert _rows(got) == _rows(nx.q4_avg_by_category(spark.read.parquet(nx_stream_dir)))


def test_q5_hot_items_two_stage(spark, nx_ordered_dir, events_schema):
    """Stage 1 streams (watermarked windowed counts, append mode —
    windows emit exactly once when the watermark closes them); stage 2
    finishes per-day top-3 over the maintained counts."""
    stream = stream_from_dir(spark, nx_ordered_dir, events_schema)
    counts = run_incremental(stream, nx.q5_hot_item_counts, output_mode="append")
    got = nx.hot_items_topk(counts.where(F.col("day") < CUTOFF), k=3)
    batch_counts = nx.q5_hot_item_counts(spark.read.parquet(nx_ordered_dir))
    want = nx.hot_items_topk(batch_counts.where(F.col("day") < CUTOFF), k=3)
    assert len(_rows(got)) > 0
    assert _rows(got) == _rows(want)


def test_q7_highest_bid_two_stage(spark, nx_ordered_dir, events_schema):
    stream = stream_from_dir(spark, nx_ordered_dir, events_schema)
    maxes = run_incremental(stream, nx.q7_window_max, output_mode="append")
    batch = spark.read.parquet(nx_ordered_dir)
    cutoff = F.lit(CUTOFF).cast("timestamp")
    got = nx.q7_attribute_bid(batch, maxes.where(F.col("hour") < cutoff))
    want = nx.q7_attribute_bid(batch, nx.q7_window_max(batch).where(F.col("hour") < cutoff))
    assert len(_rows(got)) > 0
    assert _rows(got) == _rows(want)


def test_q8_first_seen_maintained(spark, nx_stream_dir, events_schema):
    stream = stream_from_dir(spark, nx_stream_dir, events_schema)
    got = run_incremental(stream, nx.q8_first_seen, output_mode="complete")
    assert _rows(got) == _rows(nx.q8_first_seen(spark.read.parquet(nx_stream_dir)))


def test_rate_source_pipeline(spark):
    """Generator-driven stream: the rate-micro-batch source emits a
    deterministic number of rows per micro-batch; a stateless view maps
    them to the event shape. Asserts rows flow and schema holds."""
    stream = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 50)
        .option("startTimestamp", 0)
        .load()
        .select(
            F.col("value").alias("event_id"),
            (F.col("value") % 97).alias("user_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 100 / 10.0).alias("value"),
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_demo")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("rate_demo").count() >= 150:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    out = spark.table("rate_demo")
    assert out.count() >= 150
    assert set(out.columns) == {"event_id", "user_id", "ts", "value"}
    # deterministic content: event_ids are exactly 0..n-1, no gaps
    n = out.agg(F.max("event_id")).collect()[0][0]
    assert out.select("event_id").distinct().count() == n + 1
