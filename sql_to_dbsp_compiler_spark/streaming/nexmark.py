"""Nexmark continuous queries as actual Structured Streaming views
(reference: NexmarkTest.java — the reference compiles Nexmark q0-q8 to
incremental circuits and feeds deltas; here the same view functions
run over a micro-batched stream AND over the full batch, and the tests
assert the maintained result equals the batch recompute).

Each builder takes the events DataFrame (streaming or batch — the plan
is identical, which is the point: one declarative view, two execution
modes) and returns the view. Streaming-illegal constructs (ROW_NUMBER,
chained aggregates) are decomposed into a maintained aggregate stage +
a finishing stage, the reference's multi-view chaining
(MultiViewTests.java).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2
from sql_to_dbsp_compiler_spark.streaming.event_time import with_event_time_watermark


def q1_currency(events: DataFrame) -> DataFrame:
    """Stateless map — runs in append mode with zero state."""
    return events.select(
        "event_id", "user_id", (F.col("value") * 0.908).alias("eur_value"), "ts"
    )


def q2_filter(events: DataFrame) -> DataFrame:
    """Stateless filter — append mode, zero state."""
    return events.where((F.col("user_id") % 123 == 0) | (F.col("value") > 99)).select(
        "event_id", "user_id", "value"
    )


def q3_join_filter(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join: the static dim is broadcast per micro-batch
    (ΔA ⋈ B — DBSP's bilinear join rule with one constant side)."""
    e = events.where(F.col("event_type") == "purchase")
    c = customer.where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
    return e.join(F.broadcast(c), e.user_id == c.c_custkey).select(
        "event_id", "user_id", "c_name", "c_mktsegment"
    )


def q4_avg_by_category(events: DataFrame) -> DataFrame:
    """Maintained per-category average (update/complete mode). The state
    is one (sum, count) pair per category — fixed size, scale-safe."""
    return events.groupBy("event_type").agg(
        (F.sum(dec2("value")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
    )


def q5_hot_item_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Stage 1 of hot-items: maintained count per (day window, user).
    Watermarked append mode — state is bounded to windows in flight.
    Stage 2 (per-window top-k) is a finishing view over this maintained
    aggregate; streaming forbids chained aggregates in one query, so the
    pipeline mirrors the reference's view-over-view chaining."""
    agged = (
        with_event_time_watermark(events, "ts", watermark)
        .groupBy(F.window(F.col("ts"), "1 day").alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return agged.select(
        F.col("win.start").cast("date").cast("string").alias("day"), "user_id", "n"
    )


def hot_items_topk(counts: DataFrame, k: int = 3) -> Column | DataFrame:
    """Stage 2 of hot-items: per-day top-k over the maintained counts
    (batch finishing view — runs on the continuously-maintained sink)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("day").orderBy(F.col("n").desc(), F.col("user_id"))
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= k)
    )


def q7_window_max(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stage 1 of highest-bid: maintained per-hour max value, append
    mode once the watermark passes the window end."""
    return (
        with_event_time_watermark(events, "ts", watermark)
        .groupBy(F.window(F.col("ts"), "1 hour").alias("win"))
        .agg(F.max("value").alias("max_value"))
        .select(F.col("win.start").alias("hour"), "max_value")
    )


def q7_attribute_bid(events_batch: DataFrame, maxes: DataFrame) -> DataFrame:
    """Stage 2 of highest-bid: join the maintained per-window max back
    to the events to recover the winning bid row (ties broken by min
    event_id, deterministic)."""
    e = events_batch.withColumn("hour", F.date_trunc("hour", F.col("ts")))
    j = e.join(maxes, (e.hour == maxes.hour) & (e.value == maxes.max_value)).select(
        e.hour, "event_id", "user_id", "value"
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("hour").orderBy("event_id")
    return (
        j.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    )


def q8_first_seen(events: DataFrame) -> DataFrame:
    """Maintained MIN(ts) per user (complete mode) — one timestamp of
    state per user."""
    return events.groupBy("user_id").agg(F.min("ts").alias("first_seen"))
