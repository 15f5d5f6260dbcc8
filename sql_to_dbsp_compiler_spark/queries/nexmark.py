"""Nexmark suite adaptation (reference: NexmarkTest.java — the
reference compiles Nexmark's continuous queries q0-q8 to incremental
circuits). Here each query is expressed on the `events` table as a
batch view; the streaming module evaluates the same plans
incrementally (tests/test_streaming.py asserts batch == incremental,
which is DBSP's own correctness criterion).

Mapping: bid → event (bidder=user_id, price=value, dateTime=ts);
auction category → event_type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2
from sql_to_dbsp_compiler_spark.operators.topk import topk_per_group
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table


@query(
    "nexmark_q0_passthrough",
    oracle="SELECT event_id, user_id, value, ts FROM events",
    tags=("nexmark",),
)
def nexmark_q0(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select("event_id", "user_id", "value", "ts")


@query(
    "nexmark_q1_currency",
    oracle="""
    SELECT event_id, user_id, value * 0.908 AS eur_value, ts
    FROM events
    """,
    tags=("nexmark", "map"),
)
def nexmark_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select("event_id", "user_id", (F.col("value") * 0.908).alias("eur_value"), "ts")


@query(
    "nexmark_q2_filter",
    oracle="""
    SELECT event_id, user_id, value FROM events
    WHERE user_id % 123 = 0 OR value > 99
    """,
    tags=("nexmark", "filter"),
)
def nexmark_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.where((F.col("user_id") % 123 == 0) | (F.col("value") > 99)).select(
        "event_id", "user_id", "value"
    )


@query(
    "nexmark_q3_join_filter",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase' AND c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
    tags=("nexmark", "join"),
)
def nexmark_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    )
    return e.join(c, e.user_id == c.c_custkey).select(
        "event_id", "user_id", "c_name", "c_mktsegment"
    )


@query(
    "nexmark_q4_avg_by_category",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_value,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("nexmark", "aggregate"),
)
def nexmark_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        (F.sum(dec2("value")).cast("double") / F.count(F.lit(1))).alias("avg_value"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "nexmark_q5_hot_items",
    oracle="""
    SELECT * FROM (
        SELECT day, user_id, n,
               CAST(ROW_NUMBER() OVER (PARTITION BY day ORDER BY n DESC, user_id) AS BIGINT) AS rn
        FROM (
            SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
                   user_id, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
    ) WHERE rn <= 3
    """,
    tags=("nexmark", "window", "topk"),
)
def nexmark_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot items: most active users per day (tumbling-window variant of
    Nexmark q5). Aggregation shrinks data before the window, so the
    ROW_NUMBER shuffle is over (days × users), not raw events."""
    e = load_table(spark, sf_dir, "events")
    per_day = e.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").cast("string").alias("day"),
        "user_id",
    ).agg(F.count(F.lit(1)).alias("n"))
    top = topk_per_group(per_day, ["day"], [F.col("n").desc(), F.col("user_id")], 3)
    return top.withColumn("rn", F.col("rn").cast("bigint"))


@query(
    "nexmark_q7_highest_bid",
    oracle="""
    SELECT hour, event_id, user_id, value FROM (
        SELECT date_trunc('hour', ts) AS hour, event_id, user_id, value,
               ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                  ORDER BY value DESC, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("nexmark", "window"),
)
def nexmark_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highest bid per hour window (Nexmark q7), as per-window top-1 —
    WindowGroupLimit keeps one row per (partition, hour) pre-shuffle."""
    e = load_table(spark, sf_dir, "events").withColumn("hour", F.date_trunc("hour", F.col("ts")))
    w = Window.partitionBy("hour").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("hour", "event_id", "user_id", "value")
    )


@query(
    "nexmark_q8_new_users",
    oracle="""
    SELECT user_id, first_seen FROM (
        SELECT user_id, MIN(ts) AS first_seen FROM events GROUP BY user_id
    ) WHERE first_seen >= TIMESTAMP '2024-01-01 06:00:00'
    """,
    tags=("nexmark", "aggregate"),
)
def nexmark_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("first_seen"))
        .where(F.col("first_seen") >= F.lit("2024-01-01 06:00:00").cast("timestamp"))
    )


@query(
    "tumbling_window_agg",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming-analogue", "window"),
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (batch analogue; the streaming
    version with watermark lives in streaming/windows.py and is tested
    for batch==incremental parity)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window(F.col("ts"), "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec2("value")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("window_start"), "event_type", "n", "total_value")
    )


@query(
    "hopping_window_agg",
    oracle="""
    SELECT TIMESTAMP '1970-01-01'
             + (CAST(FLOOR(EXTRACT(epoch FROM ts) / 1800) AS BIGINT) - k) * INTERVAL '30 minutes'
             AS window_start,
           COUNT(*) AS n
    FROM events CROSS JOIN (VALUES (0), (1)) AS offsets(k)
    WHERE ts < TIMESTAMP '1970-01-01'
             + (CAST(FLOOR(EXTRACT(epoch FROM ts) / 1800) AS BIGINT) - k) * INTERVAL '30 minutes'
             + INTERVAL '1 hour'
    GROUP BY 1
    """,
    tags=("streaming-analogue", "window"),
)
def hopping_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window (1h size, 30m slide): each event lands in 2
    windows. Spark's window() generates both assignments at the scan —
    no self-join, single shuffle on (window, ) keys."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window(F.col("ts"), "1 hour", "30 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "n")
    )


@query(
    "session_window_agg",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '30 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events WHERE user_id <= 30
    ), sessions AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM gaps
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
    tags=("streaming-analogue", "window"),
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap), via Spark's native
    session_window — merges adjacent events server-side with state,
    identical semantics to the gaps-and-islands SQL oracle."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 30)
    return (
        e.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("win"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "x_nexmark_q9_winning_bid",
    oracle="""
    SELECT auction, event_id, user_id, value, ts FROM (
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS auction,
               event_id, user_id, value, ts,
               ROW_NUMBER() OVER (
                   PARTITION BY CAST(json_extract_string(props, '$.k') AS BIGINT)
                   ORDER BY value DESC, ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("nexmark", "window"),
)
def x_nexmark_q9_winning_bid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended Nexmark q9 — winning bid per auction: highest value,
    earliest (ts, event_id) on ties. The auction id is carried in the
    JSON props payload, so the key extraction (get_json_object) runs
    map-side inside codegen before the one per-auction rank shuffle;
    WindowGroupLimit trims to rank-1 candidates pre-exchange."""
    e = load_table(spark, sf_dir, "events")
    auction = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    w = Window.partitionBy("auction").orderBy(
        F.col("value").desc(), F.col("ts"), F.col("event_id")
    )
    return (
        e.select(auction.alias("auction"), "event_id", "user_id", "value", "ts")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "x_nexmark_q16_channel_stats",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
           event_type AS channel,
           COUNT(*) AS total_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
           CAST(SUM(CASE WHEN value < 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS rank1_events,
           CAST(SUM(CASE WHEN value >= 10 AND value < 25 THEN 1 ELSE 0 END)
               AS BIGINT) AS rank2_events,
           CAST(SUM(CASE WHEN value >= 25 THEN 1 ELSE 0 END) AS BIGINT)
               AS rank3_events
    FROM events
    GROUP BY 1, 2
    """,
    tags=("nexmark", "aggregate"),
)
def x_nexmark_q16_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended Nexmark q16 — per-day per-channel statistics mixing
    linear aggregates, banded conditional counts, and one exact
    COUNT(DISTINCT). Shape note: the distinct forces Spark's two-phase
    expand-aggregate; the linear counts ride the same shuffle, so the
    whole statistic table is two exchanges regardless of event count."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date").cast("string")
    return e.groupBy(
        day.alias("day"), F.col("event_type").alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("total_events"),
        F.countDistinct("user_id").cast("bigint").alias("distinct_users"),
        F.sum(F.when(F.col("value") < 10, 1).otherwise(0))
        .cast("bigint")
        .alias("rank1_events"),
        F.sum(F.when((F.col("value") >= 10) & (F.col("value") < 25), 1).otherwise(0))
        .cast("bigint")
        .alias("rank2_events"),
        F.sum(F.when(F.col("value") >= 25, 1).otherwise(0))
        .cast("bigint")
        .alias("rank3_events"),
    )
