"""Window (OVER-clause) queries — the reference's
DBSPWindowAggregateOperator surface (reference:
circuit/operator/DBSPWindowAggregateOperator.java; window tests appear
through Nexmark q5/q7).

Determinism rules: RANK/DENSE_RANK over non-unique orderings are
well-defined (functions of the key only); ROW_NUMBER is only used over
total orderings; running sums accumulate in DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table


@query(
    "window_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_custkey,
           CAST(RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_custkey) AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_custkey) AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER (ORDER BY o_orderkey) AS BIGINT) AS quartile
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_custkey")
    wq = Window.orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_custkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(wq).cast("bigint").alias("quartile"),
    )


@query(
    "window_lag",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           LAG(o_totalprice, 2, -1.0) OVER w AS prev2_or_default,
           o_totalprice - COALESCE(LAG(o_totalprice) OVER w, o_totalprice) AS delta
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window",),
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_or_default"),
        (F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice"))).alias("delta"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS lifetime_value,
           CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nth_order
    FROM orders WHERE o_custkey <= 100
    """,
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals — the batch analogue of DBSP's Integral operator
    (reference: circuit/operator/DBSPIntegralOperator.java)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") <= 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("lifetime_value"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("nth_order"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderdate,
           CAST(COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
                               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS orders_to_date,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS volume_to_date
    FROM orders WHERE o_orderkey <= 1500
    """,
    tags=("window",),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: peers (same o_orderdate) enter the frame together —
    well-defined under ties, unlike a ROWS frame on a partial order."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1500)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.count(F.lit(1)).over(w).cast("bigint").alias("orders_to_date"),
        F.sum(dec2("o_totalprice")).over(w).cast("double").alias("volume_to_date"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT event_id, user_id, value,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
            / CAST(COUNT(*) OVER w AS DOUBLE) AS moving_avg3
    FROM events WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (moving average), computed as exact SUM ÷
    COUNT so the result is frame-order deterministic."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        "value",
        (
            F.sum(dec2("value")).over(w).cast("double")
            / F.count(F.lit(1)).over(w).cast("double")
        ).alias("moving_avg3"),
    )


@query(
    "fraud_features_windows",
    oracle="""
    SELECT event_id, user_id,
           CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
           CASE WHEN COUNT(*) OVER w1h > 0
                THEN CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w1h AS DOUBLE)
                          / COUNT(*) OVER w1h AS DOUBLE) END AS avg_1h,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w1h AS DOUBLE) AS sum_1h,
           CAST(COUNT(*) OVER w24 AS BIGINT) AS cnt_24h
    FROM events WHERE user_id <= 30
    WINDOW
      w1h AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
              RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING),
      w24 AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
              RANGE BETWEEN 86400 PRECEDING AND 1 PRECEDING)
    """,
    tags=("window", "complex"),
)
def fraud_features_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's fraud-detection feature view
    (ComplexQueriesTest.java demographicsTest/fraudDetectionTest /
    smallTaxiTest): per-key sliding TIME-RANGE frames over epoch
    seconds that EXCLUDE the current row (`RANGE BETWEEN 3600
    PRECEDING AND 1 PRECEDING` — "activity before this transaction"),
    plus DAYOFWEEK feature extraction. Peers (same epoch second) enter
    frames together so the result is tie-stable; averages accumulate
    in DECIMAL and guard the empty-frame case (first event per user
    has COUNT 0 — NULL average, not a division error)."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 30)
    epoch = F.unix_timestamp("ts")
    w1h = Window.partitionBy("user_id").orderBy(epoch).rangeBetween(-3600, -1)
    w24 = Window.partitionBy("user_id").orderBy(epoch).rangeBetween(-86400, -1)
    s1 = F.sum(dec2("value")).over(w1h)
    c1 = F.count(F.lit(1)).over(w1h)
    return e.select(
        "event_id",
        "user_id",
        F.dayofweek("ts").cast("int").alias("dow"),
        F.when(c1 > 0, (s1.cast("double") / c1).cast("double")).alias("avg_1h"),
        s1.cast("double").alias("sum_1h"),
        F.count(F.lit(1)).over(w24).cast("bigint").alias("cnt_24h"),
    )


@query(
    "window_distribution_fns",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           round(PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey), 8) AS pct_rank,
           round(CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey), 8) AS cume,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_key,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
           NTH_VALUE(o_orderkey, 3) OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_key
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("window",),
)
def window_distribution_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution/navigation window functions: PERCENT_RANK,
    CUME_DIST, FIRST/LAST/NTH_VALUE over an explicit unbounded frame
    (LAST_VALUE under the default frame is the current row — the
    classic trap; the explicit frame makes it the true partition last
    in both engines). Unique ORDER BY key → deterministic."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
        F.first("o_orderkey").over(wf).alias("first_key"),
        F.last("o_orderkey").over(wf).alias("last_key"),
        F.nth_value("o_orderkey", 3).over(wf).alias("third_key"),
    )


@query(
    "x_window_ignore_nulls",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id,
               CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
        FROM events WHERE user_id <= 40
    )
    SELECT event_id, user_id,
           lag(v IGNORE NULLS) OVER (PARTITION BY user_id
                                     ORDER BY event_id) AS prev_v,
           lead(v IGNORE NULLS) OVER (PARTITION BY user_id
                                      ORDER BY event_id) AS next_v,
           last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
                                            ORDER BY event_id) AS locf_v,
           first_value(v IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS first_obs,
           nth_value(v, 2 IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_obs
    FROM e
    """,
    tags=("window", "nulls"),
)
def x_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2011 null-treatment clause across the navigation family —
    LAG/LEAD/LAST_VALUE (running LOCF)/FIRST_VALUE/NTH_VALUE, all
    IGNORE NULLS over a synthesized NULL-bearing measure. Both
    engines default to RESPECT NULLS, and the clause sits in
    different syntactic positions (Spark: after the call; DuckDB:
    inside it) — exactly the divergence territory the SLT bank also
    pins; this registry twin makes it driver-auditable. One window
    shuffle, all frames share the (user_id, event_id) sort."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 40)
    v = F.when(F.col("event_type") == "click", F.lit(None)).otherwise(
        F.col("value")
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base = e.select("event_id", "user_id", v.alias("v"))
    # lag/lead don't expose ignoreNulls in the Python API — SQL form
    nav = F.expr(
        "lag(v) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY event_id)"
    )
    nxt = F.expr(
        "lead(v) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY event_id)"
    )
    return base.select(
        "event_id",
        "user_id",
        nav.alias("prev_v"),
        nxt.alias("next_v"),
        F.last("v", ignorenulls=True).over(w).alias("locf_v"),
        F.first("v", ignorenulls=True).over(wf).alias("first_obs"),
        F.nth_value("v", 2, ignoreNulls=True).over(wf).alias("second_obs"),
    ).drop("v")


@query(
    "y_window_distinct_count",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(COUNT(DISTINCT event_type) OVER w AS BIGINT)
               AS distinct_types_5,
           CAST(COUNT(DISTINCT event_type) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
               AS distinct_types_run
    FROM events WHERE user_id <= 40
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "distinct"),
)
def y_window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT …) OVER a sliding ROWS frame and a running
    frame — a window shape Spark's Catalyst REJECTS natively
    (DISTINCT_WINDOW_FUNCTION_UNSUPPORTED). The BOUNDED 5-row frame is
    size(array_distinct(collect_list() OVER w)): collect_list is
    frame-bounded (≤5 elements), so distinctness is computed per frame
    JVM-side with zero Python and no self-join. The RUNNING frame is
    the linear-state spelling (VERDICT r6 #2 — collect_list over
    UNBOUNDED PRECEDING keeps every duplicate, O(prefix) array per
    row, quadratic per partition): a FIRST-OCCURRENCE flag
    (ROW_NUMBER() OVER (PARTITION BY user_id, event_type) = 1) summed
    by a running SUM — distinct-so-far = #first-occurrences-so-far.
    Both windows are ordinary streaming-frame aggregates with O(1)
    state per row; a hot user with millions of events costs two sorts,
    never an O(n²) array build. Behavioral dedup per sliding window =
    session-diversity features for fraud/quality scoring. DuckDB
    evaluates the DISTINCT window aggregate natively — the oracle is
    the ANSI spelling of the same result."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") <= 40)
    wtype = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w5 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    # (ts, event_id) is a unique ordering, so ROWS unbounded-to-current
    # equals the oracle's default RANGE frame (peers are singletons)
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.withColumn(
        "__first", (F.row_number().over(wtype) == 1).cast("bigint")
    )
    return flagged.select(
        "event_id",
        "user_id",
        "event_type",
        F.size(F.array_distinct(F.collect_list("event_type").over(w5)))
        .cast("bigint")
        .alias("distinct_types_5"),
        F.sum("__first").over(wrun).cast("bigint").alias("distinct_types_run"),
    )
