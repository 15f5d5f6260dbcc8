"""Reference-surface completion: GEOPOINT distance, TIMESTAMPDIFF,
ELEMENT/CARDINALITY — the remaining scalar surfaces the reference
exposes (reference: lib/sqllib/src/geopoint.rs ST_POINT/ST_DISTANCE
euclidean; doc/sql/datetime.rst TIMESTAMPDIFF; doc/sql/array.rst
ELEMENT/CARDINALITY)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table


@query(
    "geo_distance",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dist
    FROM (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
                 CAST(embedding[2] AS DOUBLE) AS y
          FROM embeddings WHERE vec_id <= 20) a
    JOIN (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
                 CAST(embedding[2] AS DOUBLE) AS y
          FROM embeddings WHERE vec_id <= 20) b
      ON a.vec_id < b.vec_id
    """,
    tags=("functions", "geo"),
)
def geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOPOINT surface: ST_POINT construction (a 2-double struct) and
    ST_DISTANCE = euclidean distance (reference geopoint.rs:26 uses
    geo::EuclideanDistance). Same sqrt/pow op order both engines, so
    doubles are bit-identical."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") <= 20)
    pts = e.select(
        "vec_id",
        F.struct(
            F.element_at("embedding", 1).cast("double").alias("x"),
            F.element_at("embedding", 2).cast("double").alias("y"),
        ).alias("pt"),
    )
    a = pts.select(F.col("vec_id").alias("id_a"), F.col("pt").alias("pa"))
    b = pts.select(F.col("vec_id").alias("id_b"), F.col("pt").alias("pb"))
    dx = F.col("pa.x") - F.col("pb.x")
    dy = F.col("pa.y") - F.col("pb.y")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.sqrt(dx * dx + dy * dy).alias("dist"))
    )


@query(
    "timestampdiff_units",
    oracle="""
    SELECT event_id,
           CAST(date_sub('second', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS sec_since,
           CAST(date_sub('minute', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS min_since,
           CAST(date_sub('hour',   TIMESTAMP '2024-01-01', ts) AS BIGINT) AS hr_since,
           CAST(date_sub('day',    TIMESTAMP '2024-01-01', ts) AS BIGINT) AS day_since,
           CAST(date_sub('week',   TIMESTAMP '2024-01-01', ts) AS BIGINT) AS wk_since,
           CAST(date_sub('month',  TIMESTAMP '2024-01-01', ts) AS BIGINT) AS mo_since,
           CAST(date_sub('year',   TIMESTAMP '2024-01-01', ts) AS BIGINT) AS yr_since
    FROM events WHERE event_id <= 500
    """,
    tags=("functions", "datetime"),
)
def timestampdiff_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMPDIFF = complete elapsed units, for fixed-width AND
    calendar units (reference doc/sql/datetime.rst; OtherTests.java:570
    pins MONTH: 2021-02-28 12:00 → 2021-03-28 11:59:59 is 0 months.
    DuckDB's date_sub has the same complete-units semantics, unlike
    date_diff's boundary crossings — verified for month/year too)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 500)
    t0 = "TIMESTAMP '2024-01-01'"
    return e.select(
        "event_id",
        F.expr(f"timestampdiff(SECOND, {t0}, ts)").cast("bigint").alias("sec_since"),
        F.expr(f"timestampdiff(MINUTE, {t0}, ts)").cast("bigint").alias("min_since"),
        F.expr(f"timestampdiff(HOUR, {t0}, ts)").cast("bigint").alias("hr_since"),
        F.expr(f"timestampdiff(DAY, {t0}, ts)").cast("bigint").alias("day_since"),
        F.expr(f"timestampdiff(WEEK, {t0}, ts)").cast("bigint").alias("wk_since"),
        F.expr(f"timestampdiff(MONTH, {t0}, ts)").cast("bigint").alias("mo_since"),
        F.expr(f"timestampdiff(YEAR, {t0}, ts)").cast("bigint").alias("yr_since"),
    )


@query(
    "element_cardinality",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(lang, '-')) AS BIGINT) AS n_parts,
           CASE WHEN len(string_split(lang, '-')) = 1
                THEN string_split(lang, '-')[1] END AS sole_element
    FROM documents WHERE doc_id <= 500
    """,
    tags=("functions", "array"),
)
def element_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ELEMENT (sole element of a singleton array, NULL otherwise) and
    CARDINALITY (reference doc/sql/array.rst: ELEMENT errors on >1
    element; we take the total-function variant returning NULL)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 500)
    arr = F.split(F.col("lang"), "-", -1)
    return d.select(
        "doc_id",
        F.size(arr).cast("bigint").alias("n_parts"),
        F.when(F.size(arr) == 1, F.element_at(arr, 1)).alias("sole_element"),
    )


@query(
    "datetime_floor_ceil",
    oracle="""
    WITH t AS (
        SELECT o_orderkey,
               CAST(o_orderdate AS TIMESTAMP) + INTERVAL (o_orderkey % 30) HOUR AS ts
        FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey,
           CAST(CAST(date_trunc('day', ts) AS TIMESTAMP) AS VARCHAR) AS floor_day,
           CAST(CASE WHEN date_trunc('day', ts) = ts THEN ts
                     ELSE date_trunc('day', ts) + INTERVAL 1 DAY END AS VARCHAR) AS ceil_day,
           CAST(CAST(date_trunc('month', ts) AS TIMESTAMP) AS VARCHAR) AS floor_month,
           CAST(CASE WHEN date_trunc('month', ts) = ts THEN ts
                     ELSE date_trunc('month', ts) + INTERVAL 1 MONTH END AS VARCHAR) AS ceil_month
    FROM t
    """,
    tags=("functions", "datetime"),
)
def datetime_floor_ceil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLOOR(datetime TO unit) / CEIL(datetime TO unit)
    (reference doc/sql/datetime.rst; lib/sqllib datetime rounding):
    floor = date_trunc; ceil = floor + one unit unless already on the
    boundary. All JVM-side expressions, codegen'd."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    ts = F.col("o_orderdate").cast("timestamp") + F.expr(
        "make_interval(0, 0, 0, 0, CAST(o_orderkey % 30 AS INT), 0, 0)"
    )
    t = o.select("o_orderkey", ts.alias("ts"))

    def fc(unit: str, one: str) -> tuple:
        fl = F.date_trunc(unit, F.col("ts"))
        ce = F.when(fl == F.col("ts"), F.col("ts")).otherwise(fl + F.expr(one))
        return fl.cast("string").alias(f"floor_{unit}"), ce.cast("string").alias(f"ceil_{unit}")

    fd, cd = fc("day", "INTERVAL 1 DAY")
    fm, cm = fc("month", "INTERVAL 1 MONTH")
    return t.select("o_orderkey", fd, cd, fm, cm)


@query(
    "unnest_ordinality",
    oracle="""
    SELECT o_orderkey,
           unnest(string_split(o_orderpriority, '-')) AS part,
           generate_subscripts(string_split(o_orderpriority, '-'), 1) AS ord
    FROM orders WHERE o_orderkey < 500
    """,
    tags=("relational", "flatmap"),
)
def unnest_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST ... WITH ORDINALITY (reference doc/sql/array.rst;
    ArrayTests.java:131): posexplode emits the 0-based position —
    +1 gives SQL's 1-based ordinality. DuckDB oracle spells it
    unnest + generate_subscripts."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.posexplode(F.split(F.col("o_orderpriority"), "-")).alias("pos", "part"),
    ).select(
        "o_orderkey", "part", (F.col("pos") + 1).cast("bigint").alias("ord")
    )


@query(
    "time_of_day_ops",
    oracle="""
    SELECT event_id,
           strftime(ts, '%H:%M:%S') AS hms,
           CAST(hour(ts) * 3600 + minute(ts) * 60 + CAST(floor(second(ts)) AS INT)
                AS BIGINT) AS sec_of_day,
           hour(ts) >= 12 AS pm
    FROM events WHERE event_id < 500
    """,
    tags=("functions", "datetime", "time"),
)
def time_of_day_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-of-day surface (reference DBSPTypeTime / TimeTests):
    Spark has no TIME type, so TIME values are represented as
    seconds-since-midnight (orderable, arithmetic-friendly) plus an
    HH:MM:SS rendering — the operations the reference's TIME type
    supports (extract, compare, format) all expressed over it."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    ts = F.col("ts")
    sec_of_day = (
        F.hour(ts) * 3600 + F.minute(ts) * 60 + F.floor(F.second(ts)).cast("int")
    ).cast("bigint")
    return e.select(
        "event_id",
        F.date_format(ts, "HH:mm:ss").alias("hms"),
        sec_of_day.alias("sec_of_day"),
        (F.hour(ts) >= 12).alias("pm"),
    )


@query(
    "timestampadd_units",
    oracle="""
    SELECT event_id,
           CAST(ts + INTERVAL 10 SECOND AS VARCHAR) AS plus_10s,
           CAST(ts + INTERVAL 10 MINUTE AS VARCHAR) AS plus_10min,
           CAST(ts + INTERVAL 1 HOUR AS VARCHAR) AS plus_1h,
           CAST(ts + INTERVAL 3 DAY AS VARCHAR) AS plus_3d,
           CAST(ts - INTERVAL 90 SECOND AS VARCHAR) AS minus_90s,
           CAST(CAST(ts + INTERVAL 2 MONTH AS TIMESTAMP) AS VARCHAR) AS plus_2mo
    FROM events WHERE event_id <= 400
    """,
    tags=("functions", "datetime"),
)
def timestampadd_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMPADD for fixed-width and calendar units (reference:
    TimeTests.java timestampAddTableTest — TIMESTAMPADD(SECOND/HOUR/
    MINUTE, n, ts)). Spark spells it timestampadd()/interval addition;
    results serialized as strings for exact cross-engine comparison."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") <= 400)
    return e.select(
        "event_id",
        F.expr("timestampadd(SECOND, 10, ts)").cast("string").alias("plus_10s"),
        F.expr("timestampadd(MINUTE, 10, ts)").cast("string").alias("plus_10min"),
        F.expr("timestampadd(HOUR, 1, ts)").cast("string").alias("plus_1h"),
        F.expr("timestampadd(DAY, 3, ts)").cast("string").alias("plus_3d"),
        F.expr("timestampadd(SECOND, -90, ts)").cast("string").alias("minus_90s"),
        F.expr("timestampadd(MONTH, 2, ts)").cast("string").alias("plus_2mo"),
    )
