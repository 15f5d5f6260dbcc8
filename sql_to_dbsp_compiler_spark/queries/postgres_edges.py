"""Postgres regression-bank edge queries (reference:
SQL-compiler/src/test/java/org/dbsp/sqlCompiler/compiler/postgres/
{PostgresDateTests,PostgresTimestampTests,PostgresNumericTests}.java,
themselves adapted from postgres src/test/regress). The reference
proves its runtime matches postgres on date/timestamp EXTRACT edges,
leap-year arithmetic, century/millennium boundaries, and numeric(25,10)
exact arithmetic; these queries prove the same surface on Spark with
DuckDB as the independent oracle, over the SAME canonical input rows
the postgres regression suite uses (DATE_TBL / TIMESTAMP_TBL /
num_data)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.queries.registry import query

# DATE_TBL from postgres date.sql (PostgresDateTests.java:1089 testParts).
_DATES = [
    "1957-04-09", "1957-06-13", "1996-02-28", "1996-02-29", "1996-03-01",
    "1996-03-02", "1997-02-28", "1997-03-01", "1997-03-02", "2000-04-01",
    "2000-04-02", "2000-04-03", "2038-04-08", "2039-04-09", "2040-04-10",
]

_DATE_VALUES_SQL = ", ".join(f"(DATE '{d}')" for d in _DATES) + ", (CAST(NULL AS DATE))"

# TIMESTAMP_TBL from postgres timestamp.sql (PostgresTimestampTests.java:201
# testTS), distinct values incl. fractional seconds, century spans, leap
# edges, year-boundary rows.
_TIMESTAMPS = [
    "1970-01-01 00:00:00", "1997-02-10 17:32:01", "1997-02-10 17:32:02",
    "1997-02-10 17:32:01.4", "1997-02-10 17:32:01.5", "1997-02-10 17:32:01.6",
    "1997-01-02 00:00:00", "1997-01-02 03:04:05", "1997-06-10 17:32:01",
    "2001-09-22 18:19:20", "2000-03-15 08:14:01", "2000-03-15 13:14:02",
    "2000-03-15 12:14:03", "2000-03-15 03:14:04", "2000-03-15 02:14:05",
    "1997-06-10 18:32:01", "1997-02-11 17:32:01", "1997-02-12 17:32:01",
    "1997-02-13 17:32:01", "1997-02-14 17:32:01", "1997-02-15 17:32:01",
    "1997-02-16 17:32:01", "0097-02-16 17:32:01", "0597-02-16 17:32:01",
    "1097-02-16 17:32:01", "1697-02-16 17:32:01", "1797-02-16 17:32:01",
    "1897-02-16 17:32:01", "2097-02-16 17:32:01", "1996-02-28 17:32:01",
    "1996-02-29 17:32:01", "1996-03-01 17:32:01", "1996-12-30 17:32:01",
    "1996-12-31 17:32:01", "1997-01-01 17:32:01", "1997-02-28 17:32:01",
    "1997-03-01 17:32:01", "1997-12-30 17:32:01", "1997-12-31 17:32:01",
    "1999-12-31 17:32:01", "2000-01-01 17:32:01", "2000-12-31 17:32:01",
    "2001-01-01 17:32:01", "2004-02-29 15:44:17.71393", "5000-01-01 00:00:00",
]

_TS_VALUES_SQL = (
    ", ".join(f"(TIMESTAMP '{t}')" for t in _TIMESTAMPS)
    + ", (CAST(NULL AS TIMESTAMP))"
)

# num_data from postgres numeric.sql (PostgresNumericTests.java:121
# insertData): the 10 canonical numeric(25,10) values.
_NUMS = [
    (0, "0"), (1, "0"), (2, "-34338492.215397047"), (3, "4.31"),
    (4, "7799461.4119"), (5, "16397.038491"), (6, "93901.57763026"),
    (7, "-83028485"), (8, "74881"), (9, "-24926804.045047420"),
]

_NUM_VALUES_SQL = ", ".join(f"({i}, {v})" for i, v in _NUMS)


@query(
    "postgres_date_edges",
    oracle=f"""
    SELECT CAST(d AS VARCHAR) AS d,
           CAST(date_part('year', d) AS BIGINT) AS year_f,
           CAST(date_part('month', d) AS BIGINT) AS month_f,
           CAST(date_part('day', d) AS BIGINT) AS day_f,
           CAST(date_part('quarter', d) AS BIGINT) AS quarter_f,
           CAST(FLOOR(date_part('year', d) / 10) AS BIGINT) AS decade_f,
           CAST((date_part('year', d) - 1) // 100 + 1 AS BIGINT) AS century_f,
           CAST((date_part('year', d) - 1) // 1000 + 1 AS BIGINT) AS millennium_f,
           CAST(date_part('isoyear', d) AS BIGINT) AS isoyear_f,
           CAST(date_part('week', d) AS BIGINT) AS week_f,
           CAST(date_part('dow', d) AS BIGINT) AS dow_f,
           CAST(date_part('isodow', d) AS BIGINT) AS isodow_f,
           CAST(date_part('doy', d) AS BIGINT) AS doy_f,
           CAST(epoch(d) AS BIGINT) AS epoch_f,
           CAST(d - DATE '2000-01-01' AS BIGINT) AS days_from_2k
    FROM (VALUES {_DATE_VALUES_SQL}) v(d)
    """,
    tags=("edge", "datetime", "postgres"),
)
def postgres_date_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PostgresDateTests.java testParts/testDiff/testCentury*: every
    EXTRACT field over the postgres DATE_TBL, including the fields
    Spark spells differently — decade/century/millennium via explicit
    year arithmetic ((y-1) div 100 + 1 so 2000 stays century 20),
    postgres dow (Sunday=0) from Spark's dayofweek (Sunday=1), isodow
    (Monday=1) from weekday (Monday=0), epoch seconds via unix_date,
    and date subtraction as day counts. NULL row propagates NULL in
    every field. All pure column expressions — JVM codegen,
    no shuffle."""
    rows = [(d,) for d in _DATES] + [(None,)]
    df = spark.createDataFrame(rows, schema="d string").select(
        F.col("d").cast("date").alias("d")
    )
    y = F.year("d").cast("bigint")
    return df.select(
        # string-typed key column: date/timestamp objects canonicalize
        # differently across pandas paths; strings compare exactly
        F.col("d").cast("string").alias("d"),
        y.alias("year_f"),
        F.month("d").cast("bigint").alias("month_f"),
        F.dayofmonth("d").cast("bigint").alias("day_f"),
        F.quarter("d").cast("bigint").alias("quarter_f"),
        F.floor(y / 10).cast("bigint").alias("decade_f"),
        (((y - 1) / 100).cast("bigint") + 1).alias("century_f"),
        (((y - 1) / 1000).cast("bigint") + 1).alias("millennium_f"),
        F.expr("extract(YEAROFWEEK FROM d)").cast("bigint").alias("isoyear_f"),
        F.weekofyear("d").cast("bigint").alias("week_f"),
        (F.dayofweek("d") - 1).cast("bigint").alias("dow_f"),
        (F.weekday("d") + 1).cast("bigint").alias("isodow_f"),
        F.dayofyear("d").cast("bigint").alias("doy_f"),
        (F.unix_date(F.col("d")).cast("bigint") * 86400).alias("epoch_f"),
        F.datediff(F.col("d"), F.lit("2000-01-01").cast("date"))
        .cast("bigint")
        .alias("days_from_2k"),
    )


@query(
    "postgres_timestamp_edges",
    oracle=f"""
    SELECT CAST(ts AS VARCHAR) AS ts,
           CAST(date_part('year', ts) AS BIGINT) AS year_f,
           CAST(date_part('month', ts) AS BIGINT) AS month_f,
           CAST(date_part('day', ts) AS BIGINT) AS day_f,
           CAST(date_part('hour', ts) AS BIGINT) AS hour_f,
           CAST(date_part('minute', ts) AS BIGINT) AS minute_f,
           CAST(date_part('second', ts) AS BIGINT) AS second_f,
           CAST(date_part('quarter', ts) AS BIGINT) AS quarter_f,
           CAST(date_part('week', ts) AS BIGINT) AS week_f,
           CAST(date_part('dow', ts) AS BIGINT) AS dow_f,
           CAST(date_part('isodow', ts) AS BIGINT) AS isodow_f,
           CAST(date_part('doy', ts) AS BIGINT) AS doy_f,
           CAST((date_part('year', ts) - 1) // 100 + 1 AS BIGINT) AS century_f,
           CAST(FLOOR(date_part('year', ts) / 10) AS BIGINT) AS decade_f,
           CAST(date_part('microseconds', ts) AS BIGINT) AS micros_of_minute,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
           CAST(CAST(date_trunc('week', ts) AS TIMESTAMP) AS VARCHAR) AS week_trunc,
           CAST(FLOOR((epoch(TIMESTAMP '1997-01-02 00:00:00') - epoch(ts)) / 60)
                AS BIGINT) AS full_minutes_to_19970102
    FROM (VALUES {_TS_VALUES_SQL}) v(ts)
    """,
    tags=("edge", "datetime", "postgres"),
)
def postgres_timestamp_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PostgresTimestampTests.java testDatePart/testQuarter/testDay/
    testCenturies/testMicroseconds/testWeek/diff/testLargeYear: EXTRACT
    fields over the postgres TIMESTAMP_TBL (fractional seconds, century
    spans back to 0097, leap edges, year 5000), postgres 'microseconds'
    = within-minute seconds*1e6+micros (pmod keeps pre-epoch rows
    positive), FLOOR(ts TO WEEK) Monday truncation, and full-minute
    differences computed as floored epoch arithmetic so both engines
    use elapsed-period (not boundary-crossing) semantics."""
    rows = [(t,) for t in _TIMESTAMPS] + [(None,)]
    df = spark.createDataFrame(rows, schema="ts string").select(
        F.col("ts").cast("timestamp").alias("ts")
    )
    y = F.year("ts").cast("bigint")
    ep_micros = F.unix_micros(F.col("ts"))
    ref_ep = F.unix_micros(F.lit("1997-01-02 00:00:00").cast("timestamp"))
    return df.select(
        # strings, not timestamps: year-0097/5000 rows overflow pandas
        # ns timestamps in Arrow conversion, and strings compare exactly
        F.col("ts").cast("string").alias("ts"),
        y.alias("year_f"),
        F.month("ts").cast("bigint").alias("month_f"),
        F.dayofmonth("ts").cast("bigint").alias("day_f"),
        F.hour("ts").cast("bigint").alias("hour_f"),
        F.minute("ts").cast("bigint").alias("minute_f"),
        F.second("ts").cast("bigint").alias("second_f"),
        F.quarter("ts").cast("bigint").alias("quarter_f"),
        F.weekofyear("ts").cast("bigint").alias("week_f"),
        (F.dayofweek("ts") - 1).cast("bigint").alias("dow_f"),
        (F.weekday("ts") + 1).cast("bigint").alias("isodow_f"),
        F.dayofyear("ts").cast("bigint").alias("doy_f"),
        (((y - 1) / 100).cast("bigint") + 1).alias("century_f"),
        F.floor(y / 10).cast("bigint").alias("decade_f"),
        F.pmod(ep_micros, F.lit(60000000)).cast("bigint").alias("micros_of_minute"),
        F.floor(ep_micros / 1000000).cast("bigint").alias("epoch_s"),
        F.date_trunc("week", F.col("ts")).cast("string").alias("week_trunc"),
        F.floor((ref_ep - ep_micros) / 60000000).cast("bigint").alias(
            "full_minutes_to_19970102"
        ),
    )


@query(
    "postgres_numeric_edges",
    oracle=f"""
    WITH num_data AS (
        SELECT id, CAST(val AS DECIMAL(25,10)) AS val
        FROM (VALUES {_NUM_VALUES_SQL}) v(id, val)
    )
    SELECT CAST(a.id AS BIGINT) AS id1, CAST(b.id AS BIGINT) AS id2,
           CAST(CAST(a.val + b.val AS DECIMAL(30,10)) AS VARCHAR) AS sum_exact,
           CAST(CAST(a.val - b.val AS DECIMAL(30,10)) AS VARCHAR) AS diff_exact,
           CAST(CAST(round(CAST(a.val AS DECIMAL(18,9)) * CAST(b.val AS DECIMAL(18,9)), 10)
                AS DECIMAL(38,10)) AS VARCHAR) AS prod_exact,
           round(CAST(a.val AS DOUBLE) / CAST(NULLIF(b.val, 0) AS DOUBLE), 6) + 0.0 AS div_round,
           round(sqrt(abs(CAST(a.val AS DOUBLE))), 6) AS sqrt_round,
           round(ln(abs(CAST(NULLIF(a.val, 0) AS DOUBLE))), 6) AS ln_round,
           round(log10(abs(CAST(NULLIF(a.val, 0) AS DOUBLE))), 6) AS log10_round
    FROM num_data a CROSS JOIN num_data b
    """,
    tags=("edge", "numeric", "postgres"),
)
def postgres_numeric_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PostgresNumericTests.java num_data add/sub/mul/div/sqrt/ln/log10
    expectation tables: the 10 canonical numeric(25,10) values crossed
    pairwise. Add/sub exact at DECIMAL(30,10); products computed at
    DECIMAL(18,9) operands so the exact (37,18) result fits both
    engines' 38-digit cap before rounding to scale 10 (postgres rounds
    half-away-from-zero; so do Spark round and DuckDB round);
    division/sqrt/ln/log10 in IEEE double rounded to 6 — postgres's
    NaN-for-0/0 becomes NULL via NULLIF, matching the reference's
    NULL adaptation (PostgresNumericTests.java:118)."""
    num = spark.createDataFrame(_NUMS, schema="id int, val string").select(
        "id", F.col("val").cast("decimal(25,10)").alias("val")
    )
    a = num.select(F.col("id").alias("id1"), F.col("val").alias("va"))
    b = num.select(F.col("id").alias("id2"), F.col("val").alias("vb"))
    va_d, vb_d = F.col("va").cast("double"), F.col("vb").cast("double")
    vb_nz = F.nullif(F.col("vb"), F.lit(0).cast("decimal(25,10)")).cast("double")
    va_nz = F.nullif(F.col("va"), F.lit(0).cast("decimal(25,10)")).cast("double")
    return a.crossJoin(b).select(
        F.col("id1").cast("bigint").alias("id1"),
        F.col("id2").cast("bigint").alias("id2"),
        # exact decimal arithmetic serialized as full-scale decimal
        # strings: decimal→double conversion differs in the last ulp
        # between engines, decimal→string is exact in both
        (F.col("va") + F.col("vb"))
        .cast("decimal(30,10)")
        .cast("string")
        .alias("sum_exact"),
        (F.col("va") - F.col("vb"))
        .cast("decimal(30,10)")
        .cast("string")
        .alias("diff_exact"),
        F.round(
            F.col("va").cast("decimal(18,9)") * F.col("vb").cast("decimal(18,9)"), 10
        )
        .cast("decimal(38,10)")
        .cast("string")
        .alias("prod_exact"),
        # + 0.0 normalizes IEEE -0.0 (0 / negative) to +0.0 in both engines
        (F.round(va_d / vb_nz, 6) + F.lit(0.0)).alias("div_round"),
        F.round(F.sqrt(F.abs(va_d)), 6).alias("sqrt_round"),
        F.round(F.log(F.abs(va_nz)), 6).alias("ln_round"),
        F.round(F.log10(F.abs(va_nz)), 6).alias("log10_round"),
    )
