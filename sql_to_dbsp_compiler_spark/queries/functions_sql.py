"""SQL function-library queries (reference: lib/sqllib/*, documented
in doc/sql/{datetime,string,integer,float,decimal,array,boolean}.rst
and tested by postgres/{Date,Numeric,Timestamp}Tests, ArrayTests,
TimeTests).

Cross-engine notes baked into these oracles:
- EXTRACT(DOW): DuckDB is 0=Sunday..6; Spark dayofweek() is 1..7 —
  aligned by subtracting 1 on the Spark side.
- exp/ln/log10/pow are libm-dependent in the last ulp → rounded to 6
  decimals on BOTH sides (sqrt is IEEE-exact, left unrounded).
- No bare DATE outputs (pandas type ambiguity) — dates go out as
  strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table


@query(
    "datetime_functions",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(year FROM ts) AS BIGINT) AS y,
           CAST(EXTRACT(month FROM ts) AS BIGINT) AS mo,
           CAST(EXTRACT(day FROM ts) AS BIGINT) AS d,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
           CAST(EXTRACT(minute FROM ts) AS BIGINT) AS mi,
           CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
           CAST(EXTRACT(doy FROM ts) AS BIGINT) AS doy,
           date_trunc('month', ts) AS month_start,
           date_trunc('hour', ts) AS hour_start,
           ts + INTERVAL 7 DAY AS week_later,
           ts - INTERVAL 90 MINUTE AS earlier,
           CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT) AS epoch_s
    FROM events WHERE event_id < 500
    """,
    tags=("functions", "datetime"),
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    ts = F.col("ts")
    return e.select(
        "event_id",
        F.year(ts).cast("bigint").alias("y"),
        F.month(ts).cast("bigint").alias("mo"),
        F.dayofmonth(ts).cast("bigint").alias("d"),
        F.hour(ts).cast("bigint").alias("h"),
        F.minute(ts).cast("bigint").alias("mi"),
        (F.dayofweek(ts) - 1).cast("bigint").alias("dow"),
        F.dayofyear(ts).cast("bigint").alias("doy"),
        F.date_trunc("month", ts).alias("month_start"),
        F.date_trunc("hour", ts).alias("hour_start"),
        (ts + F.expr("INTERVAL 7 DAY")).alias("week_later"),
        (ts - F.expr("INTERVAL 90 MINUTE")).alias("earlier"),
        F.unix_timestamp(ts).cast("bigint").alias("epoch_s"),
    )


@query(
    "datetime_trunc_groupby",
    oracle="""
    SELECT date_trunc('week', o_orderdate) AS week, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS volume
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01'
    GROUP BY 1
    """,
    tags=("functions", "datetime", "aggregate"),
)
def datetime_trunc_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return o.groupBy(F.date_trunc("week", F.col("o_orderdate")).alias("week")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec2("o_totalprice")).cast("double").alias("volume"),
    )


@query(
    "interval_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
           CAST(date_diff('month', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS months_since,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           (o_orderdate + INTERVAL 1 MONTH > TIMESTAMP '2001-08-01') AS due_next_window
    FROM orders WHERE o_orderkey <= 1000
    """,
    tags=("functions", "datetime"),
)
def interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic & date_diff (reference: doc/sql/datetime.rst;
    DuckDB date_diff counts boundary crossings, matched by Spark's
    datediff/months_between on midnight-aligned data)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    start = F.lit("1995-01-01").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), start).cast("bigint").alias("days_since_epoch_start"),
        F.floor(F.months_between(F.col("o_orderdate"), start)).cast("bigint").alias("months_since"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        ((F.col("o_orderdate") + F.expr("INTERVAL 1 MONTH")) > F.lit("2001-08-01").cast("timestamp")).alias(
            "due_next_window"
        ),
    )


@query(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           length(c_name) AS name_len,
           substring(c_name, 1, 8) AS name_prefix,
           concat(c_name, ':', c_mktsegment) AS tagged,
           replace(c_name, '#', '-') AS dashed,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           reverse(c_mktsegment) AS seg_rev,
           trim('  ' || c_mktsegment || ' ') AS seg_trim,
           split_part(c_name, '#', 1) AS name_stem,
           CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
           repeat(left(c_mktsegment, 2), 3) AS rep2,
           md5(c_name) AS name_md5,
           CAST(ascii(c_mktsegment) AS BIGINT) AS first_char_code
    FROM customer WHERE c_custkey <= 500
    """,
    tags=("functions", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("int").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("", F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("tagged"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dashed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_stem"),
        F.instr(F.col("c_name"), "#").cast("bigint").alias("hash_pos"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 3).alias("rep2"),
        F.md5(F.col("c_name").cast("binary")).alias("name_md5"),
        F.ascii(F.col("c_mktsegment")).cast("bigint").alias("first_char_code"),
    )


@query(
    "string_like_filter",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_type LIKE '%AR%' AND p_name NOT LIKE '%green%'
      AND p_brand ILIKE 'brand#1%'
    """,
    tags=("functions", "string", "filter"),
)
def string_like_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.where(
        F.col("p_type").like("%AR%")
        & ~F.col("p_name").like("%green%")
        & F.col("p_brand").ilike("brand#1%")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


@query(
    "numeric_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 50000) AS dist_from_mid,
           round(l_extendedprice, 1) AS price_r1,
           floor(l_extendedprice) AS price_floor,
           ceil(l_extendedprice) AS price_ceil,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           CAST(l_orderkey % 97 AS BIGINT) AS key_mod,
           sqrt(l_extendedprice) AS price_sqrt,
           l_quantity * l_quantity AS qty_sq,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(log10(l_extendedprice), 6) AS price_log10,
           round(exp(l_discount), 6) AS disc_exp,
           round(power(l_quantity, 1.5), 6) AS qty_pow
    FROM lineitem WHERE l_orderkey <= 800
    """,
    tags=("functions", "numeric"),
)
def numeric_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 800)
    price = F.col("l_extendedprice")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(price - 50000).alias("dist_from_mid"),
        F.round(price, 1).alias("price_r1"),
        F.floor(price).cast("double").alias("price_floor"),
        F.ceil(price).cast("double").alias("price_ceil"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        (F.col("l_orderkey") % 97).cast("bigint").alias("key_mod"),
        F.sqrt(price).alias("price_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.round(F.log(price), 6).alias("price_ln"),
        F.round(F.log10(price), 6).alias("price_log10"),
        F.round(F.exp(F.col("l_discount")), 6).alias("disc_exp"),
        F.round(F.pow(F.col("l_quantity"), 1.5), 6).alias("qty_pow"),
    )


@query(
    "decimal_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS exact_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_d,
           CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS min_exact,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS max_exact
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("functions", "decimal", "aggregate"),
)
def decimal_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL aggregation surfaced as strings — proves the
    engine's money math is exact, not float-approximate
    (reference: doc/sql/decimal.rst)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_totalprice").cast("decimal(18,2)")
    return o.groupBy("o_orderpriority").agg(
        F.sum(d).cast("decimal(38,2)").cast("string").alias("exact_total"),
        F.sum(d).cast("double").alias("total_d"),
        F.min(d).cast("string").alias("min_exact"),
        F.max(d).cast("string").alias("max_exact"),
    )


@query(
    "float_edge",
    oracle="""
    WITH v(x, label) AS (VALUES
        (CAST('NaN' AS DOUBLE), 'nan'),
        (CAST('Infinity' AS DOUBLE), 'posinf'),
        (CAST('-Infinity' AS DOUBLE), 'neginf'),
        (CAST(0.0 AS DOUBLE), 'zero'),
        (CAST(-1.5 AS DOUBLE), 'neg'))
    SELECT label, isnan(x) AS is_nan,
           (x = CAST('Infinity' AS DOUBLE)) AS is_posinf,
           (x > 1e308) AS huge,
           CAST(greatest(x, 0.0) AS DOUBLE) AS clamped
    FROM v
    """,
    tags=("functions", "float"),
)
def float_edge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN/±Inf semantics (reference: doc/sql/float.rst, fp.rst). Both
    engines treat NaN = NaN as TRUE and NaN as greatest for ordering."""
    df = spark.createDataFrame(
        [
            (float("nan"), "nan"),
            (float("inf"), "posinf"),
            (float("-inf"), "neginf"),
            (0.0, "zero"),
            (-1.5, "neg"),
        ],
        schema="x double, label string",
    )
    inf = F.lit(float("inf"))
    return df.select(
        "label",
        F.isnan("x").alias("is_nan"),
        (F.col("x") == inf).alias("is_posinf"),
        (F.col("x") > 1e308).alias("huge"),
        F.greatest(F.col("x"), F.lit(0.0)).alias("clamped"),
    )


@query(
    "array_functions",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(embedding[64] AS DOUBLE) AS last_elem,
           CAST(list_sort(list_slice(CAST(embedding AS DOUBLE[]), 1, 4))[4] AS DOUBLE) AS max_of_head,
           list_contains([1, 2, 3], CAST(label AS BIGINT)) AS label_in_123,
           array_to_string(CAST([label, label + 1, label + 2] AS BIGINT[]), ',') AS label_seq
    FROM embeddings WHERE vec_id < 100
    """,
    tags=("functions", "array"),
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops (reference: ArrayTests.java, doc/sql/array.rst).
    1-indexed element access in both engines."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 100)
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    lab = F.col("label").cast("bigint")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        F.element_at("embedding", 64).cast("double").alias("last_elem"),
        F.element_at(F.sort_array(F.slice(emb_d, 1, 4)), 4).alias("max_of_head"),
        F.array_contains(F.array(F.lit(1).cast("bigint"), F.lit(2), F.lit(3)), lab).alias("label_in_123"),
        # array VALUE is built JVM-side; serialized to a string so the
        # driver's value-hash (pandas factorize) can hash the column.
        F.array_join(
            F.transform(F.array(lab, lab + 1, lab + 2), lambda x: x.cast("string")), ","
        ).alias("label_seq"),
    )


@query(
    "array_agg_op",
    oracle="""
    SELECT c_nationkey,
           string_agg(CAST(c_custkey AS VARCHAR), ',' ORDER BY c_custkey) AS members,
           COUNT(*) AS n
    FROM customer
    WHERE c_acctbal > 9950
    GROUP BY c_nationkey
    """,
    tags=("functions", "array", "aggregate"),
)
def array_agg_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY_AGG / string_agg with deterministic ordering: collect,
    sort (numerically), then join — order-independent result."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9950)
    return c.groupBy("c_nationkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.col("c_custkey"))), lambda x: x.cast("string")
            ),
            ",",
        ).alias("members"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "flatmap_unnest",
    oracle="""
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word
    ORDER BY n DESC, word
    LIMIT 20
    """,
    tags=("flatmap",),
)
def flatmap_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSPFlatMapOperator: split → explode → count. The explode's
    output never materializes wide rows: Catalyst fuses
    split+explode+partial-count in one codegen stage."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split(F.col("text"), " ", -1)).alias("word")).where(
        F.col("word") != ""
    )
    agg = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return agg.orderBy(F.col("n").desc(), F.col("word")).limit(20)


@query(
    "json_extract_op",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           (CAST(json_extract_string(props, '$.k') AS BIGINT) % 10) AS k_bucket
    FROM events WHERE event_id < 1000
    """,
    tags=("functions", "json"),
)
def json_extract_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return e.select("event_id", k.alias("k_val"), (k % 10).alias("k_bucket"))


@query(
    "datetime_subsecond",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(millisecond FROM ts) AS BIGINT) AS ms_in_min,
           CAST(EXTRACT(microsecond FROM ts) AS BIGINT) AS us_in_min,
           CAST(EXTRACT(second FROM ts) AS BIGINT) AS sec_whole,
           CAST(epoch_us(ts) AS BIGINT) AS epoch_us
    FROM events WHERE event_id < 500
    """,
    tags=("functions", "datetime"),
)
def datetime_subsecond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-second EXTRACT units (reference doc/sql/datetime.rst:
    MILLISECOND and MICROSECOND are within-the-MINUTE values — seconds
    × 1000 / × 1e6 plus the fraction, ranges 0..59_999 and
    0..59_999_999). Spark has no MILLISECOND extract unit, so both
    derive from date_part('SECOND') (a DECIMAL with the full
    microsecond fraction — exact integer arithmetic after scaling, no
    float rounding); epoch microseconds via unix_micros."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    sec = F.expr("date_part('SECOND', ts)")  # DECIMAL(8,6) within minute
    return e.select(
        "event_id",
        F.floor(sec * 1000).cast("bigint").alias("ms_in_min"),
        (sec * 1000000).cast("bigint").alias("us_in_min"),
        F.floor(sec).cast("bigint").alias("sec_whole"),
        # parquet reads as TIMESTAMP_NTZ; session tz is pinned UTC so
        # the cast to TIMESTAMP is the identity instant
        F.unix_micros(F.col("ts").cast("timestamp")).alias("epoch_us"),
    )
