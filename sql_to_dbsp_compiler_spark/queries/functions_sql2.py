"""Second function-surface wave: array ops II, strftime-style
formatting (via functions/ helpers), multi-CTE pipeline
(reference: ArrayTests.java, ComplexQueriesTest.java's chained-CTE
vulnerability pipeline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.functions import (
    dow_sunday0,
    floor_div,
    format_timestamp,
    position_in,
    split_part_1,
    trunc_div,
)
from sql_to_dbsp_compiler_spark.operators.aggregates import dec2
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table


@query(
    "array_functions2",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
               WHERE vec_id < 50)
    SELECT vec_id,
           CAST(list_position(v, v[3]) AS BIGINT) AS pos_of_third,
           CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_positive,
           CAST(list_sum(list_transform(v, x -> CAST(x > 0 AS INT))) AS BIGINT) AS n_positive2,
           round(list_aggregate(v, 'sum'), 6) AS vsum,
           CAST(v[1] + v[2] AS DOUBLE) AS head2_sum,
           list_contains(v, 0.0) AS has_zero,
           array_to_string(CAST(flatten([[label], [label + 1]]) AS BIGINT[]), ',') AS flat_pair
    FROM e
    """,
    tags=("functions", "array"),
)
def array_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface II: position/filter/transform/flatten/fold
    (reference: ArrayTests.java)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    lab = F.col("label").cast("bigint")
    return e.select(
        "vec_id",
        F.array_position(v, F.element_at(v, 3)).cast("bigint").alias("pos_of_third"),
        F.size(F.filter(v, lambda x: x > 0)).cast("bigint").alias("n_positive"),
        F.aggregate(
            F.transform(v, lambda x: (x > 0).cast("int")), F.lit(0), lambda acc, x: acc + x
        )
        .cast("bigint")
        .alias("n_positive2"),
        F.round(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x), 6).alias("vsum"),
        (F.element_at(v, 1) + F.element_at(v, 2)).alias("head2_sum"),
        F.array_contains(v, F.lit(0.0)).alias("has_zero"),
        # flatten runs JVM-side; string-serialized for the driver hash.
        F.array_join(
            F.transform(
                F.flatten(F.array(F.array(lab), F.array(lab + 1))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("flat_pair"),
    )


@query(
    "strftime_format",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d') AS day_str,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS full_str,
           strftime(ts, '%j') AS doy_str,
           CAST(CAST(EXTRACT(dow FROM ts) AS BIGINT) AS VARCHAR) AS dow_str,
           CAST(FLOOR(EXTRACT(epoch FROM ts)) AS BIGINT) AS epoch_s,
           CAST(FLOOR(EXTRACT(epoch FROM ts) / 3600) AS BIGINT) AS epoch_hours
    FROM events WHERE event_id < 300
    """,
    tags=("functions", "datetime"),
)
def strftime_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strftime-style output formatting via functions/datetime_fns
    (C-style directives mapped onto Spark date_format patterns)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") < 300)
    ts = F.col("ts")
    return e.select(
        "event_id",
        format_timestamp(ts, "%Y-%m-%d").alias("day_str"),
        format_timestamp(ts, "%Y-%m-%d %H:%M:%S").alias("full_str"),
        format_timestamp(ts, "%j").alias("doy_str"),
        dow_sunday0(ts).cast("string").alias("dow_str"),
        F.unix_timestamp(ts).cast("bigint").alias("epoch_s"),
        floor_div(F.unix_timestamp(ts), F.lit(3600)).alias("epoch_hours"),
    )


@query(
    "split_position_functions",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 1) AS first_word,
           split_part(p_name, ' ', 99) AS oob_word,
           CAST(strpos(p_type, 'O') AS BIGINT) AS o_pos,
           CAST(strpos(p_type, 'zzz') AS BIGINT) AS missing_pos,
           CAST(TRUNC(CAST(p_size AS DOUBLE) / 7) AS BIGINT) AS size_trunc_div
    FROM part WHERE p_partkey <= 400
    """,
    tags=("functions", "string"),
)
def split_position_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") <= 400)
    return p.select(
        "p_partkey",
        split_part_1(F.col("p_name"), " ", 1).alias("first_word"),
        split_part_1(F.col("p_name"), " ", 99).alias("oob_word"),
        position_in("O", F.col("p_type")).alias("o_pos"),
        position_in("zzz", F.col("p_type")).alias("missing_pos"),
        trunc_div(F.col("p_size"), F.lit(7)).alias("size_trunc_div"),
    )


@query(
    "cte_pipeline",
    oracle="""
    WITH revenue_per_order AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                    AS DOUBLE) AS rev
        FROM lineitem GROUP BY l_orderkey
    ),
    customer_rev AS (
        SELECT o_custkey, CAST(SUM(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS total_rev,
               COUNT(*) AS n_orders
        FROM orders JOIN revenue_per_order ON o_orderkey = l_orderkey
        GROUP BY o_custkey
    ),
    nation_rev AS (
        SELECT c_nationkey, CAST(SUM(CAST(total_rev AS DECIMAL(18,4))) AS DOUBLE) AS nation_total,
               CAST(SUM(n_orders) AS BIGINT) AS nation_orders
        FROM customer JOIN customer_rev ON c_custkey = o_custkey
        GROUP BY c_nationkey
    )
    SELECT n_name, nation_total, nation_orders
    FROM nation JOIN nation_rev ON n_nationkey = c_nationkey
    """,
    tags=("multiview", "aggregate"),
)
def cte_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained-CTE rollup pipeline (reference: ComplexQueriesTest's
    multi-stage vulnerability views): order → customer → nation
    revenue, each stage an aggregate over the previous. Re-aggregation
    casts to DECIMAL(18,4) so every stage stays exact."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")

    rev_per_order = l.groupBy("l_orderkey").agg(
        F.sum(dec2("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec2("l_discount", 3)))
        .cast("double")
        .alias("rev")
    )
    cust_rev = (
        o.join(rev_per_order, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("rev").cast("decimal(18,4)")).cast("double").alias("total_rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    nation_rev = (
        c.join(cust_rev, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_nationkey")
        .agg(
            F.sum(F.col("total_rev").cast("decimal(18,4)")).cast("double").alias("nation_total"),
            F.sum("n_orders").cast("bigint").alias("nation_orders"),
        )
    )
    return n.join(nation_rev, F.col("n_nationkey") == F.col("c_nationkey")).select(
        "n_name", "nation_total", "nation_orders"
    )


@query(
    "explode_split",
    oracle="""
    SELECT o_orderkey, unnest(string_split(o_orderpriority, '-')) AS part
    FROM orders WHERE o_orderkey <= 300
    """,
    tags=("flatmap",),
)
def explode_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlatMap over a computed array: split then explode
    (reference: DBSPFlatMapOperator)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey", F.explode(F.split(F.col("o_orderpriority"), "-", -1)).alias("part")
    )


@query(
    "string_functions2",
    oracle="""
    SELECT c_custkey,
           chr(65 + CAST(c_custkey % 26 AS INT)) AS letter,
           right(c_name, 3) AS name_tail,
           left(c_name, 4) AS name_head,
           rpad(c_mktsegment, 12, '.') AS seg_padded,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_translated,
           concat_ws('|', c_name, c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS joined
    FROM customer WHERE c_custkey <= 300
    """,
    tags=("functions", "string"),
)
def string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface II: chr/left/right/rpad/translate/concat_ws.
    (initcap and OVERLAY exist in Spark but not DuckDB 1.0, so they
    are excluded from this oracle; BOTH are value-verified through
    the SLT dual-engine bank via compiler/slt.py:to_duck_dialect,
    which expands them into DuckDB-expressible compositions.)"""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    return c.select(
        "c_custkey",
        F.char(F.lit(65) + (F.col("c_custkey") % 26).cast("int")).alias("letter"),
        F.expr("right(c_name, 3)").alias("name_tail"),
        F.expr("left(c_name, 4)").alias("name_head"),
        F.rpad(F.col("c_mktsegment"), 12, ".").alias("seg_padded"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("seg_translated"),
        F.concat_ws(
            "|", F.col("c_name"), F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("joined"),
    )


@query(
    "trim_variants",
    oracle="""
    SELECT s,
           ltrim(s, 'x') AS ltrim_x,
           rtrim(s, 'xy') AS rtrim_xy,
           trim(s, 'x') AS btrim_x,
           ltrim(s) AS ltrim_ws,
           rtrim(s) AS rtrim_ws,
           trim(s) AS trim_ws,
           CAST(length(trim(s, 'xy')) AS BIGINT) AS btrim_len
    FROM (VALUES ('xxhelloxx'), ('xyhixyx'), ('  padded  '), ('xyx'),
                 (''), ('no-trim-chars')) v(s)
    """,
    tags=("functions", "string"),
)
def trim_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI TRIM(LEADING/TRAILING/BOTH <chars> FROM s) — character-SET
    semantics (every char in the trim set strips, not the literal
    substring), whitespace defaults, full-strip to empty string
    (reference: doc/sql/string.rst TRIM; Calcite spells the ANSI
    forms, Spark accepts them via TRIM(... FROM ...) expressions,
    DuckDB spells them ltrim/rtrim/trim(s, chars))."""
    rows = [("xxhelloxx",), ("xyhixyx",), ("  padded  ",), ("xyx",),
            ("",), ("no-trim-chars",)]
    df = spark.createDataFrame(rows, schema="s string")
    return df.select(
        "s",
        F.expr("TRIM(LEADING 'x' FROM s)").alias("ltrim_x"),
        F.expr("TRIM(TRAILING 'xy' FROM s)").alias("rtrim_xy"),
        F.expr("TRIM(BOTH 'x' FROM s)").alias("btrim_x"),
        F.ltrim(F.col("s")).alias("ltrim_ws"),
        F.rtrim(F.col("s")).alias("rtrim_ws"),
        F.trim(F.col("s")).alias("trim_ws"),
        F.length(F.expr("TRIM(BOTH 'xy' FROM s)")).cast("bigint").alias("btrim_len"),
    )
