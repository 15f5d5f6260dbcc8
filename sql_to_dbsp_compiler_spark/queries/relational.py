"""Operator-level queries: one per relational operator of the
reference's circuit vocabulary (reference:
circuit/operator/*.java — Map, Filter, Join, Aggregate, Distinct,
Sum/Subtract set ops, WindowAggregate TopK, Constant…), each with a
DuckDB oracle.

Conventions for exact cross-engine parity:
- money aggregates via DECIMAL (operators/aggregates.py);
- any LIMIT has a unique tie-breaking sort key;
- nullable integer outputs cast to DOUBLE (pandas represents both
  engines' nullable ints as float64);
- rank/count outputs cast to BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2, money_sum
from sql_to_dbsp_compiler_spark.operators.joins import anti_join, semi_join
from sql_to_dbsp_compiler_spark.operators.topk import topk_global, topk_per_group
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table


@query(
    "project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price,
           l_quantity + 1.5 AS qty_bump,
           l_extendedprice / l_quantity AS unit_price,
           -l_discount AS neg_disc,
           l_orderkey % 7 AS key_mod
    FROM lineitem
    WHERE l_orderkey <= 1000
    """,
    tags=("map",),
)
def project_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSPMapOperator: pure per-row arithmetic (double ops are
    per-row, hence bit-deterministic — only reductions need DECIMAL)."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 1000)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("disc_price"),
        (F.col("l_quantity") + 1.5).alias("qty_bump"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        (-F.col("l_discount")).alias("neg_disc"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


@query(
    "filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_quantity >= 45 AND l_returnflag = 'A'
      AND l_shipdate >= TIMESTAMP '1999-01-01'
    """,
    tags=("filter",),
)
def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSPFilterOperator: conjunctive predicates, all pushed to the
    parquet scan (verified via PushedFilters in the plan)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.where(
        (F.col("l_quantity") >= 45)
        & (F.col("l_returnflag") == "A")
        & (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")


@query(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice", "c_mktsegment"
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(o_orderkey AS DOUBLE) AS o_orderkey_d,
           o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 450000
    WHERE c_custkey <= 300
    """,
    tags=("join",),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 300)
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000)
    return c.join(o, cond, "left").select(
        "c_custkey",
        "c_name",
        F.col("o_orderkey").cast("double").alias("o_orderkey_d"),
        "o_totalprice",
    )


@query(
    "join_full",
    oracle="""
    WITH big_cust AS (
        SELECT c_nationkey AS nk, COUNT(*) AS c_cnt
        FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ), big_supp AS (
        SELECT s_nationkey AS nk, COUNT(*) AS s_cnt
        FROM supplier WHERE s_acctbal > 7000 GROUP BY s_nationkey
    )
    SELECT CAST(big_cust.nk AS DOUBLE) AS cust_nk,
           CAST(big_supp.nk AS DOUBLE) AS supp_nk,
           CAST(c_cnt AS DOUBLE) AS c_cnt,
           CAST(s_cnt AS DOUBLE) AS s_cnt
    FROM big_cust FULL OUTER JOIN big_supp ON big_cust.nk = big_supp.nk
    """,
    tags=("join",),
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("c_cnt"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 7000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("s_cnt"))
    )
    return c.join(s, c.nk == s.nk, "full_outer").select(
        c.nk.cast("double").alias("cust_nk"),
        s.nk.cast("double").alias("supp_nk"),
        F.col("c_cnt").cast("double").alias("c_cnt"),
        F.col("s_cnt").cast("double").alias("s_cnt"),
    )


@query(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
                    AND o_totalprice > 300000)
    """,
    tags=("join",),
)
def semi_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
    )
    return semi_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


@query(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 250000)
    """,
    tags=("join",),
)
def anti_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    return anti_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


@query(
    "cross_join",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    tags=("join",),
)
def cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "agg_basic",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           CAST(MIN(l_shipdate) AS TIMESTAMP) AS first_ship,
           CAST(MAX(l_shipdate) AS TIMESTAMP) AS last_ship,
           CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
    FROM lineitem
    """,
    tags=("aggregate",),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec2("l_quantity")).cast("double").alias("total_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.sum("l_orderkey").cast("bigint").alias("key_sum"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate",),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").cast("bigint").alias("n_suppliers"),
        F.countDistinct("l_partkey").cast("bigint").alias("n_parts"),
        F.sum_distinct(dec2("l_quantity")).cast("double").alias("sum_distinct_qty"),
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                FILTER (WHERE o_orderdate >= TIMESTAMP '2000-01-01') AS DOUBLE) AS recent_value
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("aggregate",),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("n_urgent"),
        F.sum(
            F.when(
                F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"),
                dec2("o_totalprice"),
            )
        )
        .cast("double")
        .alias("recent_value"),
    )


@query(
    "groupby_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
    tags=("aggregate",),
)
def groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum("o_totalprice").alias("total_spent"),
        )
        .where(F.col("n_orders") >= 15)
    )


@query(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregate",),
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum("l_extendedprice").alias("total"),
    )


@query(
    "cube_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate",),
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    tags=("distinct",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSPDistinctOperator — groupBy-based dedup, map-side partials."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "union_all",
    oracle="""
    SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind
    FROM customer WHERE c_acctbal > 9900
    UNION ALL
    SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind
    FROM supplier WHERE s_acctbal > 9000
    """,
    tags=("setop",),
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSPSumOperator (Z-set addition == UNION ALL)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9900)
        .select(F.col("c_name").alias("name"), F.col("c_acctbal").alias("acctbal"), F.lit("customer").alias("kind"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 9000)
        .select(F.col("s_name").alias("name"), F.col("s_acctbal").alias("acctbal"), F.lit("supplier").alias("kind"))
    )
    return c.unionByName(s)


@query(
    "except_op",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000
    """,
    tags=("setop",),
)
def except_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSPSubtractOperator + distinct (SQL EXCEPT)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 8000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


@query(
    "intersect_op",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 8000
    """,
    tags=("setop",),
)
def intersect_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 8000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.intersect(s)


@query(
    "orderby_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
    tags=("topk",),
)
def orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return topk_global(
        o.select("o_orderkey", "o_totalprice", "o_orderdate"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        15,
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    tags=("topk", "window"),
)
def topk_per_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-3: compiles to WindowGroupLimit (per-partition
    top-k before the shuffle — O(groups*k) exchanged)."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    df = topk_per_group(o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3)
    return df.withColumn("rn", F.col("rn").cast("bigint"))


@query(
    "scalar_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM orders)
    """,
    tags=("subquery",),
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery decorrelated to a broadcast nested-loop join —
    no .collect(): the scalar stays inside the plan."""
    o = load_table(spark, sf_dir, "orders")
    avg_df = o.agg(
        (F.sum(dec2("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("avg_all")
    )
    return (
        o.crossJoin(F.broadcast(avg_df))
        .where(F.col("o_totalprice") > 1.5 * F.col("avg_all"))
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "correlated_exists",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
    tags=("subquery", "join"),
)
def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 49)
    return o.join(l, o.o_orderkey == l.l_orderkey, "left_semi").select("o_orderkey", "o_totalprice")


@query(
    "case_expr",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 350000 THEN 'platinum'
                WHEN o_totalprice > 150000 THEN 'gold'
                ELSE 'standard' END AS tier,
           CASE o_orderstatus WHEN 'F' THEN 'final'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END AS status_name,
           CAST(CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                     THEN 1 ELSE 0 END AS BIGINT) AS is_priority
    FROM orders WHERE o_orderkey <= 2000
    """,
    tags=("map",),
)
def case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 350000, "platinum")
        .when(F.col("o_totalprice") > 150000, "gold")
        .otherwise("standard")
        .alias("tier"),
        F.when(F.col("o_orderstatus") == "F", "final")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_name"),
        F.when(
            F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"), 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("is_priority"),
    )


@query(
    "null_logic",
    oracle="""
    SELECT c_custkey,
           COALESCE(CAST(o_orderkey AS DOUBLE), -1) AS order_or_default,
           NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
           (o_orderkey IS NULL) AS no_match,
           (o_totalprice IS DISTINCT FROM c_acctbal) AS differs
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 450000
    WHERE c_custkey <= 200
    """,
    tags=("map", "null"),
)
def null_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-valued logic: COALESCE / NULLIF / IS NULL / IS DISTINCT FROM
    over outer-join nulls (reference: doc/sql/boolean.rst)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 200)
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 450000)
    return c.join(o, cond, "left").select(
        "c_custkey",
        F.coalesce(F.col("o_orderkey").cast("double"), F.lit(-1.0)).alias("order_or_default"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.col("o_orderkey").isNull().alias("no_match"),
        (~F.col("o_totalprice").eqNullSafe(F.col("c_acctbal"))).alias("differs"),
    )


@query(
    "cast_matrix",
    oracle="""
    SELECT l_orderkey,
           CAST(l_linenumber AS VARCHAR) AS line_str,
           CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(l_linenumber AS DOUBLE) AS line_d,
           CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty_dec_d,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day,
           CAST(l_quantity > 25 AS VARCHAR) AS is_bulk_str,
           CAST(CAST(CAST('2024-06-01 12:30:00' AS TIMESTAMP) AS DATE) AS VARCHAR) AS const_date
    FROM lineitem WHERE l_orderkey <= 500
    """,
    tags=("cast",),
)
def cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast lattice (reference: CastTests.java). Note double→int is
    excluded by design: Spark truncates, DuckDB rounds — engine
    semantics differ, so the engine exposes floor/round explicitly."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 500)
    return l.select(
        "l_orderkey",
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.col("l_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("l_linenumber").cast("double").alias("line_d"),
        dec2("l_quantity").cast("double").alias("qty_dec_d"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day"),
        (F.col("l_quantity") > 25).cast("string").alias("is_bulk_str"),
        F.lit("2024-06-01 12:30:00").cast("timestamp").cast("date").cast("string").alias("const_date"),
    )


@query(
    "values_constant",
    oracle="""
    SELECT CAST(a AS BIGINT) AS a, b, CAST(c AS DOUBLE) AS c
    FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', NULL)) AS t(a, b, c)
    """,
    tags=("constant",),
)
def values_constant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSPConstantOperator: inline literal relation."""
    return spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", None)],
        schema="a bigint, b string, c double",
    )


@query(
    "multi_view_reuse",
    oracle="""
    WITH per_nation AS (
        SELECT c_nationkey, COUNT(*) AS cnt FROM customer GROUP BY c_nationkey
    )
    SELECT a.c_nationkey AS nation_a, b.c_nationkey AS nation_b, a.cnt
    FROM per_nation a JOIN per_nation b
      ON a.cnt = b.cnt AND a.c_nationkey < b.c_nationkey
    """,
    tags=("multiview",),
)
def multi_view_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared subplan referenced twice (reference: MultiViewTests.java) —
    nation pairs with identical customer counts."""
    per_nation = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    a = per_nation.alias("a")
    b = per_nation.alias("b")
    return a.join(
        b,
        (F.col("a.cnt") == F.col("b.cnt")) & (F.col("a.c_nationkey") < F.col("b.c_nationkey")),
    ).select(
        F.col("a.c_nationkey").alias("nation_a"),
        F.col("b.c_nationkey").alias("nation_b"),
        F.col("a.cnt").alias("cnt"),
    )


@query(
    "pivot_agg",
    oracle="""
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
           COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_error
    FROM events
    GROUP BY 1
    """,
    tags=("aggregate", "pivot"),
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot as conditional aggregation (single shuffle, no second
    pass over the data — same plan shape Spark's own pivot() emits
    when values are pre-known)."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date").cast("string").alias("day")
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return e.groupBy(day).agg(*aggs)


@query(
    "rollup_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregate",),
)
def rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicators distinguish subtotal rows from genuine
    NULL group keys (reference Calcite surface)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "semi_join_multicol",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM lineitem k
                  WHERE k.l_quantity >= 49 AND k.l_discount > 0.09
                    AND k.l_returnflag = l.l_returnflag
                    AND k.l_linestatus = l.l_linestatus)
      AND l.l_orderkey < 3000
    """,
    tags=("join", "semi"),
)
def semi_join_multicol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-value IN subquery — multi-column semi join
    (Calcite supports (a,b) IN (SELECT …); DBSP compiles it to an
    indexed semi join on the composite key). Spark: leftsemi join on
    both columns — one shuffle on the composite key, distinct-free."""
    li = load_table(spark, sf_dir, "lineitem")
    keys = li.where((F.col("l_quantity") >= 49) & (F.col("l_discount") > 0.09)).select(
        "l_returnflag", "l_linestatus"
    )
    return (
        li.where(F.col("l_orderkey") < 3000)
        .join(keys, ["l_returnflag", "l_linestatus"], "leftsemi")
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@query(
    "grouping_sets_agg",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("aggregate",),
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind ROLLUP/CUBE —
    Calcite expands all three to the same Aggregate; Spark's Expand
    node computes every set in ONE pass over the input, map-side
    partials included)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        FROM __gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@query(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, val FROM (
        SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS val
        FROM customer WHERE c_custkey <= 500
        UNION ALL
        SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE)
        FROM customer WHERE c_custkey <= 500
        UNION ALL
        SELECT c_custkey, 'key_mod', CAST(c_custkey % 7 AS DOUBLE)
        FROM customer WHERE c_custkey <= 500
    )
    """,
    tags=("relational", "pivot"),
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide→long), the inverse of pivot_agg: Spark's
    stack()/unpivot expands k columns into k rows per input row in one
    projection — no shuffle, no join; the oracle spells it as the
    equivalent UNION ALL."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 500)
    return c.select(
        "c_custkey",
        F.expr(
            "stack(3, 'acctbal', CAST(c_acctbal AS DOUBLE), "
            "'nationkey', CAST(c_nationkey AS DOUBLE), "
            "'key_mod', CAST(c_custkey % 7 AS DOUBLE)) AS (metric, val)"
        ),
    )


@query(
    "x_lateral_topn",
    oracle="""
    SELECT n.n_name, l.c_custkey, l.c_acctbal
    FROM nation n JOIN LATERAL (
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 3) l ON true
    """,
    tags=("join", "lateral", "topk"),
)
def x_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row LIMIT (the reference
    compiles Calcite Correlate nodes to nested circuits —
    CalciteToDBSPCompiler.java:213 visitCorrelate). Spark SQL's JOIN
    LATERAL is decorrelated by Catalyst into the same
    window-rank-filter plan as an explicit per-group top-k — asserted
    equivalent to `topk_per_group` semantics by the oracle."""
    for t in ("nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name, l.c_custkey, l.c_acctbal
        FROM nation n JOIN LATERAL (
          SELECT c_custkey, c_acctbal FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 3) l
        """
    )
