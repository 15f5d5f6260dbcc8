"""Quantified comparisons and the UNIQUE predicate — the last rows of
the reference's comparison-operator table (reference
doc/sql/comparisons.rst: ``<OP> ANY SET``, ``<OP> ALL SET``,
``UNIQUE query``).

Spark SQL has no quantified-subquery predicate, so both are expressed
as the standard aggregate rewrites — which is also the scale-correct
plan: the inner query collapses to one row per correlation key
(min/max/count), then a broadcast join replaces the per-row subquery.
At 100 TB the subquery side never re-executes per outer row and the
join side is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table


@query(
    "quantified_any_all",
    oracle="""
    SELECT s_suppkey,
           s_acctbal > ALL (SELECT c_acctbal FROM customer c
                            WHERE c.c_nationkey = s.s_nationkey) AS gt_all,
           s_acctbal < ANY (SELECT c_acctbal FROM customer c
                            WHERE c.c_nationkey = s.s_nationkey) AS lt_any
    FROM supplier s
    """,
    tags=("relational", "subquery"),
)
def quantified_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``x > ALL (sub)`` / ``x < ANY (sub)`` with full three-valued
    logic (reference doc/sql/comparisons.rst quantified rows; Calcite
    expands these the same way). Rewrite: per correlation key compute
    min/max over non-NULL elements, the element count, and the
    non-NULL count, then

    - ``x > ALL S``: empty S → TRUE; x <= max non-NULL → FALSE;
      otherwise NULL if S contains NULL or x is NULL, else TRUE.
    - ``x < ANY S``: empty S → FALSE; x < max non-NULL → TRUE;
      otherwise NULL if S contains NULL or x is NULL, else FALSE.

    The inner aggregate is one row per nation → broadcast join, no
    per-row subquery execution.
    """
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    per_key = cust.groupBy("c_nationkey").agg(
        F.max("c_acctbal").alias("__mx"),
        F.count("c_acctbal").alias("__nn"),
        F.count(F.lit(1)).alias("__cnt"),
    )
    j = sup.join(
        F.broadcast(per_key), sup.s_nationkey == per_key.c_nationkey, "left"
    )
    cnt = F.coalesce(F.col("__cnt"), F.lit(0))
    has_null_elem = cnt > F.coalesce(F.col("__nn"), F.lit(0))
    x = F.col("s_acctbal")
    gt_all = (
        F.when(cnt == 0, F.lit(True))
        .when(x <= F.col("__mx"), F.lit(False))  # NULL-safe: NULL x stays NULL
        .when(has_null_elem | x.isNull(), F.lit(None).cast("boolean"))
        .otherwise(x > F.col("__mx"))
    )
    lt_any = (
        F.when(cnt == 0, F.lit(False))
        .when(x < F.col("__mx"), F.lit(True))
        .when(has_null_elem | x.isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.lit(False))
    )
    return j.select("s_suppkey", gt_all.alias("gt_all"), lt_any.alias("lt_any"))


@query(
    "unique_predicate",
    oracle="""
    SELECT c_custkey,
           NOT EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority IS NOT NULL
                       GROUP BY o.o_orderpriority
                       HAVING COUNT(*) > 1) AS uniq
    FROM customer c
    """,
    tags=("relational", "subquery"),
)
def unique_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``UNIQUE (query)`` — TRUE iff the correlated query result has
    no duplicate rows, ignoring NULLs (reference
    doc/sql/comparisons.rst last row). Rewrite: group the inner query
    by its full row, keep keys with any count > 1, anti-join-style
    left join + IS NULL. One aggregation + one join — no per-outer-row
    re-execution; the duplicate-key set is far smaller than the fact
    table so it broadcasts.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dup_keys = (
        orders.where(F.col("o_orderpriority").isNotNull())
        .groupBy("o_custkey", "o_orderpriority")
        .count()
        .where(F.col("count") > 1)
        .select(F.col("o_custkey").alias("__dk"))
        .distinct()
    )
    j = cust.join(
        F.broadcast(dup_keys), cust.c_custkey == F.col("__dk"), "left"
    )
    return j.select("c_custkey", F.col("__dk").isNull().alias("uniq"))


@query(
    "x_bool_predicates",
    oracle="""
    WITH b AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE o_totalprice > 150000 END AS p,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE o_orderstatus = 'F' END AS q
        FROM orders
    )
    SELECT o_orderkey,
           p IS TRUE       AS p_is_true,
           p IS NOT TRUE   AS p_is_not_true,
           p IS FALSE      AS p_is_false,
           p IS NOT FALSE  AS p_is_not_false,
           (p AND q) IS NULL AS and_unknown,
           (p OR q)  IS NULL AS or_unknown,
           (NOT p)   IS NULL AS not_unknown,
           COALESCE(p AND q, FALSE) AS and_val,
           COALESCE(p OR q, FALSE)  AS or_val
    FROM b
    """,
    tags=("functions", "boolean"),
)
def x_bool_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean test predicates IS [NOT] TRUE / IS [NOT] FALSE plus the
    three-valued AND/OR/NOT truth tables (reference
    doc/sql/boolean.rst; lib/sqllib/src/lib.rs ``is_true_b*`` /
    ``is_not_false_b*`` — note the doc's IS NOT FALSE table has a
    typo for the TRUE row; the Rust implementation and standard SQL
    agree on TRUE IS NOT FALSE = TRUE, which is what both engines
    compute here). Pure column expressions — stays inside
    whole-stage codegen, no shuffle at any scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    p = F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("boolean")).otherwise(
        F.col("o_totalprice") > 150000
    )
    q = F.when(F.col("o_orderkey") % 5 == 0, F.lit(None).cast("boolean")).otherwise(
        F.col("o_orderstatus") == "F"
    )
    b = orders.select(F.col("o_orderkey"), p.alias("p"), q.alias("q"))
    return b.select(
        "o_orderkey",
        F.expr("p IS TRUE").alias("p_is_true"),
        F.expr("p IS NOT TRUE").alias("p_is_not_true"),
        F.expr("p IS FALSE").alias("p_is_false"),
        F.expr("p IS NOT FALSE").alias("p_is_not_false"),
        F.expr("(p AND q) IS NULL").alias("and_unknown"),
        F.expr("(p OR q) IS NULL").alias("or_unknown"),
        F.expr("(NOT p) IS NULL").alias("not_unknown"),
        F.coalesce(F.expr("p AND q"), F.lit(False)).alias("and_val"),
        F.coalesce(F.expr("p OR q"), F.lit(False)).alias("or_val"),
    )
