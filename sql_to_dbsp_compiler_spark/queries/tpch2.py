"""Second TPC-H-style wave + as-of join: groupwise-max decorrelation,
EXISTS with predicates, nation-pair volume, conditional aggregation,
promo-share ratio, HAVING + join-back, disjunctive predicates, NOT-IN
flavors (reference: ComplexQueriesTest.java, EndToEndTests.java)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2
from sql_to_dbsp_compiler_spark.operators.asof import asof_join_backward
from sql_to_dbsp_compiler_spark.operators.joins import dim_join
from sql_to_dbsp_compiler_spark.operators.topk import topk_global
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.queries.tpch import _DISC_PRICE, _disc_price
from sql_to_dbsp_compiler_spark.sources.tables import load_table


@query(
    "groupwise_max_correlated",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier s
    WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                       WHERE s2.s_nationkey = s.s_nationkey)
    """,
    tags=("subquery", "tpch2"),
)
def groupwise_max_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: correlated 'equal to group max' subquery,
    decorrelated to a window max (single shuffle — no join back)."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey")
    return (
        s.withColumn("__mx", F.max("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("__mx"))
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )


@query(
    "tpch_q4_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    tags=("tpch2", "subquery"),
)
def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q4: EXISTS with a cross-table predicate → semi join on key with
    the time predicate inside the join condition. The semi join's
    right side is the FULL lineitem fact — pinned sort-merge so it is
    never the broadcast build side (see tpch_q5; measured 6.1x→~1x
    at 10x data)."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(l.hint("merge"), cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q7_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_6', 'NATION_9') AND n2.n_name IN ('NATION_7', 'NATION_11')
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY 1, 2, 3
    """,
    tags=("tpch2", "join"),
)
def tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.where(F.col("n_name").isin("NATION_6", "NATION_9")).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.where(F.col("n_name").isin("NATION_7", "NATION_11")).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        # lineitem⋈orders is fact-fact: pinned sort-merge (see
        # tpch_q5). customer is left to Catalyst — its estimate is
        # honest (no pruning-induced underestimate), so the broadcast
        # self-corrects to SMJ as the table grows (measured faster at
        # both sf0.1 and sf1 unhinted).
        .join(o.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
    )
    j = dim_join(j, n1, F.col("s_nationkey") == F.col("n1_key"))
    j = dim_join(j, n2, F.col("c_nationkey") == F.col("n2_key"))
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
    ).agg(F.sum(_disc_price()).cast("double").alias("revenue"))


@query(
    "tpch_q12_conditional",
    oracle="""
    SELECT l_linestatus,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
    GROUP BY l_linestatus
    """,
    tags=("tpch2", "aggregate"),
)
def tpch_q12_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        # fact-fact join pinned sort-merge (see tpch_q5)
        o.join(l.hint("merge"), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_share",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_DISC_PRICE}
                              ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
               / CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1998-03-01' AND l_shipdate < TIMESTAMP '1998-04-01'
    """,
    tags=("tpch2", "aggregate"),
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    j = dim_join(l, p, F.col("l_partkey") == F.col("p_partkey"))
    promo = F.when(F.col("p_type").like("PROMO%"), _disc_price()).otherwise(
        F.lit(0).cast("decimal(16,4)")
    )
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(promo).cast("double")
            / F.sum(_disc_price()).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("tpch2", "subquery", "topk"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18: IN-subquery over a HAVING aggregate → aggregate once, semi
    join the fact tables against the qualifying key set. The
    orders⋈(semi-filtered lineitem) join is pinned sort-merge — the
    semi output is still O(fact) and must never be the broadcast
    build side (see tpch_q5; measured faster at both sf0.1 and sf1)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    j = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l.join(big.withColumnRenamed("l_orderkey", "__bk"),
                     F.col("l_orderkey") == F.col("__bk"), "left_semi")
              .hint("merge"),
              F.col("o_orderkey") == F.col("l_orderkey"))
    )
    agg = j.groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice").agg(
        F.sum(dec2("l_quantity")).cast("double").alias("total_qty")
    )
    return topk_global(agg, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 25)


@query(
    "tpch_q19_disjunctive",
    oracle=f"""
    SELECT CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
    tags=("tpch2", "filter"),
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q19: OR-of-ANDs across both join sides — Catalyst pushes the
    common per-side conjuncts below the join."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = dim_join(l, p, F.col("p_partkey") == F.col("l_partkey"))
    c1 = (F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21)
    c2 = (F.col("p_brand") == "Brand#22") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30)
    c3 = (F.col("p_brand") == "Brand#33") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40)
    return j.where(c1 | c2 | c3).agg(
        F.sum(_disc_price()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "tpch_q22_idle_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS a
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_nationkey
    """,
    tags=("tpch2", "subquery"),
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22: scalar subquery + anti join + aggregate."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (F.sum(dec2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("a")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("a"))
    recent = o.where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
    idle = rich.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(dec2("c_acctbal")).cast("double").alias("totacctbal"),
    )


@query(
    "asof_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice
    FROM (SELECT *, ts + INTERVAL 9125 DAY AS shifted_ts FROM events) e
    ASOF LEFT JOIN (
        SELECT * FROM orders
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                   ORDER BY o_orderkey DESC) = 1
    ) o ON e.user_id = o.o_custkey AND e.shifted_ts >= o.o_orderdate
    """,
    tags=("asof", "join"),
)
def asof_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each event picks the customer's most recent
    order at-or-before the event time (events shifted into the orders'
    date range). Union-sort-carry implementation — one shuffle, no
    range self-join; DuckDB's native ASOF JOIN is the oracle."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "shifted_ts", F.col("ts") + F.expr("INTERVAL 9125 DAY")
    )
    o = load_table(spark, sf_dir, "orders")
    # dedup ties on (custkey, orderdate) so "the most recent order" is
    # well-defined in both engines
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(F.col("o_orderkey").desc())
    o = o.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    out = asof_join_backward(
        e,
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        left_key="user_id",
        right_key="o_custkey",
        left_ts="shifted_ts",
        right_ts="o_orderdate",
        right_payload=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


@query(
    "y_asof_tolerance",
    oracle="""
    SELECT e.event_id, e.user_id,
           CASE WHEN e.shifted_ts - o.o_orderdate <= INTERVAL 30 DAY
                THEN o.o_orderkey END AS last_orderkey,
           CASE WHEN e.shifted_ts - o.o_orderdate <= INTERVAL 30 DAY
                THEN o.o_totalprice END AS last_totalprice
    FROM (SELECT *, ts + INTERVAL 9125 DAY AS shifted_ts FROM events) e
    ASOF LEFT JOIN (
        SELECT * FROM orders
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                   ORDER BY o_orderkey DESC) = 1
    ) o ON e.user_id = o.o_custkey AND e.shifted_ts >= o.o_orderdate
    """,
    tags=("asof", "join"),
)
def y_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness TOLERANCE (pandas merge_asof
    semantics; the variant every feature-store point-in-time join
    needs so a years-old record can't leak into a fresh example): the
    carried match is kept only when it is at most 30 days older than
    the event. Same union-sort-carry plan as asof_join — the bound is
    a post-carry predicate on the carried timestamp, not a range
    join. Oracle: DuckDB's native ASOF JOIN with the gap CASE'd to
    NULL."""
    e = load_table(spark, sf_dir, "events").withColumn(
        "shifted_ts", F.col("ts") + F.expr("INTERVAL 9125 DAY")
    )
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    o = o.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    out = asof_join_backward(
        e,
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        left_key="user_id",
        right_key="o_custkey",
        left_ts="shifted_ts",
        right_ts="o_orderdate",
        right_payload=["o_orderkey", "o_totalprice"],
        tolerance="INTERVAL 30 DAY",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )
