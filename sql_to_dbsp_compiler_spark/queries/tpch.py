"""TPC-H-style headline queries, adapted to the trimmed test schema.

These exercise the reference's core pipeline — scan → filter → join →
aggregate → sort/limit (reference: ComplexQueriesTest.java runs
similarly-shaped multi-join analytics views). Money arithmetic follows
the DECIMAL-exact convention in operators/aggregates.py so results are
identical under any degree of parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2, one_minus, one_plus
from sql_to_dbsp_compiler_spark.operators.joins import dim_join
from sql_to_dbsp_compiler_spark.operators.topk import topk_global
from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table

# SQL fragment: exact-decimal discounted price, cast to DOUBLE on SUM.
_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)
_CHARGE = f"({_DISC_PRICE}) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"


def _disc_price() -> F.Column:
    return dec2("l_extendedprice") * one_minus("l_discount")


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
        CAST(SUM({_CHARGE}) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("headline", "aggregate"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: full-scan groupBy with 6 aggregates.

    Scale: partial aggregation (map-side combine) reduces each input
    partition to <=|groups| rows before the shuffle; the shuffle moves
    O(partitions * groups) rows regardless of input size.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    cnt = F.count(F.lit(1))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec2("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
        F.sum(_disc_price() * one_plus("l_tax")).cast("double").alias("sum_charge"),
        (F.sum(dec2("l_quantity")).cast("double") / cnt).alias("avg_qty"),
        (F.sum(dec2("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
        (F.sum(dec2("l_discount")).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
        CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
        o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("headline", "join", "topk"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: selective filters on both join sides, then
    top-10. Filters are pushed below the joins by Catalyst; order has a
    unique tiebreaker (l_orderkey) so LIMIT is deterministic. The
    orders⋈lineitem join is pinned sort-merge: a filtered fact is
    still O(fact) and must never be the broadcast build side (see
    tpch_q5; measured 2.4x→1.2x at 10x data, faster at sf0.1 too)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    joined = c.join(o, c.c_custkey == o.o_custkey).join(
        l.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(_disc_price()).cast("double").alias("revenue")
    )
    return topk_global(
        agg.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority"),
        [F.col("revenue").desc(), F.col("l_orderkey")],
        10,
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n_name, CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    tags=("headline", "join", "aggregate"),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-table join. The region predicate is
    pushed THROUGH the join graph before any big shuffle: nation⋈ASIA
    folds into the supplier broadcast, and customers are pruned by a
    broadcast semi-join on the ASIA nation set — Catalyst cannot infer
    that c_nationkey must be an ASIA nation from the transitive
    c_nationkey = s_nationkey chain, so doing it explicitly cuts the
    customer⋈orders⋈lineitem shuffle volume ~5x (the dominant cost at
    cluster scale). Only the three fact tables shuffle, each on its
    natural key. The orders⋈lineitem fact-fact join is PINNED to
    sort-merge: with column pruning, lineitem's size estimate slips
    under the broadcast threshold at mid scales and Catalyst
    broadcast the ENTIRE fact table — a single-threaded hash-relation
    build that made sf1 wall superlinear (measured 3.3x for 10x data;
    SMJ is 1.2x and 2x faster at BOTH scales). A fact table must
    never be on the build side regardless of what the estimate says;
    SMJ shuffles both sides on the join key and spills, the canonical
    fact-fact strategy at 100 TB."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")

    asia = n.join(r, F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", "n_name"
    )
    s2 = dim_join(s, asia, F.col("s_nationkey") == F.col("n_nationkey"))
    c2 = c.join(
        F.broadcast(asia.select(F.col("n_nationkey").alias("__nk"))),
        F.col("c_nationkey") == F.col("__nk"),
        "left_semi",
    )
    joined = (
        c2.join(o, c2.c_custkey == o.o_custkey)
        .join(l.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    joined = dim_join(
        joined,
        s2,
        (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
    )
    return joined.groupBy("n_name").agg(F.sum(_disc_price()).cast("double").alias("revenue"))


@query(
    "tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("headline", "filter", "aggregate"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue change: pure scan-filter-aggregate. All four
    predicates reach the parquet reader as PushedFilters; no shuffle at
    all beyond the final single-row reduce."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec2("l_extendedprice") * dec2("l_discount", 3)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
        CAST(SUM({_DISC_PRICE}) AS DOUBLE) AS revenue,
        CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("headline", "join", "topk"),
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting: top-20 customers by lost revenue.
    The orders⋈lineitem join is pinned sort-merge — the returnflag
    filter keeps ~25% of the fact table, which must never be the
    broadcast build side (see tpch_q5; measured 3.0x→1.7x at 10x
    data, faster at sf0.1 too)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    joined = dim_join(joined, n, F.col("c_nationkey") == F.col("n_nationkey"))
    agg = joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        F.sum(_disc_price()).cast("double").alias("revenue")
    )
    return topk_global(
        agg.select("c_custkey", "c_name", "revenue", F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name"),
        [F.col("revenue").desc(), F.col("c_custkey")],
        20,
    )
