"""Bucketed TPC-H pipelines: the orders⋈lineitem join that q3/q4/q10/
q12/q18/q21 all repeat runs with ZERO Exchange once both facts are
bucketed on orderkey — the pre-paid-shuffle (DBSPIndexOperator)
pattern at TPC-H shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.operators.aggregates import dec2
from sql_to_dbsp_compiler_spark.sources.bucketing import bucket_tpch_facts
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def _plan(df):
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    return bucket_tpch_facts(spark, sf_dir, num_buckets=8)


def _q3_shape(o, l, c):
    j = (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return j.groupBy("l_orderkey").agg(
        F.sum(dec2("l_extendedprice")).cast("double").alias("revenue")
    )


def _q18_shape(o, l):
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec2("l_quantity")).alias("q"))
        .where(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("__bk"))
    )
    return (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(big, F.col("o_orderkey") == F.col("__bk"), "left_semi")
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum(dec2("l_quantity")).cast("double").alias("total_qty"))
    )


def test_bucketed_fact_join_no_exchange(spark, bucketed):
    ob, lb = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ob.join(lb, F.col("o_orderkey") == F.col("l_orderkey")).select(
            "o_orderkey", "l_quantity"
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_q3_pipeline_matches_plain(spark, sf_dir, bucketed):
    ob, lb = bucketed
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    got = sorted(map(tuple, _q3_shape(ob, lb, c).collect()))
    want = sorted(map(tuple, _q3_shape(o, l, c).collect()))
    assert got == want


def test_bucketed_q18_pipeline_matches_plain_and_saves_exchanges(spark, sf_dir, bucketed):
    """q18 touches lineitem-by-orderkey TWICE (the HAVING aggregate and
    the join) — bucketing removes the orderkey Exchange both times."""
    ob, lb = bucketed
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_b = _plan(_q18_shape(ob, lb))
        plan_p = _plan(_q18_shape(o, l))
        assert plan_b.count("Exchange") < plan_p.count("Exchange"), (
            "bucketed q18 should need fewer shuffles"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    got = sorted(map(tuple, _q18_shape(ob, lb).collect()))
    want = sorted(map(tuple, _q18_shape(o, l).collect()))
    assert got == want
