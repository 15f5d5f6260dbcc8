"""Co-located join via bucketing: same results, no Exchange."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.sources.bucketing import read_table, write_bucketed
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    write_bucketed(o, "orders_b", "o_orderkey", 8)
    write_bucketed(
        l.withColumnRenamed("l_orderkey", "lk"), "lineitem_b", "lk", 8
    )
    ob, lb = read_table(spark, "orders_b"), read_table(spark, "lineitem_b")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, F.col("o_orderkey") == F.col("lk")).select(
            "o_orderkey", "l_linenumber", "o_totalprice", "l_quantity"
        )
        plan = spark._jvm.PythonSQLUtils.explainString(joined._jdf.queryExecution(), "formatted")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not re-shuffle either side"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # and it is the same relation the plain join produces
    plain = o.join(l, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderkey", "l_linenumber", "o_totalprice", "l_quantity"
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
