"""Salted join equivalence + incremental Z-set view equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.operators.skew import salted_join
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    plain = o.join(c, F.col("o_custkey") == F.col("c_custkey")).select(
        "o_orderkey", "c_nationkey"
    )
    salted = salted_join(o, c, "o_custkey", "c_custkey", salt=4).select(
        "o_orderkey", "c_nationkey"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
