"""Error bounds for sketch aggregates vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def test_approx_sketches_within_bounds(spark, sf_dir):
    approx = {r.l_returnflag: r for r in REGISTRY["approx_sketches"].fn(spark, sf_dir).collect()}
    l = load_table(spark, sf_dir, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.percentile(F.col("l_extendedprice"), F.lit(0.5)).alias("median_price"),
        )
        .collect()
    }
    for flag, ex in exact.items():
        ap = approx[flag]
        assert abs(ap.approx_parts - ex.parts) / ex.parts < 0.1
        assert abs(ap.approx_median_price - ex.median_price) / ex.median_price < 0.05
