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


def test_aqe_skew_join_split(spark):
    """A hot key whose shuffle partition dwarfs the median triggers
    AQE's OptimizeSkewedJoin: the final adaptive plan runs
    SortMergeJoin(skew=true), splitting the oversized partition into
    advisory-sized chunks at runtime — the dynamic complement to
    static salting (salted_join) for keys hot enough to overwhelm a
    single task. Result is identical to the logical join."""
    conf = spark.conf
    keys = [
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = conf.get(k)
        except Exception:
            saved[k] = None
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128k")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32k")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        # 4/5 of the left rows share key 0; the rest spread over 1..100
        left = spark.range(0, 250_000).select(
            F.when(F.col("id") % 5 != 0, F.lit(0))
            .otherwise((F.col("id") % 100) + 1)
            .cast("long")
            .alias("k"),
            F.rpad(F.col("id").cast("string"), 48, "x").alias("pad"),
        )
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), F.lit("r").alias("rv")
        )
        out = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.length("pad")).alias("chars")
        )
        row = out.collect()[0]
        # every left row matches exactly one right row
        assert (row["n"], row["chars"]) == (250_000, 250_000 * 48)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE did not split the skewed join:\n{plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
