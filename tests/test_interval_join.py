"""Bucketized interval join: equals the naive range join, with an
equi-join plan (no nested loop), across bucket widths including ones
much smaller/larger than the interval span."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.operators.interval_join import (
    point_in_interval_join,
)
from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.sources.tables import load_table


def _inputs(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    windows = e.where(
        (F.col("event_type") == "error") & (F.col("event_id") % 7 == 0)
    ).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_lo"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_hi"),
    )
    points = e.where(F.col("event_type") != "error").select("event_id", "ts")
    return points, windows


@pytest.mark.parametrize("bucket_s", [600, 3600, 86400])
def test_matches_naive_range_join(spark, sf_correct_dir, bucket_s):
    points, windows = _inputs(spark, sf_correct_dir)
    got = point_in_interval_join(
        points, windows, "ts", "w_lo", "w_hi", bucket_seconds=bucket_s
    ).select("event_id", "window_id")
    naive = points.join(
        windows,
        (F.col("ts") >= F.col("w_lo")) & (F.col("ts") <= F.col("w_hi")),
    ).select("event_id", "window_id")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_plan_is_equi_join_not_nested_loop(spark, sf_correct_dir):
    df = REGISTRY["x_interval_join"].fn(spark, sf_correct_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert (
        "SortMergeJoin" in plan
        or "ShuffledHashJoin" in plan
        or "BroadcastHashJoin" in plan
    )


@pytest.mark.parametrize("bucket_s", [1800, 3600, 43200])
def test_overlap_join_matches_naive(spark, sf_correct_dir, bucket_s):
    """interval×interval overlap: canonical-bucket emission yields each
    qualifying pair exactly once — equal to the naive theta join,
    duplicates included NOT."""
    from sql_to_dbsp_compiler_spark.operators.interval_join import (
        interval_overlap_join,
    )

    e = load_table(spark, sf_correct_dir, "events")
    left = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("l_id"),
        F.col("ts").alias("l_lo"),
        (F.col("ts") + F.expr("INTERVAL 3 HOURS")).alias("l_hi"),
    )
    right = e.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_lo"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("r_hi"),
    )
    got = interval_overlap_join(
        left, right, "l_lo", "l_hi", "r_lo", "r_hi", bucket_seconds=bucket_s
    ).select("l_id", "r_id")
    naive = left.join(
        right,
        (F.col("l_lo") <= F.col("r_hi")) & (F.col("r_lo") <= F.col("l_hi")),
    ).select("l_id", "r_id")
    g = sorted(map(tuple, got.collect()))
    n = sorted(map(tuple, naive.collect()))
    assert g == n
    assert len(g) == len(set(g))  # exactly-once emission
