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
