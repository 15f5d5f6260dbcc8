"""NULL grouping/partition keys in optimized incremental operators.

SQL GROUP BY and window PARTITION BY place NULL keys in a single
group, but Spark name-list joins use null-unsafe equality — before the
null-safe fix, NULL-keyed state rows were never recomputed into the
fresh output nor retracted from the stored one, so the optimized path
silently diverged from naive/batch recompute (ADVICE r2, high)."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_to_dbsp_compiler_spark.plans.incremental import (
    IncrementalGroupRecomputeAgg,
    IncrementalPartitionedWindow,
    IncrementalTopK,
)
from sql_to_dbsp_compiler_spark.plans.zset import WEIGHT, ZSet


def _zset(spark, schema, rows):
    return ZSet(spark.createDataFrame(rows, schema + f", {WEIGHT} long"))


def _rows(z: ZSet) -> set[tuple]:
    return {tuple(r) for r in z.consolidate().df.collect()}


def _integrate(acc, d):
    return d if acc is None else acc.add(d)


def _null_key_steps(seed: int, nsteps: int):
    """Insert/delete stream over (k, v) where k is frequently NULL."""
    rng = random.Random(seed)
    live: list[tuple] = []
    steps = []
    for _ in range(nsteps):
        delta = []
        for _ in range(rng.randint(1, 5)):
            if live and rng.random() < 0.3:
                row = live.pop(rng.randrange(len(live)))
                delta.append((*row, -1))
            else:
                row = (rng.choice([None, 1, 2]), rng.randint(0, 50))
                live.append(row)
                delta.append((*row, 1))
        steps.append((delta, list(live)))
    return steps


@pytest.mark.slow
def test_partitioned_window_null_partition_key(spark):
    op = IncrementalPartitionedWindow(
        part_keys=["k"],
        select_items=[
            "k",
            "v",
            "sum(v) over (partition by k) as total",
            "row_number() over (partition by k order by v, k) as rn",
        ],
        checkpoint_every=2,
    )
    acc = None
    for delta, live in _null_key_steps(11, 5):
        acc = _integrate(acc, op.step(_zset(spark, "k int, v int", delta)))
        snap = spark.createDataFrame(live, "k int, v int")
        expect = snap.selectExpr(
            "k",
            "v",
            "sum(v) over (partition by k) as total",
            "row_number() over (partition by k order by v, k) as rn",
        )
        assert _rows(acc) == _rows(ZSet.from_df(expect)), "NULL-partition rows diverged"
    assert _rows(ZSet.from_df(op.snapshot())) == _rows(acc)


@pytest.mark.slow
def test_topk_null_group_key(spark):
    op = IncrementalTopK(keys=["k"], order=[F.col("v").desc()], k=2, checkpoint_every=2)
    acc = None
    for delta, live in _null_key_steps(13, 5):
        acc = _integrate(acc, op.step(_zset(spark, "k int, v int", delta)))
        snap = spark.createDataFrame(live, "k int, v int")
        win = Window.partitionBy("k").orderBy(F.col("v").desc())
        expect = snap.withColumn("rn", F.row_number().over(win).cast("bigint")).where(
            F.col("rn") <= 2
        )
        assert _rows(acc) == _rows(ZSet.from_df(expect)), "NULL-group topk diverged"


@pytest.mark.slow
def test_group_recompute_null_group_key(spark):
    op = IncrementalGroupRecomputeAgg(
        keys=["k"], aggs=[F.max("v").alias("mx"), F.min("v").alias("mn")], checkpoint_every=2
    )
    acc = None
    for delta, live in _null_key_steps(17, 5):
        acc = _integrate(acc, op.step(_zset(spark, "k int, v int", delta)))
        snap = spark.createDataFrame(live, "k int, v int")
        expect = snap.groupBy("k").agg(F.max("v").alias("mx"), F.min("v").alias("mn"))
        assert _rows(acc) == _rows(ZSet.from_df(expect)), "NULL-group agg diverged"
