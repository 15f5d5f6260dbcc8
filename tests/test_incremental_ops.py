"""Optimized-incremental operators vs naive recompute (the reference's
OptimizedIncrementalTests criterion): for random insert/delete step
sequences, the integral of the operator's output deltas equals the
batch query over the integrated input — at every step."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.plans.incremental import (
    AggSpec,
    IncrementalDistinct,
    IncrementalFilterMap,
    IncrementalJoin,
    IncrementalLinearAgg,
)
from sql_to_dbsp_compiler_spark.plans.zset import WEIGHT, ZSet


def _zset(spark, schema, rows):
    return ZSet(spark.createDataFrame(rows, schema + f", {WEIGHT} long"))


def _rows(z: ZSet) -> set[tuple]:
    return {tuple(r) for r in z.consolidate().df.collect()}


def _integrate(acc: ZSet | None, d: ZSet) -> ZSet:
    return d if acc is None else acc.add(d)


def _random_steps(seed: int, nsteps: int, keyspace: int):
    """Insert/delete step stream over (k, v, tag) rows; deletes only
    remove rows currently live (valid multiset evolution)."""
    rng = random.Random(seed)
    live: list[tuple] = []
    steps = []
    for _ in range(nsteps):
        delta = []
        for _ in range(rng.randint(1, 6)):
            if live and rng.random() < 0.35:
                row = live.pop(rng.randrange(len(live)))
                delta.append((*row, -1))
            else:
                row = (
                    rng.randrange(keyspace),
                    rng.choice([None, rng.randint(-50, 100)]),
                    rng.choice(["x", "y"]),
                )
                live.append(row)
                delta.append((*row, 1))
        steps.append((delta, list(live)))
    return steps


def test_incremental_filter_map(spark):
    op = IncrementalFilterMap(
        cols=[F.col("k"), (F.col("v") * 2).alias("v2")], cond=F.col("v") > 10
    )
    acc = None
    for delta, live in _random_steps(1, 6, 5):
        d = _zset(spark, "k int, v int, tag string", delta)
        acc = _integrate(acc, op.step(d))
    snap = spark.createDataFrame(live, "k int, v int, tag string")
    expect = ZSet.from_df(snap.where(F.col("v") > 10).select("k", (F.col("v") * 2).alias("v2")))
    assert _rows(acc) == _rows(expect)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [7, 42])
def test_incremental_linear_agg_every_step(spark, seed):
    op = IncrementalLinearAgg(
        keys=["k"],
        specs=[
            AggSpec("n", "count"),
            AggSpec("nv", "count", F.col("v")),
            AggSpec("sv", "sum", F.col("v")),
            AggSpec("av", "avg", F.col("v")),
        ],
        cond=F.col("tag") != "skip",
        checkpoint_every=2,
    )
    acc = None
    for delta, live in _random_steps(seed, 6, 3):
        d = _zset(spark, "k int, v int, tag string", delta)
        acc = _integrate(acc, op.step(d))
        snap = spark.createDataFrame(live, "k int, v int, tag string")
        expect = (
            snap.where(F.col("tag") != "skip")
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count("v").alias("nv"),
                F.sum("v").alias("sv"),
                F.avg("v").alias("av"),
            )
        )
        assert _rows(acc) == _rows(ZSet.from_df(expect)), f"step diverged (seed={seed})"
    # snapshot() equals the integral too
    assert _rows(ZSet.from_df(op.snapshot())) == _rows(acc)


def test_incremental_linear_agg_all_null_sum_group(spark):
    """A group whose values are all NULL must keep SUM/AVG NULL (not
    0) — and flip to a number when a non-null value arrives."""
    op = IncrementalLinearAgg(keys=["k"], specs=[AggSpec("s", "sum", F.col("v"))])
    d1 = _zset(spark, "k int, v int", [(1, None, 1), (1, None, 1)])
    acc = op.step(d1)
    assert _rows(acc) == {(1, None, 1)}
    d2 = _zset(spark, "k int, v int", [(1, 5, 1)])
    acc = acc.add(op.step(d2))
    assert _rows(acc) == {(1, 5, 1)}
    d3 = _zset(spark, "k int, v int", [(1, 5, -1)])
    acc = acc.add(op.step(d3))
    assert _rows(acc) == {(1, None, 1)}


@pytest.mark.slow
def test_incremental_join_every_step(spark):
    op = IncrementalJoin(
        on=F.col("ak") == F.col("bk"),
        project=[F.col("ak").alias("k"), F.col("av"), F.col("bv")],
        checkpoint_every=2,
    )
    rng = random.Random(3)
    a_live: list[tuple] = []
    b_live: list[tuple] = []
    acc = None
    for _ in range(5):
        da, db = [], []
        for _ in range(rng.randint(1, 4)):
            if a_live and rng.random() < 0.3:
                row = a_live.pop(rng.randrange(len(a_live)))
                da.append((*row, -1))
            else:
                row = (rng.randrange(3), rng.randint(0, 9))
                a_live.append(row)
                da.append((*row, 1))
            if b_live and rng.random() < 0.3:
                row = b_live.pop(rng.randrange(len(b_live)))
                db.append((*row, -1))
            else:
                row = (rng.randrange(3), rng.randint(0, 9))
                b_live.append(row)
                db.append((*row, 1))
        acc = _integrate(
            acc,
            op.step(_zset(spark, "ak int, av int", da), _zset(spark, "bk int, bv int", db)),
        )
        asnap = spark.createDataFrame(a_live, "ak int, av int")
        bsnap = spark.createDataFrame(b_live, "bk int, bv int")
        expect = asnap.join(bsnap, asnap["ak"] == bsnap["bk"]).select(
            F.col("ak").alias("k"), "av", "bv"
        )
        assert _rows(acc) == _rows(ZSet.from_df(expect))


def test_incremental_distinct(spark):
    op = IncrementalDistinct(checkpoint_every=2)
    s = "k int, tag string"
    # row appears (weight 2), partial delete keeps it distinct-visible,
    # full delete retracts it
    d1 = op.step(_zset(spark, s, [(1, "x", 2), (2, "y", 1)]))
    assert _rows(ZSet(d1.df)) == {(1, "x", 1), (2, "y", 1)}
    d2 = op.step(_zset(spark, s, [(1, "x", -1)]))
    assert _rows(ZSet(d2.df)) == set()  # multiplicity 2→1: still present
    d3 = op.step(_zset(spark, s, [(1, "x", -1), (3, "z", 1)]))
    assert _rows(ZSet(d3.df)) == {(1, "x", -1), (3, "z", 1)}


@pytest.mark.slow
@pytest.mark.parametrize("seed", [5, 19])
def test_incremental_group_recompute_minmax(spark, seed):
    """MIN/MAX maintained by affected-group recompute: every step's
    integrated output equals the batch aggregate, including deletes
    of current extrema (the case no subtraction rule can handle)."""
    from sql_to_dbsp_compiler_spark.plans.incremental import IncrementalGroupRecomputeAgg

    op = IncrementalGroupRecomputeAgg(
        keys=["k"],
        aggs=[
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.count(F.lit(1)).alias("n"),
        ],
        checkpoint_every=2,
    )
    acc = None
    for delta, live in _random_steps(seed, 6, 3):
        d = _zset(spark, "k int, v int, tag string", delta)
        acc = _integrate(acc, op.step(d))
        snap = spark.createDataFrame(live, "k int, v int, tag string")
        expect = snap.groupBy("k").agg(
            F.min("v").alias("mn"), F.max("v").alias("mx"), F.count(F.lit(1)).alias("n")
        )
        assert _rows(acc) == _rows(ZSet.from_df(expect)), f"diverged (seed={seed})"
    assert _rows(ZSet.from_df(op.snapshot())) == _rows(acc)


def test_group_recompute_delete_of_max(spark):
    """Deleting the maximum forces recompute from remaining rows."""
    from sql_to_dbsp_compiler_spark.plans.incremental import IncrementalGroupRecomputeAgg

    op = IncrementalGroupRecomputeAgg(keys=["k"], aggs=[F.max("v").alias("mx")])
    s = "k int, v int"
    d1 = op.step(_zset(spark, s, [(1, 5, 1), (1, 9, 1), (2, 3, 1)]))
    assert _rows(ZSet(d1.df)) == {(1, 9, 1), (2, 3, 1)}
    d2 = op.step(_zset(spark, s, [(1, 9, -1)]))
    assert _rows(ZSet(d2.df)) == {(1, 9, -1), (1, 5, 1)}
    d3 = op.step(_zset(spark, s, [(2, 3, -1)]))  # group disappears
    assert _rows(ZSet(d3.df)) == {(2, 3, -1)}


@pytest.mark.slow
def test_incremental_topk_every_step(spark):
    """Per-group Top-2 under inserts and deletes of top elements:
    integrated deltas == batch ROW_NUMBER topk at every step."""
    from pyspark.sql.window import Window

    from sql_to_dbsp_compiler_spark.plans.incremental import IncrementalTopK

    op = IncrementalTopK(
        keys=["k"], order=[F.col("v").desc(), F.col("tag")], k=2, checkpoint_every=2
    )
    rng = random.Random(23)
    live: list[tuple] = []
    acc = None
    for _ in range(6):
        delta = []
        for _ in range(rng.randint(1, 5)):
            if live and rng.random() < 0.35:
                row = live.pop(rng.randrange(len(live)))
                delta.append((*row, -1))
            else:
                row = (rng.randrange(3), rng.randint(0, 50), f"t{rng.randrange(40)}")
                live.append(row)
                delta.append((*row, 1))
        acc = _integrate(acc, op.step(_zset(spark, "k int, v int, tag string", delta)))
        snap = spark.createDataFrame(live, "k int, v int, tag string")
        win = Window.partitionBy("k").orderBy(F.col("v").desc(), F.col("tag"))
        expect = (
            snap.withColumn("rn", F.row_number().over(win).cast("bigint"))
            .where(F.col("rn") <= 2)
        )
        assert _rows(acc) == _rows(ZSet.from_df(expect))
    assert _rows(ZSet.from_df(op.snapshot())) == _rows(acc)
