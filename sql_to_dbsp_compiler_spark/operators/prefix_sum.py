"""Distributed prefix sums: two-phase running totals that avoid the
single-reducer sort a plain `SUM() OVER (PARTITION BY k ORDER BY ...)`
costs when one partition key dominates.

A windowed running sum puts every row of a key through ONE task's
sort. With few, huge keys (a mixture cut over 5 sources at 100 TB)
that is the canonical skew bottleneck. The classic fix is the
two-phase prefix sum:

  phase 1 — bucket rows by a PREFIX of the sort key (here: the first
  two hex chars of the md5 order hash, so bucket order == sort
  order), aggregate each bucket's total — a tiny (key × 256) table;
  compute each bucket's EXCLUSIVE offset with a window over that tiny
  table (driver-scale, broadcast back).

  phase 2 — running sum WITHIN each (key, bucket) — 256× the
  parallelism, bounded partition size — plus the broadcast offset.

The result is row-identical to the single-window form; the equality
is pinned in tests/test_prefix_sum.py at two SFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_BUCKET_HEX = 2  # 256 buckets from the md5 prefix


def prefix_sum_by_hash(
    df: DataFrame,
    key: str,
    hash_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cum",
) -> DataFrame:
    """Running SUM(value_col) over (PARTITION BY key ORDER BY
    hash_col, *order_cols), computed as a two-phase prefix sum.
    `hash_col` must be a hex string (md5); buckets are its first two
    chars, so bucketing refines the sort order exactly."""
    b = df.withColumn("__bkt", F.substring(F.col(hash_col), 1, _BUCKET_HEX))

    # phase 1: per-(key, bucket) totals -> exclusive offsets (tiny)
    totals = b.groupBy(key, "__bkt").agg(F.sum(value_col).alias("__tot"))
    w_off = (
        Window.partitionBy(key)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        key,
        "__bkt",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )

    # phase 2: bounded per-bucket running sums + broadcast offsets
    w_local = Window.partitionBy(key, "__bkt").orderBy(hash_col, *order_cols)
    return (
        b.join(broadcast(offsets), [key, "__bkt"])
        .withColumn(out_col, F.sum(value_col).over(w_local) + F.col("__off"))
        .drop("__bkt", "__off")
    )


def token_budget_mix_twophase(
    docs: DataFrame, budget: Column
) -> DataFrame:
    """The scale path of x_token_budget_mix (queries/vocab.py): same
    deterministic hash-ordered budget cut, running total computed with
    the two-phase prefix sum so no source ever funnels through a
    single sort task. Row-identical to the windowed form."""
    n_tokens = F.size(
        F.filter(F.split(F.col("text"), " ", -1), lambda w: w != "")
    )
    t = docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        budget.alias("__budget"),
    )
    c = prefix_sum_by_hash(
        t, "source", "h", ["doc_id"], "n_tokens", out_col="cum_tokens"
    )
    return c.where(F.col("cum_tokens") <= F.col("__budget")).select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
    )
