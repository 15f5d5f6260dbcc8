"""Bucketized interval join: point-in-interval (and interval-overlap)
joins as EQUI-joins.

Spark has no native range-join optimization: `e.ts BETWEEN w.lo AND
w.hi` compiles to BroadcastNestedLoopJoin (or a cartesian sort-merge)
— O(|L|·|R|) at scale. The standard fix is time bucketing: explode
each interval to the fixed-width buckets it covers, map each point to
its single bucket, and equi-join on the bucket id with the exact
predicate re-checked after. Work becomes O(|intervals|·span/B +
|points|) shuffled by bucket — linear, AQE-skew-splittable, and the
explode factor is bounded by span/B.

No duplicate elimination is needed for point-in-interval: a point
lives in exactly one bucket, so each qualifying (point, interval)
pair meets exactly once. (For interval×interval overlap the canonical
-bucket trick — emit only where the join bucket equals
bucket(max(l.lo, r.lo)) — restores uniqueness without a distinct.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, width_s: int) -> Column:
    # parquet often carries TIMESTAMP_NTZ, which won't cast to DOUBLE
    # directly; the LTZ hop is value-preserving under the pinned-UTC
    # session (same normalization streaming/event_time.py applies)
    return F.floor(ts.cast("timestamp").cast("double") / F.lit(width_s)).cast(
        "long"
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """All (point, interval) pairs with lo <= point_ts <= hi, computed
    with one bucket equi-join. Column names must be disjoint between
    the two inputs."""
    p = points.withColumn("__b", _bucket(F.col(point_ts), bucket_seconds))
    iv = intervals.withColumn(
        "__bs",
        F.sequence(
            _bucket(F.col(lo), bucket_seconds),
            _bucket(F.col(hi), bucket_seconds),
        ),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")
    joined = p.join(iv, "__b").where(
        (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) <= F.col(hi))
    )
    return joined.drop("__b")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """All (left, right) pairs whose intervals overlap
    (l_lo <= r_hi AND r_lo <= l_hi), as one bucket equi-join. Both
    sides explode to their covered buckets; a pair meets in every
    shared bucket, so emission is restricted to the CANONICAL bucket —
    the bucket of max(l_lo, r_lo), the overlap's start — which each
    qualifying pair has exactly once. No distinct, no post-join
    dedup shuffle."""
    lb = left.withColumn(
        "__lb",
        F.explode(
            F.sequence(
                _bucket(F.col(l_lo), bucket_seconds),
                _bucket(F.col(l_hi), bucket_seconds),
            )
        ),
    )
    rb = right.withColumn(
        "__rb",
        F.explode(
            F.sequence(
                _bucket(F.col(r_lo), bucket_seconds),
                _bucket(F.col(r_hi), bucket_seconds),
            )
        ),
    )
    joined = lb.join(rb, lb["__lb"] == rb["__rb"]).where(
        (F.col(l_lo) <= F.col(r_hi))
        & (F.col(r_lo) <= F.col(l_hi))
        & (
            F.col("__lb")
            == _bucket(F.greatest(F.col(l_lo), F.col(r_lo)), bucket_seconds)
        )
    )
    return joined.drop("__lb", "__rb")
