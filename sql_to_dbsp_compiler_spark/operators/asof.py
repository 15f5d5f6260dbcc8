"""As-of (point-in-time) join — an operator Spark lacks natively
(reference's Calcite dialect family exposes temporal/ASOF joins; DBSP
evaluates them via time-indexed traces).

Implementation is the scalable union-sort-carry pattern, NOT a range
self-join: tag both inputs, union, and for each key carry the most
recent right-side payload forward with a last_value(ignoreNulls)
window ordered by time. One shuffle on (key), one sort — O(n log n)
per partition, no quadratic candidate pairs, skew bounded by the
hottest key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts for the same key (NULL payload if none).

    ``tolerance`` (a SQL interval literal, e.g. ``"INTERVAL 30 DAY"``)
    bounds how stale the match may be — pandas ``merge_asof``
    semantics: a carried right row older than ``left_ts - tolerance``
    is treated as no match (payload NULL). Enforced as a post-carry
    predicate, so the plan is unchanged: one (key) shuffle, one sort,
    never a range self-join."""
    left_cols = left.columns
    l_part = left.select(
        *left_cols,
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_payload],
    )
    r_part = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    # right rows sort before left rows at equal timestamps, so a right
    # row at exactly left_ts IS visible (ts >= semantics)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_part.unionByName(r_part).select(
        "*",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__carried_{c}")
            for c in right_payload
        ],
        # the matched right row's own timestamp rides along for the
        # tolerance check (NULL among left rows, carried like payloads)
        F.last(
            F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True
        ).over(w).alias("__carried_ts"),
    )
    keep = F.lit(True)
    if tolerance is not None:
        keep = F.col("__carried_ts") >= F.col("__t") - F.expr(tolerance)
    return (
        carried.where(F.col("__is_left") == 1)
        .select(
            *left_cols,
            *[
                F.when(keep, F.col(f"__carried_{c}")).alias(c)
                for c in right_payload
            ],
        )
    )
