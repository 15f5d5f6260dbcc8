"""TopK operators.

Per-group topK is the reference's window-aggregate shape
(reference: circuit/operator/DBSPWindowAggregateOperator.java). In
Spark, ROW_NUMBER + filter compiles to WindowGroupLimit: each map task
keeps only k rows per group *before* the shuffle, so the exchanged
data is O(groups*k), not O(n) — the property that keeps this viable at
100 TB. Order columns must form a total order (include a unique key)
or the selected rows are nondeterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(df: DataFrame, partition_by: list[str], order_by: list[Column], k: int, rank_col: str = "rn") -> DataFrame:
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def topk_global(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k — Spark executes TakeOrderedAndProject:
    per-partition heaps, then a k-row merge on the driver."""
    return df.orderBy(*order_by).limit(k)
