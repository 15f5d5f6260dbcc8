"""Join operators (reference: circuit/operator/DBSPJoinOperator.java,
DBSPIncrementalJoinOperator.java).

At 100 TB the join strategy matters more than the join itself:
dimension joins must broadcast (no shuffle of the fact table on the
dim key), fact-fact joins shuffle on the key with AQE skew splitting.
Semi/anti joins are first-class — Catalyst never materializes the
probe side's payload columns for them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_join(fact: DataFrame, dim: DataFrame, on: Column | list[str] | str, how: str = "inner") -> DataFrame:
    """Join a fact table against a (small) dimension with a broadcast
    hint, so the fact side is never shuffled for this join."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on: Column | list[str] | str) -> DataFrame:
    """EXISTS / IN-subquery semantics (rows of `left` with >=1 match)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: Column | list[str] | str) -> DataFrame:
    """NOT EXISTS / NOT IN (non-null) semantics."""
    return left.join(right, on, "left_anti")
