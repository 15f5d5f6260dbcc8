"""Aggregation helpers with scale-deterministic numeric semantics.

The test data stores money/ratio columns as doubles holding exact
2-decimal values. Summing doubles is order-dependent, so a plan that
reduces in a different partition order yields different low bits —
unacceptable both for the DuckDB value-hash gate and for reproducible
results on a 1000-executor cluster. We therefore accumulate money in
DECIMAL (associative, exact — reference keeps exact DECIMAL semantics
too, see doc/sql/decimal.rst) and cast the final result to DOUBLE.

Widths are chosen so every intermediate product stays within both
Spark's and DuckDB's 38-digit cap with no precision loss:
(12,2) * (4,2) -> (17,4);  (17,4) * (4,2) -> (22,6);  SUM -> (38,6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col: Column | str, prec: int = 12) -> Column:
    """Cast an exact-2-decimal double column to DECIMAL(prec, 2)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({prec},2)")


def one_minus(col: str) -> Column:
    """(1 - x) in DECIMAL(4,2), for discount factors."""
    return F.lit(1).cast("decimal(3,2)") - dec2(col, 3)


def one_plus(col: str) -> Column:
    """(1 + x) in DECIMAL(4,2), for tax factors."""
    return F.lit(1).cast("decimal(3,2)") + dec2(col, 3)


def money_sum(c: Column | str) -> Column:
    """Order-independent SUM of a money column, returned as DOUBLE."""
    return F.sum(dec2(c)).cast("double")


def money_avg(c: Column | str) -> Column:
    """AVG as exact-decimal SUM divided by COUNT (one double division,
    bit-deterministic under any partitioning)."""
    return F.sum(dec2(c)).cast("double") / F.count(F.lit(1))
