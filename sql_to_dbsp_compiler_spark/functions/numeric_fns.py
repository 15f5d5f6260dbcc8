"""Integer division variants (reference: doc/sql/integer.rst).

SQL engines disagree here: Spark `div` and DuckDB `//` truncate
toward zero; floor semantics need an explicit FLOOR. Both are exposed
so a view can say which it means."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def trunc_div(a: Column, b: Column) -> Column:
    """Integer division truncating toward zero (C semantics) —
    Spark's cast(double→long) truncates toward zero."""
    return (a.cast("double") / b.cast("double")).cast("long")


def floor_div(a: Column, b: Column) -> Column:
    """Integer division rounding toward negative infinity."""
    return F.floor(a.cast("double") / b.cast("double")).cast("long")


def division(a: Column, b: Column) -> Column:
    """The reference's total integer division: NULL on a zero divisor
    instead of a runtime error (EndToEndTests divZeroTest /
    customDivisionTest: ``SELECT 1/0`` and ``DIVISION(1, 0)`` are the
    nullable-NULL row; NULL propagates through enclosing expressions,
    nestedDivTest). Our session runs ANSI mode where ``/`` raises, so
    the reference's semantics is spelled with this helper."""
    return F.when(b == 0, F.lit(None)).otherwise(trunc_div(a, b))


def total_mod(a: Column, b: Column) -> Column:
    """`%` with NULL on a zero modulus (same totalization rule)."""
    return F.when(b == 0, F.lit(None)).otherwise(a % b)
