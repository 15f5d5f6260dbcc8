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
