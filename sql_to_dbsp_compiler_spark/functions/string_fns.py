"""String helpers with reference-dialect semantics
(reference: lib/sqllib string ops, doc/sql/string.rst)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def position_in(needle: Column | str, haystack: Column) -> Column:
    """1-based position of needle in haystack, 0 if absent
    (SQL POSITION(needle IN haystack))."""
    n = F.lit(needle) if isinstance(needle, str) else needle
    return F.instr(haystack, n).cast("bigint")


def split_part_1(s: Column, delim: str, index: int) -> Column:
    """1-based split_part; empty string when index is out of range
    (PostgreSQL/reference semantics, matching DuckDB)."""
    return F.split_part(s, F.lit(delim), F.lit(index))
