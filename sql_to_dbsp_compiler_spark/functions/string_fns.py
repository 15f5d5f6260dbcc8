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


def cast_varchar(s: Column, n: int) -> Column:
    """Reference VARCHAR(n) cast semantics — truncate to the first n
    characters (reference lib/sqllib/src/casts.rs VARCHAR rows;
    doc/sql/types.rst). Spark's own CAST(x AS VARCHAR(n)) keeps the
    full string (CharVarcharUtils treats char types as string), so the
    engine maps the reference cast to an explicit substring."""
    return F.substring(s, 1, n)


def cast_char(s: Column, n: int) -> Column:
    """Reference CHAR(n) cast semantics — truncate-or-pad to exactly
    n characters (space-padded, same as the CHAR comparison/concat
    behavior pinned in char_smallint_types)."""
    return F.rpad(F.substring(s, 1, n), n, " ")
