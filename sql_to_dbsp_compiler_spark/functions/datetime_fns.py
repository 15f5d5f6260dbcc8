"""Datetime helpers with reference-dialect semantics
(reference: lib/sqllib datetime ops, doc/sql/datetime.rst)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# C-style strftime directive → Java SimpleDateFormat-ish pattern used
# by Spark's date_format. Covers the directives the reference dialect
# documents.
_STRFTIME_TO_JAVA = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%j": "DDD",
    "%y": "yy",
}


def dow_sunday0(ts: Column) -> Column:
    """Day of week with Sunday=0 (PostgreSQL/reference EXTRACT(DOW));
    Spark's dayofweek is Sunday=1."""
    return (F.dayofweek(ts) - 1).cast("bigint")


def epoch_seconds(ts: Column) -> Column:
    """Whole seconds since the epoch (floor), as BIGINT."""
    return F.unix_timestamp(ts).cast("bigint")


def format_timestamp(ts: Column, strftime_pattern: str) -> Column:
    """strftime-style formatting on top of Spark's date_format."""
    java = strftime_pattern
    for c, j in _STRFTIME_TO_JAVA.items():
        java = java.replace(c, j)
    return F.date_format(ts, java)
