"""Calcite/reference-semantics function helpers (reference:
lib/sqllib, doc/sql/*.rst). Thin Column-level wrappers where Spark's
default differs from the reference dialect (day-of-week numbering,
truncating vs flooring division, C-style time formats)."""

from sql_to_dbsp_compiler_spark.functions.datetime_fns import (
    dow_sunday0,
    epoch_seconds,
    format_timestamp,
)
from sql_to_dbsp_compiler_spark.functions.numeric_fns import floor_div, trunc_div
from sql_to_dbsp_compiler_spark.functions.string_fns import position_in, split_part_1

__all__ = [
    "dow_sunday0",
    "epoch_seconds",
    "floor_div",
    "format_timestamp",
    "position_in",
    "split_part_1",
    "trunc_div",
]
