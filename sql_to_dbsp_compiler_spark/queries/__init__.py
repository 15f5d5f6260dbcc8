"""Import all query modules so the registry is fully populated."""

from sql_to_dbsp_compiler_spark.queries.registry import REGISTRY, Query, query

from sql_to_dbsp_compiler_spark.queries import functions_sql, relational, tpch  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "query"]
