"""Import all query modules so the registry is fully populated."""

from sql_to_dbsp_compiler_spark.queries.registry import REGISTRY, Query, query

from sql_to_dbsp_compiler_spark.queries import (  # noqa: E402,F401
    comparisons,
    edge_semantics,
    functions_sql,
    functions_sql2,
    layout,
    llm_queries,
    nexmark,
    pipeline2,
    postgres_edges,
    program_queries,
    reference_surface,
    relational,
    statistics,
    tpch,
    tpch2,
    tpch3,
    training_data,
    vocab,
    windows_batch,
)

__all__ = ["REGISTRY", "Query", "query"]
