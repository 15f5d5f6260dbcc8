"""Query registry: the single source of truth for the engine's surface.

Each entry pairs a Spark implementation with an equivalent ANSI-SQL
oracle (run by DuckDB over the same parquet) — mirroring the
reference's test strategy of SQL text + expected output
(reference: SQL-compiler/src/test/java/org/dbsp/sqlCompiler/compiler/BaseSQLTests.java).
Entries without an oracle are non-SQL-expressible (LSH, streaming) and
are covered by dedicated tests instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # The driver hands us a vanilla SparkSession; pin the
            # load-bearing runtime confs before ANY plan is built, so
            # queries that never call load_table (pure-program views,
            # custom sources) still get the contract confs.
            from sql_to_dbsp_compiler_spark.sources.tables import (
                _ensure_session_confs,
            )

            _ensure_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        wrapped.__module__ = fn.__module__
        wrapped.__wrapped__ = fn
        REGISTRY[name] = Query(name, wrapped, oracle, tags)
        return fn

    return deco
