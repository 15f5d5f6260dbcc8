"""PySpark-native analytics engine with the query surface of the
SQL-to-DBSP compiler (vmware-archive/sql-to-dbsp-compiler).

The reference compiles SQL views to incremental DBSP circuits
(reference: SQL-compiler/src/main/java/org/dbsp/sqlCompiler/). Here the
same capability is expressed Spark-first: batch views are Catalyst
plans built with the DataFrame API, incremental views are Structured
Streaming queries, and the DBSP Z-set model is available explicitly in
:mod:`sql_to_dbsp_compiler_spark.plans.zset` for change-stream algebra.
"""

__version__ = "0.1.0"

from sql_to_dbsp_compiler_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
