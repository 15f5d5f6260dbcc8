"""File sources/sinks beyond parquet: CSV, JSON-lines, partitioned
writes (reference ingests via sqllogictest inserts and CSV readers —
lib/readers; sinks via DBSPSinkOperator).

Scale rules encoded here:
- always explicit schema (schema inference = an extra full pass);
- partitioned parquet writes for re-readable, prunable output;
- writer partition count controlled by the caller (a 100 TB sink
  wants large files, not 32k shards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True, sep: str = ","
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    if num_files is not None:
        df = df.repartition(num_files, *(partition_by or []) or None) if partition_by else df.coalesce(num_files)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, header: bool = True, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC batch source — same declarative-scan contract as parquet
    (predicate pushdown + column pruning reach the ORC reader)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
