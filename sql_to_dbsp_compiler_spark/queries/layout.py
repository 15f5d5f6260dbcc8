"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional scan pruning.

At 100 TB the dominant cost is the scan; a table laid out by a
single sort key prunes row groups only for predicates on that key.
Z-ordering bit-interleaves several dimensions into one clustering key
so a range predicate on ANY participating dimension maps to a bounded
set of key ranges — parquet min/max row-group stats then prune files
for 2D box queries the way a 1D sort never can. (Same technique the
lakehouse engines expose as `OPTIMIZE ... ZORDER BY`; implemented
here from first principles with JVM-side bitwise expressions.)

The interleave is the classic mask-spread: 16 bits of each dimension
spread into even/odd positions of a 32-bit Morton code, entirely with
`shiftleft`/`&`/`|` column expressions — whole-stage codegen, no UDF,
no shuffle. DuckDB evaluates the identical bit arithmetic, so the
whole op is exactly oracle-checkable.

Reference parity: the reference engine's table layout is row-oriented
Z-sets with no clustering story (sort order is a per-operator concern,
e.g. SQL-compiler ORDER BY handling); Z-order is part of the
beyond-reference lakehouse surface this repo adds for the 100 TB
target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.queries.registry import query
from sql_to_dbsp_compiler_spark.sources.tables import load_table

# mask-spread constants: 16 input bits -> even bit positions of 32
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits(col: Column) -> Column:
    """Spread the low 16 bits of `col` into the even bit positions of
    a 32-bit value (0b...a_b_c_d). Pure bitwise column arithmetic —
    stays inside whole-stage codegen."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zvalue(d1: Column, d2: Column) -> Column:
    """32-bit Morton code of two 16-bit dimensions (d1 even bits,
    d2 odd bits)."""
    return spread_bits(d1).bitwiseOR(F.shiftleft(spread_bits(d2), 1))


def _spread_sql(expr: str) -> str:
    # BIGINT from the start: DuckDB's << range-checks INT32
    x = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def zvalue_sql(d1: str, d2: str) -> str:
    """The identical Morton code as portable SQL (DuckDB oracle)."""
    return f"({_spread_sql(d1)} | ({_spread_sql(d2)} << 1))"


# the two clustering dimensions over `events`, normalized to 16 bits
# with explicit floor (DuckDB CAST(double) rounds, Spark truncates)
_D1_SQL = "(user_id % 65536)"
_D2_SQL = "least(greatest(CAST(floor(value * 100) AS BIGINT), 0), 65535)"


def _dims(df: DataFrame) -> tuple[Column, Column]:
    d1 = F.col("user_id") % F.lit(65536)
    d2 = F.least(
        F.greatest(F.floor(F.col("value") * 100).cast("bigint"), F.lit(0)),
        F.lit(65535),
    )
    return d1, d2


@query(
    "x_zorder_layout",
    oracle=f"""
    WITH z AS (
        SELECT event_id,
               {_D1_SQL} AS d1,
               {_D2_SQL} AS d2,
               {zvalue_sql(_D1_SQL, _D2_SQL)} AS zval
        FROM events
    )
    SELECT CAST(zval >> 27 AS BIGINT) AS zbucket,
           count(*) AS n,
           CAST(min(d1) AS BIGINT) AS d1_min,
           CAST(max(d1) AS BIGINT) AS d1_max,
           CAST(min(d2) AS BIGINT) AS d2_min,
           CAST(max(d2) AS BIGINT) AS d2_max,
           CAST(min(zval) AS BIGINT) AS z_min,
           CAST(max(zval) AS BIGINT) AS z_max
    FROM z
    GROUP BY zval >> 27
    """,
    tags=("layout", "zorder"),
)
def x_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering summary over `events`: Morton-interleave
    (user_id, value) into a 32-bit z-value, bucket by the top 5 bits
    (32 coarse clusters — at scale these are file boundaries), and
    report each bucket's bounding box in BOTH dimensions. The payoff
    is visible in the result: every bucket's (d1, d2) box covers a
    small fraction of the global domain, which is exactly why parquet
    min/max stats prune 2D box predicates after a z-order write.

    Plan shape: the z-value is pure bitwise whole-stage-codegen
    arithmetic on the scan (no UDF, no extra shuffle); the bucket key
    is `z >> 27` (an expression, NOT a global sort — an ntile() here
    would serialize the table through one partition); one partial-agg
    shuffle. At 100 TB: one pass, map-side combine into 32 groups."""
    e = load_table(spark, sf_dir, "events")
    d1, d2 = _dims(e)
    z = zvalue(d1, d2)
    zb = e.select(
        F.shiftright(z, 27).cast("bigint").alias("zbucket"),
        d1.alias("d1"),
        d2.alias("d2"),
        z.alias("zval"),
    )
    return zb.groupBy("zbucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("d1").cast("bigint").alias("d1_min"),
        F.max("d1").cast("bigint").alias("d1_max"),
        F.min("d2").cast("bigint").alias("d2_min"),
        F.max("d2").cast("bigint").alias("d2_max"),
        F.min("zval").cast("bigint").alias("z_min"),
        F.max("zval").cast("bigint").alias("z_max"),
    )


def zorder_write(
    df: DataFrame, path: str, d1: Column, d2: Column, files: int = 8
) -> None:
    """Write `df` laid out by z-order: range-partition on the Morton
    code into `files` output files and sort within each, so every
    file's parquet footer carries tight min/max for BOTH dimensions.
    This is the write-side half of the pruning story; the summary
    query above quantifies the locality the layout buys."""
    z = zvalue(d1, d2).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
