"""Parquet table sources for the test-data star schema.

Mirrors the reference's ``CREATE TABLE`` + source-operator stage
(reference: circuit/operator/DBSPSourceOperator.java): a source is a
declarative scan so Catalyst can push filters/column pruning into the
parquet reader. Never ``.cache()`` here — at 100 TB the scan must
stream, and pushdown only happens on the un-materialized plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast even at 100 TB fact scale
# (region/nation are fixed-size; supplier/part grow sub-linearly).
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})


def _ensure_session_confs(spark: SparkSession) -> None:
    """The engine may be handed an externally-created SparkSession
    (the driver contract does exactly that). Four confs are
    load-bearing and runtime-settable — pin them defensively:
    nanos-timestamp parquet support, UTC timestamp semantics,
    the Spark 4.1 constraint-propagation workaround (dangling
    attribute reference in UnionBase.rewriteConstraints when a
    localCheckpoint barrier sits under a self-union — hit by the
    recursive-view fixpoint), and Python DataSource filter pushdown
    (CdcJournalReader implements pushFilters(); Spark 4.1 hard-errors
    with DATA_SOURCE_PUSHDOWN_DISABLED when the conf is off)."""
    for key, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.constraintPropagation.enabled", "false"),
        ("spark.sql.python.filterPushdown.enabled", "true"),
    ):
        try:
            if spark.conf.get(key, None) != val:
                spark.conf.set(key, val)
        except Exception:
            pass  # non-settable in this build: keep going
    # Python planner workers (custom data sources) spawn fresh
    # interpreters that see PYTHONPATH, not the parent's sys.path —
    # under an externally-created session nobody has exported it yet.
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )


# Plan cache: (session id, sf_dir, table, mtime) -> unresolved
# DataFrame plan. Building a scan costs a schema-inference round trip
# to the JVM per call; with 143 registry queries each loading 1-4
# tables, reusing the lazy plan object trims meaningful per-query
# constant cost from the driver's correctness sweep. The cached object
# is an un-materialized plan (no .cache()), so pushdown/pruning still
# happen per query. The path mtime in the key invalidates entries when
# a parquet target is rewritten in-session (gen_scale, regenerated
# test dirs) — a pinned file index would serve a stale listing.
_PLAN_CACHE: dict[tuple[int, str, str, float], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    key = (id(spark), sf_dir, name, mtime)
    hit = _PLAN_CACHE.get(key)
    if hit is not None:
        # Guard against id() reuse after the original session was
        # garbage-collected: the plan is valid only for ITS session.
        if hit.sparkSession is spark:
            # Confs are runtime-settable and may have been reset by a
            # caller between loads — re-pin on hits too.
            _ensure_session_confs(spark)
            return hit
        _PLAN_CACHE.pop(key, None)
    # Drop superseded entries for the same (session, dir, table) so a
    # rewritten directory doesn't leave dead plans accumulating.
    for k in [k for k in _PLAN_CACHE if k[:3] == key[:3]]:
        _PLAN_CACHE.pop(k, None)
    df = _load_table_uncached(spark, sf_dir, name)
    _PLAN_CACHE[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # TIMESTAMP(NANOS) arrives as bigint (nanosAsLong); truncate
        # to micros — same thing DuckDB does reading this file.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            # integer DIV, not `/`: nano-epochs exceed 2^53, double
            # division would lose the low microsecond digits.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


# Logical-plan node names that PRESERVE row count (projections,
# repartitionings, column-level ops). Anything else — Filter, Join,
# Aggregate, Generate, Sample, Limit… — changes cardinality, so the
# metadata shortcut must refuse.
_ROWCOUNT_SAFE_NODES = {
    "Project",
    "Repartition",
    "RepartitionByExpression",
    "Relation",
    "LogicalRDD",  # refused below anyway (no files), listed for clarity
}


def metadata_rowcount(df: DataFrame) -> "int | None":
    """Exact row count from parquet footers WITHOUT scanning data, or
    None when the plan doesn't allow it.

    Auto-scaling operators (SRP band geometry, k-means nlist, SemDeDup
    cluster counts) need n = |corpus| before planning; a ``count()``
    is a full pass — at 100 TB, the most expensive way to learn one
    integer. When the frame is just projections/repartitionings over a
    parquet scan, the row count is already in the file footers: read
    them driver-side (metadata pages only, milliseconds per file).
    Every cardinality-changing node (Filter/Join/Aggregate/Generate/
    Limit/Sample/Union…) makes this return None — callers fall back to
    ``count()``."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:  # pragma: no cover - defensive on connect-only APIs
        return None
    import re as _re

    nodes = _re.findall(r"^[+\-: ]*([A-Za-z]+)", plan, flags=_re.MULTILINE)
    if not nodes or any(n not in _ROWCOUNT_SAFE_NODES for n in nodes):
        return None
    files = df.inputFiles()
    if not files or not all(f.endswith(".parquet") for f in files):
        return None
    # inputFiles() returns URIs. Footer reads only work for local
    # files; object-store schemes (s3a://, hdfs://, abfs://) and any
    # read error fall back to a counting job rather than crashing the
    # planning path (ADVICE r4: srp_neardup_pairs / x_semdedup plan on
    # this, and at 100 TB the inputs live on object storage).
    from urllib.parse import unquote, urlparse

    import pyarrow.parquet as pq

    total = 0
    for f in files:
        parsed = urlparse(f)
        if parsed.scheme not in ("", "file"):
            return None
        path = unquote(parsed.path) if parsed.scheme == "file" else f
        try:
            total += pq.ParquetFile(path).metadata.num_rows
        except Exception:  # missing file, corrupt footer (ArrowInvalid)
            return None
    return total


def rowcount(df: DataFrame) -> int:
    """metadata_rowcount when the plan allows, else a counting job."""
    n = metadata_rowcount(df)
    return df.count() if n is None else n
