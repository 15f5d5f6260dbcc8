"""SparkSession factory tuned for both local testing and cluster scale.

Every knob here is chosen for the 100 TB target and merely *also* works
on local[32]:

- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic join-strategy switching replace hand-tuning.
- ``spark.sql.shuffle.partitions`` is a default for the first shuffle
  only; AQE coalesces it down. On a real cluster this would be set to
  ~2-3x total cores.
- Arrow enabled: every pandas-UDF hop is Arrow-batched, never pickled
  rows.
- Session timezone pinned to UTC so timestamp semantics are identical
  to the DuckDB oracle and independent of cluster locale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(app_name: str = "sql_to_dbsp_compiler_spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Python planner workers (custom data sources, streaming source
    # planning) spawn fresh interpreters that see PYTHONPATH, not the
    # parent's sys.path — make this package importable from them even
    # when the driver process started outside the repo root.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # custom Python data sources (sources/cdc_journal.py) push
        # EqualTo/IsNotNull into the scan when this is on
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Workaround for a Spark 4.1 constraint-propagation bug:
        # Dataset.localCheckpoint produces a LogicalRDD that PRESERVES
        # the origin plan's constraints; after Z-set consolidation
        # renames exprIds, those constraints reference attributes no
        # longer in the plan's output and Union.rewriteConstraints
        # crashes with "java.util.NoSuchElementException: key not
        # found: col#N" on any later subtract/add of checkpointed
        # incremental state. Constraint propagation only feeds
        # InferFiltersFromConstraints/PruneFilters (adds isnotnull
        # pre-join filters); measured bench delta at sf0.1 is noise.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # type, so read as long and convert in sources/tables.py.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
        .config("spark.ui.enabled", "false")
        # In a single-JVM local master every task is node-local by
        # definition, so the delay-scheduling wait is pure stall: a
        # coalesce(1) over a 32-partition local relation inherits 32
        # preferred locations and sat out the full 3 s locality wait
        # before launching (measured 4.5 s for a one-row artifact
        # write). On a real cluster this knob would stay default.
        .config("spark.locality.wait", "0s")
    )
    return builder.getOrCreate()
