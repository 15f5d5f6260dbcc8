"""Skew-handling join: salting (reference's runtime shards hot keys
across workers; Spark's AQE skew-join splits oversized partitions at
runtime — salting is the static fallback when a single key is hot
enough to overwhelm one task even after AQE splitting).

`salted_join` replicates the (small-ish) build side `salt` times and
scatters the probe side across the replicas, so one hot key spreads
over `salt` tasks. Result is identical to the plain join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    salt: int = 8,
) -> DataFrame:
    """Equi-join with the probe side salted and the build side
    replicated `salt` times. Use when a probe key is pathologically
    hot; costs `salt`x replication of the build side."""
    salted_probe = probe.withColumn(
        "__psalt", (F.abs(F.xxhash64(F.monotonically_increasing_id())) % salt).cast("int")
    )
    replicated_build = build.withColumn(
        "__bsalt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    out = salted_probe.join(
        replicated_build,
        (F.col(probe_key) == F.col(build_key)) & (F.col("__psalt") == F.col("__bsalt")),
    )
    return out.drop("__psalt", "__bsalt")


def _is_scan_shaped(df: DataFrame) -> bool:
    """True when ``df``'s ANALYZED logical plan is a plain file scan
    under narrow operators (Project/Filter/aliasing) — the only shape
    whose ``rdd.getNumPartitions()`` probe is both cheap (no shuffle
    planning) and meaningful ("scan splits"). Walks the analyzed plan,
    never the optimized/physical one, so the check costs no planning."""
    node = df._jdf.queryExecution().analyzed()
    narrow = {"Project", "Filter", "SubqueryAlias", "GlobalLimit", "LocalLimit"}
    while True:
        name = node.getClass().getSimpleName()
        if name in ("LogicalRelation", "DataSourceV2Relation"):
            return True
        if name not in narrow or node.children().size() != 1:
            return False
        node = node.children().apply(0)


def spread_by(df: DataFrame, id_col: str) -> DataFrame:
    """Scale-adaptive compute-spread (optimization guide §2.4): hash-
    repartition ``df`` across the cluster ONLY when its current scan
    parallelism is below the core count. The per-row compute that
    follows (shingling, hashing, signature math) wants one partition
    per core; the single-file/single-row-group test corpora scan as
    ONE split, so without a repartition every core but one idles. At
    production scale the input is thousands of parquet splits — the
    scan is already parallel and the repartition would be a full
    shuffle of the heaviest column (the document text) for nothing,
    exactly the "shuffle opaque payloads more than once" anti-pattern
    of guide §8.

    Input contract (ADVICE r9): the split-count probe is only
    meaningful for SCAN-SHAPED inputs — for a shuffle-derived input
    ``rdd.getNumPartitions()`` reports the static shuffle partition
    count (>= cores) even when AQE coalesces to one partition at
    runtime, which would silently skip the spread and serialize the
    per-row compute. Non-scan shapes therefore repartition
    unconditionally (the pre-r9 behavior — a possibly-redundant
    shuffle, never a serialized stage). Probing the rdd of a plain
    scan compiles the scan plan only (file listing is cached by the
    session); no job runs."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if _is_scan_shaped(df) and df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, F.col(id_col))
