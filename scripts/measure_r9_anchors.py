"""r9 new-op scale anchors (sf0.1 → sf1 → sf10 dirs from
scripts/gen_scale.py), best-of-2 warm runs, noop sink — the same
protocol as the r7/r8 anchor tables in BENCH_SCALE.md.

Anchored:
- y_dedup_delta_retract: warm (delta grows with the corpus) AND a
  FIXED sf0.1-sized signed delta (doc_id < 10_000_000 — replica 0
  keeps original ids; the per-replica 10M offset preserves doc_id
  % 16 classes) against each corpus's full standing state — the
  "cost ∝ |delta|" evidence.
- y_ann_centroid_staleness: warm (one store scan + broadcast join +
  16-group aggregate — should track corpus linearly at worst).
- fixed ANN delta commit mechanics: assign (broadcast argmax) +
  append (partitioned file write) of the FIXED sf0.1 delta — cost
  must be flat in corpus size by construction.
- y_dedup_span_excise: warm; the honest statement is the sf1→sf10
  decade (sf0.1 is fixed-overhead-dominated).

One-time standing-state builds (previous-ingest cost by definition)
are excluded: the first warm run pays them, timing starts at run 2.

y_program_dedup_statements is deliberately NOT anchored at scale:
its statement stream rewrites every doc_id % 16 = 2 row to ONE
sentinel text, so the exact-dup pair view grows quadratically in
that synthetic group — a property of the gate fixture's delta, not
of the operator (real dup groups are bounded; the maintenance rides
the statement's matched slice).

Usage: python scripts/measure_r9_anchors.py  (quiet machine)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.session import get_spark
from sql_to_dbsp_compiler_spark.sources.tables import load_table

DIRS = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", "/tmp/sparkgraft_sf1"),
    ("sf10", "/tmp/sparkgraft_sf10"),
]
FIXED_MAX_ID = 10_000_000  # replica-0 ids == the sf0.1 id space


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def best2(fn) -> float:
    fn()  # warm (state builds, codegen)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 2)


def main() -> None:
    spark = get_spark("anchors")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    for tag, d in DIRS:
        row: dict = {}
        row["retract_warm"] = best2(
            lambda: noop(REGISTRY["y_dedup_delta_retract"].fn(spark, d))
        )

        # FIXED delta against this corpus's full standing state
        from sql_to_dbsp_compiler_spark.llm.dedup import delta_dedup_retract
        from sql_to_dbsp_compiler_spark.queries.llm_queries import (
            _RETRACT_STATE_ROOT,
        )

        docs = load_table(spark, d, "documents").select("doc_id", "text")
        buckets = spark.read.parquet(
            f"{_RETRACT_STATE_ROOT}/{os.path.basename(d.rstrip('/'))}/buckets"
        )
        fixed = F.col("doc_id") < FIXED_MAX_ID
        deleted = docs.where(fixed & ((F.col("doc_id") % 16) == 1)).select(
            "doc_id"
        )
        src = docs.select(
            F.col("doc_id").alias("src_id"), F.col("text").alias("src_text")
        )
        updated = (
            docs.where(fixed & ((F.col("doc_id") % 16) == 2))
            .join(src, F.col("doc_id") - 2 == F.col("src_id"), "left")
            .select("doc_id", F.coalesce("src_text", "text").alias("text"))
        )
        row["retract_fixed_delta"] = best2(
            lambda: noop(
                delta_dedup_retract(docs, deleted, updated, buckets, threshold=0.5)
            )
        )

        row["staleness_warm"] = best2(
            lambda: noop(REGISTRY["y_ann_centroid_staleness"].fn(spark, d))
        )

        # fixed ANN delta commit mechanics: broadcast assign + append
        from sql_to_dbsp_compiler_spark.llm.similarity import (
            ivf_assign_to,
            ivf_store_append,
        )
        from sql_to_dbsp_compiler_spark.queries.llm_queries import (
            _ANN_DELTA_STATE,
        )

        cent = spark.read.parquet(
            f"{_ANN_DELTA_STATE}/{os.path.basename(d.rstrip('/'))}/centroids"
        )
        e = load_table(spark, d, "embeddings")
        delta_vecs = e.where(
            (F.col("vec_id") >= 10)
            & (F.col("vec_id") < FIXED_MAX_ID)
            & (F.col("vec_id") % 8 == 0)
        )
        tmp_store = f"/tmp/r9_anchor_store_{tag}"

        def commit_fixed():
            ivf_store_append(ivf_assign_to(delta_vecs, cent), tmp_store)

        row["ann_commit_fixed_delta"] = best2(commit_fixed)

        row["span_excise_warm"] = best2(
            lambda: noop(REGISTRY["y_dedup_span_excise"].fn(spark, d))
        )
        out[tag] = row
        print(tag, json.dumps(row), flush=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
