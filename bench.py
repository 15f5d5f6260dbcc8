"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is forced to full execution with a noop sink (no driver
collect, no result materialization cost — measures the plan, like the
reference's circuit-evaluation benchmarks)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.session import get_spark

BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18_large_orders",
    "cte_pipeline",
    "asof_join",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_canonical_groups",
    "embedding_neardup",
    "embedding_lsh_neardup",
    "ann_bruteforce_topk",
    "text_quality",
    "tumbling_window_agg",
    "zset_incremental_view",
    "program_multiview_chain",
    # Heavy LLM-pipeline ops (VERDICT r4 item 2): track the training-
    # data operators in the driver's BENCH file, not just TPC-H+dedup,
    # so a regression in one of them is visible round-over-round.
    "x_dsir_resample",
    "x_contamination_ngram",
    "x_semdedup",
    "x_bm25_topk",
    "train_pipeline_end2end",
    # Incremental-ingest flagship ops (VERDICT r8 item 4): the delta
    # apply/commit/retract loop and the ANN delta ingest are the
    # 100 TB scale path — make them visible in BENCH_rN. Their
    # standing state builds once per (sf_dir, content) and the first
    # run pays it; the median of 3 discounts that exactly like
    # whole-stage-codegen compilation. NOTE: r9 grew the headline set
    # from 23 to 27 queries — BENCH_r9's total is not comparable to
    # BENCH_r8's without the bridge table in BENCH_SCALE.md.
    "y_dedup_delta_apply",
    "y_dedup_delta_commit",
    "y_dedup_delta_retract",
    "y_ann_delta_ingest",
]


def _median_run(spark, name: str, sf_dir: str, n: int = 3) -> "tuple[float, float]":
    """(median wall seconds, standing-state build seconds).

    The build cost of the incremental ops' one-time standing state
    (``_build_state_once``) is reported SEPARATELY (VERDICT r9 #3):
    it fires at most once per (sf_dir, content) across all runs, so a
    cold first run pays it and the median discounts it — the explicit
    field makes warm-vs-cold comparisons (e.g. a low-core scaling run
    inheriting state a 32-core run built) adjudicable."""
    from sql_to_dbsp_compiler_spark.queries.llm_queries import STATE_BUILD_SECONDS

    build0 = sum(STATE_BUILD_SECONDS.values())
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples), sum(STATE_BUILD_SECONDS.values()) - build0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in BENCH_QUERIES if n in REGISTRY]
    # JVM + first-job warmup so q1 doesn't pay session startup.
    REGISTRY[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # MEDIAN of 3 runs per query (VERDICT r7 item 5; was best-of-3
    # since r2 item 9). The dedup-family queries swing ±80% run-to-run
    # under machine noise, and a min is still a one-sided order
    # statistic — one lucky run hides a regression, one round of bad
    # luck on the OTHER queries reads as one. The median is noise-
    # robust in both directions, making BENCH_rN regression-adjudicable
    # without a same-day A/B worktree control for every delta. The
    # first run still pays one-time whole-stage-codegen compilation
    # (~1-1.5 s per distinct plan) — in the reference's model that is
    # circuit *compilation*, not evaluation, and the median of 3
    # discounts it exactly like the old min did.
    times: dict[str, float] = {}
    builds: dict[str, float] = {}
    for name in names:
        med, built = _median_run(spark, name, sf_dir)
        times[name] = round(med, 3)
        if built > 0:
            builds[name] = round(built, 3)

    total = round(sum(times.values()), 3)
    result = {"metric": "headline_queries_total", "value": total, "unit": "sec", "queries": times, "sf": sf}
    # One-time standing-state build cost (0 when every state was warm),
    # keyed by the query whose run triggered the build — ADDITIVE field,
    # the timed queries/values above are computed exactly as before.
    result["state_build_sec"] = round(sum(builds.values()), 3)
    if builds:
        result["state_build_queries"] = builds

    # Optional second-scale anchor (superlinearity audit): set
    # SPARK_GRAFT_SCALE2_DIR to a dir produced by scripts/gen_scale.py
    # to re-run the suite there and report per-query ratios.
    # embedding_neardup is excluded at scale2 by design: it is the
    # documented O(n^2) all-pairs oracle baseline (the scale path is
    # embedding_lsh_neardup), so benching it at 10x data means 100x
    # work by construction.
    scale2 = os.environ.get("SPARK_GRAFT_SCALE2_DIR")
    if scale2 and os.path.isdir(scale2):
        sf2 = float(os.environ.get("SPARK_GRAFT_SCALE2_SF", "1.0"))
        times2: dict[str, float] = {}
        for name in [n for n in names if n != "embedding_neardup"]:
            times2[name] = round(_median_run(spark, name, scale2)[0], 3)
        result["scale2"] = {
            "sf": sf2,
            "value": round(sum(times2.values()), 3),
            "queries": times2,
            "ratio": {
                n: round(times2[n] / times[n], 2) for n in times2 if times.get(n)
            },
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
