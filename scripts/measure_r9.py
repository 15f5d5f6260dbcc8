"""r9 dual-protocol bench bridge (VERDICT r8 item 4): run the OLD
23-query headline set 3x each on the CURRENT tree and report BOTH
median-of-3 (the protocol since r8) and min-of-3 (the protocol
through r7) computed from the SAME samples — one quiet run yields
both numbers, so round-over-round medians are adjudicable against
the r7-era history without a judge-side worktree A/B. Also times the
four new r9 headline queries so BENCH_r9's expanded 27-query total
has a same-tree decomposition.

Usage: python scripts/measure_r9.py  (quiet machine, local[32])
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.session import get_spark

OLD_SET = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q10",
    "tpch_q18_large_orders", "cte_pipeline", "asof_join", "dedup_exact",
    "dedup_minhash_pairs", "dedup_canonical_groups", "embedding_neardup",
    "embedding_lsh_neardup", "ann_bruteforce_topk", "text_quality",
    "tumbling_window_agg", "zset_incremental_view", "program_multiview_chain",
    "x_dsir_resample", "x_contamination_ngram", "x_semdedup", "x_bm25_topk",
    "train_pipeline_end2end",
]
NEW_SET = [
    "y_dedup_delta_apply", "y_dedup_delta_commit",
    "y_dedup_delta_retract", "y_ann_delta_ingest",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY[OLD_SET[0]].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    samples: dict[str, list[float]] = {}
    for name in OLD_SET + NEW_SET:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        samples[name] = runs

    med = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    mn = {n: round(min(s), 3) for n, s in samples.items()}
    out = {
        "old23_median_total": round(sum(med[n] for n in OLD_SET), 2),
        "old23_min_total": round(sum(mn[n] for n in OLD_SET), 2),
        "new4_median_total": round(sum(med[n] for n in NEW_SET), 2),
        "r9set_median_total": round(sum(med.values()), 2),
        "median": med,
        "min": mn,
        "samples": samples,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
