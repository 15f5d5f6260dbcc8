"""Ad-hoc scale-anchor measurement for the late-r6 op wave.

Runs each new op at sf0.1 and at the replicated sf1 (10x) dir —
plus sf10 (100x) for the similarity-join flagship — best-of-2 wall
each, and prints a markdown table for BENCH_SCALE.md.

Usage: python scripts/measure_new_ops_r6b.py [sf1_dir] [sf10_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
NAMES_10X = [
    "y_simjoin_prefix",
    "y_program_cdc_statements",
    "y_window_distinct_count",
    "y_tokenizer_fertility",
    "y_skyline_pareto",
    "y_vocab_coverage",
    "y_grouped_corr",
    "y_benford_digits",
    "y_length_band_filter",
    "y_interval_coverage",
    "y_event_rate_anomaly",
]
NAMES_100X = ["y_simjoin_prefix", "y_vocab_coverage", "y_tokenizer_fertility"]


def best_of(fn, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_sf1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_sf10"
    spark = get_spark("anchors", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name, d):
        df = REGISTRY[name].fn(spark, d)
        return df.count()

    print("| query | sf0.1 s | sf1 s | 10x ratio |")
    print("|---|---|---|---|")
    rows = {}
    for name in NAMES_10X:
        try:
            t01 = best_of(lambda: run(name, SF01))
            t1 = best_of(lambda: run(name, sf1))
        except Exception as exc:  # noqa: BLE001
            print(f"| {name} | ERR | {type(exc).__name__} | - |", flush=True)
            continue
        rows[name] = (t01, t1)
        print(f"| {name} | {t01:.2f} | {t1:.2f} | {t1 / t01:.1f} |", flush=True)
    if os.path.isdir(sf10):
        print()
        print("| query | sf0.1 s | sf10 s | 100x ratio |")
        print("|---|---|---|---|")
        for name in NAMES_100X:
            if name not in rows:
                continue
            t01 = rows[name][0]
            try:
                t10 = best_of(lambda: run(name, sf10))
            except Exception as exc:  # noqa: BLE001
                print(f"| {name} | {t01:.2f} | ERR {type(exc).__name__} | - |", flush=True)
                continue
            print(f"| {name} | {t01:.2f} | {t10:.2f} | {t10 / t01:.1f} |", flush=True)


if __name__ == "__main__":
    main()
