"""Ad-hoc r7 scale-anchor + re-pin measurements for BENCH_SCALE.md.

- y_window_distinct_count at sf0.1/sf1/sf10: the replicated dirs grow
  every user's partition 10x/100x — the hot-partition growth test the
  linear-state respell must survive (the old quadratic spelling would
  go ~100x/10000x in work per partition).
- y_dedup_containment_lsh at sf0.1/sf1/sf10 vs the standalone
  containment op's 18.3x 100x anchor.
- tpch_q21 sf0.1/sf1 after the single-scan rewrite.
- x_dsir_resample and tpch_q1 three-run MEDIANS at sf0.1 (VERDICT r6
  item 6 driver-delta adjudication).

Usage: python scripts/measure_r7.py [sf1_dir] [sf10_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_sf1"
    sf10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_sf10"
    spark = get_spark("anchors_r7", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    def wall(name, d):
        t0 = time.time()
        REGISTRY[name].fn(spark, d).count()
        return time.time() - t0

    def best_of(name, d, n=2):
        return min(wall(name, d) for _ in range(n))

    print("| query | sf0.1 s | sf1 s | 10x | sf10 s | 100x |")
    print("|---|---|---|---|---|---|")
    for name in ["y_window_distinct_count", "y_dedup_containment_lsh", "tpch_q21_waiting_suppliers"]:
        t01 = best_of(name, SF01)
        t1 = best_of(name, sf1)
        row = f"| {name} | {t01:.2f} | {t1:.2f} | {t1 / t01:.1f} |"
        if os.path.isdir(sf10) and name != "tpch_q21_waiting_suppliers":
            t10 = best_of(name, sf10)
            row += f" {t10:.2f} | {t10 / t01:.1f} |"
        else:
            row += " - | - |"
        print(row, flush=True)

    print()
    print("| query | sf0.1 median-of-3 s |")
    print("|---|---|")
    for name in ["x_dsir_resample", "tpch_q1"]:
        med = statistics.median(wall(name, SF01) for _ in range(3))
        print(f"| {name} | {med:.2f} |", flush=True)


if __name__ == "__main__":
    main()
