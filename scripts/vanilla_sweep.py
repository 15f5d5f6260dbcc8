"""Driver-faithful fresh-process correctness sweep.

The r5 postmortem: three driver reds were invisible to a 219/219
local sweep because the local sweep ran on ``session.py``'s tuned
SparkSession (which pins the constraint-propagation workaround,
Python-source filter pushdown, Arrow, UTC) while the driver hands the
engine a VANILLA ``SparkSession.builder.getOrCreate()``. This sweep
reproduces the driver's environment contract:

- a vanilla session — ``master(local[N])`` and an app name, nothing
  else; every load-bearing conf must be pinned at runtime by the
  engine itself (``sources.tables._ensure_session_confs``) or not be
  depended on;
- the driver's canonicalization (raw pandas ``sort_values`` + cell
  hashing via ``testing.driver_canonicalize``), which hard-fails on
  bare array/map/struct output columns;
- the exact value compare from ``testing.compare_frames`` on top.

Usage:
    python scripts/vanilla_sweep.py [--sf-dir DIR] [--names a,b,c]
                                    [--window-only]

``--window-only`` sweeps just the names the NEXT driver round will
audit (first 50 alphabetical exports from ``__spark_entry__``),
which is the fast pre-freeze check.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default="")
    ap.add_argument("--window-only", action="store_true")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # VANILLA on purpose: no shuffle-partition tuning, no Arrow, no
    # workaround confs. Do not "fix" this by importing session.py —
    # the whole point is to match the driver's environment.
    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("vanilla_sweep")
        .getOrCreate()
    )

    import __spark_entry__ as entry
    from sql_to_dbsp_compiler_spark.testing import (
        compare_frames,
        driver_canonicalize,
        run_oracle,
    )

    qmap = entry.queries()
    omap = entry.oracle_sql()
    names = [n for n in sorted(qmap) if n in omap]
    if args.window_only:
        names = [n for n in sorted(qmap)][:50]
        names = [n for n in names if n in omap]
    if args.names:
        want = set(args.names.split(","))
        names = [
            n for n in names
            if n in want
            or (n.startswith(("zz_", "a0_")) and n[3:] in want)
        ]

    results: dict[str, dict] = {}
    failed = []
    for i, name in enumerate(names, 1):
        t0 = time.time()
        row: dict = {}
        try:
            spark_pdf = qmap[name](spark, args.sf_dir).toPandas()
            driver_canonicalize(spark_pdf)
            oracle_pdf = run_oracle(omap[name], args.sf_dir)
            problems = compare_frames(spark_pdf, oracle_pdf)
            row = {
                "ok": not problems,
                "spark_rows": len(spark_pdf),
                "oracle_rows": len(oracle_pdf),
                "problems": problems[:3],
                "sec": round(time.time() - t0, 2),
            }
        except Exception as exc:  # noqa: BLE001 — sweep must report, not die
            row = {
                "ok": False,
                "err": f"{type(exc).__name__}: {exc}"[:500],
                "sec": round(time.time() - t0, 2),
            }
            traceback.print_exc(limit=4)
        results[name] = row
        if not row["ok"]:
            failed.append(name)
        print(f"[{i}/{len(names)}] {name}: "
              f"{'ok' if row['ok'] else 'FAIL'} ({row['sec']}s)", flush=True)

    print(json.dumps({
        "total": len(names),
        "passed": len(names) - len(failed),
        "failed": failed,
    }))
    out = os.path.join(REPO, ".artifacts", "vanilla_sweep.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
