"""r10 per-query profiler: run the given queries N times each with the
noop sink and a per-run job description, with Spark event logging on,
then fold the event log into per-query structural metrics — tasks,
stages, shuffle read/write bytes, executor CPU/run time — plus wall
clock per run. Guide §1: measure first; the structural numbers are
exactly reproducible even when this host's wall clock is not.

Usage: python scripts/profile_r10.py [query ...]  (default: top costs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_to_dbsp_compiler_spark.queries import REGISTRY

DEFAULT = [
    "dedup_canonical_groups",
    "y_dedup_delta_retract",
    "embedding_lsh_neardup",
    "tpch_q1",
    "x_semdedup",
    "y_dedup_delta_commit",
    "x_bm25_topk",
    "dedup_minhash_pairs",
]

EVDIR = "/tmp/spark_events_r10"


def get_spark_with_events(app: str):
    os.makedirs(EVDIR, exist_ok=True)
    # event-log confs must reach the JVM at launch — PYSPARK_SUBMIT_ARGS
    # is read when the gateway starts, before the session builder runs
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.eventLog.enabled=true "
        f"--conf spark.eventLog.compress=false "
        f"--conf spark.eventLog.rolling.enabled=false "
        f"--conf spark.eventLog.dir=file://{EVDIR} pyspark-shell"
    )
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from sql_to_dbsp_compiler_spark.session import get_spark as _gs

    return _gs(app)


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    runs = int(os.environ.get("PROFILE_RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark_with_events("profile_r10")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    app_id = sc.applicationId

    # warmup
    REGISTRY[names[0]].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    walls: dict[str, list[float]] = {}
    for name in names:
        walls[name] = []
        for r in range(runs):
            sc.setJobDescription(f"q::{name}::{r}")
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[name].append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
    spark.stop()

    # fold the event log (Spark 4 writes a rolling eventlog_v2 dir)
    path = os.path.join(EVDIR, app_id)
    v2 = os.path.join(EVDIR, f"eventlog_v2_{app_id}")
    if not os.path.exists(path) and os.path.isdir(v2):
        evs = [
            os.path.join(v2, f)
            for f in sorted(os.listdir(v2))
            if f.startswith("events_")
        ]
        path = evs[0] if len(evs) == 1 else None
        if path is None:
            import itertools

            def _lines():
                for f in evs:
                    yield from open(f)

            lines = _lines()
        else:
            lines = open(path)
    else:
        lines = open(path)
    jobs: dict[int, str] = {}  # job id -> description
    stage_to_job: dict[int, int] = {}
    agg: dict[str, dict] = {
        n: dict.fromkeys(
            ["tasks", "stages", "shuffle_read", "shuffle_write", "cpu_ns", "run_ns"], 0
        )
        for n in names
    }
    for line in lines:
        ev = json.loads(line)
        t = ev.get("Event")
        if t == "SparkListenerJobStart":
            desc = ev.get("Properties", {}).get("spark.job.description", "")
            jobs[ev["Job ID"]] = desc
            for st in ev.get("Stage Infos", []):
                stage_to_job[st["Stage ID"]] = ev["Job ID"]
        elif t == "SparkListenerStageCompleted":
            sid = ev["Stage Info"]["Stage ID"]
            desc = jobs.get(stage_to_job.get(sid, -1), "")
            if not desc.startswith("q::"):
                continue
            name, run = desc.split("::")[1:3]
            if name not in agg or run != "0":
                continue  # structural metrics from run 0 only
            agg[name]["stages"] += 1
        elif t == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            desc = jobs.get(stage_to_job.get(sid, -1), "")
            if not desc.startswith("q::"):
                continue
            name, run = desc.split("::")[1:3]
            if name not in agg or run != "0":
                continue
            m = ev.get("Task Metrics") or {}
            agg[name]["tasks"] += 1
            agg[name]["cpu_ns"] += m.get("Executor CPU Time", 0)
            agg[name]["run_ns"] += m.get("Executor Run Time", 0) * 1_000_000
            agg[name]["shuffle_read"] += (m.get("Shuffle Read Metrics") or {}).get(
                "Remote Bytes Read", 0
            ) + (m.get("Shuffle Read Metrics") or {}).get("Local Bytes Read", 0)
            agg[name]["shuffle_write"] += (
                m.get("Shuffle Write Metrics") or {}
            ).get("Shuffle Bytes Written", 0)

    out = {}
    for n in names:
        a = agg[n]
        out[n] = {
            "walls": walls[n],
            "tasks": a["tasks"],
            "stages": a["stages"],
            "cpu_s": round(a["cpu_ns"] / 1e9, 2),
            "run_s": round(a["run_ns"] / 1e9, 2),
            "shuffle_read_mb": round(a["shuffle_read"] / 1e6, 2),
            "shuffle_write_mb": round(a["shuffle_write"] / 1e6, 2),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
