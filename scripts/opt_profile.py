#!/usr/bin/env python
"""Optimization-round profiler (r15): per-query wall time, Spark job /
stage / task counts, and the formatted physical plan.

Unlike bench.py (the driver's timing contract, untouched), this tool
answers the guide's §1 question — WHERE the time goes — for any subset
of headline keys:

    python scripts/opt_profile.py [--keys a,b,c] [--repeats N]
        [--plans-dir plans/r15] [--suffix _before]

Per key it reports min/median wall over N repeats, the number of Spark
jobs the action triggered (multi-job keys pay per-job scheduling +
collect latency — the fixed overhead that dominates at sf0.1), total
tasks, and writes ``<plans-dir>/<key><suffix>.txt`` with
``explain('formatted')``. State is released between repeats the same
way bench.py does, so numbers are comparable to the bench's min stat.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default="",
                    help="comma-separated headline keys (default: all)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--out", default="", help="write JSON here too")
    args = ap.parse_args()

    from bench import HEADLINE, _release_persisted
    from okera_trino_spark.registry import load_all_queries
    from okera_trino_spark.session import get_spark

    specs = load_all_queries()
    names = ([k for k in args.keys.split(",") if k] if args.keys
             else [n for n in HEADLINE if n in specs])
    unknown = [n for n in names if n not in specs]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    spark = get_spark("okera-trino-spark-opt-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    plans_dir = Path(args.plans_dir) if args.plans_dir else None
    if plans_dir:
        plans_dir.mkdir(parents=True, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        # warm-up (plan + codegen JIT + footer reads), untimed
        sc.setJobDescription(f"warmup:{name}")
        specs[name].fn(spark, SF_DIR).count()
        _release_persisted(spark)

        walls: list[float] = []
        jobs = tasks = 0
        for rep in range(args.repeats):
            before_ids = set(tracker.getJobIdsForGroup() or [])
            all_before = set(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}:rep{rep}")
            start = time.perf_counter()
            df = specs[name].fn(spark, SF_DIR)
            df.count()
            walls.append(time.perf_counter() - start)
            if rep == 0:
                all_after = set(tracker.getJobIdsForGroup(None) or [])
                new_jobs = sorted(all_after - all_before)
                jobs = len(new_jobs)
                tasks = 0
                for jid in new_jobs:
                    ji = tracker.getJobInfo(jid)
                    if ji is None:
                        continue
                    for sid in ji.stageIds:
                        si = tracker.getStageInfo(sid)
                        if si is not None:
                            tasks += si.numTasks
            _release_persisted(spark)
        sc.setJobDescription(None)

        if plans_dir:
            df = specs[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}{args.suffix}.txt").write_text(plan)
            _release_persisted(spark)

        s = sorted(walls)
        mid = len(s) // 2
        med = s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2
        results[name] = {
            "min": round(min(walls), 3),
            "median": round(med, 3),
            "jobs": jobs,
            "tasks": tasks,
            "samples": [round(x, 3) for x in walls],
        }
        print(f"{name:32s} min={min(walls):7.3f} med={med:7.3f} "
              f"jobs={jobs:3d} tasks={tasks:5d}", flush=True)

    print(json.dumps({"sf_dir": SF_DIR, "results": results}))
    if args.out:
        Path(args.out).write_text(
            json.dumps({"sf_dir": SF_DIR, "results": results}, indent=1))


if __name__ == "__main__":
    main()
