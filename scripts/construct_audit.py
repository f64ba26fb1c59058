#!/usr/bin/env python
"""Construction-vs-execution dissection for every headline key (r16,
verdict item 4): time ``fn(spark, sf_dir)`` — pure DataFrame/plan
construction, where py4j chatter and driver-side checkpoint
materialization live — separately from the ``count()`` action. Keys
whose construction dominates are candidates for parsed-expression
conversion (the r15 kmeans/LSH lesson) or checkpoint restructuring;
keys whose action dominates need plan work instead.

NOTE: a localCheckpoint call inside fn() executes its upstream AQE
stages at construction time, so ``construct`` includes that real
compute for checkpointing keys — read the split together with the
plan, not as pure driver overhead.

    python scripts/construct_audit.py [--keys a,b,c] [--repeats 3]
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
    ap.add_argument("--keys", default="")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from bench import HEADLINE, _release_persisted
    from okera_trino_spark.registry import load_all_queries
    from okera_trino_spark.session import get_spark

    specs = load_all_queries()
    names = ([k for k in args.keys.split(",") if k] if args.keys
             else [n for n in HEADLINE if n in specs])
    spark = get_spark("okera-trino-spark-construct-audit")
    sc = spark.sparkContext

    results: dict[str, dict] = {}
    for name in names:
        sc.setJobDescription(f"warmup:{name}")
        specs[name].fn(spark, SF_DIR).count()
        _release_persisted(spark)
        cons, act = [], []
        for rep in range(args.repeats):
            sc.setJobDescription(f"construct:{name}:rep{rep}")
            t0 = time.perf_counter()
            df = specs[name].fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            act.append(t2 - t1)
            _release_persisted(spark)
        sc.setJobDescription(None)
        results[name] = {
            "construct_min": round(min(cons), 3),
            "action_min": round(min(act), 3),
            "construct_samples": [round(x, 3) for x in cons],
            "action_samples": [round(x, 3) for x in act],
        }
        print(f"{name:28s} construct={min(cons):6.3f} action={min(act):6.3f} "
              f"frac={min(cons) / max(min(cons) + min(act), 1e-9):5.1%}",
              flush=True)

    if args.out:
        Path(args.out).write_text(json.dumps(
            {"sf_dir": SF_DIR, "results": results}, indent=1))


if __name__ == "__main__":
    main()
