#!/usr/bin/env python
"""Interleaved A/B for the keyed spread (r16 NEGATIVE result): variant
A is the shipped round-robin spread_if_narrow, variant B monkeypatches
it to hash-partition on doc_id — the rejected r16 experiment (it
removed the (doc, key) aggregation exchange but hash imbalance over
~5000 docs x 64 partitions straggled the dominant explode stage;
measured trigram min 1.294 -> 1.655 REGRESSION, dsir ~neutral).
Alternating repeats in ONE session so host drift hits both variants
equally. The keyed variant is replicated HERE (the ``by`` parameter was
reverted from the engine) so the negative result stays reproducible."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import okera_trino_spark.operators._util as _util
from bench import _release_persisted
from okera_trino_spark.registry import load_all_queries
from okera_trino_spark.session import get_spark

_real_spread = _util.spread_if_narrow


def _spread_keyed(df, spark, factor=2):
    """The rejected variant: hash-partition on doc_id instead of
    round-robin (same condition and target as the real helper)."""
    from pyspark.sql import functions as F

    target = spark.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col("doc_id"))


def main() -> None:
    keys = (sys.argv[1] if len(sys.argv) > 1
            else "q_llm_trigram_lm,q_llm_dsir").split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    specs = load_all_queries()
    spark = get_spark("okera-trino-spark-ab-spread")
    sc = spark.sparkContext

    for name in keys:
        fn = specs[name].fn
        # untimed warm-up, one per variant
        for patched in (False, True):
            _util.spread_if_narrow = (_spread_keyed if patched
                                      else _real_spread)
            fn(spark, SF_DIR).count()
            _release_persisted(spark)
        walls: dict[str, list[float]] = {"A_roundrobin": [], "B_keyed": []}
        for rep in range(reps):
            for label, patched in (("A_roundrobin", False), ("B_keyed", True)):
                _util.spread_if_narrow = (_spread_keyed if patched
                                          else _real_spread)
                sc.setJobDescription(f"ab:{name}:{label}:{rep}")
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                walls[label].append(time.perf_counter() - t0)
                _release_persisted(spark)
        _util.spread_if_narrow = _real_spread
        sc.setJobDescription(None)
        for label, ws in walls.items():
            s = sorted(ws)
            mid = len(s) // 2
            med = s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2
            print(f"{name:24s} {label:14s} min={min(ws):7.3f} "
                  f"med={med:7.3f} samples={[round(x, 3) for x in ws]}",
                  flush=True)


if __name__ == "__main__":
    main()
