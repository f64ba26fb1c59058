#!/usr/bin/env python
"""Measure the sf0.1 -> sf1.0 scaling of the most expensive registry
keys (r11). One decade of measured data per operator family turns the
plan-shape 100-TB argument in SCALE.md into evidence.

Prints one line per key: name, t(sf0.1), t(sf1.0), ratio. Data grows
10x, cores are fixed (local[32]), so near-linear work shows a ratio
<= ~12 (10x work + shuffle/log overheads); a ratio well above that
flags super-linear cost (pair blowup, driver iteration growth).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

KEYS = [
    "q_llm_dup_clusters",
    "q_llm_bpe_apply",
    "q_llm_winnow",
    "q_llm_semdedup",
    "q_llm_trigram_lm",
    # relational core (r11 second wave — 10x fact tables, fixed dims)
    "q_tpch_q18",
    "q_tpch_q21",
    "q_asof_join",
    "q_events_sessionize",
    "q_events_pattern_rows",
    "q_llm_dedup_near",
    # r11 third wave: DSIR — the broadcast-model scoring shape
    "q_llm_dsir",
]

SF01 = "/root/testdata/sf0.1"
SF10 = str(Path(__file__).resolve().parent.parent / ".scale" / "sf1.0")
REPEATS = 2


def _clear_session_state(spark) -> None:
    """Drop every persisted/checkpointed block between keys. Several
    probe keys localCheckpoint intermediates (dup_clusters' label
    rounds, bpe's vocab, the text keys' term counts); in one shared
    session those blocks accumulate and pin executor memory, slowing
    LATER keys' measurements by 2-6x (r11: winnow measured 21 s inside
    the shared session vs 3.3 s fresh). Per-key isolation makes the
    numbers comparable without paying a JVM restart per key."""
    spark.catalog.clearCache()
    # py4j converts the java.util.Map to a dict-like view
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


def main() -> None:
    from okera_trino_spark.registry import load_all_queries
    from okera_trino_spark.session import get_spark

    specs = load_all_queries()
    spark = get_spark("okera-trino-spark-scale-probe")

    results = {}
    for name in KEYS:
        fn = specs[name].fn
        times = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1.0", SF10)):
            fn(spark, sf_dir).count()  # warm-up: JIT + footer reads
            _clear_session_state(spark)
            samples = []
            for _ in range(REPEATS):
                samples.append(_timed(fn, spark, sf_dir))
                # clear BETWEEN repeats too: a prior run's checkpoint
                # blocks pinning memory during the next timed run is
                # the same contamination, one level down
                _clear_session_state(spark)
            times[label] = round(min(samples), 3)
        ratio = round(times["sf1.0"] / times["sf0.1"], 2)
        results[name] = {**times, "ratio": ratio}
        print(json.dumps({"key": name, **results[name]}), flush=True)
    print(json.dumps({"scale_probe": results}))


def _timed(fn, spark, sf_dir) -> float:
    start = time.perf_counter()
    fn(spark, sf_dir).count()
    return time.perf_counter() - start


if __name__ == "__main__":
    main()
