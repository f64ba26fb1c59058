#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall time over the headline set (one warm-up of the
session excluded: Spark JVM + first-read parquet footer costs are session
overhead, not per-query cost at scale).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline queries: the flagship plus one representative per operator
#: family (scan/filter, join, agg, window, sort, set, function, llm).
HEADLINE = [
    "q_pricing_summary",
    # Same logical query submitted as Trino-dialect TEXT: measures that
    # the string front end costs nothing at execution time (the rewrite
    # is pure text; the Catalyst plan matches the flagship's).
    "q_trino_tpch_q1",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q8",
    "q_tpch_q13",
    "q_tpch_q18",
    "q_tpch_q21",
    "q_filter_range",
    "q_join_inner",
    "q_join_broadcast",
    "q_agg_group",
    "q_agg_rollup",
    "q_win_rank",
    "q_topk",
    "q_union_all",
    "q_fn_string",
    "q_stream_tumble",
    "q_asof_join",
    "q_events_gapfill",
    "q_events_retention",
    "q_llm_curation",
    "q_llm_pipeline",
    "q_llm_dedup_exact",
    # r12 NOTE: dedup_near gained the candidate-doc verify-prune (the
    # sf10 probe's second catch — SCALE.md round-12); expect ~+0.5 s
    # over r11 at sf0.1, bought back 1.3-1.5x at the sf10 tier.
    "q_llm_dedup_near",
    "q_llm_dup_clusters",
    # r13 addition (r12 verdict item 6): the LSH-edge cluster resolver
    # is the at-scale default dedup path (df-independent candidate
    # volume; sub-linear both probe decades) and must be tracked
    # round-over-round. Reference point: 3.55 s at sf0.1 in the r12
    # isolated probe (SCALE_PROBE_r12.json). The exact-edge
    # q_llm_dup_clusters above stays the FROZEN host canary.
    "q_llm_dup_clusters_lsh",
    "q_llm_decontaminate",
    "q_llm_text_stats",
    "q_llm_vocab",
    "q_llm_similarity",
    # round 5 additions: the deterministic mixing gate (map-only filter
    # + tiny audit agg) and the recursive calendar-spine CTE (iterative
    # execution + broadcast join onto the fact scan).
    "q_llm_mix",
    "q_recursive_cte",
    # round 6 additions: tf-idf keywords (one corpus pass + word-key
    # join + per-doc window), char-trigram LM scoring (bounded-alphabet
    # broadcast join), and row-pattern matching (the one sanctioned
    # applyInPandas hot path — Arrow-batched per-user regex walk).
    "q_llm_tfidf",
    "q_llm_trigram_lm",
    "q_events_pattern",
    # round 7 additions: the remaining heavy r6 text/dedup operators so
    # the de-windowed plans (groupBy + join-back replacing hot-key
    # WindowExec) are measured, not inferred — passage dedup, SemDeDup
    # and sliding-window chunking.
    "q_llm_para_dedup",
    "q_llm_semdedup",
    "q_llm_chunk",
    # round 8 additions: ALL ROWS PER MATCH (emits |match|x more rows
    # than the summary form — its cost was previously unmeasured) and
    # the MATCH_RECOGNIZE string path with PREV() lag columns (dialect
    # parse + lag window + pattern walk end to end).
    "q_events_pattern_rows",
    "q_trino_sql_mr_prev",
    # round 8 sketch/projection family: the CMS heavy-hitter pass
    # (word-count-derived cell agg), the JL projection (Arrow-batched
    # BLAS matmul), and the winnowing fingerprint pass (the heaviest
    # pure higher-order-function pipeline — zero shuffle by design).
    "q_llm_heavy_hitters",
    "q_llm_project",
    "q_llm_winnow",
    "q_llm_ann_pq",
    "q_llm_bpe_apply",
    "q_llm_quality_clf",
    # round 12 additions: the newest heavy paths — DSIR importance
    # weighting (two corpus bucket passes + broadcast scoring join) and
    # the dialect-TEXT form of TPC-H Q21. r13 NOTE on the twin spread:
    # the twins INTENTIONALLY plan differently — the text lowers the
    # original double EXISTS faithfully (3 lineitem scans, decorrelated
    # joins) while native q_tpch_q21 is the at-scale window rewrite
    # (1 lineitem scan) — so the ~1.2-1.5x spread is an algorithmic
    # delta, pinned in tests/test_plans.py, NOT front-end overhead
    # (see functions/trino_tpch.py plan-shape note). r11 reference
    # points are the
    # cold-ish SCALE_PROBE_r11 sf0.1 runs (q_llm_dsir 2.23 s
    # single-repeat isolated-session; steady-state medians here will
    # be lower — BENCH_r12 sets the comparable baseline).
    "q_llm_dsir",
    "q_trino_tpch_q21",
    # r13 addition: deterministic k-means — iterative (2 Lloyd rounds,
    # each one corpus scan + one groupBy(k) shuffle, centroids as
    # broadcast literals); the clustering step SemDeDup-style pipelines
    # lean on, tracked round-over-round from its first round
    # (~2.8 s at sf0.1 on first measurement, host_factor ~1.03).
    "q_llm_kmeans",
    # r14 addition: SemDeDup as published — the k-means cells above
    # plus a within-cell pair join (equi-join on cluster_id) and
    # Arrow-batched cosine rescoring; tracked from its first round.
    "q_llm_semdedup_kmeans",
]

#: Timed steady-state repeats per query. Per-query headline time is the
#: MEDIAN over repeats (robust to a one-off GC/JIT stall in either
#: direction); the MIN is kept as a secondary signal (``queries_min``) —
#: it is the best-case steady-state cost and the stat all rounds <= r10
#: reported, so cross-round comparisons against old BENCH files should
#: use ``queries_min``. Raised from 2 to 3 in round 11: with 2 samples
#: min==median-indistinguishable noise made an ~8% body drift
#: unresolvable (r10 verdict); 3 samples give a real median.
REPEATS = 3

#: Host-variance canary: queries whose IMPLEMENTATION has been frozen
#: for multiple rounds, with frozen reference times (sf0.1, min-stat).
#: The emitted ``host_factor`` = median(current_min/reference) over this
#: set — a >1 factor means THIS host/run is that much slower than the
#: reference measurement, so a query at host_factor x its old time is
#: host noise, not a regression. Round 11 adds two DATA-BOUND canaries
#: (q_tpch_q18: 6-way join + grouped-HAVING at lineitem scale;
#: q_llm_dup_clusters: the iterative component resolver, untouched
#: since r8 — it replaced q_llm_winnow mid-r11 when the conditional-
#: spread change made winnow ~4x faster, and a canary must have a
#: FROZEN implementation) so the factor tracks the data-bound body,
#: not just sub-0.2s planning-bound shapes — the r10
#: canary-faster/body-slower split was unreadable without them.
#: Their references are the cross-round median of the r8/r9/r10 BENCH
#: min-stat values (code untouched across those rounds). Only meaningful
#: at sf0.1 (the reference scale); omitted otherwise.
CANARY_REF_SF01 = {
    # planning-bound, frozen since round 3 (r3 reference times)
    "q_fn_string": 0.0824,
    "q_union_all": 0.0769,
    "q_topk": 0.1053,
    "q_filter_range": 0.1392,
    "q_win_rank": 0.0978,
    # data-bound, frozen since r8 (median of r8/r9/r10 min-stat).
    # q_llm_winnow was the second data-bound canary until mid-r11, when
    # its implementation changed (spread_if_narrow, ~4x faster) — a
    # canary must have a FROZEN implementation, so it is replaced by
    # q_llm_dup_clusters (clusters.py untouched since r8).
    "q_tpch_q18": 0.9265,
    "q_llm_dup_clusters": 3.3544,
}


# MEASUREMENT-INTEGRITY NOTE (r13, closing the r12 verdict's item 3 —
# the 1.75x same-round disagreement between BENCH_r12's in-bench
# trigram_lm (2.41 s) and SCALE_PROBE_r12's isolated reading (1.37 s)):
# measured A/B this round, the gap is CROSS-SESSION HOST DRIFT, not
# accumulated bench-session state. Same-day evidence: isolated
# fresh-session trigram_lm min-of-3 = 2.05 s vs in-bench 2.33 s — a
# 14% gap, inside the verdict's 15% bound — while the frozen planning
# canaries read ~1.3x their r12 values (the host was simply faster
# during the r12 probe run than during the r12 bench run). Two
# remediations were tried and REJECTED on measurement:
#   - forcing a JVM GC between samples (gc.collect() +
#     System.gc()): catastrophic — the 128 GiB full collection
#     degrades the NEXT timed query 2-4x (q_fn_string 0.136->0.614 s,
#     q_llm_dedup_near 3.1->8.4 s). Do not re-add.
#   - unpersisting all persistent RDDs between samples
#     (getPersistentRDDs + unpersist): statistically neutral at sf0.1
#     (within rep-to-rep noise in an interleaved A/B/A) — at r13
#     nothing big was pinned, so it was judged not worth the code
#     path. SUPERSEDED in r15: once q_llm_semdedup_kmeans (r14) put a
#     per-invocation localCheckpoint of the embedding corpus in the
#     headline list, the accumulation became the r14 median collapse
#     (headline median 2.7x over r13 while min-stat stayed flat). The
#     r15 three-way bisect at sf0.1 pinned it: NO_RELEASE + full list
#     degrades monotonically (bpe_apply 3.74->4.92->4.90, dsir
#     2.23->2.76->3.21); NO_RELEASE with ONLY semdedup_kmeans skipped
#     is flat (med/min <= 1.08); release WITH the key is flat too
#     (med/min <= 1.17, repeats IMPROVE) — so the release ships (see
#     _release_persisted) and the key stays measured.
# The durable interpretive rule stands: cross-harness and cross-round
# comparisons must be read THROUGH host_factor (the frozen-canary
# ratio emitted below); an isolated-probe number is exactly as
# host-moment-sensitive as an in-bench number.


def _release_persisted(spark) -> None:
    """Drop every block still pinned by FINISHED samples — caches and
    ``localCheckpoint`` blocks alike (local checkpoints persist their
    RDD, so they show up in ``getPersistentRDDs``).

    Why (r15, the r14 median-collapse diagnosis): every sample builds
    its query plan fresh, so nothing persisted by a previous sample is
    ever reused — but the blocks stay pinned until the DataFrame is
    GC'd. A headline key that checkpoints a corpus WITH embedding
    arrays (q_llm_semdedup_kmeans) pins ~that working set PER
    INVOCATION; over warm-up + 3 repeats the accumulation drives the
    same allocator-pressure/GC-stall mode the r14 sf10 substring probe
    diagnosed, degrading every LATER multi-job sample in the pass
    (median >> min while min stays flat). Unpersisting between samples
    was measured NEUTRAL at sf0.1 when nothing big is pinned (r13
    note below) and removes the accumulation when something is. Never
    force a JVM GC instead — measured catastrophic (same note)."""
    # blocking=True: the release sits OUTSIDE the timed window, and an
    # async drop would let BlockManager cleanup overlap the NEXT
    # sample's timed region — the same cross-key contamination one
    # level down (scale_probe's _clear_session_state does the same).
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


def main() -> None:
    from okera_trino_spark.registry import load_all_queries
    from okera_trino_spark.session import get_spark

    # Debug knobs for session-degradation bisects (r15): SKIP drops
    # named keys from the headline list; NO_RELEASE disables the
    # between-sample block release so the r14 harness behavior can be
    # reproduced on demand. Validated BEFORE the JVM spins up — a
    # typo'd skip silently measuring the WRONG configuration while
    # the artifact claims otherwise is exactly the silent-no-op
    # failure scale_probe.py guards --keys against.
    skip = {s for s in os.environ.get(
        "SPARK_GRAFT_BENCH_SKIP", "").split(",") if s}
    unknown = sorted(skip - set(HEADLINE))
    if unknown:
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_SKIP names not in HEADLINE: {unknown}")
    release = os.environ.get("SPARK_GRAFT_BENCH_NO_RELEASE", "") != "1"

    specs = load_all_queries()
    spark = get_spark("okera-trino-spark-bench")
    names = [n for n in HEADLINE if n in specs and n not in skip]

    # Warm-up pass (untimed): run every headline query once so one-time
    # costs — JVM spin-up, parquet footer reads, and per-plan whole-stage
    # codegen JIT — are excluded from the steady-state measurement. This
    # mirrors how the engine runs in production: a long-lived session
    # executing a query shape repeatedly, not a cold process per query.
    for name in names:
        specs[name].fn(spark, SF_DIR).count()
        if release:
            _release_persisted(spark)

    samples: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(REPEATS):
        for name in names:
            start = time.perf_counter()
            df = specs[name].fn(spark, SF_DIR)
            df.count()  # full materialization without driver-side collect
            samples[name].append(time.perf_counter() - start)
            # OUTSIDE the timed window: the release is bookkeeping for
            # blocks the finished sample left behind, not query cost.
            if release:
                _release_persisted(spark)

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    timings = {n: round(_median(xs), 4) for n, xs in samples.items()}
    timings_min = {n: round(min(xs), 4) for n, xs in samples.items()}

    m = re.search(r"sf([0-9.]+)$", SF_DIR.rstrip("/"))
    try:
        sf: float | str = float(m.group(1)) if m else SF_DIR
    except ValueError:
        sf = SF_DIR
    # KEY ORDER IS THE CONTRACT (r15, r14 verdict "what's missing" #2):
    # the driver archives only the LAST 2000 chars of stdout, so the
    # bulky per-key dicts print FIRST and the headline facts — value,
    # value_min, host_factor, the worst median/min degradation ratios —
    # print LAST, where the tail always keeps them. ``samples`` holds
    # the raw per-repeat wall times per key (execution order preserved)
    # so a median-vs-min divergence can be diagnosed from the artifact
    # instead of reconstructed (the r14 failure mode).
    out = {
        "metric": "headline_total_wall_sec",
        "unit": "sec",
        "stat": "median",
        "repeats": REPEATS,
        "sf": sf,
        "samples": {n: [round(x, 4) for x in xs]
                    for n, xs in samples.items()},
        "queries": timings,
        "queries_min": timings_min,
        # forensics: whether the between-sample release ran and which
        # keys were skipped — an artifact produced under the debug
        # knobs must say so
        "release_between_samples": release,
        "skipped": sorted(skip & set(HEADLINE)),
        "value": round(sum(timings.values()), 4),
        "value_min": round(sum(timings_min.values()), 4),
    }
    if sf == 0.1:
        # min-stat ratios: the frozen references are min-stat numbers.
        ratios = sorted(timings_min[n] / ref for n, ref in
                        CANARY_REF_SF01.items() if n in timings_min)
        if ratios:
            out["host_factor"] = round(_median(ratios), 3)
    # worst in-session degradation, median/min per key — a healthy
    # steady-state session reads ~1.0-1.2; >2 on multi-job keys is the
    # allocator-pressure signature (r14) and should be diagnosed from
    # ``samples`` before trusting cross-round median comparisons.
    worst = sorted(((round(timings[n] / timings_min[n], 2), n)
                    for n in timings if timings_min[n] > 0),
                   reverse=True)[:5]
    out["degrade_top"] = {n: r for r, n in worst}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
