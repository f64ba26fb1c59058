"""Central query registry — single source of truth for the driver contract.

Every operator key from SURVEY.md §2 registers here with:
  - a Spark callable ``(SparkSession, sf_dir) -> DataFrame``
  - an optional DuckDB oracle SQL string (``None`` → driver runs the
    weaker rows-only check; used for non-deterministic / non-SQL ops).

``__spark_entry__.py`` re-exports this registry as ``queries()`` /
``oracle_sql()``; tests/test_oracle_parity.py runs the same comparison
the driver does (row count + schema + order-insensitive value hash).

Column-name discipline: every computed column is aliased identically in
the Spark callable and the oracle SQL — the driver sorts columns by name
before hashing.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


#: name -> QuerySpec. Populated by the @query decorator at module import.
QUERIES: dict[str, QuerySpec] = {}

#: Modules that define queries; imported lazily by load_all_queries().
_QUERY_MODULES = [
    "okera_trino_spark.operators.scan",
    "okera_trino_spark.operators.joins",
    "okera_trino_spark.operators.aggregates",
    "okera_trino_spark.operators.windows",
    "okera_trino_spark.operators.sorts_sets",
    "okera_trino_spark.operators.subqueries",
    "okera_trino_spark.operators.scalar_fns",
    "okera_trino_spark.operators.nested",
    "okera_trino_spark.operators.analytics",
    "okera_trino_spark.operators.analytics_ext",
    "okera_trino_spark.operators.tpch_full",
    "okera_trino_spark.operators.extras",
    "okera_trino_spark.operators.asof",
    "okera_trino_spark.operators.skew",
    "okera_trino_spark.operators.views_udfs",
    "okera_trino_spark.operators.pattern",
    "okera_trino_spark.streaming.windows",
    "okera_trino_spark.llm.dedup",
    "okera_trino_spark.llm.clusters",
    "okera_trino_spark.llm.contamination",
    "okera_trino_spark.llm.similarity",
    "okera_trino_spark.llm.text",
    "okera_trino_spark.llm.multimodal",
    "okera_trino_spark.functions.trino_sql",
    "okera_trino_spark.functions.trino_tpch",
]


def query(name: str, oracle: str | None = None,
          tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation under a SURVEY.md §2 key."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                  tags=tuple(tags), doc=(fn.__doc__ or "").strip())
        return fn

    return deco


#: Driver-window priority. The correctness driver records the FIRST 50 keys
#: of ``queries()`` in iteration order, so this list hand-picks one-or-more
#: representatives from EVERY SURVEY.md §2 family (§2.1 scan/pushdown, §2.2
#: joins/aggregates/windows/sorts-sets/subqueries/scalar-fns/nested/views-UDF,
#: §2.3 streaming, §2.4 LLM ops, §2.5 extensions: TPC-H composites, as-of,
#: salted-skew agg, applyInPandas). Keys not listed here keep their module
#: registration order after the priority block — they are still registered,
#: tested locally by tests/test_oracle_parity.py, and available to the driver.
#: ROUND-14 ROTATION (data-driven: slots ranked by last-green round
#: computed from CORRECTNESS_r01..r13 — scripts/rotation_audit.py
#: recomputes and checks this, and since r14 also simulates a
#: lookahead schedule and FAILS if any future window needs > 50
#: slots). The r13 window went 50/50 hash-green, so all 50 rotate
#: OUT. Slots, in order:
#:   1) the 29-key r9-stale cohort — last green r9, AT the 5-round
#:      staleness bound this round; pre-committed in the r13 rotation
#:      note and the r13 verdict's item 1;
#:   2) the NEW r14 keys — new keys must sit in-window for the
#:      test_entry.py union-closure invariant;
#:   3) backfill from the 50-key r10 cohort (next-stalest; bound hits
#:      at r15), favoring the heavy/plan-sensitive keys (the LLM
#:      pipeline block, the events-analytics block, as-of join).
#:      The 32 r10-cohort keys that did NOT fit MUST rotate in at r15
#:      (they reach the 5-round bound then) — rotation_audit.py prints
#:      the exact list: q_agg_bool, q_agg_histogram, q_agg_listagg,
#:      q_asof_join, q_events_gapfill, q_events_sessionize,
#:      q_fn_decimal, q_fn_interval,
#:      q_fn_json, q_fn_try, q_fn_url, q_join_range_banded,
#:      q_recursive_cte, q_scan_nested, q_sort_multi, q_sort_nulls,
#:      q_stream_dedup, q_stream_session, q_stream_slide,
#:      q_stream_stream_join, q_stream_tumble, q_trino_sql_breadth5,
#:      q_trino_sql_breadth6, q_trino_sql_jsonpath_bool,
#:      q_trino_sql_listagg_distinct, q_trino_sql_listagg_trunc,
#:      q_trino_sql_murmur3, q_trino_sql_statfns,
#:      q_trino_sql_word_stem, q_udf_current_db, q_unnest_ordinality,
#:      q_win_dist.
#:
#: R15 WINDOW PLAN (pre-staged): 32 mandatory (list above) + up to 3
#: new keys + 15 backfill from the 50-key r11 cohort, stalest-first
#: with the heavy/plan-sensitive keys preferred — suggested backfill:
#: q_llm_dedup_near, q_llm_dsir, q_llm_para_dedup, q_llm_chunk,
#: q_llm_ann_lsh, q_llm_entropy, q_llm_pack, q_llm_dedup_ngram,
#: q_tpch_q9, q_tpch_q21, q_tpch_q2, q_trino_tpch_q21,
#: q_trino_tpch_q1, q_win_frame_rows, q_join_full. The remaining 35
#: r11-cohort keys then form the r16 mandatory core (35 + 3 + 12 —
#: rotation_audit.py's lookahead verifies the whole chain to r20).
#:
#: NEW-KEY RULES (standing, r14):
#:   - BUDGET: at most 3 new registry keys per round — the declared
#:     budget rotation_audit.py's lookahead simulates. The capacity
#:     arithmetic is hard: ~230 keys x 5-round staleness bound vs a
#:     50-slot window leaves ~4 slots/round of slack; an unbudgeted
#:     ~5 keys/round breaches near r17. Exceeding the budget must be
#:     paid for by consolidating/removing existing keys in the SAME
#:     round (the audit fails loudly otherwise).
#:   - SCALE PROBE: any new key whose plan contains a shuffle ships
#:     WITH a SCALE_PROBE row at >= 1 decade (sf1.0) in the round it
#:     is born — the k-means/star precedent; scripts/scale_probe.py
#:     --keys makes the subset run cheap.
#:
#: WINDOW-INELIGIBLE, PERMANENTLY: q_agg_approx_distinct and
#: q_agg_approx_percentile never enter this list BY DESIGN — they are
#: Spark-native non-deterministic sketches whose values cannot
#: hash-match a DuckDB replay; their correctness evidence is the
#: hash-green deterministic twins (q_agg_approx_*_det) plus the error-
#: bound tests in tests/test_bounds.py. Rotation audits (including
#: scripts/rotation_audit.py) must exclude them from staleness checks.
_PRIORITY: tuple[str, ...] = (
    # 1) r9-stale cohort (29) — at the staleness bound, mandatory this
    #    round (enumerated in the r13 rotation note + verdict item 1)
    "q_agg_grouping_id", "q_agg_minmax_by", "q_agg_pivot",
    "q_agg_rollup", "q_agg_stats", "q_agg_unpivot", "q_case_expr",
    "q_count_star", "q_fn_array", "q_fn_bitwise", "q_fn_cast",
    "q_fn_date", "q_fn_map", "q_fn_math", "q_fn_regex", "q_fn_string",
    "q_fn_struct", "q_join_right", "q_profile_orders", "q_project",
    "q_stream_watermark", "q_subquery_corr", "q_trino_sql_xxhash64",
    "q_udf_custom", "q_udtf_split", "q_union_all", "q_unnest",
    "q_win_frame_range", "q_win_ntile",
    # 2) new r14 keys (the full 3-key budget): SemDeDup exactly as
    #    published (k-means cells + within-cell cosine prune), the
    #    dynamic-partition-pruning CORRECTNESS row, and
    #    Efraimidis-Spirakis weighted sampling — each displaced one
    #    backfill slot below (q_asof_join, q_events_gapfill,
    #    q_events_sessionize rejoin the r15 mandatory cohort)
    "q_llm_semdedup_kmeans",
    "q_meta_dpp",
    "q_llm_weighted_sample",
    # 3) r10 backfill (18 of 50; 29 + 3 + 18 = 50) — the LLM pipeline
    #    block and the events-analytics block
    "q_llm_dedup_apply", "q_llm_dedup_simhash",
    "q_llm_dedup_simhash_pairs", "q_llm_dup_clusters",
    "q_llm_fingerprint", "q_llm_frame_sample", "q_llm_knn_join",
    "q_llm_langid", "q_llm_mix", "q_llm_pii_scrub", "q_llm_pipeline",
    "q_llm_repetition", "q_llm_text_stats", "q_llm_tokens",
    "q_llm_vocab",
    "q_events_funnel", "q_events_outliers",
    "q_events_retention",
)


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry,
    reordered so the driver's 50-key correctness window spans every
    SURVEY.md §2 family (see ``_PRIORITY``)."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [k for k in _PRIORITY if k not in QUERIES]
    if missing:
        raise RuntimeError(f"_PRIORITY keys not registered: {missing}")
    ordered = {k: QUERIES[k] for k in _PRIORITY}
    ordered.update((k, s) for k, s in QUERIES.items() if k not in ordered)
    return ordered
