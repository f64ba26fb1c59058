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
#: ROUND-12 ROTATION (data-driven: slots ranked by last-green round
#: computed from CORRECTNESS_r01..r11 — scripts/rotation_audit.py
#: recomputes and checks this). The r11 window went 50/50 hash-green,
#: so all 50 rotate OUT. Slots, in order:
#:   1) the 22-key r7-stale cohort — last green r7, AT the 5-round
#:      staleness bound this round; pre-committed in the r11 rotation
#:      note and the r11 verdict's item 1;
#:   2) the NEW r12 keys (SpookyHash V2, SHOW CATALOGS/USE discovery,
#:      EXPLAIN VALIDATE/IO driver evidence, LSH-edge dup clusters,
#:      CCNet perplexity buckets, exact-substring spans) — new keys
#:      must sit in-window for the test_entry.py union-closure
#:      invariant;
#:   3) backfill 22 from the 46-key r8 cohort (next-stalest; bound
#:      hits at r13), favoring the heavy/plan-sensitive keys (TPC-H
#:      composites, the LLM pipeline block, MATCH_RECOGNIZE core).
#:      The 25 r8 keys that did NOT fit MUST rotate in at r13 (they
#:      reach the 5-round bound then): q_agg_approx_distinct_det,
#:      q_agg_approx_percentile_det, q_agg_group, q_agg_salted,
#:      q_cte, q_events_pattern_empty, q_events_pattern_skipnext,
#:      q_filter_range, q_join_broadcast, q_join_inner, q_join_left,
#:      q_join_semi, q_pandas_group_norm, q_stream_static_join,
#:      q_topk, q_trino_info_schema, q_trino_sql_unicode,
#:      q_view_create_read, q_win_rank, q_trino_sql_mr_desc,
#:      q_trino_sql_mr_prev, q_trino_sql_mr_skiplast,
#:      q_trino_sql_mr_skipsubset, q_trino_sql_mr_unmatched,
#:      q_trino_sql_mr_vars.
#:      25 + new r13 keys + r9-cohort backfill (49 keys, bound r14)
#:      keeps the schedule feasible at ~226 keys (45.2/round average
#:      vs the 50-slot window).
#:
#: WINDOW-INELIGIBLE, PERMANENTLY: q_agg_approx_distinct and
#: q_agg_approx_percentile never enter this list BY DESIGN — they are
#: Spark-native non-deterministic sketches whose values cannot
#: hash-match a DuckDB replay; their correctness evidence is the
#: hash-green deterministic twins (q_agg_approx_*_det) plus the error-
#: bound tests in tests/test_bounds.py. Rotation audits (including
#: scripts/rotation_audit.py) must exclude them from staleness checks.
_PRIORITY: tuple[str, ...] = (
    # 1) r7-stale cohort — at the staleness bound, mandatory this round
    "q_agg_collect", "q_agg_global", "q_distinct_rows", "q_except",
    "q_except_all", "q_filter_in", "q_filter_null", "q_intersect",
    "q_intersect_all", "q_join_cross", "q_limit",
    "q_llm_ann_ivf_static", "q_llm_dedup_embed", "q_llm_quantize",
    "q_llm_semdedup", "q_llm_stratified", "q_llm_tfidf",
    "q_meta_discovery", "q_offset", "q_sample", "q_scan_wide",
    "q_values",
    # 2) new r12 keys (inserted as they land)
    "q_trino_sql_spooky", "q_meta_catalogs", "q_trino_explain_validate",
    "q_llm_dup_clusters_lsh", "q_llm_ccnet_buckets",
    "q_llm_substring_spans", "q_llm_dedup_apply_lsh",
    # 3) r8 backfill (21 of 46; 22 + 7 + 21 = 50)
    "q_events_pattern",
    "q_events_pattern_rows",
    "q_trino_sql_mr",
    "q_llm_ann_ivf", "q_llm_ann_pq", "q_llm_bpe", "q_llm_bpe_apply",
    "q_llm_curation", "q_llm_decontaminate", "q_llm_dedup_exact",
    "q_llm_heavy_hitters", "q_llm_multimodal", "q_llm_project",
    "q_llm_quality_clf", "q_llm_similarity", "q_llm_trigram_lm",
    "q_llm_winnow",
    "q_tpch_q3", "q_tpch_q18", "q_pricing_summary", "q_scan_full",
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
