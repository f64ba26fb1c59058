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
#: ROUND-8 ROTATION. Slots, in order:
#:   1) the two r7 keys that were registered without a window slot (the
#:      r7 process miss — zero driver signal ever) + the NEW r8 keys
#:      (SKIP TO NEXT ROW, ALL-ROWS RUNNING measures) — new keys must
#:      sit in-window to keep the test_entry.py union-closure
#:      invariant green;
#:   2) keys whose implementation or oracle CHANGED in r8:
#:      q_llm_ann_ivf (graduated to the Lloyd-replay hard oracle —
#:      deterministic 4dp centroids / 6dp argmin), q_llm_trigram_lm
#:      (model broadcast hint dropped for AQE), q_events_pattern /
#:      q_trino_sql_mr (shared operator gained the skip-mode walk and
#:      vector measures);
#:   3) the r2 cohort — six rounds stale, the oldest evidence in the
#:      repo — filling the window to exactly 50 (the r2 keys left
#:      out, q_udtf_split, q_count_star, q_fn_cast, q_union_all,
#:      q_fn_array, and — for the session-3 keys q_llm_ann_pq /
#:      q_llm_bpe_apply / q_trino_sql_unicode / q_llm_bpe /
#:      q_trino_info_schema — q_fn_string, q_fn_date, q_unnest,
#:      q_case_expr, q_project and — for q_trino_sql_listagg /
#:      q_llm_quality_clf — q_win_frame_range, q_agg_stats and (for
#:      q_trino_sql_mr_skipsubset) q_agg_rollup: all
#:      have driver rows (q_project's pushdown and q_win_frame_range's
#:      E16 surface are also covered by plan-asserted/r7 sibling keys)
#:      and re-enter next rotation; the late-r8
#:      q_events_pattern_empty / q_llm_winnow / q_trino_sql_mr_vars /
#:      q_trino_sql_mr_desc took the first five slots).
#: q_llm_bpe RE-ENTERS the window (late r8): it graduated from
#: rows-only to a hash oracle (the learning rounds unrolled as chained
#: CTEs), so its driver check upgrades — the changed-key rule applies.
_PRIORITY: tuple[str, ...] = (
    # 1) zero-driver-signal + new in r8
    "q_trino_sql_mr_prev", "q_events_pattern_rows",
    "q_events_pattern_skipnext", "q_trino_sql_mr_running",
    "q_trino_sql_breadth2", "q_trino_sql_mr_skiplast",
    "q_trino_sql_mr_unmatched", "q_agg_approx_distinct_det",
    "q_agg_approx_percentile_det", "q_llm_project",
    "q_llm_heavy_hitters", "q_events_pattern_empty", "q_llm_winnow",
    "q_trino_sql_mr_vars", "q_trino_sql_mr_desc",
    "q_trino_sql_breadth3", "q_llm_ann_pq", "q_llm_bpe_apply",
    "q_trino_sql_unicode", "q_llm_bpe", "q_trino_info_schema",
    "q_trino_sql_listagg", "q_llm_quality_clf",
    "q_trino_sql_mr_skipsubset",
    # 2) changed in r8
    "q_llm_ann_ivf", "q_llm_trigram_lm", "q_events_pattern",
    "q_trino_sql_mr",
    # 3) r2-stale cohort
    "q_pricing_summary", "q_scan_full", "q_filter_range",
    "q_join_inner", "q_join_left", "q_join_semi",
    "q_join_broadcast", "q_agg_group",
    "q_win_rank", "q_topk",
    "q_cte",
    "q_tpch_q3", "q_tpch_q18", "q_pandas_group_norm", "q_agg_salted",
    "q_view_create_read",
    "q_stream_static_join", "q_llm_dedup_exact",
    "q_llm_similarity", "q_llm_decontaminate", "q_llm_curation",
    "q_llm_multimodal",
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
