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
#: ROUND-13 ROTATION (data-driven: slots ranked by last-green round
#: computed from CORRECTNESS_r01..r12 — scripts/rotation_audit.py
#: recomputes and checks this). The r12 window went 50/50 hash-green,
#: so all 50 rotate OUT. Slots, in order:
#:   1) the 25-key r8-stale cohort — last green r8, AT the 5-round
#:      staleness bound this round; pre-committed in the r12 rotation
#:      note and the r12 verdict's item 1;
#:   2) the NEW r13 keys (SHOW STATS driver evidence for C13;
#:      alternating-star cluster resolver; auth/delegation/audit
#:      driver evidence for C18-C20; deterministic k-means +
#:      cluster-balanced sampling) — new
#:      keys must sit in-window for the test_entry.py union-closure
#:      invariant;
#:   3) backfill 20 from the 49-key r9 cohort (next-stalest; bound
#:      hits at r14), favoring the heavy/plan-sensitive keys (the
#:      TPC-H composite block, the Trino-dialect breadth/ties/
#:      MATCH_RECOGNIZE keys, window frames).
#:      The 29 r9 keys that did NOT fit MUST rotate in at r14 (they
#:      reach the 5-round bound then): q_agg_grouping_id,
#:      q_agg_minmax_by, q_agg_pivot, q_agg_rollup, q_agg_stats,
#:      q_agg_unpivot, q_case_expr, q_count_star, q_fn_array,
#:      q_fn_bitwise, q_fn_cast, q_fn_date, q_fn_map, q_fn_math,
#:      q_fn_regex, q_fn_string, q_fn_struct, q_join_right,
#:      q_profile_orders, q_project, q_stream_watermark,
#:      q_subquery_corr, q_trino_sql_xxhash64, q_udf_custom,
#:      q_udtf_split, q_union_all, q_unnest, q_win_frame_range,
#:      q_win_ntile.
#:      29 + new r14 keys + r10-cohort backfill keeps the schedule
#:      feasible at ~230 keys (~45/round average vs the 50-slot
#:      window).
#:
#: WINDOW-INELIGIBLE, PERMANENTLY: q_agg_approx_distinct and
#: q_agg_approx_percentile never enter this list BY DESIGN — they are
#: Spark-native non-deterministic sketches whose values cannot
#: hash-match a DuckDB replay; their correctness evidence is the
#: hash-green deterministic twins (q_agg_approx_*_det) plus the error-
#: bound tests in tests/test_bounds.py. Rotation audits (including
#: scripts/rotation_audit.py) must exclude them from staleness checks.
_PRIORITY: tuple[str, ...] = (
    # 1) r8-stale cohort (25) — at the staleness bound, mandatory this
    #    round (enumerated in the r12 rotation note + verdict item 1)
    "q_agg_approx_distinct_det", "q_agg_approx_percentile_det",
    "q_agg_group", "q_agg_salted", "q_cte",
    "q_events_pattern_empty", "q_events_pattern_skipnext",
    "q_filter_range", "q_join_broadcast", "q_join_inner",
    "q_join_left", "q_join_semi", "q_pandas_group_norm",
    "q_stream_static_join", "q_topk", "q_trino_info_schema",
    "q_trino_sql_mr_desc", "q_trino_sql_mr_prev",
    "q_trino_sql_mr_skiplast", "q_trino_sql_mr_skipsubset",
    "q_trino_sql_mr_unmatched", "q_trino_sql_mr_vars",
    "q_trino_sql_unicode", "q_view_create_read", "q_win_rank",
    # 2) new r13 keys (inserted as they land)
    "q_meta_stats",
    "q_llm_dup_clusters_star",
    "q_meta_security",
    "q_llm_kmeans",
    "q_llm_cluster_sample",
    # 3) r9 backfill (20 of 49; 25 + 5 + 20 = 50)
    "q_tpch_q4", "q_tpch_q5", "q_tpch_q6", "q_tpch_q7", "q_tpch_q8",
    "q_tpch_q10", "q_tpch_q13", "q_tpch_q14", "q_tpch_q15",
    "q_tpch_q17", "q_tpch_q19", "q_tpch_q22",
    "q_trino_sql_breadth2", "q_trino_sql_breadth3",
    "q_trino_sql_breadth4", "q_trino_sql_mr_excl",
    "q_trino_sql_mr_running", "q_trino_sql_ties",
    "q_trino_sql_jsonpath", "q_trino_sql_listagg",
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
