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
#: ROUND-11 ROTATION (data-driven: slots ranked by last-green round
#: computed from CORRECTNESS_r01..r10; the r10 window went 50/50
#: hash-green, so all 50 rotate OUT). Slots, in order:
#:   1) the 12-key r5-stale cohort (q_tpch_q2/q9/q11/q12/q16/q20/q21,
#:      q_view_expand, q_llm_media_features / q_llm_entropy /
#:      q_llm_pack / q_llm_dedup_ngram) — last green in r5, AT the
#:      5-round staleness bound this round; deferred twice (r9, r10)
#:      and pre-committed to this slot in the r10 rotation note;
#:   2) the 5 NEW r11 keys (qdigest read path, equi-depth histogram
#:      twin, SQL-text GROUPS frames, strict-mode SQL/JSON, numeric
#:      jsonpath item methods) — new keys must sit in-window for the
#:      test_entry.py union-closure invariant;
#:   3) backfill from the 46-key r7 cohort (next-stalest; last green
#:      r7, bound hits at r12). The 13 r7 keys that did NOT fit this
#:      window MUST rotate in at r12 (they reach the 5-round bound
#:      then): q_llm_quantize, q_llm_semdedup, q_llm_stratified,
#:      q_llm_tfidf, q_meta_discovery, q_offset, q_sample,
#:      q_scan_wide, q_values, q_except_all, q_intersect_all,
#:      q_llm_dedup_embed, q_llm_ann_ivf_static.
_PRIORITY: tuple[str, ...] = (
    # 1) r5-stale cohort — at the staleness bound, mandatory this round
    "q_tpch_q2", "q_tpch_q9", "q_tpch_q11", "q_tpch_q12",
    "q_tpch_q16", "q_tpch_q20", "q_tpch_q21", "q_view_expand",
    "q_llm_media_features", "q_llm_entropy", "q_llm_pack",
    "q_llm_dedup_ngram",
    # 2) new r11 keys (inserted as they land)
    "q_trino_sql_qdigest", "q_agg_numeric_histogram_det",
    "q_trino_sql_groups_frame", "q_trino_sql_jsonpath_strict",
    "q_trino_sql_jsonpath_methods",
    # 2b) new r11 keys, second wave: the TPC-H-as-Trino-TEXT suite
    #     (functions/trino_tpch.py) — the eight dialect-hardest texts
    #     enter the contract (the other 13 are twin-equality-tested in
    #     tests/test_trino_tpch_suite.py). Their window slots displace
    #     eight r7-backfill keys into the r12 deferral list below.
    "q_trino_tpch_q2", "q_trino_tpch_q4", "q_trino_tpch_q13",
    "q_trino_tpch_q15", "q_trino_tpch_q17", "q_trino_tpch_q18",
    "q_trino_tpch_q21", "q_trino_tpch_q22",
    # 2c) new r11 key, third wave: DSIR importance weighting.
    "q_llm_dsir",
    # 3) r7 backfill (24 of 46; 12 + 5 + 8 + 1 + 24 = 50 — the other
    #    22 r7 keys are the r12 deferral list: the 13 in the note above
    #    PLUS the 9 displaced by the r11 new-key waves: q_agg_collect,
    #    q_agg_global, q_distinct_rows, q_except, q_filter_in,
    #    q_filter_null, q_intersect, q_join_cross, q_limit. All 22
    #    reach the 5-round bound at r12 and MUST rotate in then; 22 +
    #    28 r8-cohort keys fill the r12 window, leaving an 18-key r8
    #    remainder that greens exactly AT its r13 bound — the schedule
    #    stays feasible at 219 keys (43.8/round average vs the 50-slot
    #    window).
    "q_agg_cube", "q_agg_distinct", "q_agg_filtered",
    "q_agg_gsets", "q_join_anti",
    "q_join_full", "q_join_theta",
    "q_llm_ann_lsh", "q_llm_chunk", "q_llm_dedup_near",
    "q_llm_para_dedup", "q_subquery_in", "q_subquery_scalar",
    "q_trino_sql", "q_trino_sql_breadth", "q_trino_sql_fns",
    "q_trino_sql_prepared", "q_trino_sql_tz", "q_trino_sql_unnest",
    "q_trino_tpch_q1", "q_union_distinct", "q_win_frame_groups",
    "q_win_frame_rows", "q_win_lag_lead",
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
