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
#: ROUND-6 ROTATION — freshness, not closure (the union closed in r5:
#: all 155 then-registered keys have a driver row). Slots, in order:
#:   1) the r5 red row (quantize — output shape fixed this round) +
#:      keys whose implementation or oracle CHANGED in r6 (q_sample's
#:      new byte-exact prefix oracle; the Trino-SQL string keys, whose
#:      shared rewriter gained VARCHAR(n)/random/to_unixtime/TRY/
#:      AT TIME ZONE handling) + the NEW r6 keys (metadata discovery,
#:      tz surface) — new keys must sit in-window to keep the
#:      test_entry.py union-closure invariant green;
#:   2) the 26 keys whose only driver row is round 1 — five rounds
#:      stale, the oldest evidence in the repo.
_PRIORITY: tuple[str, ...] = (
    # 1) changed or new in r6
    "q_llm_quantize", "q_sample", "q_meta_discovery", "q_trino_sql_tz",
    "q_trino_sql", "q_trino_sql_fns", "q_trino_sql_unnest",
    "q_trino_tpch_q1", "q_trino_sql_breadth", "q_llm_tfidf",
    "q_llm_trigram_lm", "q_events_pattern", "q_win_frame_groups",
    "q_trino_sql_mr", "q_llm_para_dedup", "q_llm_semdedup",
    "q_llm_ann_lsh", "q_llm_dedup_embed", "q_llm_dedup_near",
    "q_llm_bpe", "q_trino_sql_prepared", "q_llm_ann_ivf_static",
    "q_llm_stratified", "q_llm_chunk",
    # 2) r1-only driver evidence
    "q_agg_collect", "q_agg_cube", "q_agg_distinct", "q_agg_filtered",
    "q_agg_global", "q_agg_gsets", "q_distinct_rows", "q_except",
    "q_except_all", "q_filter_in", "q_filter_null", "q_intersect",
    "q_intersect_all", "q_join_anti", "q_join_cross", "q_join_full",
    "q_join_theta", "q_limit", "q_offset", "q_scan_wide",
    "q_subquery_in", "q_subquery_scalar", "q_union_distinct", "q_values",
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
