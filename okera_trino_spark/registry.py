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
#: ROUND-5 ROTATION (the rotation round 3's verdict ordered and round 4
#: never executed). Slots, in order:
#:   1) the 17 keys that have NEVER had a driver row (all remaining
#:      tpch_full composites + 8 LLM keys + q_events_outliers +
#:      q_agg_approx_percentile) — closes the verification union at
#:      148/148 registered keys;
#:   2) the 3 stale-error keys (errored r1/r2, fixed, never re-driven);
#:   3) keys whose implementation or oracle CHANGED this round and so
#:      re-enter the window per the round-4 verdict rule (q_sort_multi
#:      localCheckpoint rewrite; pack-id stride; ngram DF cap feeds the
#:      ngram/cluster family);
#:   4) the 3 new Trino-SQL string-path keys;
#:   5) the 8 keys the r4 loader bug turned red — prove the fix to the
#:      driver — plus the other events-dependent keys that went red in
#:      the local parity sweep (views, streams, nested/JSON, as-of,
#:      banded join);
#:   6) leftover slots: the §2.5 extension keys last driven in r2
#:      (pandas UDF/UDTF, salted agg).
_PRIORITY: tuple[str, ...] = (
    # 1) never driver-checked
    "q_tpch_q2", "q_tpch_q9", "q_tpch_q11", "q_tpch_q12", "q_tpch_q16",
    "q_tpch_q20", "q_tpch_q21",
    "q_llm_vocab", "q_llm_quantize", "q_llm_repetition", "q_llm_dedup_apply",
    "q_llm_text_stats", "q_llm_stratified", "q_llm_ann_ivf", "q_llm_ann_lsh",
    "q_events_outliers", "q_agg_approx_percentile",
    # 2) stale errors (r1/r2), never re-driven
    "q_sample", "q_agg_approx_distinct", "q_llm_dedup_near",
    # 3) rewritten this round
    "q_sort_multi", "q_llm_pack", "q_llm_pipeline",
    "q_llm_dedup_ngram", "q_llm_dup_clusters",
    # 4) new: Trino-SQL string front end + L5 feature extraction
    "q_trino_sql", "q_trino_sql_fns", "q_trino_sql_unnest",
    "q_trino_tpch_q1", "q_llm_media_features",
    # 5) r4 loader-bug reds — prove the fix
    "q_events_funnel", "q_events_gapfill", "q_events_retention",
    "q_fn_interval", "q_stream_slide", "q_stream_dedup",
    "q_stream_stream_join", "q_llm_pii_scrub",
    "q_scan_nested", "q_fn_json", "q_asof_join", "q_join_range_banded",
    "q_stream_tumble", "q_stream_session",
    # (q_stream_watermark — green r2, re-verified locally — yielded its
    # re-check slot to the new q_events_sessionize key)
    "q_events_sessionize",
    # (q_stream_static_join — green r2, loader-fix already re-proven by
    # the 8 required red keys above — yielded its slot to the new
    # q_recursive_cte key)
    "q_recursive_cte", "q_view_expand",
    # (q_view_create_read — green r2, re-verified locally — yielded its
    # re-check slot to the new q_llm_entropy key)
    "q_llm_entropy",
    # 6) new keys (outrank green-in-r2 re-checks: q_agg_salted/
    # q_udtf_split/q_pandas_group_norm/q_udf_custom — all green r2,
    # re-verified locally — yielded their slots)
    "q_llm_mix", "q_agg_histogram",
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
