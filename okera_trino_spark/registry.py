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
#: ROUND-10 ROTATION (data-driven: slots ranked by last-green round
#: computed from CORRECTNESS_r01..r09). Slots, in order:
#:   1) the r9 driver-red — q_trino_sql_listagg_trunc (md5 VARBINARY
#:      vs the oracle's hex VARCHAR; FIXED this round: both digests
#:      now render lower(to_hex(...))) — still without a green row;
#:   2) the NEW r10 keys: q_trino_sql_word_stem (Porter2/Snowball
#:      english pandas UDF), q_trino_sql_listagg_distinct
#:      (array_distinct before the sorted fold),
#:      q_trino_sql_jsonpath_bool (compound &&/|| filter predicates
#:      under K3 logic) — new keys must sit in-window to keep the
#:      test_entry.py union-closure invariant green;
#:   3) the r4-stale cohort (16 keys, last green five rounds ago —
#:      at the staleness bound this round);
#:   4) 26 of the 38-key r5 cohort. The r9 window's 49 greens all
#:      rotate OUT (fresh evidence last round); the 12 deferred r5
#:      keys (the TPC-H q2/q9/q11/q12/q16/q20/q21 composites — their
#:      constituent operators are all freshly green elsewhere —
#:      q_view_expand, and q_llm_media_features / q_llm_entropy /
#:      q_llm_pack / q_llm_dedup_ngram, whose multimodal /
#:      text-analysis / chunking / dedup families keep
#:      q_llm_frame_sample / q_llm_text_stats / q_llm_mix /
#:      q_llm_dedup_apply+simhash in-window) MUST rotate in next
#:      round (r11) to stay within the 5-round staleness bound.
_PRIORITY: tuple[str, ...] = (
    # 1) r9 driver-red, fixed in r10, no green row yet
    "q_trino_sql_listagg_trunc",
    # 2) new in r10
    "q_trino_sql_word_stem", "q_trino_sql_listagg_distinct",
    "q_trino_sql_jsonpath_bool", "q_trino_sql_breadth5",
    "q_trino_sql_breadth6", "q_trino_sql_statfns",
    "q_trino_sql_murmur3",
    # 3) r4-stale cohort (16)
    "q_agg_bool", "q_agg_listagg", "q_fn_decimal", "q_fn_try",
    "q_fn_url", "q_llm_dedup_simhash", "q_llm_dedup_simhash_pairs",
    "q_llm_fingerprint", "q_llm_frame_sample", "q_llm_knn_join",
    "q_llm_langid", "q_llm_tokens", "q_sort_nulls",
    "q_udf_current_db", "q_unnest_ordinality", "q_win_dist",
    # 4) r5-stale cohort (26 of 38 — see the 12-key deferral note above)
    "q_agg_histogram", "q_asof_join", "q_events_funnel",
    "q_events_gapfill", "q_events_outliers", "q_events_retention",
    "q_events_sessionize", "q_fn_interval", "q_fn_json",
    "q_join_range_banded", "q_llm_dedup_apply",
    "q_llm_dup_clusters",
    "q_llm_mix", "q_llm_pii_scrub", "q_llm_pipeline",
    "q_llm_repetition", "q_llm_text_stats", "q_llm_vocab",
    "q_recursive_cte", "q_scan_nested", "q_sort_multi",
    "q_stream_dedup", "q_stream_session", "q_stream_slide",
    "q_stream_stream_join", "q_stream_tumble",
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
